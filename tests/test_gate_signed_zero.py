"""Signed-zero gate hardening (VERDICT r12 asks #2a-c).

The r12 driver failure: at sf0.01 DuckDB's ROUND(x, 4) kept IEEE -0.0 for
19 importance_weights docs whose exact mean is a tiny negative, while
Spark's F.round (BigDecimal — no signed zero) emitted +0.0. The driver's
value hash distinguishes the two; the local gate's norm_cell collapsed
both through str(int(v)) == "0", so two full local chains were green
while the driver was red. These tests pin the hardened gate: a crafted
-0.0/+0.0 pair must FAIL locally, exactly the class the driver sees.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

from check_oracle import frame_hash, negative_zero_cells, norm_cell  # noqa: E402


def test_norm_cell_preserves_zero_sign():
    """-0.0 and +0.0 must normalize differently (the driver's hash does);
    everything else about integral-float collapsing stays intact so the
    int-vs-float cross-engine equivalences keep hashing equal."""
    assert norm_cell(-0.0) == "-0"
    assert norm_cell(0.0) == "0"
    assert norm_cell(0) == "0"  # int zero still collapses with float +0.0
    assert norm_cell(-0.0) != norm_cell(0.0)
    assert norm_cell(2.0) == "2" == norm_cell(2)
    assert norm_cell(-2.0) == "-2"
    assert norm_cell(float("nan")) == "<null>"


def test_crafted_signed_zero_pair_fails_the_local_gate():
    """The exact r12 failure shape: rows match, columns match, one side
    rounds to -0.0 where the other emits +0.0 — the hardened frame_hash
    must differ (pre-hardening both hashed identically)."""
    spark_like = pd.DataFrame({"doc_id": [1, 2], "score": [0.0, 1.5]})
    duck_like = pd.DataFrame({"doc_id": [1, 2], "score": [-0.0, 1.5]})
    assert frame_hash(spark_like) != frame_hash(duck_like)
    # and with the sign normalized (+ 0.0 — the committed fix) they agree
    fixed = duck_like.assign(score=duck_like["score"] + 0.0)
    assert frame_hash(spark_like) == frame_hash(fixed)


def test_negative_zero_lint_flags_float_and_object_columns():
    clean = pd.DataFrame({"a": [0.0, 1.0], "b": ["x", "y"], "c": [0, -1]})
    assert negative_zero_cells(clean, "spark") == []
    dirty_f = pd.DataFrame({"a": [-0.0, 1.0]})
    (msg,) = negative_zero_cells(dirty_f, "oracle")
    assert "'a'" in msg and "-0.0" in msg
    # nullable doubles surface as object dtype in some fetch paths
    dirty_o = pd.DataFrame({"a": pd.array([None, -0.0], dtype=object)})
    assert dirty_o["a"].dtype.kind == "O"
    assert len(negative_zero_cells(dirty_o, "oracle")) == 1
    # array<double> columns arrive as object cells holding lists/ndarrays;
    # the lint recurses one level (no such oracle-backed query exists
    # today — schema-scanned — but the lint must not go blind when added)
    import numpy as np

    dirty_list = pd.DataFrame({"a": [[0.0, -0.0], [1.0]]})
    assert len(negative_zero_cells(dirty_list, "spark")) == 1
    dirty_nd = pd.DataFrame({"a": [np.array([0.0]), np.array([-0.0, 2.0])]})
    assert len(negative_zero_cells(dirty_nd, "oracle")) == 1
    clean_list = pd.DataFrame({"a": [["x", "y"], []], "b": [[0.0], [3.5]]})
    assert negative_zero_cells(clean_list, "spark") == []


def test_duckdb_round_emits_negative_zero_and_plus_zero_normalizes():
    """Pin the engine behavior the importance_weights fix depends on:
    DuckDB ROUND keeps the sign of a negative underflow-to-zero, and
    appending + 0.0 flips it to +0.0 without touching any nonzero value."""
    con = duckdb.connect()
    # NB the input must be DOUBLE (as in the dsir_score expression, which
    # rounds CAST(SUM(lr) AS DOUBLE) / COUNT(*)): DuckDB's DECIMAL ROUND
    # has no signed zero, it is the DOUBLE overload that keeps the sign.
    raw, fixed, nonzero = con.execute(
        "SELECT ROUND(CAST(-0.00001 AS DOUBLE), 4),"
        "       ROUND(CAST(-0.00001 AS DOUBLE), 4) + 0.0,"
        "       ROUND(CAST(-1.23456 AS DOUBLE), 4) + 0.0"
    ).fetchone()
    assert raw == 0.0 and math.copysign(1.0, raw) < 0.0  # IEEE -0.0
    assert fixed == 0.0 and math.copysign(1.0, fixed) > 0.0  # normalized
    assert nonzero == -1.2346  # + 0.0 is exact on every other value


def test_importance_weights_score_normalizes_zero_sign_in_both_engines():
    """The committed fix is structural in both engines' expressions: the
    oracle's dsir_score and the Spark aggregation both append + 0.0
    after the ROUND (sampling.py — signed-zero note)."""
    import __spark_entry__ as e

    sql = e.oracle_sql()["importance_weights"]
    assert "+ 0.0 AS DOUBLE) AS dsir_score" in sql
    import inspect

    from dhs_to_database_spark.operators import sampling

    src = inspect.getsource(sampling.importance_weights)
    assert "+ F.lit(0.0)" in src


def test_bitwise_probe_untag_keeps_real_bit_diffs_real():
    """ADVICE r13: the probe's NORMONLY classifier must not erase a
    genuine -0.0/+0.0 bit difference or an int diff past 2^53 — only the
    legitimate int-vs-float tag equivalence (2 vs 2.0) may compare
    equal. key_cell must also tag numpy scalars like their Python
    equivalents (np.int64 is not a Python int subclass)."""
    import numpy as np

    from bitwise_probe import key_cell, untag

    # numpy scalar tagging matches Python scalar tagging
    assert key_cell(np.int64(7)) == key_cell(7)
    assert key_cell(np.float64(1.5)) == key_cell(1.5)
    assert key_cell(np.bool_(True)) == key_cell(True)
    assert key_cell(np.float64("nan")) == ("nan",)

    def rows(*vals):
        return sorted((key_cell(v),) for v in vals)

    # int-vs-float equivalence survives untag (the intended NORMONLY class)
    assert untag(rows(2)) == untag(rows(2.0))
    # signed zero is a REAL bit diff: int 0 / float +0.0 equal each other
    # but never -0.0
    assert untag(rows(0)) == untag(rows(0.0))
    assert untag(rows(-0.0)) != untag(rows(0.0))
    assert untag(rows(-0.0)) != untag(rows(0))
    # past 2^53 ints compare exactly: 2^53 and 2^53+1 collapse to the
    # same double but must stay distinct under untag
    assert untag(rows(2**53)) != untag(rows(2**53 + 1))
    # and an exactly-representable big int still equals its float twin
    assert untag(rows(2**53)) == untag(rows(float(2**53)))


def test_layout_probe_allowlist_contract():
    """The invariance probes' allowlists must stay honest: every entry
    names a registered query and carries a documented semantic reason
    (the inherent layout/config dependence plus the gate that covers
    the query instead), and this pin asserts the EXACT expected
    contents, so allowlisting can never silently mute a LAYOUTDIFF /
    CONFDIFF failure. Sole member today: approx_percentile_orders —
    Spark's Greenwald-Khanna sketch estimate depends on partition merge
    order by construction (rows_only_reason says the same; its row
    count is layout-stable and approx_quantile_calibration is the
    exact, invariant value gate). Every other registered query is
    invariant: 157/157 at sf0.001, 156/157+1-allowed at sf0.01 (r14)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    import layout_probe

    import __spark_entry__ as e

    import config_probe

    qs = e.queries()
    # per-tool expected contents: the GK sketch is layout-sensitive
    # (partition merge order feeds the estimate) but CONFIG-invariant
    # (identical input splits produce identical partial sketches
    # whatever the session tuning — verified 157/157 at both SFs), so
    # only the layout allowlist carries it.
    expected = {
        "layout_probe": (
            layout_probe.LAYOUT_DEPENDENT_OK,
            {"approx_percentile_orders"},
        ),
        "config_probe": (config_probe.CONFIG_DEPENDENT_OK, set()),
    }
    for tool, (allow, names) in expected.items():
        for name, reason in allow.items():
            assert name in qs, f"{tool}: allowlisted unknown query {name!r}"
            assert isinstance(reason, str) and len(reason) >= 20, (
                f"{tool}: allowlist entry {name!r} needs a real reason"
            )
        assert set(allow) == names, (
            f"{tool}: new allowlist entries require a documented semantic"
            " reason AND updating this pin"
        )
    # the sketch query must keep carrying its rows-only registration (the
    # driver grade the allowlist rationale leans on)
    assert "approx_percentile_orders" not in e.oracle_sql()


def test_key_cell_recurses_into_arrays_and_maps():
    """r14 (found by config_probe): array cells must compare by element
    bits, not by repr — np.ndarray vs list of identical floats tagged
    differently under the old str() fallback, and numpy's 8-sig-digit
    print precision could make genuinely different floats compare equal.
    Maps key-sort so python dict insertion order cannot leak in."""
    import numpy as np

    from bitwise_probe import key_cell

    assert key_cell(np.array([0.1, 0.2])) == key_cell([0.1, 0.2])
    assert key_cell((1, 2.5)) == key_cell([1, 2.5])
    # element bits matter: differs past numpy print precision
    assert key_cell([0.1]) != key_cell([0.1 + 1e-12])
    # nested signed zero stays a real difference
    assert key_cell([0.0]) != key_cell([-0.0])
    # int vs float elements tag differently (exactness, as at top level)
    assert key_cell([1]) != key_cell([1.0])
    # maps: order-insensitive, value-bit-sensitive
    assert key_cell({"a": 1, "b": 2.0}) == key_cell({"b": 2.0, "a": 1})
    assert key_cell({"a": 0.0}) != key_cell({"a": -0.0})
