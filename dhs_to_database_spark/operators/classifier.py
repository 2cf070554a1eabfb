"""Distributed linear text-classifier training — the fastText-style
quality/domain classifier step of an LLM data pipeline (classifiers
trained on heuristic labels are how production corpora get their quality
filters: GPT-3's WebText-vs-CommonCrawl LR, Llama's Wikipedia-reference
classifier). Here the declarative quality gate
(``text_analysis.quality_score.passes_quality``) is DISTILLED into a
dense linear scorer over hashing-trick features — the classifier must
recover the rule from raw text.

Spark-first shape, designed for the 100 TB case:

- **Featurization** is ONE Arrow-batched ``mapInPandas`` pass: the
  hashing trick (md5 token -> bucket) needs no vocabulary build, no
  shuffle, and a fixed-width output no matter the corpus vocabulary.
  The feature table is ``localCheckpoint``-ed so the kernel runs once,
  not once per training iteration.
- **Training** is Newton/IRLS (r7, VERDICT r6 ask #2 — was 6-step batch
  GD): each iteration is ONE Arrow-batched ``mapInPandas`` pass emitting
  per-partition sufficient statistics (gradient d+1, Hessian (d+1)^2 —
  one numpy GEMM per batch), which the driver sums and solves (a
  (d+1)x(d+1) system; d is a constant). This is MLlib's
  ``treeAggregate``-of-gradient/Hessian shape expressed on DataFrames:
  rows never leave the executors, the collect is partials-sized
  (n_partitions x (d+1)(d+2) doubles), and quadratic convergence cuts
  the passes over the data from 6 to 2 — at 100 TB the number of full
  passes IS the cost model, and second-order steps buy passes with
  driver-side d^2 math. Measured at sf0.1: loss 0.089 / AUC ~1.0 after
  2 Newton passes vs loss ~0.28 / AUC ~0.99 after 6 GD passes.
- Iterations and dimensionality are constants: training cost is
  T x (one stats pass over the feature table), linear in corpus size.

Registered rows-only: iterative float optimization is not
SQL-expressible (like ``bpe_compression``); correctness is pinned by
tests instead — held-out AUC, training-loss decrease, and the scorer's
agreement with the rule it distills.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query
from .util import local_rows_df
from .sampling import _java_ws_tokens

_HASH_DIM = 16  # hashed bag-of-words buckets
_DENSE = 4  # log-length, tokens/100, mean token length/10, stopword ratio
_CLF_DIM = _HASH_DIM + _DENSE
_CLF_ITERS = 2  # Newton passes; measured loss 0.09 << the 0.35 test bound
_CLF_RIDGE = 1e-6  # Hessian regularizer: solvable even on degenerate corpora
_STOPWORDS = ("the", "a", "and", "of", "to")


def _bucket(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % _HASH_DIM


def featurize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, x array<double>[_CLF_DIM], y double) — hashed-BoW counts
    (L1-normalized) + dense quality signals, and the rule label being
    distilled (the quality gate: 100 <= chars <= 20000 and >= 20
    tokens). One narrow Arrow pass; no shuffle.

    Vectorized (r6, VERDICT r5 nit #1): tokens are exploded once per
    batch and every per-token quantity (bucket counts, length sums,
    stopword counts) is bincount arithmetic over a factorized token
    array — the per-token Python loop is gone. Python-level work is
    only the md5 bucket of each UNSEEN distinct token (memoized across
    batches), so hot-token corpora pay ~zero interpreter cost per
    occurrence. Tokenization is Java-\\s+ exact via the same regex
    class as ``_java_ws_tokens`` (ASCII-space trim only), with the
    original kernel's ``if tx else []`` guard preserved: None AND ''
    both yield zero tokens. Distinct tokens stay PYTHON STRINGS
    end-to-end (object-dtype unique — no fixed-width ``astype('U')``,
    which both truncates trailing NULs, diverging from ``_bucket``,
    and allocates max_len x n_tokens on corpora with one long
    unbroken token).
    """
    import numpy as np
    import pandas as pd

    stop_arr = list(_STOPWORDS)

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            nd = len(pdf)
            if nd == 0:
                yield pd.DataFrame({"doc_id": [], "x": [], "y": []})
                continue
            txt = pdf[text_col]
            nchars = txt.str.len().fillna(0).to_numpy(dtype=np.int64)
            toks = txt.str.strip(" ").str.split("[ \t\n\x0b\f\r]+", regex=True)
            # `if tx else []`: None and '' alike contribute no tokens
            tok_lists = [
                v if (isinstance(v, list) and tx) else []
                for v, tx in zip(toks, txt)
            ]
            ex = pd.Series(tok_lists, dtype=object).explode()
            valid = ex.notna().to_numpy()
            doc_idx = ex.index.to_numpy()[valid]
            flat = ex.to_numpy()[valid]
            nt = np.bincount(doc_idx, minlength=nd).astype(np.int64)
            if len(flat):
                uniq, inv = np.unique(flat, return_inverse=True)
            else:
                uniq = np.array([], dtype=object)
                inv = np.array([], dtype=np.int64)
            buck = np.empty(len(uniq), dtype=np.int64)
            for i, tok in enumerate(uniq.tolist()):
                b = memo.get(tok)
                if b is None:
                    b = _bucket(tok)
                    memo[tok] = b
                buck[i] = b
            counts = np.bincount(
                doc_idx * _HASH_DIM + buck[inv], minlength=nd * _HASH_DIM
            ).astype(np.float64).reshape(nd, _HASH_DIM)
            denom = np.where(nt > 0, nt, 1).astype(np.float64)
            counts /= denom[:, None]
            ulen = np.fromiter(
                (len(t) for t in uniq.tolist()), np.float64, count=len(uniq)
            )
            ustop = np.isin(uniq, stop_arr).astype(np.float64)
            sum_len = np.bincount(doc_idx, weights=ulen[inv], minlength=nd)
            stops = np.bincount(doc_idx, weights=ustop[inv], minlength=nd)
            dense = np.stack(
                [
                    np.log1p(nchars) / 10.0,
                    np.minimum(nt, 1000) / 100.0,
                    np.where(nt > 0, sum_len / denom / 10.0, 0.0),
                    np.where(nt > 0, stops / denom, 0.0),
                ],
                axis=1,
            )
            x = np.concatenate([counts, dense], axis=1)
            y = (
                (nchars >= 100) & (nchars <= 20000) & (nt >= 20)
            ).astype(np.float64)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(), "x": list(x), "y": y}
            )

    src = docs.select("doc_id", text_col)
    # Parallelism guard: a small corpus often arrives as one file split,
    # which would serialize the Arrow kernel on a single core. Spreading
    # it across the cluster costs one tiny shuffle of raw text; at real
    # scale the scan already has >= defaultParallelism splits and this is
    # a no-op (same tier-guard shape as the windows.py thresholds).
    # r14 measurement note (guide §1.1 — empirical beats first-principles
    # here): an earlier r14 edit size-capped this spread at ~4 MB of
    # estimated input per Arrow task on the theory that each partition
    # costs a 0.2-0.4 s Python worker round-trip. Measured with the
    # isolated min-of-5 harness, that theory was wrong — reused daemon
    # workers make the per-partition overhead tens of ms, while the
    # featurize kernel itself costs real CPU seconds per MB, so the cap
    # serialized genuine work: featurize_calibration 0.78 s -> 1.11 s,
    # quality_classifier 1.63 s -> 1.93 s. The unconditional spread is
    # also the safer shape at every scale: in the only window where the
    # guard binds (corpus smaller than one split per core), the cost of
    # over-spreading is a bounded constant (tiny parallel tasks) while
    # under-spreading serializes kernel time that grows with the corpus.
    par = docs.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.mapInPandas(gen, "doc_id bigint, x array<double>, y double")


def _sigmoid_col(w: list[float]) -> Column:
    """P(y=1 | x) under weights w (w[0] = bias) — pure JVM arithmetic.

    Shape note (r7): the whole weight vector — bias included, folded
    into the dot product against a 1-prepended feature vector — is ONE
    array expression (``F.lit(list)`` expands to per-element literals
    that the optimizer constant-folds back into a single array literal),
    keeping the py4j expression tree compact. Measured while closing
    VERDICT r6 ask #2: per-iteration cost in the old GD loop was JOB
    overhead, NOT codegen recompilation (same-weights vs
    changed-weights reruns timed identically), which is why training
    moved to the 2-pass Newton shape below; this helper now runs only
    in the final scoring pass and ``mean_logloss``."""
    warr = F.lit([float(v) for v in w])
    dot = F.aggregate(
        F.zip_with(
            F.concat(F.array(F.lit(1.0)), F.col("x")), warr, lambda a, b: a * b
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))


def _newton_stats(feats: DataFrame, w: list[float]) -> DataFrame:
    """One row of logistic sufficient statistics PER PARTITION at weights
    w: (n, gradient[d+1], Hessian[(d+1)^2] flattened). Arrow-batched
    numpy GEMMs — (Z'r, Z'WZ with W = p(1-p)) — so the per-pass compute
    is two matrix products per batch, not 250+ codegen expressions. The
    driver sums these partials and solves: the DataFrame expression of
    MLlib's treeAggregate-of-partials pattern."""
    import numpy as np
    import pandas as pd

    wv = [float(v) for v in w]

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        warr = np.asarray(wv)
        d1 = len(warr)
        n = 0
        g = np.zeros(d1)
        h = np.zeros((d1, d1))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["x"].to_numpy())
            z = np.concatenate([np.ones((len(x), 1)), x], axis=1)
            p = 1.0 / (1.0 + np.exp(-np.clip(z @ warr, -35.0, 35.0)))
            g += z.T @ (p - pdf["y"].to_numpy(dtype=np.float64))
            h += (z * (p * (1.0 - p))[:, None]).T @ z
            n += len(pdf)
        yield pd.DataFrame(
            {"n": [n], "g": [g.tolist()], "h": [h.reshape(-1).tolist()]}
        )

    return feats.select("x", "y").mapInPandas(
        gen, "n bigint, g array<double>, h array<double>"
    )


def train_logistic(
    feats: DataFrame,
    dim: int = _CLF_DIM,
    iters: int = _CLF_ITERS,
    ridge: float = _CLF_RIDGE,
) -> list[float]:
    """Newton/IRLS logistic regression over a (x, y) DataFrame. One
    sufficient-statistics pass per iteration (``_newton_stats``); the
    driver's only state is w plus the (d+1)x(d+1) solve — the collect is
    partials-sized (one row per partition), never row-sized.

    Determinism note (ADVICE r5): partials are float GEMM sums, so
    weight values (and the rounded 6-dp scores downstream) depend on
    partition layout — NOT bit-identical across cluster layouts, unlike
    the repo's integer-sum operators. Acceptable for this rows-only
    query: the tests pin layout-independent properties (held-out AUC,
    loss decrease, rule agreement), not exact score bytes. (The r6
    fixed-point alternative measured +45% wall on the GD shape; with
    Newton the equivalent would be rounding each partial to 9-dp —
    still unconsumed downstream, so kept on doubles deliberately.)"""
    import numpy as np

    d1 = dim + 1
    w = np.zeros(d1)
    for _ in range(iters):
        rows = _newton_stats(feats, w.tolist()).collect()
        n = float(sum(r["n"] for r in rows))
        g = np.sum([np.asarray(r["g"]) for r in rows], axis=0) / n
        h = np.sum(
            [np.asarray(r["h"]).reshape(d1, d1) for r in rows], axis=0
        ) / n
        h[np.diag_indices_from(h)] += ridge
        w = w - np.linalg.solve(h, g)
    return [float(v) for v in w]


def mean_logloss(feats: DataFrame, w: list[float]) -> float:
    """Mean binary cross-entropy of weights w on a (x, y) frame."""
    p = _sigmoid_col(w)
    eps = F.lit(1e-12)
    ll = -(
        F.col("y") * F.log(p + eps)
        + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p + eps)
    )
    return float(feats.select(F.avg(ll).alias("l")).first()["l"])


# ---------------------------------------------------------------------------
# Featurize calibration (r8, VERDICT r7 ask #7) — the classifier's INPUT
# path put under the oracle. Training stays rows-only (float Newton),
# but everything ``featurize`` computes before it — md5 hashing-trick
# bucket weights, token counts, dense ratios, the rule label — is
# integer/exact-ratio arithmetic both engines can state: bucket =
# int(md5(token)[:8], 16) % _HASH_DIM is the repo's proven md5->int pair
# (sampling.hash_bucket), and every reported value is an int/int double
# division rounded through the proven ROUND pair. The one feature NOT
# hash-compared is x[16] (log1p(nchars)/10): ln is transcendental and
# libm-vs-JVM last-ulp differences are exactly the divergence this repo
# keeps out of oracles — nchars itself is pinned via the label instead.
# The Spark side runs the REAL Arrow kernel (featurize), so a kernel
# regression (tokenization drift, memo bug, normalization change) fails
# the hash gate, not just the statistical tests.
# ---------------------------------------------------------------------------

_FEAT_STOP_SQL = ", ".join(f"'{s}'" for s in _STOPWORDS)


@query(
    "featurize_calibration",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN 0 ELSE length(text) END AS nchars,
             CASE WHEN text IS NULL OR text = '' THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text, ' '),
                                          '[ \\t\\n\\x0b\\f\\r]+') END AS t
      FROM documents
    ),
    per_tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(u.tok), 1, 8)) AS BIGINT)
               % {_HASH_DIM} AS bucket,
             length(u.tok) AS tlen,
             CASE WHEN u.tok IN ({_FEAT_STOP_SQL}) THEN 1 ELSE 0 END AS is_stop
      FROM docs, UNNEST(t) AS u(tok)
    ),
    counts AS (
      SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM per_tok GROUP BY doc_id, bucket
    ),
    dense AS (
      SELECT d.doc_id, d.nchars, len(d.t) AS nt,
             COALESCE(s.sum_len, 0) AS sum_len,
             COALESCE(s.stops, 0) AS stops
      FROM docs d LEFT JOIN (
        SELECT doc_id, CAST(SUM(tlen) AS BIGINT) AS sum_len,
               CAST(SUM(is_stop) AS BIGINT) AS stops
        FROM per_tok GROUP BY doc_id) s USING (doc_id)
    )
    SELECT d.doc_id, CAST(b.bucket AS INT) AS bucket,
           CAST(ROUND(CAST(COALESCE(c.c, 0) AS DOUBLE)
                      / GREATEST(d.nt, 1), 6) AS DOUBLE) AS w,
           CAST(ROUND(CAST(LEAST(d.nt, 1000) AS DOUBLE) / 100.0, 6)
             AS DOUBLE) AS tok_density,
           CAST(ROUND(CASE WHEN d.nt > 0
                           THEN (CAST(d.sum_len AS DOUBLE) / d.nt) / 10.0
                           ELSE 0.0 END, 6) AS DOUBLE) AS mean_tok_len,
           CAST(ROUND(CASE WHEN d.nt > 0
                           THEN CAST(d.stops AS DOUBLE) / d.nt
                           ELSE 0.0 END, 6) AS DOUBLE) AS stop_ratio,
           CAST(CASE WHEN d.nchars >= 100 AND d.nchars <= 20000
                      AND d.nt >= 20 THEN 1 ELSE 0 END AS INT) AS label
    FROM dense d
    CROSS JOIN (SELECT unnest(generate_series(0, {_HASH_DIM - 1})) AS bucket) b
    LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.bucket = b.bucket
    """,
)
def featurize_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, bucket) report of the REAL featurize kernel's output
    (see block comment): the L1-normalized hashed-BoW weight ``w`` for
    every bucket (zeros included — the histogram is dense by design),
    the three exact-ratio dense features, and the rule label — all
    hash-compared against a DuckDB recomputation from raw text."""
    d = load_table(spark, sf_dir, "documents")
    feats = featurize(d)
    ex = feats.select(
        "doc_id",
        "x",
        F.col("y").cast("int").alias("label"),
        F.posexplode(F.expr(f"slice(x, 1, {_HASH_DIM})")).alias(
            "bucket", "w_raw"
        ),
    )
    return ex.select(
        "doc_id",
        "bucket",
        F.round("w_raw", 6).cast("double").alias("w"),
        F.round(F.col("x")[_HASH_DIM + 1], 6)
        .cast("double")
        .alias("tok_density"),
        F.round(F.col("x")[_HASH_DIM + 2], 6)
        .cast("double")
        .alias("mean_tok_len"),
        F.round(F.col("x")[_HASH_DIM + 3], 6)
        .cast("double")
        .alias("stop_ratio"),
        "label",
    )


# ---------------------------------------------------------------------------
# IRLS sufficient-statistics calibration (r9, VERDICT r8 ask #4) — the
# classifier's TRAINING accumulation path put under the oracle. The
# Newton solve itself stays rows-only (driver-side float linear algebra),
# but what each IRLS pass ACCUMULATES — X^T.W.X and X^T.r, sums of
# products of already-oracle-gated featurize quantities — is exact
# integer math once (a) the gated feature dims (log1p excluded, as in
# featurize_calibration) are quantized through the proven round-pair,
# and (b) the sigmoid probability is replaced by a deterministic
# rational surrogate p = (doc_id % 5 + 1)/10 injected identically in
# both engines (the pii_redact injection pattern): then W = p(1-p) and
# r = p - y are exact tenths, and G_j = sum(qz_j * (p10 - 10 y)),
# H_jk = sum(qz_j * qz_k * p10 * (10 - p10)) are order-free int64 sums.
# The Spark side runs the REAL featurize kernel and the REAL partials
# shape (one Arrow-batched integer-GEMM row per partition, summed
# exactly, i.e. _newton_stats with the floats swapped for int64), so a
# drift in EITHER the featurize math or the accumulation plumbing fails
# the hash gate. A runtime guard enforces the int64 bound
# 25 * max|qz|^2 * N < 2^63 (Spark's non-ANSI sum wraps silently where
# DuckDB's HUGEINT doesn't — the kmeans/source_pagerank guard recipe).
# ---------------------------------------------------------------------------

_IRLS_Q = 10**4  # feature quantization: x -> round(x * 1e4) int64 units
_IRLS_D1 = _CLF_DIM  # bias + 16 buckets + 3 dense ratios (log1p dim dropped)
_IRLS_GSCALE = 10 * _IRLS_Q  # gradient fixed-point scale (p,r in tenths)
_IRLS_HSCALE = 100 * _IRLS_Q * _IRLS_Q  # Hessian scale (W in hundredths)


def _irls_oracle() -> str:
    return f"""
    WITH docs AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN 0 ELSE length(text) END AS nchars,
             CASE WHEN text IS NULL OR text = '' THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text, ' '),
                                          '[ \\t\\n\\x0b\\f\\r]+') END AS t
      FROM documents
    ),
    per_tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(u.tok), 1, 8)) AS BIGINT)
               % {_HASH_DIM} AS bucket,
             length(u.tok) AS tlen,
             CASE WHEN u.tok IN ({_FEAT_STOP_SQL}) THEN 1 ELSE 0 END AS is_stop
      FROM docs, UNNEST(t) AS u(tok)
    ),
    counts AS (
      SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM per_tok GROUP BY doc_id, bucket
    ),
    dense AS (
      SELECT d.doc_id, d.nchars, len(d.t) AS nt,
             COALESCE(s.sum_len, 0) AS sum_len,
             COALESCE(s.stops, 0) AS stops
      FROM docs d LEFT JOIN (
        SELECT doc_id, CAST(SUM(tlen) AS BIGINT) AS sum_len,
               CAST(SUM(is_stop) AS BIGINT) AS stops
        FROM per_tok GROUP BY doc_id) s USING (doc_id)
    ),
    bw AS (
      SELECT d.doc_id,
             list(CAST(ROUND((CAST(COALESCE(c.c, 0) AS DOUBLE)
                              / GREATEST(d.nt, 1)) * {_IRLS_Q}.0) AS BIGINT)
                  ORDER BY b.bucket) AS qw
      FROM dense d
      CROSS JOIN (SELECT unnest(generate_series(0, {_HASH_DIM - 1}))
                    AS bucket) b
      LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.bucket = b.bucket
      GROUP BY d.doc_id
    ),
    vec AS MATERIALIZED (
      SELECT d.doc_id,
             list_concat(list_concat(
               [CAST({_IRLS_Q} AS BIGINT)],
               bw.qw),
               [CAST(ROUND((CAST(LEAST(d.nt, 1000) AS DOUBLE) / 100.0)
                           * {_IRLS_Q}.0) AS BIGINT),
                CAST(ROUND((CASE WHEN d.nt > 0
                            THEN (CAST(d.sum_len AS DOUBLE) / d.nt) / 10.0
                            ELSE 0.0 END) * {_IRLS_Q}.0) AS BIGINT),
                CAST(ROUND((CASE WHEN d.nt > 0
                            THEN CAST(d.stops AS DOUBLE) / d.nt
                            ELSE 0.0 END) * {_IRLS_Q}.0) AS BIGINT)]
             ) AS qz,
             CAST(d.doc_id % 5 + 1 AS BIGINT) AS p10,
             CAST(CASE WHEN d.nchars >= 100 AND d.nchars <= 20000
                        AND d.nt >= 20 THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM dense d JOIN bw USING (doc_id)
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vec),
    dims AS (SELECT unnest(generate_series(0, {_IRLS_D1 - 1})) AS j),
    g AS (
      SELECT j.j AS j,
             CAST(SUM(v.qz[j.j + 1] * (v.p10 - 10 * v.y)) AS BIGINT) AS v_fp
      FROM vec v, dims j GROUP BY j.j
    ),
    h AS (
      SELECT j.j AS j, k.j AS k,
             CAST(SUM(v.qz[j.j + 1] * v.qz[k.j + 1]
                      * v.p10 * (10 - v.p10)) AS BIGINT) AS v_fp
      FROM vec v, dims j, dims k GROUP BY j.j, k.j
    )
    SELECT 'n' AS term, -1 AS j, -1 AS k, nn.n AS v_fp,
           CAST(nn.n AS DOUBLE) AS v
    FROM nn
    UNION ALL
    SELECT 'grad' AS term, CAST(g.j AS INT) AS j, -1 AS k, g.v_fp,
           (CAST(g.v_fp AS DOUBLE) / nn.n) / {_IRLS_GSCALE}.0 AS v
    FROM g, nn
    UNION ALL
    SELECT 'hess' AS term, CAST(h.j AS INT) AS j, CAST(h.k AS INT) AS k,
           h.v_fp,
           (CAST(h.v_fp AS DOUBLE) / nn.n) / {_IRLS_HSCALE}.0 AS v
    FROM h, nn
    """


@query("irls_stats_calibration", oracle=_irls_oracle())
def irls_stats_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One IRLS pass's sufficient statistics in exact fixed point (see
    block comment): per-(j, k) Hessian cells, per-j gradient entries
    (k = -1), and the corpus count — v_fp is the raw int64 sum, v the
    descaled mean both engines derive with the identical double-division
    order ((v_fp / n) / scale)."""
    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    feats = featurize(d)  # the REAL Arrow kernel — drift fails the gate
    q = feats.select(
        F.expr(
            f"transform(concat(array(CAST(1.0 AS DOUBLE)),"
            f" slice(x, 1, {_HASH_DIM}), slice(x, {_HASH_DIM + 2}, 3)),"
            f" v -> CAST(round(v * {_IRLS_Q}.0) AS BIGINT))"
        ).alias("qz"),
        (F.col("doc_id") % 5 + 1).cast("bigint").alias("p10"),
        F.col("y").cast("bigint").alias("y"),
    ).localCheckpoint(eager=True)  # one kernel run feeds guard + partials

    # Runtime overflow guard (the kmeans/source_pagerank recipe): every
    # Hessian term is qz_j * qz_k * p10 * (10 - p10) <= 25 * max|qz|^2,
    # summed over N rows in Spark's silently-wrapping int64.
    stats = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.expr("array_max(transform(qz, v -> abs(v)))")).alias("maxq"),
    ).collect()[0]
    n, maxq = stats["n"], stats["maxq"] or 0
    assert 25 * maxq * maxq * max(n, 1) < 2**63, (
        f"max|qz|={maxq} over n={n} rows would overflow the int64 Hessian"
        f" sum (25*maxq^2*n >= 2^63); drop _IRLS_Q a decade"
    )

    d1 = _IRLS_D1

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # _newton_stats' partials shape with the float GEMMs swapped for
        # exact int64 GEMMs: one (g, h) row per partition, rows never
        # leave the executors.
        #
        # INVARIANT (VERDICT r9): unlike the pca/spectral kernels
        # (similarity.py, which early-flush a partial when
        # mq^2 * rows approaches 2^63), this kernel accumulates a WHOLE
        # partition unflushed — that is safe ONLY because the pre-pass
        # guard above bounds the entire corpus: every Hessian term is
        # <= 25 * max|qz|^2 and 25 * maxq^2 * N < 2^63 covers any
        # partition's sum (a partition holds <= N rows). If that guard
        # is ever weakened or removed, add the siblings' overflow-safe
        # early flush here in the same edit.
        g = np.zeros(d1, dtype=np.int64)
        h = np.zeros((d1, d1), dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            z = np.stack(pdf["qz"].to_numpy()).astype(np.int64)
            p10 = pdf["p10"].to_numpy(dtype=np.int64)
            y = pdf["y"].to_numpy(dtype=np.int64)
            g += z.T @ (p10 - 10 * y)
            h += (z * (p10 * (10 - p10))[:, None]).T @ z
        yield pd.DataFrame({"g": [g.tolist()], "h": [h.reshape(-1).tolist()]})

    partials = q.mapInPandas(
        gen, "g array<bigint>, h array<bigint>"
    ).collect()  # partials-sized: one row per partition
    assert n > 0, "empty documents table"  # fail loudly, like the siblings
    gsum = [sum(int(r["g"][j]) for r in partials) for j in range(d1)]
    hsum = [
        sum(int(r["h"][i]) for r in partials) for i in range(d1 * d1)
    ]  # python ints: the driver-side sum cannot wrap
    rows = [("n", -1, -1, n, float(n))]
    rows += [
        ("grad", j, -1, gsum[j], (float(gsum[j]) / n) / float(_IRLS_GSCALE))
        for j in range(d1)
    ]
    rows += [
        (
            "hess",
            i // d1,
            i % d1,
            hsum[i],
            (float(hsum[i]) / n) / float(_IRLS_HSCALE),
        )
        for i in range(d1 * d1)
    ]
    return local_rows_df(
        spark, rows, "term string, j int, k int, v_fp bigint, v double"
    )


@query("quality_classifier", rows_only_reason="float IRLS solve: coefficient bits depend on BLAS summation order, so no engine-independent hash exists; the featurize and per-iteration sufficient-stats kernels are oracle-gated by featurize_calibration + irls_stats_calibration")
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the distilled quality scorer on the corpus and score every
    doc: (doc_id, score, label). Correctness pinned by tests (held-out
    AUC, loss decrease, rule agreement), not a SQL oracle."""
    d = load_table(spark, sf_dir, "documents")
    feats = featurize(d).localCheckpoint(eager=True)
    w = train_logistic(feats)
    return feats.select(
        "doc_id",
        F.round(_sigmoid_col(w), 6).cast("double").alias("score"),
        F.col("y").cast("int").alias("label"),
    )
