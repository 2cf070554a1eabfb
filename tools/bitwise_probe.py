"""Bitwise-equality probe over the 50-query grading window at sf0.01.

Stricter than any value hash: every cell must match EXACTLY — floats
bit-for-bit (struct.pack '<d'), ints as ints, strings/dates verbatim.
A query can pass the driver hash while failing here only via a
normalizer equivalence (e.g. int 2 vs double 2.0); anything that fails
here AND relies on such an equivalence is flagged for review.
"""
import math
import struct
import sys

sys.path.insert(0, "/root/repo")
import duckdb

import __spark_entry__ as em
from dhs_to_database_spark.session import get_spark
from dhs_to_database_spark.sources.tables import TABLE_NAMES

SF = next(
    (a for a in sys.argv[1:] if not a.startswith("--")),
    "/root/testdata/sf0.01",
)

def key_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", struct.pack("<d", v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return ("s", str(v))

def frame_key(df):
    cols = sorted(df.columns)
    rows = [tuple(key_cell(v) for v in rec) for rec in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows

spark = get_spark("bitwise_probe")
con = duckdb.connect()
for t in TABLE_NAMES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, ors = em.queries(), em.oracle_sql()
# default: the 50-entry grading window; `--all` probes every
# oracle-backed query (the r14 queue pre-clearance mode)
if "--all" in sys.argv:
    window = [n for n in qs if n in ors]
else:
    window = list(qs)[:50]
bit_fail, norm_only = [], []
for name in window:
    sdf = qs[name](spark, SF).toPandas()
    ddf = con.execute(ors[name]).fetchdf()
    sk, dk = frame_key(sdf), frame_key(ddf)
    if sk == dk:
        print(f"BITEXACT {name}: {len(sk)} rows")
    else:
        # multiset difference, not positional zip: one early differing
        # cell must not misalign (and overcount) every later row
        from collections import Counter

        ca, cb = Counter(sk), Counter(dk)
        diffs = sum(((ca - cb) + (cb - ca)).values())
        # classify: does the difference survive the type tag? (int-vs-float equiv)
        def untag(rows):
            out = []
            for r in rows:
                out.append(tuple(("n", float(c[1]) if c[0] == "i" else struct.unpack("<d", c[1])[0] if c[0] == "f" else c[1]) if c[0] in ("i", "f") else c for c in r))
            return sorted(out)
        if untag(sk) == untag(dk):
            norm_only.append(name)
            print(f"NORMONLY {name}: int-vs-float tag only ({diffs} cells)")
        else:
            bit_fail.append(name)
            print(f"BITFAIL  {name}: {diffs} differing rows")
print("\nbitwise-exact:", len(window) - len(bit_fail) - len(norm_only), "norm-equiv-only:", norm_only, "real bit diffs:", bit_fail)
# gate semantics (review r13): any non-bitexact query is a nonzero exit
# so the probe composes with set -e chains like every other gate tool
sys.exit(1 if (bit_fail or norm_only) else 0)
