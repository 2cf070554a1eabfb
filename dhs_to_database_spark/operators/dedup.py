"""Deduplication operators — SURVEY.md §2.D extension surface.

Exact dedup (hash-groupBy), n-gram Jaccard near-dup (shingle self-join),
MinHash+LSH (shingle -> minhash signature -> banding -> bucket join), and
SimHash (bit-vote fingerprint + banded Hamming join) over ``documents``.

Ancestry in the reference: duplicate-load detection (03 nb raw :993-1140,
GROUP BY ... HAVING count(*)>1) and the fuzzy label match QA
(DCF_Parser.py:278-288).

Scale design (the part that matters at 100 TB):
- Exact dedup is one shuffle on a 16-byte digest — the cheapest possible key.
- N-gram Jaccard's all-pairs join is quadratic; it is exposed here on a
  bounded slice as the *verification* primitive. The scale path is MinHash:
  cost is linear in corpus size (explode shingles -> 32 min-aggregations ->
  8 banded bucket joins), and only bucket-colliding pairs are verified.
- Everything is built-in expressions (xxhash64/md5/higher-order array
  functions) — no Python in the hot path.
- MinHash/SimHash use Spark's xxhash64, which DuckDB cannot reproduce, so
  those two register without an oracle (driver records rows-only check);
  their correctness is pinned by unit tests against exact Jaccard instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query
from .text_analysis import normalized_fingerprint

# ---------------------------------------------------------------------------
# Exact dedup: keep-first per normalized content fingerprint.
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM (
      SELECT doc_id, text,
             ROW_NUMBER() OVER (
               PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               ORDER BY doc_id
             ) AS rn
      FROM documents
    ) t WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keep-first == MIN(doc_id) per fingerprint: a partial-aggregated
    # groupBy (map-side combine) instead of a window sort — one small
    # shuffle on the 16-byte digest, no per-partition ordering.
    d = load_table(spark, sf_dir, "documents")
    fp = normalized_fingerprint(F.col("text"))
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fingerprint")
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup: character 4-gram shingles, exact Jaccard on a
# bounded doc slice (the verification primitive for the LSH path).
# ---------------------------------------------------------------------------

_JACCARD_LIMIT = 200  # bounded all-pairs slice; the scale path is MinHash
_JACCARD_THRESHOLD = 0.5


def char_shingles(t: Column, n: int = 4) -> Column:
    """Array of character n-grams of ``t`` (expects length(t) >= n)."""
    return F.expr(f"transform(sequence(1, length(t) - {n - 1}), i -> substring(t, i, {n}))").alias(
        "shingles"
    )


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lower(text) AS t FROM documents
      WHERE doc_id < {_JACCARD_LIMIT} AND length(text) >= 4
    ),
    idx AS (SELECT doc_id, t, unnest(range(1, length(t) - 2)) AS i FROM docs),
    sh AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 4) AS sh FROM idx),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(ROUND(CAST(n_common AS DECIMAL(18,6)) / (sa.sz + sb.sz - n_common), 4)
                AS DOUBLE) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(ROUND(CAST(n_common AS DECIMAL(18,6)) / (sa.sz + sb.sz - n_common), 4)
               AS DOUBLE) >= {_JACCARD_THRESHOLD}
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    docs = (
        d.filter((F.col("doc_id") < _JACCARD_LIMIT) & (F.length("text") >= 4))
        .select("doc_id", F.lower("text").alias("t"))
    )
    sh = docs.select("doc_id", F.explode(char_shingles(F.col("t"))).alias("sh")).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        a.join(b, ["sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.round(
        F.col("n_common").cast("decimal(18,6)") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        4,
    ).cast("double")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup: the linear-cost scale path.
# Signature: 32 permutations approximated by xxhash64(seed || shingle); LSH:
# 8 bands x 4 rows. Candidate pairs = docs sharing any band bucket; estimated
# Jaccard = fraction of matching signature components.
# ---------------------------------------------------------------------------

_N_HASHES = 32
_N_BANDS = 8  # 4 rows per band


def word_shingles(text_col: str = "text", n: int = 3) -> Column:
    """Array of ``n``-word shingles of a text column (named by ``text_col``)."""
    words = f"split(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), ' ')"
    return F.expr(
        f"transform(sequence(1, greatest(size({words}) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice({words}, i, {n})))"
    )


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One row per doc: ``sig`` = array of _N_HASHES minhash components.

    The permutation family is ``g_i = xxhash64(i, xxhash64(shingle))``: the
    string is hashed ONCE, then each permutation re-hashes only the 8-byte
    long (cheap, ANSI-safe — long multiply would overflow-throw under ANSI).
    No pre-aggregation ``distinct``: MIN is duplicate-insensitive, so
    duplicate shingles cost nothing and we save a full shuffle; the only
    shuffle is the partial-aggregated groupBy(doc)."""
    sh = docs.select(id_col, F.explode(word_shingles("text", 3)).alias("sh")).select(
        id_col, F.xxhash64("sh").alias("h")
    )
    mins = [F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"h{i}") for i in range(_N_HASHES)]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(id_col, F.array(*[f"h{i}" for i in range(_N_HASHES)]).alias("sig"))


@query("minhash_near_dup")  # no SQL oracle: xxhash64 is Spark-specific (rows-only check)
def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(d.select("doc_id", "text"))

    rows_per_band = _N_HASHES // _N_BANDS
    band_cols = [
        F.hash(*[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]).alias(f"b{b}")
        for b in range(_N_BANDS)
    ]
    banded = sigs.select("doc_id", *band_cols)
    buckets = banded.select(
        "doc_id",
        F.posexplode(F.array(*[f"b{b}" for b in range(_N_BANDS)])).alias("band_idx", "band_val"),
    )
    # bucket join -> candidate pairs (sorted ids, distinct across bands)
    grouped = (
        buckets.groupBy("band_idx", "band_val")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids)), y ->"
                    " struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    # verify candidates against full signatures (estimated Jaccard)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(_N_HASHES)
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(est, 4).cast("double").alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.5)
    )


# ---------------------------------------------------------------------------
# SimHash near-dup: 64-bit bit-vote fingerprint over word hashes; candidate
# pairs share at least one of eight 8-bit bands (pigeonhole: any pair with
# Hamming distance <= 7 must collide on some band); Hamming distance <= 10 (empirically tuned so strong Jaccard near-dups are retained on the synthetic corpus).
# ---------------------------------------------------------------------------


N_SIMHASH_BANDS = 8
_BAND_BITS = 64 // N_SIMHASH_BANDS


def simhash_bands(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per doc: eight 8-bit SimHash band values (p0..p7)."""
    words = docs.select(
        id_col, F.explode(F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")).alias("w")
    )
    h = F.xxhash64("w")
    votes = [
        F.sum(
            F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{bit}")
        for bit in range(64)
    ]
    voted = words.groupBy(id_col).agg(*votes)
    bands = []
    for band in range(N_SIMHASH_BANDS):
        expr = F.lit(0)
        for r in range(_BAND_BITS):
            bit = band * _BAND_BITS + r
            expr = expr + F.when(F.col(f"v{bit}") >= 0, F.lit(2**r)).otherwise(0)
        bands.append(expr.alias(f"p{band}"))
    return voted.select(id_col, *bands)


@query("simhash_near_dup")  # no SQL oracle: xxhash64 is Spark-specific (rows-only check)
def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bands = simhash_bands(d.select("doc_id", "text"))

    a = bands.select(*[F.col(c).alias(f"a_{c}") for c in bands.columns])
    b = bands.select(*[F.col(c).alias(f"b_{c}") for c in bands.columns])
    candidates = None
    for band in range(N_SIMHASH_BANDS):
        cand = a.join(b, F.col(f"a_p{band}") == F.col(f"b_p{band}")).filter(
            F.col("a_doc_id") < F.col("b_doc_id")
        )
        candidates = cand if candidates is None else candidates.unionByName(cand)
    candidates = candidates.distinct()
    hamming = sum(
        F.bit_count(F.col(f"a_p{band}").bitwiseXOR(F.col(f"b_p{band}")))
        for band in range(N_SIMHASH_BANDS)
    )
    return (
        candidates.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= 10)
        .select(
            F.col("a_doc_id").alias("doc_a"),
            F.col("b_doc_id").alias("doc_b"),
            "hamming",
        )
    )
