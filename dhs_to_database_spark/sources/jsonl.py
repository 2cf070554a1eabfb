"""JSONL (newline-delimited JSON) source + sink — LLM-corpus interchange.

Beyond the reference's CSV / fixed-width / JDBC surface (its formats,
DAT_Parser.py / lib04_Update_Table_Data.py): JSONL is the de-facto
interchange format for LLM training corpora (one document object per
line, usually gzip'd in shards), so an engine aimed at training-data
pipelines must read and write it natively.

Spark-first design:
- The reader is ``spark.read.text`` + ``from_json``: one splittable
  line-oriented scan, schema-directed parsing (Catalyst prunes the
  parse to the referenced fields), and — unlike the native JSON
  reader's ``_corrupt_record`` — no "cannot query only the corrupt
  column" restriction, so audit-then-drop works in a single pass.
- Always pass an explicit schema in production: schema inference
  (``infer=True``, the native reader) is a full extra pass over 100 TB.
- Malformed lines follow the reference's log-and-skip stance (its
  unknown-record-type handling, DAT_Parser.py:76-79): they surface in
  the ``_corrupt_record`` column for audit instead of failing the job;
  ``strict=True`` (FAILFAST ``from_json``) fails loads that must be
  exact.
- The writer shards via partition count — gzip members don't split, so
  parallelism of a compressed corpus is its file count; keep shards at
  a few hundred MB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: documents-table schema (TESTDATA.md): the default for corpus shards.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    strict: bool = False,
    infer: bool = False,
) -> DataFrame:
    """Read a JSONL file/directory into ``schema`` fields plus a
    ``_corrupt_record`` column holding each unparsable raw line (null for
    good rows; blank lines are skipped). ``strict`` fails the job on the
    first malformed line instead. ``infer=True`` uses the native reader's
    schema inference (an extra full pass — opt-in only)."""
    if infer:
        return spark.read.json(path)
    return parse_jsonl_lines(
        spark.read.text(path), schema=schema, strict=strict
    )


def parse_jsonl_lines(
    lines: DataFrame, schema: T.StructType | None = None, strict: bool = False
) -> DataFrame:
    """Parse a ``value: string`` DataFrame of JSONL lines (batch or
    streaming — ``spark.readStream.text`` feeds this unchanged)."""
    if schema is None:
        schema = DOCUMENTS_SCHEMA
    raw = lines.filter(F.length(F.trim("value")) > 0)
    # PERMISSIVE from_json yields a struct of nulls for malformed lines —
    # the raw line is only recoverable via a corrupt-record field INSIDE
    # the parse schema.
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    j = F.from_json(
        F.col("value"), parse_schema, {"columnNameOfCorruptRecord": _CORRUPT}
    )
    out = raw.select(j.alias("__j")).select("__j.*")
    if strict:
        # A raising FILTER (not FAILFAST parse mode): a bare count() prunes
        # every column, which would skip the parse entirely and let a
        # malformed corpus slip through — the filter pins the corrupt
        # field into the required schema so every row is parsed.
        out = out.filter(
            F.when(
                F.col(_CORRUPT).isNotNull(),
                F.raise_error(
                    F.concat(F.lit("Malformed JSONL line: "), F.col(_CORRUPT))
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
    return out


def corrupt_lines(df: DataFrame) -> DataFrame:
    """The malformed raw lines of a ``read_jsonl`` result."""
    return df.filter(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)


def clean(df: DataFrame) -> DataFrame:
    """Drop the corrupt-record column and the rows it flagged."""
    if _CORRUPT not in df.columns:
        return df
    return df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)


def write_jsonl(
    df: DataFrame,
    path: str,
    num_shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Write one JSON object per line. ``num_shards`` controls output file
    count (each shard is an independently-readable unit — keep shards at
    a few hundred MB so gzip'd shards still parallelize per file)."""
    out = df.repartition(num_shards) if num_shards else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
