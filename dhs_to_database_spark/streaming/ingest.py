"""Continuous corpus ingestion: JSONL shards -> content-dedup'd corpus.

The production crawl-ingest loop: shards of documents land in a directory;
each microbatch is parsed (malformed lines audited, not fatal), content-
fingerprinted, deduplicated against everything already ingested AND
within itself, and only genuinely new documents are appended to the
corpus. Composes `sources.jsonl` (parse), `operators.dedup.
incremental_dedup` (batch-vs-corpus classification), and Structured
Streaming file discovery + checkpointing.

Ancestry in the reference: the download-staging reconciliation + dup-load
check run per survey batch (lib02 / 03 nb) — here as a continuously
running stream instead of a manual notebook pass.

Scale + exactly-once design:
- File-source streaming tracks discovered shards in the checkpoint; the
  dedup key join shuffles ONLY the incoming batch (the corpus fingerprint
  table is the stored big side).
- foreachBatch append is at-least-once under retries, but the content
  dedup makes replays SELF-HEALING: rows a failed attempt already
  appended are 'dup_of_corpus' on the retry and skipped — the corpus
  converges to exactly-once contents without a transactional sink
  (pinned by a replay test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import incremental_dedup
from ..operators.text_analysis import normalized_fingerprint
from ..sources.jsonl import DOCUMENTS_SCHEMA, clean, parse_jsonl_lines


def ingest_batch(
    spark: SparkSession, batch: DataFrame, corpus_dir: str, id_col: str = "doc_id"
) -> int:
    """Dedup one parsed batch against the corpus at ``corpus_dir`` and
    append the new rows (with their stored fingerprint). Returns the
    number of appended rows. Idempotent: re-running the same batch
    appends nothing."""
    fp = batch.withColumn("fingerprint", normalized_fingerprint(F.col("text")))
    try:
        known = spark.read.parquet(corpus_dir).select("fingerprint")
    except Exception:  # first batch: corpus does not exist yet
        known = spark.createDataFrame(
            [], T.StructType([T.StructField("fingerprint", T.StringType())])
        )
    tagged = incremental_dedup(
        fp, known, key_cols=["fingerprint"], id_col=id_col
    )
    new_ids = tagged.filter(F.col("status") == "new").select(id_col)
    # Materialize BEFORE appending: the plan's lineage scans corpus_dir,
    # and appending to a directory a running plan is still reading is a
    # self-referential race. Batch-sized, so the pin is trivial.
    new_rows = fp.join(new_ids, id_col).localCheckpoint(eager=True)
    n = new_rows.count()
    if n:
        new_rows.write.mode("append").parquet(corpus_dir)
    return n


def ingest_jsonl_stream(
    spark: SparkSession,
    src_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    available_now: bool = True,
):
    """Start the ingestion stream over ``src_dir`` shards. With
    ``available_now`` it drains everything currently present and stops
    (the batch-replay-friendly mode the tests use); otherwise it keeps
    watching for new shards."""
    if schema is None:
        schema = DOCUMENTS_SCHEMA
    lines = spark.readStream.text(src_dir)
    parsed = parse_jsonl_lines(lines, schema=schema)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(batch_df.sparkSession, clean(batch_df), corpus_dir)

    writer = parsed.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
