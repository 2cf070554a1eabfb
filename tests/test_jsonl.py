"""JSONL source/sink: round-trip, corrupt-line audit, sharding, gzip."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from dhs_to_database_spark.sources.jsonl import (
    clean,
    corrupt_lines,
    read_jsonl,
    write_jsonl,
)
from dhs_to_database_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_jsonl_round_trip_documents(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, num_shards=4)
    assert len(glob.glob(out + "/part-*")) == 4
    back = clean(read_jsonl(spark, out))
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    a = docs.orderBy("doc_id").collect()
    b = back.orderBy("doc_id").collect()
    assert [r["text"] for r in a] == [r["text"] for r in b]


def test_jsonl_gzip_round_trip(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    out = str(tmp_path / "gz")
    write_jsonl(docs, out, num_shards=2, compression="gzip")
    assert glob.glob(out + "/part-*.gz")
    assert clean(read_jsonl(spark, out)).count() == 50


def test_jsonl_corrupt_lines_audited_not_fatal(spark, tmp_path):
    p = tmp_path / "shard.jsonl"
    good = {"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
    p.write_text(json.dumps(good) + "\n" + "{not json at all\n")
    df = read_jsonl(spark, str(p))
    assert clean(df).count() == 1
    bad = corrupt_lines(df).collect()
    assert len(bad) == 1 and bad[0][0].startswith("{not json")


def test_jsonl_strict_raises_on_corrupt(spark, tmp_path):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    p = tmp_path / "bad.jsonl"
    p.write_text("{broken\n")
    with _pytest.raises(Exception) as ei:
        read_jsonl(spark, str(p), strict=True).count()
    assert isinstance(ei.value, Py4JJavaError) or "Malformed" in str(ei.value)


def test_jsonl_schema_prunes_fields(spark, tmp_path):
    """A narrow schema parses only requested fields — extra JSON keys are
    ignored, not errors (the column-pruning contract)."""
    from pyspark.sql import types as T

    p = tmp_path / "wide.jsonl"
    p.write_text(
        json.dumps({"doc_id": 7, "text": "t", "extra": {"deep": [1, 2]}}) + "\n"
    )
    narrow = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    row = clean(read_jsonl(spark, str(p), schema=narrow)).first()
    assert (row["doc_id"], row["text"]) == (7, "t")


def test_curation_to_jsonl_shards_end_to_end(spark, tmp_path):
    """The training-export composition: curate (quality gate -> dedup ->
    split) -> write train split as gzip'd JSONL shards -> read back clean.
    This is the handoff surface a trainer consumes."""
    from dhs_to_database_spark.operators.sampling import split_assignment

    docs = load_table(spark, SF_DIR, "documents")
    curated = docs.withColumn(
        "split", split_assignment(F.col("doc_id"), 0.8)
    ).filter((F.length("text") >= 100) & (F.col("split") == "train"))
    out = str(tmp_path / "train_shards")
    write_jsonl(curated.drop("split"), out, num_shards=3, compression="gzip")
    back = clean(read_jsonl(spark, out))
    assert back.count() == curated.count()
    assert len(glob.glob(out + "/part-*.gz")) == 3
    # doc-level fidelity through the format boundary
    a = {r["doc_id"]: r["text"] for r in curated.select("doc_id", "text").collect()}
    b = {r["doc_id"]: r["text"] for r in back.select("doc_id", "text").collect()}
    assert a == b
