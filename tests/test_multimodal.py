"""Tests for binary-column (multimodal) plumbing (§2.D)."""

from __future__ import annotations

import hashlib

import pytest

from dhs_to_database_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    fake_codec,
)
from tests.conftest import SF_DIR


def test_media_frame_shape(spark):
    media = documents_as_media(spark, SF_DIR)
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "mime", "n_bytes"]
    row = media.orderBy("media_id").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])


def test_decode_requires_codec(spark):
    media = documents_as_media(spark, SF_DIR)
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(media)


def test_decode_with_fake_codec_is_deterministic(spark):
    media = documents_as_media(spark, SF_DIR).limit(20)
    decoded = decode_media(media, fake_codec).collect()
    assert len(decoded) == 20
    by_id = {r["media_id"]: r for r in decoded}
    raw = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, payload in raw.items():
        want = fake_codec(payload)
        got = by_id[mid]
        assert (got["width"], got["height"], got["digest"]) == (
            want["width"],
            want["height"],
            want["digest"],
        )
        assert got["digest"] == hashlib.md5(payload).hexdigest()
        assert got["n_channels"] == 3


def test_resize_dimension_contract(spark):
    from dhs_to_database_spark.operators.multimodal import resize_media

    media = documents_as_media(spark, SF_DIR).limit(20)
    decoded = decode_media(media, fake_codec)
    rows = resize_media(decoded, max_dim=64).collect()
    assert rows
    for r in rows:
        w, h, rw, rh = r["width"], r["height"], r["resized_width"], r["resized_height"]
        assert max(rw, rh) <= 64
        assert rw <= w and rh <= h  # never upscale
        if max(w, h) > 64:
            assert max(rw, rh) == 64  # longer side fits the box exactly
        else:
            assert (rw, rh) == (w, h)  # small images untouched
        # aspect preserved: short side derived from the pinned long side
        new_long = min(64, max(w, h))
        new_short = max(1, min(w, h) * new_long // max(w, h))
        want = (new_long, new_short) if w >= h else (new_short, new_long)
        assert (rw, rh) == want
