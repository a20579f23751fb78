"""Multimodal plumbing tests: binary payload schema, Arrow-batched
feature extraction, stub gating."""

from __future__ import annotations

import hashlib

import pytest

from asvsp_spark.operators import multimodal as MM
from tests.conftest import SF_DIR


def test_attach_fake_media_schema(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    media = MM.attach_fake_media(docs)
    dtypes = dict(media.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["media_type"] == "string"
    assert dtypes["meta"].startswith("struct<")


def test_media_features_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    feats = MM.media_features(MM.attach_fake_media(docs)).collect()
    assert len(feats) == 20
    originals = {r.doc_id: r.text for r in docs.collect()}
    for r in feats:
        raw = originals[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.head_hex == raw[:8].hex().upper()
        assert r.digest == hashlib.md5(raw).hexdigest()
        assert r.media_type in MM.MEDIA_TYPES


def test_media_features_drops_payload(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5)
    feats = MM.media_features(MM.attach_fake_media(docs))
    assert "payload" not in feats.columns  # narrow output, no bytes shuffled


def test_decode_stubs_gated(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(1)
    media = MM.attach_fake_media(docs)
    if not MM._HAS_PIL:
        with pytest.raises(NotImplementedError):
            MM.decode_image(media)
    with pytest.raises(NotImplementedError):
        MM.frame_sample(media)
    with pytest.raises(NotImplementedError):
        MM.decode_audio(media)
