"""Multimodal extension: typed metadata, frame sampling, Arrow-batched
decode plumbing (real codec stubbed — not in this image)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators.multimodal import (
    _fake_decode_features,
    decode_image,
    media_table,
    mm_decode_features,
)


def test_decode_stub_is_gated():
    with pytest.raises(NotImplementedError, match="image library"):
        decode_image(b"\x89PNG...")


def test_media_table_shape(spark, sf_dir):
    media = media_table(spark, sf_dir)
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_features_match_local(spark, sf_dir):
    """The Arrow-batched mapInPandas path must equal a driver-side
    recomputation on raw text bytes."""
    got = {r.media_id: r for r in mm_decode_features(spark, sf_dir).limit(50).collect()}
    docs = {
        r.doc_id: r.text
        for r in read_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id").isin([int(k) for k in got]))
        .collect()
    }
    assert got
    for mid, row in got.items():
        n, mean, hist = _fake_decode_features(docs[mid].encode("utf-8"))
        assert row.n_bytes == n
        assert row.mean_byte == pytest.approx(mean)
        assert list(row.byte_hist) == hist
        assert sum(row.byte_hist) == row.n_bytes
