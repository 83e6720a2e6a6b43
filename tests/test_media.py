"""Multimodal plumbing tests: media-span explode, mapInPandas feature
extraction (schema, determinism, batch behavior), stub gating.
"""

import pytest

from zentity_spark.operators.media import (
    FEATURE_DIM,
    MEDIA_FEATURE_SCHEMA,
    extract_media_features,
    media_spans,
)


def test_media_spans_extraction(spark, docs_sf0001):
    ms = media_spans(docs_sf0001)
    rows = ms.collect()
    assert all(r["media_ref"].startswith("media://") for r in rows)
    assert ms.count() > 0


def test_feature_schema_and_determinism(spark, docs_sf0001):
    feats = extract_media_features(docs_sf0001)
    assert feats.schema == MEDIA_FEATURE_SCHEMA
    rows1 = {(r["doc_id"], r["media_ref"]): (r["width"], r["height"],
                                             tuple(r["feature"]))
             for r in feats.collect()}
    rows2 = {(r["doc_id"], r["media_ref"]): (r["width"], r["height"],
                                             tuple(r["feature"]))
             for r in extract_media_features(docs_sf0001,
                                             batch_partitions=4).collect()}
    # deterministic regardless of partitioning
    assert rows1 == rows2
    assert all(len(v[2]) == FEATURE_DIM for v in rows1.values())
    assert all(64 <= v[0] < 256 and 64 <= v[1] < 256 for v in rows1.values())
    # one feature row per media span
    assert len(rows1) == media_spans(docs_sf0001).count()


def test_real_decoder_is_stubbed(spark, docs_sf0001):
    with pytest.raises(NotImplementedError, match="decoder='image'"):
        extract_media_features(docs_sf0001, decoder="image")
