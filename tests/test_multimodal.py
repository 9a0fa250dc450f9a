from __future__ import annotations

import pytest

from ml_training_data_pipeline_spark.operators.multimodal import (
    decode_image,
    documents_as_media,
    extract_media_features,
    fake_decode_stats,
)


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_decode_deterministic():
    a = fake_decode_stats(b"hello")
    b = fake_decode_stats(b"hello")
    assert a == b
    assert 0 <= a[2] < 1 and 0 <= a[3] < 1


def test_media_pipeline_batch_shape(spark):
    docs = spark.createDataFrame(
        [(1, "some text"), (2, "other text"), (3, None)], schema="doc_id long, text string"
    )
    media = documents_as_media(docs)
    feats = extract_media_features(media).collect()
    assert len(feats) == 2  # NULL text dropped
    row = {r["media_id"]: r for r in feats}
    assert row[1]["n_bytes"] == len(b"some text")
    assert row[1]["modality"] == "text"
