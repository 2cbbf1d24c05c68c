"""Multimodal plumbing tests: media schema, content addressing, the
mapInPandas decode path (stubbed kernel, real batch/schema/partition
flow), and the real-path NotImplementedError gate."""

from __future__ import annotations

import pandas as pd
import pytest

from house_price_etl_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA, _decode_batch, decode_media, media_table)


def test_media_table_schema_and_content_addressing(spark, sf_dir):
    m = media_table(spark, sf_dir)
    assert [f.name for f in m.schema.fields] == ["doc_id", "payload", "meta"]
    assert m.schema["payload"].dataType.typeName() == "binary"
    row = m.filter("doc_id = 0").collect()[0]
    assert row.meta.n_bytes == len(row.payload)
    import hashlib
    assert row.meta.sha256 == hashlib.sha256(bytes(row.payload)).hexdigest()


def test_decode_media_batch_flow(spark, sf_dir):
    feats = decode_media(media_table(spark, sf_dir))
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.orderBy("doc_id").limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_bytes > 0
        assert 1 <= r.width <= 640 and 1 <= r.height <= 480
        assert len(r.feature) == 4 and r.feature[0] == float(r.n_bytes)


def test_decode_is_deterministic_across_runs(spark, sf_dir):
    a = decode_media(media_table(spark, sf_dir)).orderBy("doc_id").limit(20).collect()
    b = decode_media(media_table(spark, sf_dir)).orderBy("doc_id").limit(20).collect()
    assert a == b


def test_real_decode_path_raises_not_implemented(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FAKE_DECODE", "0")
    pdf = pd.DataFrame({"doc_id": [1], "payload": [b"xyz"]})
    with pytest.raises(NotImplementedError, match="media decode"):
        _decode_batch(pdf)
