"""Multimodal plumbing: Arrow mapInPandas over binary payloads
(SURVEY §2.11 N5). Decode is stubbed; the Spark-side contract is real."""

import hashlib

import pytest

from dataframe_retail_e_inventarios_spark.operators.multimodal import (
    documents_as_media,
    extract_media_features,
    resize_stub,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_media_features_roundtrip(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    src = {r.doc_id: r.text for r in docs.collect()}
    feats = extract_media_features(documents_as_media(docs)).toPandas()
    assert len(feats) == len(src)
    for r in feats.itertuples(index=False):
        payload = src[r.doc_id].encode("utf-8")
        assert r.payload_len == len(payload)
        assert r.header_hex == payload[:8].hex()
        assert r.content_md5 == hashlib.md5(payload).hexdigest()
        assert r.media_type == "text/plain"


def test_native_and_mapinpandas_paths_agree(spark):
    """The registered production query is the native-expression plan;
    the mapInPandas decoder contract must produce byte-identical rows."""
    from dataframe_retail_e_inventarios_spark.operators.multimodal import (
        media_features_native,
    )

    media = documents_as_media(load_table(spark, SF_SMOKE, "documents").limit(50))
    native = media_features_native(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    udf = extract_media_features(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert native.equals(udf)


def test_resize_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        resize_stub(b"\x89PNG", 64, 64)


def test_frame_schedule_bounds_and_coverage(spark):
    """Schedule invariants: <=16 frames per asset, indices strictly
    increasing with uniform stride, every index < n_frames_total, and
    short clips (< 16 frames) sample every frame exactly once."""
    import pyspark.sql.functions as F
    from dataframe_retail_e_inventarios_spark.operators.multimodal import (
        frame_sample_schedule,
    )

    media = spark.createDataFrame(
        [(1, 500, 24), (2, 100_000, 30), (3, 1000, 24), (4, 3_600_000, 30)],
        "doc_id long, duration_ms long, fps int",
    )
    rows = frame_sample_schedule(media).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.sample_no)
        idxs = [r.frame_idx for r in rs]
        assert len(idxs) <= 16
        assert all(i < rs[0].n_frames_total for i in idxs)
        assert idxs == sorted(set(idxs))
        if rs[0].n_frames_total <= 16:
            # short clip: every frame scheduled
            assert idxs == list(range(rs[0].n_frames_total))
        if len(idxs) >= 3:
            strides = {b - a for a, b in zip(idxs, idxs[1:])}
            assert len(strides) == 1  # uniform stride
        for r in rs:
            assert r.ts_ms == r.frame_idx * 1000 // r.fps
