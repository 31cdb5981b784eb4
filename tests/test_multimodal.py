"""Multimodal operators: schema/partitioning/batch plumbing is real; codec
layer is a deterministic fake behind NotImplementedError stubs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.multimodal import (
    MAX_MEDIA_BYTES,
    _decode_audio_real,
    _decode_image_real,
    audio_features,
    image_features,
    media_batch,
    media_df,
    video_frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    df = media_df(spark, 300, partitions=6).persist()
    df.count()
    yield df
    df.unpersist()


def test_real_decoders_are_stubs():
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"x")
    with pytest.raises(NotImplementedError):
        _decode_audio_real(b"x")


def test_media_generation_deterministic(spark, media):
    a = media_batch(np.arange(50))
    b = media_batch(np.arange(50))
    assert (a["media_id"] == b["media_id"]).all()
    assert all(x == y for x, y in zip(a["content"], b["content"]))
    assert set(a["modality"].unique()) == {"image", "audio", "video"}


def test_image_features(spark, media):
    out = image_features(media).toPandas()
    n_img = media.where(F.col("modality") == "image").count()
    assert len(out) == n_img
    ok = out[out.oversize == 0]
    assert (ok["feature"].map(len) == 64).all()
    assert (ok["mean_rgb"].map(len) == 3).all()
    # oversize payloads routed, not crashed (tlob cap analog)
    n_over = media.where(
        (F.col("modality") == "image") & (F.col("meta.n_bytes") > MAX_MEDIA_BYTES)
    ).count()
    assert (out.oversize == 1).sum() == n_over
    # deterministic across partitionings
    out2 = image_features(media.repartition(13)).toPandas()
    tt = lambda v: None if v is None else tuple(v)
    m1 = out.set_index("media_id")["feature"].map(tt).sort_index()
    m2 = out2.set_index("media_id")["feature"].map(tt).sort_index()
    assert m1.equals(m2)


def test_audio_features(spark, media):
    out = audio_features(media).toPandas()
    assert len(out) == media.where(F.col("modality") == "audio").count()
    assert (out["feature"].map(len) == 32).all()
    assert (out["rms"] > 0).all()


def test_video_frame_sampling(spark, media):
    out = video_frame_sample(media, k=4).toPandas()
    n_vid = media.where(F.col("modality") == "video").count()
    assert out.media_id.nunique() == n_vid
    per = out.groupby("media_id").size()
    assert (per <= 4).all() and (per >= 1).all()
    # frame indices follow the evenly-spread formula (within each video)
    g = out.groupby("media_id").frame_idx.apply(list)
    assert all(v == sorted(v) for v in g)


def test_metadata_only_scan_prunes_blob(spark, media, tmp_path):
    """Metadata queries must not read the content column (ReadSchema)."""
    p = str(tmp_path / "media.parquet")
    media.write.parquet(p)
    df = spark.read.parquet(p).select("media_id", "modality", "meta.n_bytes")
    plan = df._jdf.queryExecution().executedPlan().toString()
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "content" not in rs
