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


def test_pool_to_thumb_total_for_tiny_inputs():
    """1x1 tracking pixels (and any sub-thumb decode) must pool, not
    crash: edge-pad up to the thumb grid."""
    from eventanalysis_spark.operators.multimodal import _pool_to_thumb

    one = np.full((1, 1, 3), 200, dtype=np.uint8)
    pooled = _pool_to_thumb(one, 8)
    assert pooled.shape == (8, 8, 3)
    assert np.allclose(pooled, 200.0)
    odd = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert _pool_to_thumb(odd, 8).shape == (8, 8, 3)
    # identity (in float) for already-thumb-sized input
    sq = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    assert np.allclose(_pool_to_thumb(sq, 8), sq)


def test_small_media_never_kills_the_task(spark):
    """meta claiming 1x1 images / sample rates below the band count used
    to crash the reshape inside mapInPandas; both must be total now."""
    rows = [
        ("m1", "image", "image/png", b"tiny", (1, 1, None, None, 4)),
        ("m2", "image", "image/png", b"tall", (1, 100, None, None, 4)),
        ("m3", "audio", "audio/wav", b"blip", (None, None, 1, 16, 4)),
    ]
    df = spark.createDataFrame(
        [
            (mid, mod, mime, content, meta)
            for mid, mod, mime, content, meta in rows
        ],
        "media_id string, modality string, mime string, content binary, "
        "meta struct<width:int, height:int, duration_ms:bigint, "
        "sample_rate:int, n_bytes:bigint>",
    )
    img = image_features(df).toPandas().set_index("media_id")
    assert len(img) == 2
    assert len(img.loc["m1", "feature"]) == 64
    assert len(img.loc["m2", "feature"]) == 64
    aud = audio_features(df).toPandas()
    assert len(aud) == 1
    assert len(aud.loc[0, "feature"]) == 32


def test_video_decoder_contract_returns_exactly_n_frames():
    """_decode_video_frames_real must hand back exactly n_frames (repeating
    when the stream is short) so pick labels and timestamps stay aligned;
    without PyAV the stub raises and the contract is enforced on the fake
    path via the zip in video_frame_sample."""
    from eventanalysis_spark.operators.multimodal import _decode_video_frames_real

    with pytest.raises(NotImplementedError):
        _decode_video_frames_real(b"x", 4)
