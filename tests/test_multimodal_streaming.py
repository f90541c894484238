"""Multimodal binary-column ops + streaming dress."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fetcho_spark import fixtures as fx
from fetcho_spark.operators import multimodal as MM


def _images(spark, n=12):
    return spark.createDataFrame(fx.gen_images(n), fx.IMAGES_SCHEMA)


@pytest.mark.spark
def test_image_features(spark):
    imgs = _images(spark)
    feats = MM.image_features(imgs).collect()
    assert len(feats) == 12
    by = {r["image_id"]: r for r in feats}
    # features line up with the stored metadata + stored phash
    stored = {r["image_id"]: r for r in imgs.collect()}
    for iid, r in by.items():
        assert (r["w"], r["h"], r["fmt"]) == \
            (stored[iid]["w"], stored[iid]["h"], stored[iid]["fmt"])
        assert r["phash"] == stored[iid]["phash"]
        assert 0.0 <= r["brightness"] <= 255.0


@pytest.mark.spark
def test_image_resize(spark):
    out = MM.image_resize(_images(spark), size=16).collect()
    from fetcho_spark.functions.codec import decode
    for r in out:
        px, fmt = decode(bytes(r["bytes"]))
        assert px.shape == (16, 16, 3)


@pytest.mark.spark
def test_video_frame_sampling(spark):
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
              for _ in range(25)]
    vid = MM.fake_video(frames)
    df = spark.createDataFrame([("v1", bytearray(vid))],
                               "video_id string, bytes binary")
    out = MM.video_frame_sample(df, every_n=10).collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 10, 20]
    from fetcho_spark.functions.codec import decode
    got, _ = decode(bytes(out[0]["frame_bytes"]))
    assert (got == frames[0]).all()


@pytest.mark.spark
def test_audio_stubbed(spark):
    with pytest.raises(NotImplementedError):
        MM.audio_features(None)


@pytest.mark.spark
def test_windowed_event_counts_batch_semantics(spark):
    import datetime as dt
    from fetcho_spark.streaming.loop import windowed_event_counts
    t0 = dt.datetime(2026, 1, 1)
    rows = [(t0 + dt.timedelta(minutes=m), "click") for m in (1, 5, 11, 25)]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {(r["window_start"].minute, r["event_type"]): r["n"]
           for r in windowed_event_counts(df, "10 minutes").collect()}
    assert out[(0, "click")] == 2
    assert out[(10, "click")] == 1
    assert out[(20, "click")] == 1


@pytest.mark.spark
@pytest.mark.slow
def test_stream_crawl_availablenow(spark, tmp_path):
    """The foreachBatch dress: frontier files streamed in → rounds run."""
    from fetcho_spark.catalog import Catalog
    from fetcho_spark.crawl import CrawlConfig, CrawlEngine, FRONTIER_SCHEMA
    from fetcho_spark.streaming.loop import stream_crawl

    cat = Catalog(spark, str(tmp_path / "cat"))
    cfg = CrawlConfig(max_chunk=20, n_seen_buckets=4, bits_per_bucket=1 << 12)
    eng = CrawlEngine(spark, cat, cfg)
    wg = fx.gen_webgraph(30, 6, 10)
    eng.init([], fx.webgraph_df(spark, 30, 6, 10), _images(spark, 10),
             fx.robots_df(spark, 6), fx.hosts_df(spark, 6))
    seeds = fx.gen_seeds(wg, 4)
    fdir = str(tmp_path / "stream-in")
    spark.createDataFrame(
        [(u, u.split("/")[2], None, None, 0) for u in seeds],
        FRONTIER_SCHEMA).write.parquet(fdir)
    q = stream_crawl(eng, fdir, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert eng.last_completed_round() is not None
    assert cat.read("crawl_log").count() > 0
