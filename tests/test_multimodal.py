"""Multimodal plumbing tests (task-brief surface): schema, determinism,
dimension math, and 1→many frame explode — over real header bytes (PNG/GIF/
BMP/JPEG built by hand, sharing no code with the kernel's parsers)."""

from __future__ import annotations

import struct

import pytest

from universal_text_extractor_spark.operators import multimodal as M


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _bmp(w: int, h: int) -> bytes:
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 8


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("u/png", _png(640, 480)),
        ("u/gif", _gif(320, 200)),
        ("u/bmp", _bmp(100, 4000)),
        ("u/txt", b"not an image at all"),
        ("u/empty", b""),
    ]
    return spark.createDataFrame(rows, "url string, payload binary")


def test_media_metadata(spark, media_df):
    out = {r["url"]: r for r in M.media_metadata(media_df).collect()}
    assert out["u/png"]["format"] == "PNG" and out["u/png"]["width"] == 640
    assert out["u/gif"]["height"] == 200
    assert out["u/bmp"]["width"] == 100 and out["u/bmp"]["height"] == 4000
    assert out["u/txt"]["format"] == "unknown"
    assert out["u/txt"]["width"] is None
    assert out["u/empty"]["n_bytes"] == 0
    assert [f.name for f in M.media_metadata(media_df).schema.fields] == [
        "url", "format", "width", "height", "n_bytes",
    ]


def test_image_features_deterministic(spark, media_df):
    a = {r["url"]: r["features"] for r in M.image_features(media_df).collect()}
    b = {
        r["url"]: r["features"]
        for r in M.image_features(media_df.repartition(7)).collect()
    }
    assert a == b  # partitioning-invariant
    assert all(len(v) == M.IMAGE_FEATURE_DIM for v in a.values())
    assert all(-1.0 <= x < 1.0 for v in a.values() for x in v)
    assert a["u/png"] != a["u/gif"]


def test_image_resize_dims(spark, media_df):
    out = {r["url"]: r for r in M.image_resize(media_df, max_side=64).collect()}
    # non-images dropped
    assert set(out) == {"u/png", "u/gif", "u/bmp"}
    r = out["u/png"]  # 640x480 → 64x48
    assert (r["width"], r["height"]) == (64, 48)
    assert len(r["thumb"]) == 64 * 48
    r = out["u/bmp"]  # 100x4000 → 2x64 (portrait)
    assert (r["width"], r["height"]) == (2, 64)
    # deterministic across runs
    again = {r["url"]: r for r in M.image_resize(media_df, max_side=64).collect()}
    assert out["u/gif"]["thumb"] == again["u/gif"]["thumb"]


def test_frame_sample_explode(spark):
    df = spark.createDataFrame(
        [("u/vid", b"\x00" * (1024 * 5)), ("u/short", b"\x01" * 10)],
        "url string, payload binary",
    )
    out = M.frame_sample(df, every_ms=1000, bytes_per_frame=64).collect()
    by_url: dict[str, list] = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    # 5 KiB → 5000 ms "duration" → frames at 0..5000 ms = 6 frames
    assert len(by_url["u/vid"]) == 6
    assert sorted(r["ts_ms"] for r in by_url["u/vid"]) == [
        0, 1000, 2000, 3000, 4000, 5000,
    ]
    assert len(by_url["u/short"]) == 1  # sub-second clip → 1 frame
    assert all(len(r["frame"]) == 64 for r in out)
    # distinct frames from the same clip
    frames = [bytes(r["frame"]) for r in by_url["u/vid"]]
    assert len(set(frames)) == len(frames)


def test_audio_features(spark, media_df):
    out = M.audio_features(media_df).collect()
    assert all(len(r["features"]) == M.AUDIO_FEATURE_DIM for r in out)


def test_no_shuffle_in_plan(spark, media_df):
    """Multimodal ops are map-only: no Exchange in the physical plan."""
    plan = (
        M.media_metadata(media_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
