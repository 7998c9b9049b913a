"""Baseline JPEG codec pair: independent writer (pages_gen.make_jpeg)
↔ from-scratch decoder (kernels/jpeg_kernel.py).

JPEG is lossy by construction, so the round-trip contract is a
quality-bounded TOLERANCE (dims/channels exact, pixel error bounded) —
unlike the byte-exact BMP/PNG contracts. Structured inputs at high
quality must land within a few gray levels; the decoder must agree with
itself across restart-marker layouts bit-for-bit; golden hashes pin both
the writer bytes and the decoded pixels against silent drift; and the
Spark operator surface must report JPEG payloads as decoded=true with
features equal to the direct pixel math.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from universal_text_extractor_spark.kernels.image_prep import (
    decode_image,
    to_grayscale,
)
from universal_text_extractor_spark.kernels.jpeg_kernel import decode_jpeg
from universal_text_extractor_spark.kernels.image_kernel import parse_image_header
from universal_text_extractor_spark.sources.pages_gen import (
    make_jpeg,
    make_jpeg_lossless,
)


def _err(got: np.ndarray, want: np.ndarray) -> np.ndarray:
    return np.abs(got.astype(np.int32) - want.astype(np.int32))


def _gradient(w: int, h: int) -> list[list[tuple[int, int, int]]]:
    return [
        [(x * 5 % 256, y * 7 % 256, (x + y) * 3 % 256) for x in range(w)]
        for y in range(h)
    ]


def test_flat_gray_is_exact():
    # a flat field has only a DC coefficient — even a lossy codec
    # reproduces it exactly at any quality
    px = [[77] * 20 for _ in range(12)]
    got = decode_jpeg(make_jpeg(px, color="gray", quality=75))
    assert got is not None and got.shape == (12, 20, 3)
    assert (got == 77).all()


def test_gradient_444_high_quality_tight():
    px = _gradient(49, 33)
    want = np.array([[list(p) for p in r] for r in px], np.uint8)
    got = decode_jpeg(make_jpeg(px, quality=95))
    assert got.shape == want.shape
    assert _err(got, want).max() <= 2


def test_subsampled_420_luma_tight_chroma_bounded():
    px = _gradient(49, 33)
    want = np.array([[list(p) for p in r] for r in px], np.uint8)
    got = decode_jpeg(make_jpeg(px, quality=95, subsample=True))
    assert got.shape == want.shape
    # chroma is 2x2-averaged: bounded, looser than 4:4:4
    assert _err(got, want).max() <= 24
    # luma survives subsampling: compare through the shared gray map
    gw = to_grayscale(want).astype(np.int32)
    gg = to_grayscale(got).astype(np.int32)
    assert np.abs(gw - gg).max() <= 4


def test_restart_markers_do_not_change_pixels():
    px = _gradient(40, 24)
    base = decode_jpeg(make_jpeg(px, quality=85))
    for interval in (1, 3, 7):
        dri = decode_jpeg(make_jpeg(px, quality=85, restart_interval=interval))
        assert (dri == base).all()


def test_odd_dims_and_tiny_images():
    for w, h in ((1, 1), (3, 2), (7, 9), (8, 8), (17, 16)):
        px = [[(x * 31 % 256, y * 17 % 256, 50) for x in range(w)] for y in range(h)]
        for sub in (False, True):
            got = decode_jpeg(make_jpeg(px, quality=95, subsample=sub))
            assert got is not None and got.shape == (h, w, 3), (w, h, sub)


def test_noise_error_is_quality_monotone():
    rng = random.Random(11)
    px = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(24)]
        for _ in range(17)
    ]
    want = np.array([[list(p) for p in r] for r in px], np.uint8)
    means = []
    for q in (95, 75, 50):
        got = decode_jpeg(make_jpeg(px, quality=q))
        means.append(_err(got, want).mean())
    assert means[0] <= 3.0  # q95 keeps even noise within a few levels
    assert means[0] < means[1] < means[2]


def test_decode_containment_and_unsupported():
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8") is None
    assert decode_jpeg(b"\xff\xd8\xff\x00junk") is None
    assert decode_jpeg(b"\xff\xd8" + bytes(100)) is None
    good = bytearray(make_jpeg(_gradient(16, 16), quality=90))
    # SOF0 patched to SOF2: the frame claims progressive but its scan
    # header is baseline-shaped (Ss=0, Se=63 — illegal for a progressive
    # DC scan, G.1.1.1.1) → contained to None, not a crash
    sof = good.find(b"\xff\xc0")
    prog = bytes(good[:sof]) + b"\xff\xc2" + bytes(good[sof + 2 :])
    assert decode_jpeg(prog) is None
    # arithmetic-coded SOF9 → None (honest unsupported)
    arith = bytes(good[:sof]) + b"\xff\xc9" + bytes(good[sof + 2 :])
    assert decode_jpeg(arith) is None
    # truncated entropy stream → None
    assert decode_jpeg(bytes(good[: len(good) // 2])) is None


def test_header_parser_agrees_with_decoder():
    b = make_jpeg(_gradient(31, 22), quality=90)
    assert parse_image_header(b) == (31, 22, "JPEG")
    assert decode_image(b).shape == (22, 31, 3)


def test_golden_bytes_and_pixels_pinned():
    """Writer bytes and decoded pixels are both deterministic; these pins
    catch silent drift in either side of the codec pair (regenerate
    deliberately if the writer's tables change)."""
    px = _gradient(32, 20)
    b = make_jpeg(px, quality=90, subsample=True, restart_interval=2)
    arr = decode_jpeg(b)
    assert hashlib.sha256(b).hexdigest() == GOLDEN_BYTES
    assert hashlib.sha256(arr.tobytes()).hexdigest() == GOLDEN_PIXELS
    p = make_jpeg(px, quality=90, subsample=True, restart_interval=2, progressive=True)
    assert hashlib.sha256(p).hexdigest() == GOLDEN_PROG_BYTES
    # and the progressive twin decodes to the SAME pinned pixels
    assert hashlib.sha256(decode_jpeg(p).tobytes()).hexdigest() == GOLDEN_PIXELS


GOLDEN_BYTES = "56a5d775eac7276cb1f237b7887fc0cdaac5b14ce3d3da4cd05b157535b35926"
GOLDEN_PIXELS = "987234cfa4e3dd00fcda7716655e1cb8acdc5dcc8a65b1520680c30a4f99efee"
GOLDEN_PROG_BYTES = "c7aa71c22ef80befe67d91901428f0fd3f69bffcb2652afe6bb8da3c647b3875"
def test_progressive_equals_baseline_exactly():
    """The §G scan script accumulates the SAME quantized coefficients a
    baseline scan codes in one pass, so the decoded arrays must be
    bit-identical twins — an exact oracle despite JPEG's lossiness."""
    cases = [
        (_gradient(49, 33), dict(quality=95)),
        (_gradient(49, 33), dict(quality=80, subsample=True)),
        (_gradient(16, 16), dict(quality=50)),  # sparse AC → long EOB runs
        (_gradient(40, 24), dict(quality=85, subsample=True, restart_interval=2)),
        (_gradient(31, 22), dict(quality=90, restart_interval=1)),
    ]
    for px, kw in cases:
        base = decode_jpeg(make_jpeg(px, **kw))
        prog = decode_jpeg(make_jpeg(px, progressive=True, **kw))
        assert base is not None and prog is not None, kw
        assert prog.shape == base.shape and (prog == base).all(), kw


def test_progressive_gray_and_tiny():
    gray = [[(x * 9 + y) % 256 for x in range(26)] for y in range(18)]
    b = decode_jpeg(make_jpeg(gray, color="gray", quality=92))
    p = decode_jpeg(make_jpeg(gray, color="gray", quality=92, progressive=True))
    assert (p == b).all()
    for w, h in ((1, 1), (3, 2), (7, 9), (8, 8), (17, 16)):
        px = [[(x * 31 % 256, y * 17 % 256, 50) for x in range(w)] for y in range(h)]
        for sub in (False, True):
            bb = decode_jpeg(make_jpeg(px, quality=95, subsample=sub))
            pp = decode_jpeg(make_jpeg(px, quality=95, subsample=sub, progressive=True))
            assert pp is not None and (pp == bb).all(), (w, h, sub)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    quality=st.integers(55, 100),
    sub=st.booleans(),
    gray=st.booleans(),
    ri=st.integers(0, 4),
    seed=st.integers(0, 2**32 - 1),
)
def test_progressive_equals_baseline_property(w, h, quality, sub, gray, ri, seed):
    """Random noise maximizes AC density / EOB-run / refinement-bit
    diversity; restart intervals exercise per-scan resync. Progressive
    must equal baseline exactly on every layout."""
    rng = random.Random(seed)
    if gray:
        px = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        kw = dict(color="gray", quality=quality, restart_interval=ri)
    else:
        px = [
            [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(w)]
            for _ in range(h)
        ]
        kw = dict(quality=quality, subsample=sub, restart_interval=ri)
    base = decode_jpeg(make_jpeg(px, **kw))
    prog = decode_jpeg(make_jpeg(px, progressive=True, **kw))
    assert base is not None and prog is not None
    assert (prog == base).all()


@settings(max_examples=30, deadline=None)
@given(
    pos=st.integers(0, 10_000),
    val=st.integers(0, 255),
    seed=st.integers(0, 2**16),
)
def test_progressive_corruption_fuzz_never_raises(pos, val, seed):
    """D2 containment for the progressive decode paths too."""
    rng = random.Random(seed)
    px = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(12)]
        for _ in range(10)
    ]
    b = bytearray(
        make_jpeg(px, quality=80, subsample=seed % 2 == 0, progressive=True,
                  restart_interval=seed % 3)
    )
    b[pos % len(b)] = val
    got = decode_jpeg(bytes(b))
    assert got is None or (got.dtype == np.uint8 and got.ndim == 3)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    quality=st.integers(60, 100),
    sub=st.booleans(),
    gray=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_roundtrip_property(w, h, quality, sub, gray, seed):
    """Any image, any supported layout: decode succeeds, dims exact,
    error bounded by a conservative quality-independent ceiling for the
    supported quality range, and gray payloads stay channel-equal."""
    rng = random.Random(seed)
    if gray:
        px = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        want = np.repeat(np.array(px, np.uint8)[:, :, None], 3, axis=2)
        b = make_jpeg(px, color="gray", quality=quality)
    else:
        px = [
            [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(w)]
            for _ in range(h)
        ]
        want = np.array([[list(p) for p in r] for r in px], np.uint8)
        b = make_jpeg(px, quality=quality, subsample=sub)
    got = decode_jpeg(b)
    assert got is not None and got.shape == (h, w, 3)
    if gray:
        assert (got[:, :, 0] == got[:, :, 1]).all() and (got[:, :, 1] == got[:, :, 2]).all()
        assert _err(got, want).max() <= 96  # q60 noise worst case, bounded
    elif not sub:
        assert _err(got, want).max() <= 112
    # subsampled chroma on noise is unbounded pointwise by design; the
    # structured-input tests above carry the tight bounds


@settings(max_examples=40, deadline=None)
@given(
    pos=st.integers(0, 10_000),
    val=st.integers(0, 255),
    seed=st.integers(0, 2**16),
)
def test_corruption_fuzz_never_raises(pos, val, seed):
    """D2 containment under byte corruption: a mutated payload decodes to
    None or a valid array — never an exception escaping decode_jpeg."""
    rng = random.Random(seed)
    px = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(12)]
        for _ in range(10)
    ]
    b = bytearray(make_jpeg(px, quality=80, subsample=seed % 2 == 0))
    b[pos % len(b)] = val
    got = decode_jpeg(bytes(b))
    assert got is None or (got.dtype == np.uint8 and got.ndim == 3)


def test_operator_surface_sees_real_jpeg_pixels(spark):
    """image_features / image_resize / media_metadata over JPEG payloads:
    decoded=true, features equal the direct pixel math, thumbs equal the
    direct nearest-neighbor sampling — the same end-to-end contract the
    PNG/BMP paths carry in test_multimodal.py."""
    from universal_text_extractor_spark.operators.multimodal import (
        image_features,
        image_resize,
        media_metadata,
        _pixel_features,
    )

    payloads = {
        "https://m/j444.jpg": make_jpeg(_gradient(40, 28), quality=95),
        "https://m/j420.jpg": make_jpeg(_gradient(33, 21), quality=90, subsample=True),
        "https://m/jgray.jpg": make_jpeg(
            [[(x * 9) % 256 for x in range(26)] for _ in range(18)],
            color="gray",
            quality=92,
        ),
    }
    df = spark.createDataFrame(
        [(u, p) for u, p in payloads.items()], "url string, payload binary"
    )

    meta = {r["url"]: r for r in media_metadata(df).collect()}
    assert meta["https://m/j444.jpg"]["format"] == "JPEG"
    assert (meta["https://m/j444.jpg"]["width"], meta["https://m/j444.jpg"]["height"]) == (40, 28)

    feats = {r["url"]: r for r in image_features(df).collect()}
    for url, payload in payloads.items():
        row = feats[url]
        assert row["decoded"] is True, url
        want = _pixel_features(decode_image(payload))
        got = row["features"]
        assert len(got) == len(want)
        assert all(abs(a - b) < 1e-4 for a, b in zip(got, want)), url

    thumbs = {r["url"]: r for r in image_resize(df, max_side=16).collect()}
    arr = decode_image(payloads["https://m/j444.jpg"])
    gray = to_grayscale(arr)
    th = thumbs["https://m/j444.jpg"]
    assert th["decoded"] is True
    assert (th["src_width"], th["src_height"]) == (40, 28)
    ys = (np.arange(th["height"]) * gray.shape[0]) // th["height"]
    xs = (np.arange(th["width"]) * gray.shape[1]) // th["width"]
    assert bytes(th["thumb"]) == gray[np.ix_(ys, xs)].tobytes()


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3, Annex H): the one JPEG mode whose writer-pixel
# round-trip is BYTE-EXACT — predictive coding has no quantization loss.
# Writer (pages_gen.make_jpeg_lossless) and decoder are independent
# spec implementations.


def test_lossless_roundtrip_byte_exact_all_predictors():
    px = _gradient(17, 9)
    want = np.array([[list(p) for p in r] for r in px], np.uint8)
    for pred in range(1, 8):
        got = decode_jpeg(make_jpeg_lossless(px, predictor=pred))
        assert got is not None and (got == want).all(), pred
    gray = [[(x * 9 + y) % 256 for x in range(13)] for y in range(7)]
    wantg = np.repeat(np.array(gray, np.uint8)[:, :, None], 3, axis=2)
    for pred in range(1, 8):
        got = decode_jpeg(make_jpeg_lossless(gray, color="gray", predictor=pred))
        assert got is not None and (got == wantg).all(), pred


def test_lossless_point_transform():
    """Pt shifts samples right before coding; decode restores value<<Pt —
    exact equality against the same shift applied to the input."""
    px = _gradient(11, 8)
    arr = np.array([[list(p) for p in r] for r in px], np.uint8)
    for pt in (1, 2, 4):
        want = (arr >> pt) << pt
        got = decode_jpeg(make_jpeg_lossless(px, predictor=5, pt=pt))
        assert got is not None and (got == want).all(), pt


def test_lossless_golden_bytes_pinned():
    b = make_jpeg_lossless(_gradient(32, 20), predictor=4)
    assert hashlib.sha256(b).hexdigest() == GOLDEN_LOSSLESS_BYTES


GOLDEN_LOSSLESS_BYTES = (
    "b50ad7069067f2da404534c1ef5cdc35e0bce2a567539f762af4268985ad9d01"
)


def test_lossless_header_and_operator_surface():
    b = make_jpeg_lossless(_gradient(31, 22))
    assert parse_image_header(b) == (31, 22, "JPEG")
    want = np.array([[list(p) for p in r] for r in _gradient(31, 22)], np.uint8)
    assert (decode_image(b) == want).all()


def test_lossless_unsupported_subsets_contained():
    good = bytearray(make_jpeg_lossless(_gradient(8, 8)))
    sof = good.find(b"\xff\xc3")
    # 16-bit precision → honest None (output contract is uint8 RGB)
    deep = bytearray(good)
    deep[sof + 4] = 16
    assert decode_jpeg(bytes(deep)) is None
    # non-1x1 sampling → None
    samp = bytearray(good)
    samp[sof + 11] = 0x21
    assert decode_jpeg(bytes(samp)) is None
    # a DRI segment before the scan → None (lossless restart semantics
    # are outside the decoder's subset, contained not guessed)
    dri = bytes(good[:sof]) + b"\xff\xdd\x00\x04\x00\x02" + bytes(good[sof:])
    assert decode_jpeg(dri) is None
    # truncated entropy stream → None
    assert decode_jpeg(bytes(good[: len(good) - 8])) is None


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 32),
    h=st.integers(1, 32),
    pred=st.integers(1, 7),
    pt=st.integers(0, 5),
    gray=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_lossless_roundtrip_property(w, h, pred, pt, gray, seed):
    """Random noise, every predictor/point-transform/layout: decoded
    pixels must equal the point-transformed input EXACTLY."""
    rng = random.Random(seed)
    if gray:
        px = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        want = np.repeat(
            ((np.array(px, np.uint8) >> pt) << pt)[:, :, None], 3, axis=2
        )
        b = make_jpeg_lossless(px, color="gray", predictor=pred, pt=pt)
    else:
        px = [
            [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(w)]
            for _ in range(h)
        ]
        want = (np.array([[list(p) for p in r] for r in px], np.uint8) >> pt) << pt
        b = make_jpeg_lossless(px, predictor=pred, pt=pt)
    got = decode_jpeg(b)
    assert got is not None and (got == want).all()


@settings(max_examples=30, deadline=None)
@given(
    pos=st.integers(0, 10_000),
    val=st.integers(0, 255),
    seed=st.integers(0, 2**16),
)
def test_lossless_corruption_fuzz_never_raises(pos, val, seed):
    """D2 containment for the lossless decode path."""
    rng = random.Random(seed)
    px = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(12)]
        for _ in range(10)
    ]
    b = bytearray(make_jpeg_lossless(px, predictor=1 + seed % 7, pt=seed % 3))
    b[pos % len(b)] = val
    got = decode_jpeg(bytes(b))
    assert got is None or (got.dtype == np.uint8 and got.ndim == 3)


def test_missing_eoi_is_tolerated():
    """Real-world JPEGs are routinely truncated right after the last
    scan's entropy bytes; decode must finish with what it has."""
    px = _gradient(24, 16)
    for kw in (dict(quality=90), dict(quality=85, progressive=True)):
        full = make_jpeg(px, **kw)
        assert full.endswith(b"\xff\xd9")
        cut = decode_jpeg(full[:-2])
        assert cut is not None and (cut == decode_jpeg(full)).all(), kw
    lossless = make_jpeg_lossless(px)
    assert (decode_jpeg(lossless[:-2]) == decode_jpeg(lossless)).all()


def test_header_bomb_contained():
    """A crafted SOF claiming huge dimensions must be rejected before
    any allocation — progressive EOB runs would otherwise let a few-KB
    payload drive multi-GB coefficient stores."""
    import struct
    import time

    good = bytearray(make_jpeg(_gradient(16, 16), quality=90, progressive=True))
    sof = good.find(b"\xff\xc2")
    struct.pack_into(">HH", good, sof + 5, 65500, 65500)
    t0 = time.monotonic()
    assert decode_jpeg(bytes(good)) is None
    assert time.monotonic() - t0 < 1.0
