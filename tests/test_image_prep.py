"""K14-K16 image preprocessing: writer↔decoder round-trips (BMP both
orientations; PNG gray/RGB/RGBA across all five scanline filters),
preprocessing-chain semantics, scanned-document classification,
orientation detection, and the Spark operator surface."""

from __future__ import annotations

import random

import numpy as np

from universal_text_extractor_spark.kernels.image_prep import (
    binarize,
    decode_image,
    detect_orientation,
    enhance_contrast,
    is_scanned_document,
    median3,
    preprocess_image,
    to_grayscale,
)
from universal_text_extractor_spark.sources.pages_gen import (
    generate_media_df,
    make_bmp,
    make_document_image,
    make_noise_image,
    make_png,
    _document_pixels,
)

RGB_ROWS = [[(x * 3 % 256, y * 5 % 256, (x + y) % 256) for x in range(13)] for y in range(7)]


def test_bmp_round_trip_both_orientations():
    want = np.array(RGB_ROWS, dtype=np.uint8)
    for top_down in (False, True):
        got = decode_image(make_bmp(RGB_ROWS, top_down=top_down))
        assert got is not None and (got == want).all()


def test_png_round_trip_all_filters_and_colortypes():
    gray = [[(x * y) % 256 for x in range(9)] for y in range(11)]
    got = decode_image(make_png(gray, "gray", filters=[y % 5 for y in range(11)]))
    assert (got[:, :, 0] == np.array(gray, dtype=np.uint8)).all()
    assert (got[:, :, 0] == got[:, :, 1]).all()  # gray replicated to RGB

    got = decode_image(make_png(RGB_ROWS, "rgb", filters=[4, 3, 2, 1, 0, 4, 3]))
    assert (got == np.array(RGB_ROWS, dtype=np.uint8)).all()

    rgba = [[(1, 2, 3, 200), (250, 5, 6, 10)], [(7, 8, 9, 0), (10, 11, 12, 255)]]
    got = decode_image(make_png(rgba, "rgba", filters=[4, 1]))
    want = np.array([[p[:3] for p in r] for r in rgba], dtype=np.uint8)
    assert (got == want).all()


def test_decode_containment():
    assert decode_image(b"") is None
    assert decode_image(b"BM\x00trunc") is None
    assert decode_image(b"\x89PNG\r\n\x1a\njunk") is None
    assert decode_image(b"GIF89a\x00\x00") is None  # header-only format


def test_preprocess_chain_semantics():
    rng = random.Random(9)
    payload = make_document_image(rng)
    pp = preprocess_image(payload)
    assert pp is not None and set(np.unique(pp)) <= {0, 255}  # binarized
    ink = float((pp == 0).mean())
    assert 0.02 < ink < 0.5  # text bands present, page mostly white
    # unit steps
    g = to_grayscale(np.array(RGB_ROWS, dtype=np.uint8))
    assert g.dtype == np.uint8 and g.shape == (7, 13)
    e = enhance_contrast(g, 1.5)
    assert int(e.max()) - int(e.min()) >= int(g.max()) - int(g.min())
    b = binarize(g, 130)
    assert set(np.unique(b)) <= {0, 255}
    m = median3(b)
    assert m.shape == b.shape


def test_scanned_document_classifier():
    rng = random.Random(21)
    assert is_scanned_document(make_document_image(rng)) is True
    assert is_scanned_document(make_noise_image(rng)) is False
    assert is_scanned_document(b"not an image") is False


def test_orientation_detection():
    rng = random.Random(33)
    upright = make_document_image(rng, w=56, h=78, fmt="png")
    assert detect_orientation(upright) == 0
    # writer-side 90° rotation (pixel lists transposed before encoding)
    rows = _document_pixels(random.Random(34), 56, 78)
    rot = [[rows[y][x] for y in range(len(rows))] for x in range(len(rows[0]) - 1, -1, -1)]
    got = detect_orientation(make_bmp(rot))
    assert got in (90, 270) and got != 0
    assert detect_orientation(b"junk") == 0


def test_image_prep_profile_operator(spark):
    from universal_text_extractor_spark.operators.multimodal import image_prep_profile

    media = generate_media_df(spark, 80)
    rows = {r["url"]: r for r in image_prep_profile(media).collect()}
    assert len(rows) == 80
    kinds = {u: u.split("/")[3] for u in rows}
    for u, r in rows.items():
        kind = kinds[u]
        if kind == "junk":
            assert r["decoded"] is False and r["orientation"] == 0
        else:
            assert r["decoded"] is True and r["width"] > 0
            assert r["n_pix"] == r["width"] * r["height"]
            assert 0 <= r["sum_gray"] <= 255 * r["n_pix"]
    docs = [r for u, r in rows.items() if kinds[u] == "doc"]
    rotated = [r for u, r in rows.items() if kinds[u] == "doc_rot"]
    noise = [r for u, r in rows.items() if kinds[u] == "noise"]
    assert docs and rotated and noise
    # classifier separates scans from photos; orientation finds the rotation
    assert all(r["is_scanned"] for r in docs)
    assert not any(r["is_scanned"] for r in noise)
    assert all(r["orientation"] == 0 for r in docs)
    assert all(r["orientation"] == 90 for r in rotated)
    assert all(0.02 < r["ink0"] / r["n_pix"] < 0.5 for r in docs)


def test_pages_generator_byte_stability():
    """The pages corpus feeds the m1 oracle, the goldens, and the cached
    bench parquet — pin its bytes so a generator refactor can't silently
    shift them (index-purity alone doesn't catch a draw-order change)."""
    import hashlib

    from universal_text_extractor_spark.sources.pages_gen import make_page

    h = hashlib.sha256()
    for i in range(300):
        r = make_page(i)
        h.update(r["url"].encode())
        h.update(r["html"] or b"")
    assert h.hexdigest() == "380fe1d5ffa6e0d5731d4fd5fcb7176812b15b5b4e454e5b923d4f8b71ff3610"


def test_media_generator_byte_stability():
    """The media corpus is the m3 oracle's ground truth — pin its bytes so
    a generator refactor can't silently shift what the oracle grades."""
    import hashlib

    from universal_text_extractor_spark.sources.pages_gen import make_media_row

    h = hashlib.sha256()
    for i in range(300):
        r = make_media_row(i)
        h.update(r["url"].encode())
        h.update(r["payload"])
    assert h.hexdigest() == (
        "9e9c96f42ff8f7a9ea23d5afc1c09f42562077114c211dcf8aa003c085e611a0"
    )


def test_profile_scores_match_float_variance():
    """The integer orientation scores must order rotations exactly like
    the float row-density variance they replace (same sign, common
    denominator h²w² — see profile_scores docstring)."""
    import numpy as np

    from universal_text_extractor_spark.kernels.image_prep import profile_scores

    rng = random.Random(77)
    for _ in range(20):
        h, w = rng.randint(3, 40), rng.randint(3, 40)
        gray = np.array(
            [[rng.randrange(256) for _ in range(w)] for _ in range(h)], dtype=np.uint8
        )
        s_rows, s_cols = profile_scores(gray)
        var_rows = float((gray < 128).mean(axis=1).var())
        var_cols = float((np.rot90(gray) < 128).mean(axis=1).var())
        # same ordering (float ties allowed to go either way within 1e-12)
        if abs(var_rows - var_cols) > 1e-9:
            assert (s_rows > s_cols) == (var_rows > var_cols)


def test_png_widened_round_trips():
    """PNG beyond the legacy subset: palette (PLTE, depths 1/2/4/8),
    Adam7 interlace (7 independently filtered passes, incl. images small
    enough that some passes are empty), 16-bit (high byte kept), sub-8
    gray, gray+alpha. All lossless → byte-exact vs the writer grid."""
    import random

    import numpy as np

    from universal_text_extractor_spark.kernels.image_prep import _decode_png
    from universal_text_extractor_spark.sources.pages_gen import make_png

    rng = random.Random(12)
    W, H = 21, 17
    rgb = [
        [(rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255))
         for _ in range(W)]
        for _ in range(H)
    ]
    gray = [[rng.randint(0, 255) for _ in range(W)] for _ in range(H)]
    want_rgb = np.array(rgb, np.uint8)
    want_gray = np.repeat(np.array(gray, np.uint8)[:, :, None], 3, axis=2)
    filts = [rng.choice([0, 1, 2, 3, 4]) for _ in range(200)]

    for color, pix, want in (("rgb", rgb, want_rgb), ("gray", gray, want_gray)):
        for il in (False, True):
            for d in (8, 16):
                got = _decode_png(make_png(pix, color, filts, interlace=il, depth=d))
                assert got is not None and np.array_equal(got, want), (color, il, d)
    ga = [[(gray[y][x], rng.randint(0, 255)) for x in range(W)] for y in range(H)]
    for il in (False, True):
        got = _decode_png(make_png(ga, "graya", filts, interlace=il))
        assert np.array_equal(got, want_gray), ("graya", il)
    for d, ncol in ((1, 2), (2, 4), (4, 16), (8, 200)):
        colors = [
            (rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255))
            for _ in range(ncol)
        ]
        pp = [[rng.choice(colors) for _ in range(W)] for _ in range(H)]
        for il in (False, True):
            got = _decode_png(make_png(pp, "palette", filts, interlace=il, depth=d))
            assert got is not None and np.array_equal(got, np.array(pp, np.uint8)), (d, il)
    for d in (1, 2, 4):
        step = 255 // ((1 << d) - 1)
        gq = [[rng.randint(0, (1 << d) - 1) * step for _ in range(W)] for _ in range(H)]
        for il in (False, True):
            got = _decode_png(make_png(gq, "gray", filts, interlace=il, depth=d))
            want = np.repeat(np.array(gq, np.uint8)[:, :, None], 3, axis=2)
            assert got is not None and np.array_equal(got, want), (d, il)
    for w2, h2 in ((1, 1), (2, 3), (5, 5), (8, 1), (1, 9)):
        pix = [[(x * 13 % 256, y * 29 % 256, 7) for x in range(w2)] for y in range(h2)]
        got = _decode_png(make_png(pix, "rgb", [0], interlace=True))
        assert got is not None and np.array_equal(got, np.array(pix, np.uint8)), (w2, h2)
    # corruption containment across the new paths
    good = make_png(rgb, "rgb", filts, interlace=True)
    for pos in range(8, len(good), max(1, len(good) // 30)):
        mut = bytearray(good)
        mut[pos] ^= 0xA5
        r = _decode_png(bytes(mut))
        assert r is None or isinstance(r, np.ndarray)


def test_bmp_widened_round_trips():
    """BMP beyond 24bpp BI_RGB: 32bpp, 8/4/1bpp palette, and BI_RLE8 /
    BI_RLE4 runs — the classic clip-art/screenshot shapes. Lossless →
    byte-exact vs the independent writer; corruption contained."""
    import random

    import numpy as np

    from universal_text_extractor_spark.kernels.image_prep import _decode_bmp
    from universal_text_extractor_spark.sources.pages_gen import make_bmp

    rng = random.Random(7)
    W, H = 23, 17
    rgb = [
        [(rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255))
         for _ in range(W)]
        for _ in range(H)
    ]
    want = np.array(rgb, np.uint8)
    for td in (False, True):
        assert np.array_equal(_decode_bmp(make_bmp(rgb, top_down=td)), want)
        assert np.array_equal(_decode_bmp(make_bmp(rgb, top_down=td, bpp=32)), want)
    for bpp, ncol in ((8, 200), (4, 16), (1, 2)):
        colors = [
            (rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255))
            for _ in range(ncol)
        ]
        pix = [[rng.choice(colors) for _ in range(W)] for _ in range(H)]
        for td in (False, True):
            got = _decode_bmp(make_bmp(pix, top_down=td, bpp=bpp))
            assert got is not None and np.array_equal(got, np.array(pix, np.uint8))
    for bpp, ncol in ((8, 7), (4, 5)):
        colors = [
            (rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255))
            for _ in range(ncol)
        ]
        pix = [[rng.choice(colors)] * rng.randint(1, 4) for _ in range(H)]
        pix = [(r * ((W // len(r)) + 1))[:W] for r in pix]
        got = _decode_bmp(make_bmp(pix, bpp=bpp, rle=True))
        assert got is not None and np.array_equal(got, np.array(pix, np.uint8))
    for payload in (
        make_bmp(rgb[:8], bpp=8),
        make_bmp([[(1, 2, 3)] * 10] * 6, bpp=8, rle=True),
    ):
        for pos in range(2, len(payload), max(1, len(payload) // 30)):
            mut = bytearray(payload)
            mut[pos] ^= 0xA5
            r = _decode_bmp(bytes(mut))
            assert r is None or isinstance(r, np.ndarray)


def _brute_adaptive(gray, block_size, c):
    """Per-pixel reference implementation: edge-replicated window, integer
    floor mean, out = 255 where pixel > mean - c."""
    import numpy as np

    h, w = gray.shape
    r = block_size // 2
    p = np.pad(gray, r, mode="edge").astype(np.int64)
    out = np.zeros_like(gray)
    for y in range(h):
        for x in range(w):
            win = p[y : y + block_size, x : x + block_size]
            mean = int(win.sum()) // (block_size * block_size)
            out[y, x] = 255 if int(gray[y, x]) > mean - c else 0
    return out


def test_adaptive_threshold_matches_brute_force():
    """K14 adaptive-threshold parity (r4 verdict item #5): the integral-
    image implementation equals the per-pixel spec on random images, odd
    block sizes, and varied C — including blocks larger than the image
    (the padded window degrades toward the global mean)."""
    import numpy as np

    from universal_text_extractor_spark.kernels.image_prep import (
        adaptive_threshold,
    )

    rng = np.random.default_rng(17)
    for block in (3, 5, 11, 31):
        for c in (0, 2, 7):
            g = rng.integers(0, 256, size=(19, 23), dtype=np.uint8)
            got = adaptive_threshold(g, block, c)
            assert got.dtype == np.uint8
            assert (got == _brute_adaptive(g, block, c)).all(), (block, c)
    # invariants: constant image is all-255 for c>0 (v > v - c);
    # output strictly binary
    flat = np.full((9, 9), 130, dtype=np.uint8)
    assert (adaptive_threshold(flat, 11, 2) == 255).all()
    assert set(np.unique(adaptive_threshold(
        rng.integers(0, 256, size=(16, 16), dtype=np.uint8), 5, 2
    ))) <= {0, 255}
    # parameter validation
    import pytest

    for bad in (2, 1, 0, 4):
        with pytest.raises(ValueError):
            adaptive_threshold(flat, bad, 2)


def test_adaptive_threshold_hypothesis_sweep():
    """Property sweep: arbitrary small images × odd blocks × C — the
    vectorized path never disagrees with the per-pixel spec."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from universal_text_extractor_spark.kernels.image_prep import (
        adaptive_threshold,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        block=st.sampled_from([3, 5, 7, 9, 13]),
        c=st.integers(-5, 10),
        seed=st.integers(0, 2**31),
    )
    def run(h, w, block, c, seed):
        g = np.random.default_rng(seed).integers(
            0, 256, size=(h, w), dtype=np.uint8
        )
        assert (adaptive_threshold(g, block, c) == _brute_adaptive(g, block, c)).all()

    run()


def test_adaptive_threshold_default_off_and_ocr_thread():
    """Gate: the default K14 chain is byte-identical with the new keys
    absent/False (goldens + m3 oracle unmoved); the param threads through
    perform_ocr and still reads a rendered page (ink is darker than its
    local mean, so adaptive binarization preserves glyph structure)."""
    import numpy as np

    from universal_text_extractor_spark.kernels.image_prep import (
        preprocess_gray,
    )
    from universal_text_extractor_spark.kernels.ocr_kernel import perform_ocr
    from universal_text_extractor_spark.sources.pages_gen import (
        make_ocr_page,
    )

    rng = random.Random(21)
    g = to_grayscale(decode_image(make_document_image(rng)))
    assert (preprocess_gray(g) == preprocess_gray(
        g, {"adaptive_threshold": False}
    )).all()
    on = preprocess_gray(g, {"adaptive_threshold": True})
    assert set(np.unique(on)) <= {0, 255}

    payload = make_ocr_page(random.Random(4), ["HELLO WORLD"], fmt="bmp", scale=3)
    base = perform_ocr(payload)
    assert "HELLO WORLD" in base
    # C must exceed the page's background speckle amplitude or adaptive
    # binarization promotes noise to ink (same knob trade-off as cv2's) —
    # the generator's speckle is ±~8 gray levels, so C=12 clears it while
    # ink (Δ≈200 from its local mean) stays ink
    adaptive = perform_ocr(
        payload,
        preprocess_params={
            "enhance": False,
            "adaptive_threshold": True,
            "adaptive_c": 12,
        },
    )
    assert "HELLO WORLD" in adaptive
