"""Property-based round-trips (hypothesis) for the hand-rolled codec
pairs: independent writer → kernel parser must reproduce the INPUT data
exactly, with the expected text constructed straight from the inputs (not
from any kernel code) — a second oracle besides the committed goldens."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from universal_text_extractor_spark.kernels.image_prep import decode_image
from universal_text_extractor_spark.kernels.msg_kernel import extract_msg
from universal_text_extractor_spark.kernels.xls_kernel import extract_xls
from universal_text_extractor_spark.sources.pages_gen import (
    make_bmp,
    make_msg,
    make_png,
    make_xls,
)

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))  # (h, w)


def _pixels(h, w, rng_draw):
    return [[tuple(rng_draw.draw(st.integers(0, 255)) for _ in range(3)) for _ in range(w)] for _ in range(h)]


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_bmp_roundtrip_random(data):
    h, w = data.draw(_dims)
    px = _pixels(h, w, data)
    top_down = data.draw(st.booleans())
    got = decode_image(make_bmp(px, top_down=top_down))
    assert got is not None and (got == np.array(px, dtype=np.uint8)).all()


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_png_roundtrip_random_filters(data):
    h, w = data.draw(_dims)
    px = _pixels(h, w, data)
    filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
    got = decode_image(make_png(px, "rgb", filters=filters))
    assert got is not None and (got == np.array(px, dtype=np.uint8)).all()


_cell = st.one_of(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0, max_size=12,
    ),
    st.integers(-9999, 9999),
)
_sheet_name = st.text(
    alphabet=st.characters(min_codepoint=65, max_codepoint=90), min_size=1, max_size=8
)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            _sheet_name,
            st.lists(st.lists(_cell, min_size=1, max_size=5), min_size=1, max_size=6),
        ),
        min_size=1,
        max_size=3,
        unique_by=lambda t: t[0],
    )
)
def test_xls_roundtrip_random(sheets):
    text, logs = extract_xls(make_xls(sheets))
    # expected framing built from the INPUT, independent of both sides
    expected = "\n\n".join(
        f"--- Sheet: {name} ---\n"
        + "\n".join("|".join(str(v) for v in row) for row in rows)
        + "\n"
        for name, rows in sheets
    )
    assert text == expected, (text, expected)
    assert logs[-1].startswith("Successfully extracted data from")


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=16, max_value=64),
)
def test_xls_sst_continue_roundtrip(values, max_record):
    """SSTs spanning CONTINUE records (the ubiquitous real-workbook shape,
    ADVICE r2 #5): force tiny record caps so strings split between records
    AND mid-character-array, and require byte-exact recovery."""
    rows = [[v] for v in values]
    payload = make_xls([("s", rows)], max_record=max_record)
    # the tiny cap must actually have produced CONTINUE records whenever
    # the SST body exceeds it
    sst_size = 8 + sum(3 + len(v) for v in dict.fromkeys(values))
    text, logs = extract_xls(payload)
    expected = "--- Sheet: s ---\n" + "\n".join(values) + "\n"
    assert text == expected, (sst_size, text, expected)
    assert logs[-1].startswith("Successfully extracted data from")


def test_xls_continue_after_non_sst_contained():
    """A CONTINUE that doesn't follow an SST is out of scope — must fall
    into the legacy literal, never crash."""
    import struct

    from universal_text_extractor_spark.sources.pages_gen import _cfb_build

    rec = lambda op, body: struct.pack("<HH", op, len(body)) + body  # noqa: E731
    stream = (
        rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
        + rec(0x003C, b"orphan")
        + rec(0x000A, b"")
    )
    text, logs = extract_xls(_cfb_build({"Workbook": stream}))
    assert text.startswith("[Could not extract data from XLS file")
    assert any("failed" in log for log in logs)


@st.composite
def _gif_case(draw):
    w = draw(st.integers(3, 20))
    h = draw(st.integers(3, 16))
    n = draw(st.integers(1, 4))
    frames = [
        [[draw(st.integers(0, 255)) for _ in range(w)] for _ in range(h)]
        for _ in range(n)
    ]
    return frames


@settings(max_examples=20, deadline=None)
@given(_gif_case(), st.lists(st.integers(0, 5000), min_size=4, max_size=4))
def test_gif_roundtrip_random(frames, delays):
    """Writer↔parser pair for the animated-GIF codec: pixels and
    centisecond-rounded delays recover exactly."""
    from universal_text_extractor_spark.kernels.gif_kernel import decode_gif_frames
    from universal_text_extractor_spark.sources.pages_gen import make_gif

    import numpy as np

    delays = delays[: len(frames)] + [100] * max(0, len(frames) - len(delays))
    payload = make_gif(frames, delays_ms=delays)
    got = decode_gif_frames(payload)
    assert got is not None
    w, h, out = got
    assert (w, h) == (len(frames[0][0]), len(frames[0]))
    assert len(out) == len(frames)
    for (delay_ms, arr), want_f, want_d in zip(out, frames, delays):
        assert delay_ms == (want_d // 10) * 10
        assert (arr[:, :, 0] == np.array(want_f, dtype=np.uint8)).all()
        assert (arr[:, :, 0] == arr[:, :, 1]).all()  # grayscale palette


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_decode_known_samples(samples, rate):
    """decode_wav against a RIFF payload packed BY HAND here (independent
    of both the kernel and make_wav): exact 16-bit sample recovery."""
    import struct

    import numpy as np

    from universal_text_extractor_spark.kernels.audio_kernel import decode_wav

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    got_rate, got = decode_wav(payload)
    assert got_rate == rate
    assert np.allclose(got, np.array(samples) / 32768.0)


_field = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=40
)


@settings(max_examples=25, deadline=None)
@given(_field, _field, _field, _field)
def test_msg_roundtrip_random(sender, to, subject, body):
    text, _logs = extract_msg(make_msg(sender, to, subject, body))
    assert text == (
        f"From: {sender}\nTo: {to}\nSubject: {subject}\nDate: None\n\n{body}"
    )


@settings(max_examples=15, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(200, 3000),
)
def test_wav_ima_adpcm_roundtrip(seed, n_samples):
    """make_wav(codec='ima_adpcm') → decode_wav recovers the PCM signal
    within the codec's quantization bound. IMA ADPCM is lossy (4-bit
    residual quantizer), so the contract is a tolerance on RMS error
    relative to the quantizer's own step sizes, not byte equality —
    same contract class as the JPEG round trip."""
    import random

    from universal_text_extractor_spark.kernels.audio_kernel import decode_wav
    from universal_text_extractor_spark.sources.pages_gen import make_wav

    ref_rate, ref = decode_wav(make_wav(random.Random(seed), n_samples=n_samples))
    got_rate, got = decode_wav(
        make_wav(random.Random(seed), n_samples=n_samples, codec="ima_adpcm")
    )
    assert got_rate == ref_rate
    # final-block nibble padding may append a short reconstructed tail
    assert len(ref) <= len(got) <= len(ref) + 512
    # ENVELOPE bound only, measured past the adaptation transient (the
    # step size starts at 7 and needs ~100 samples to lock onto a loud
    # carrier): make_wav's signal (triangle with period as short as 20
    # samples + a noise floor) sits near the adaptive quantizer's
    # slew-rate worst case, so corpus-signal error is codec-inherent,
    # not an implementation defect — the tight fidelity bound lives in
    # test_wav_ima_adpcm_smooth_signal below.
    s = min(128, n_samples // 2)
    err = np.sqrt(((ref[s:] - got[s : len(ref)]) ** 2).mean())
    amp = np.sqrt((ref**2).mean())
    assert err <= max(0.5 * amp, 0.03), (err, amp)


def test_wav_ima_adpcm_smooth_signal():
    """Fidelity bound on a signal inside the codec's design envelope
    (slow sine, slope « max step): encoder+decoder track within 1% RMS.
    This is the bound that separates 'lossy codec' from 'broken
    implementation' — the corpus round-trip above only checks the
    containment envelope because its carrier is a slew-rate torture
    signal."""
    import struct

    from universal_text_extractor_spark.kernels.audio_kernel import decode_wav
    from universal_text_extractor_spark.sources.pages_gen import _ima_adpcm_encode

    sig = [int(20000 * np.sin(2 * np.pi * t / 400)) for t in range(2000)]
    data = _ima_adpcm_encode(sig, block_align=256)
    spb = (256 - 4) * 2 + 1
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 4125, 256, 4, 2, spb)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    _rate, got = decode_wav(payload)
    ref = np.array(sig, dtype=np.float64) / 32768.0
    err = np.sqrt(((ref - got[: len(ref)]) ** 2).mean())
    amp = np.sqrt((ref**2).mean())
    assert err <= 0.01 * amp, (err, amp)


def test_ima_adpcm_known_block():
    """decode_wav against an ADPCM block packed BY HAND with samples
    computed BY HAND from the published IMA tables (independent of both
    the kernel loop and the writer's encoder): header pred=100 index=0
    (step 7); nibble 0x3 → diff 3+1=4 → 104; nibble 0x8 (sign, zero
    magnitude) → diff -0 → 104."""
    import struct

    from universal_text_extractor_spark.kernels.audio_kernel import decode_wav

    block = struct.pack("<hBB", 100, 0, 0) + bytes([0x83])  # low nibble first
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000, 5, 4, 2, 3)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(block)) + block
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, got = decode_wav(payload)
    assert rate == 8000
    assert np.allclose(got * 32768.0, [100.0, 104.0, 104.0])


def test_ima_adpcm_containment():
    """Malformed ADPCM (step index > 88, trailing fragment) → None,
    never a raise (D2)."""
    import random
    import struct

    from universal_text_extractor_spark.kernels.audio_kernel import decode_wav
    from universal_text_extractor_spark.sources.pages_gen import make_wav

    good = make_wav(random.Random(3), n_samples=1000, codec="ima_adpcm")
    assert decode_wav(good) is not None
    # corrupt the first block's step index to 200 (data chunk starts at
    # RIFF(12) + fmt hdr(8) + fmt(20) + data hdr(8); index byte at +2)
    bad = bytearray(good)
    bad[12 + 8 + 20 + 8 + 2] = 200
    assert decode_wav(bytes(bad)) is None
    # trailing fragment shorter than a block header
    frag = good + b"\x01\x02"
    frag = bytearray(frag)
    # patch the data chunk length to include the fragment
    (dlen,) = struct.unpack_from("<I", frag, 12 + 8 + 20 + 4)
    struct.pack_into("<I", frag, 12 + 8 + 20 + 4, dlen + 2)
    struct.pack_into("<I", frag, 4, len(frag) - 8)
    assert decode_wav(bytes(frag)) is None


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_aes_cbc_property(data):
    """AES-CBC round-trips for arbitrary keys/IVs/lengths, all three key
    sizes — alongside the fixed FIPS-197 vectors in test_pdf_crypt.py."""
    from universal_text_extractor_spark.kernels.pdf_crypt import (
        aes_cbc_decrypt,
        aes_cbc_encrypt,
    )

    key = bytes(data.draw(st.lists(st.integers(0, 255),
                                   min_size=16, max_size=16)))
    key = key * data.draw(st.sampled_from([1, 2])) if len(key) == 16 else key
    iv = bytes(data.draw(st.lists(st.integers(0, 255), min_size=16, max_size=16)))
    msg = bytes(data.draw(st.lists(st.integers(0, 255), min_size=0, max_size=200)))
    assert aes_cbc_decrypt(key, aes_cbc_encrypt(key, iv, msg)) == msg


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_png_modes_property(data):
    """Random pixels × random per-row filters × interlace × palette/gray
    depth round-trip byte-exact through the widened PNG writer/decoder."""
    import numpy as np

    from universal_text_extractor_spark.kernels.image_prep import _decode_png
    from universal_text_extractor_spark.sources.pages_gen import make_png

    w = data.draw(st.integers(1, 24))
    h = data.draw(st.integers(1, 20))
    interlace = data.draw(st.booleans())
    filts = data.draw(st.lists(st.integers(0, 4), min_size=1, max_size=8))
    mode = data.draw(st.sampled_from(["rgb", "gray", "palette16", "gray4", "rgb16"]))
    if mode == "palette16":
        colors = [
            (data.draw(st.integers(0, 255)), data.draw(st.integers(0, 255)),
             data.draw(st.integers(0, 255)))
            for _ in range(data.draw(st.integers(1, 16)))
        ]
        pix = [[colors[data.draw(st.integers(0, len(colors) - 1))]
                for _ in range(w)] for _ in range(h)]
        png = make_png(pix, "palette", filts, interlace=interlace, depth=4)
        want = np.array(pix, np.uint8)
    elif mode == "gray4":
        step = 255 // 15
        pix = [[data.draw(st.integers(0, 15)) * step for _ in range(w)]
               for _ in range(h)]
        png = make_png(pix, "gray", filts, interlace=interlace, depth=4)
        want = np.repeat(np.array(pix, np.uint8)[:, :, None], 3, axis=2)
    else:
        depth = 16 if mode.endswith("16") else 8
        base = mode.replace("16", "")
        if base == "gray":
            pix = [[data.draw(st.integers(0, 255)) for _ in range(w)]
                   for _ in range(h)]
            want = np.repeat(np.array(pix, np.uint8)[:, :, None], 3, axis=2)
        else:
            pix = [[(data.draw(st.integers(0, 255)), data.draw(st.integers(0, 255)),
                     data.draw(st.integers(0, 255))) for _ in range(w)]
                   for _ in range(h)]
            want = np.array(pix, np.uint8)
        png = make_png(pix, base, filts, interlace=interlace, depth=depth)
    got = _decode_png(png)
    assert got is not None and np.array_equal(got, want)


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_encrypted_cid_pdf_property(data):
    """Random (seed, pages, mode, layout) encrypted/CID PDFs extract
    byte-identically to their plain twin."""
    import random

    from universal_text_extractor_spark.kernels.pdf_kernel import extract_pdf
    from universal_text_extractor_spark.sources.pages_gen import _pdf_doc_pages

    seed = data.draw(st.integers(0, 10_000))
    npages = data.draw(st.integers(1, 4))
    flate = data.draw(st.booleans())
    cid = data.draw(st.booleans())
    objstm = data.draw(st.booleans())
    mode = data.draw(st.sampled_from([None, "rc4-40", "rc4-128", "aesv2"]))
    ref = extract_pdf(_pdf_doc_pages(random.Random(seed), npages, flate))[0]
    got = extract_pdf(
        _pdf_doc_pages(
            random.Random(seed), npages, flate,
            cid_font=cid, objstm=objstm, encrypt=mode,
        )
    )[0]
    assert got == ref
