"""Real stdlib codecs (kernels/media_codecs.py): BMP / WAV / PNG
round-trips, PNG filter reconstruction, dispatch, and the error channel
for genuinely unsupported formats."""

import numpy as np
import pytest

from pdf_parser_spark.kernels import media_codecs as mc


def _img(h, w, c, seed=3):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


def test_bmp_roundtrip_gray_and_rgb():
    g = _img(7, 5, 1)
    d = mc.decode_bmp(mc.encode_bmp(g))
    assert (d["width"], d["height"], d["channels"]) == (5, 7, 1)
    assert np.array_equal(d["pixels"], g)

    rgb = _img(6, 9, 3)
    d = mc.decode_bmp(mc.encode_bmp(rgb))
    assert (d["width"], d["height"], d["channels"]) == (9, 6, 3)
    assert np.array_equal(d["pixels"], rgb)


def test_bmp_row_padding():
    # width 3 @ 24bpp -> 9 bytes/row, stride 12: padding must not leak
    rgb = _img(4, 3, 3, seed=9)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(rgb))["pixels"], rgb)


def test_wav_roundtrip_and_stereo_mix():
    rng = np.random.Generator(np.random.PCG64(5))
    s = rng.integers(-30000, 30000, 400, dtype=np.int16)
    d = mc.decode_wav(mc.encode_wav(s, 16000))
    assert d["sample_rate"] == 16000
    assert np.array_equal(d["samples"], s)


def test_png_roundtrip_all_color_types():
    for c in (1, 2, 3, 4):
        px = _img(8, 6, c, seed=c)
        d = mc.decode_png(mc.encode_png(px))
        assert (d["width"], d["height"], d["channels"]) == (6, 8, c)
        assert np.array_equal(d["pixels"], px), f"channels={c}"


def test_png_filters_reconstruct():
    """Hand-build an IDAT using every filter type; the decoder must
    reconstruct the same image as the filter-0 encoding."""
    import struct
    import zlib

    px = _img(5, 4, 3, seed=11)
    h, w, c = px.shape
    rowlen = w * c
    rows = px.reshape(h, rowlen).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(rowlen, dtype=np.int32)
    filters = [0, 1, 2, 3, 4]
    for y in range(h):
        f = filters[y % len(filters)]
        cur = rows[y]
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            enc = cur.copy()
            enc[c:] = (cur[c:] - cur[:-c]) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            enc = cur.copy()
            for x in range(rowlen):
                a = cur[x - c] if x >= c else 0
                enc[x] = (cur[x] - ((a + prev[x]) >> 1)) % 256
        else:
            enc = cur.copy()
            for x in range(rowlen):
                a = int(cur[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[x] = (cur[x] - pred) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        mc._PNG_SIG
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + mc._png_chunk(b"IEND", b"")
    )
    d = mc.decode_png(blob)
    assert np.array_equal(d["pixels"], px)


def test_dispatch_and_error_channel():
    assert mc.decode_any(mc.encode_bmp(_img(2, 2, 3)))["kind"] == "image"
    assert (
        mc.decode_any(mc.encode_wav(np.zeros(4, np.int16), 8000))["kind"]
        == "audio"
    )
    assert mc.decode_any(mc.encode_png(_img(2, 2, 1)))["kind"] == "image"
    with pytest.raises(NotImplementedError):
        mc.decode_any(b"\xff\xd8\xff\xe0JFIF....")
    with pytest.raises(mc.MediaError):
        mc.decode_any(b"garbage-bytes")
    with pytest.raises(mc.MediaError):
        mc.decode_bmp(mc.encode_bmp(_img(4, 4, 3))[:30])  # truncated


def test_featurize_one_uses_real_codecs():
    """The multimodal feature stage must produce real features for real
    containers and error rows for codec-less formats."""
    from pdf_parser_spark.functions.multimodal import _featurize_one

    img = _img(10, 8, 3, seed=21)
    r = _featurize_one(1, mc.encode_png(img))
    assert r["error"] is None and r["kind"] == "image"
    assert (r["width"], r["height"], r["channels"]) == (8, 10, 3)
    assert r["mean_intensity"] == pytest.approx(float(img.mean()))

    s = np.arange(-200, 200, dtype=np.int16)
    r = _featurize_one(2, mc.encode_wav(s, 8000))
    assert r["error"] is None and r["kind"] == "audio"
    assert r["sample_rate"] == 8000
    assert r["duration_s"] == pytest.approx(len(s) / 8000)

    r = _featurize_one(3, b"\xff\xd8\xff\xe0 jpeg-ish")
    assert r["error"] is not None and r["error"].startswith("no_codec")


# ---------------------------------------------------- property tests

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31),
)
def test_bmp_roundtrip_property(h, w, c, seed):
    px = _img(h, w, c, seed=seed)
    d = mc.decode_bmp(mc.encode_bmp(px))
    assert np.array_equal(d["pixels"], px)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_property(h, w, c, seed):
    px = _img(h, w, c, seed=seed)
    d = mc.decode_png(mc.encode_png(px))
    assert np.array_equal(d["pixels"], px)


@settings(max_examples=40, deadline=None)
@given(n=st.integers(1, 2000), sr=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(0, 2**31))
def test_wav_roundtrip_property(n, sr, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    s = rng.integers(-32768, 32768, n, dtype=np.int16)
    d = mc.decode_wav(mc.encode_wav(s, sr))
    assert d["sample_rate"] == sr and np.array_equal(d["samples"], s)
