"""Real media codecs, stdlib-only (SURVEY.md §7.0: no PIL/ffmpeg in
this environment — but BMP, WAV and PNG are fully decodable with
struct + zlib + numpy, so these three REAL formats get real decoders;
JPEG/MP4 full decode still raises NotImplementedError into the error
channel, while their HEADER metadata — dimensions, channels, duration,
frame count — is parsed for real from the public container structures:
JFIF marker segments and ISO-BMFF boxes, see probe_jpeg/probe_mp4).

Encoders exist so tests can round-trip deterministic arrays; they write
the plainest legal form of each format (BI_RGB bitmaps, PCM wav,
non-interlaced PNG with filter 0).

Spark-free by design — shared by the multimodal Arrow stages and any
future single-process oracle, the same sharing contract as kernels/.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class MediaError(ValueError):
    pass


# ------------------------------------------------------------------ BMP


def decode_bmp(blob: bytes) -> dict:
    """Uncompressed (BI_RGB) 8-bit palette/gray and 24-bit BGR bitmaps,
    bottom-up or top-down, 4-byte row stride."""
    if blob[:2] != b"BM" or len(blob) < 54:
        raise MediaError("not a BMP")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise MediaError("unsupported BMP header")
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0:
        raise MediaError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24):
        raise MediaError(f"unsupported BMP bpp {bpp}")
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise MediaError("bad BMP dimensions")
    stride = (w * (bpp // 8) + 3) & ~3
    need = data_off + stride * h
    if len(blob) < need:
        raise MediaError("truncated BMP pixel data")
    rows = np.frombuffer(
        blob, np.uint8, stride * h, data_off
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # palette lookup -> gray via the palette's blue channel (gray
        # palettes store r==g==b; 4 bytes per entry after the header)
        pal_off = 14 + hdr_size
        n_colors = struct.unpack_from("<I", blob, 46)[0] or 256
        pal = np.frombuffer(
            blob, np.uint8, n_colors * 4, pal_off
        ).reshape(n_colors, 4)
        idx = rows[:, :w]
        px = pal[idx, 0][..., None]  # (h, w, 1) gray
        channels = 1
    else:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        px = bgr[:, :, ::-1]  # BGR -> RGB
        channels = 3
    return {
        "kind": "image",
        "width": int(w),
        "height": int(h),
        "channels": channels,
        "pixels": np.ascontiguousarray(px),
    }


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w) or (h, w, 1) uint8 -> 8-bit gray-palette BMP;
    (h, w, 3) RGB uint8 -> 24-bit BMP. Bottom-up, BI_RGB."""
    if px.ndim == 2:
        px = px[..., None]
    h, w, c = px.shape
    if px.dtype != np.uint8 or c not in (1, 3):
        raise MediaError("encode_bmp wants uint8 (h,w,{1,3})")
    if c == 1:
        bpp, pal = 8, b"".join(bytes((i, i, i, 0)) for i in range(256))
        rowbytes = px[:, :, 0]
    else:
        bpp, pal = 24, b""
        rowbytes = px[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    stride = (w * (bpp // 8) + 3) & ~3
    pad = stride - rowbytes.shape[1]
    body = b"".join(
        rowbytes[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    data_off = 14 + 40 + len(pal)
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body), 2835, 2835,
            256 if c == 1 else 0, 0,
        )
    )
    return header + pal + body


# ------------------------------------------------------------------ WAV


def decode_wav(blob: bytes) -> dict:
    """RIFF/WAVE PCM, 8-bit unsigned or 16-bit signed, any channel
    count; returns mono-mixed int16 samples."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise MediaError("not a WAV")
    off = 12
    fmt = None
    data = None
    while off + 8 <= len(blob):
        cid = blob[off : off + 4]
        (size,) = struct.unpack_from("<I", blob, off + 4)
        body = blob[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise MediaError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1:
        raise MediaError(f"unsupported WAV format {audio_fmt} (PCM only)")
    if bits == 16:
        s = np.frombuffer(data, np.int16, len(data) // 2)
    elif bits == 8:
        s = (
            np.frombuffer(data, np.uint8).astype(np.int16) - 128
        ) * 256
    else:
        raise MediaError(f"unsupported WAV bit depth {bits}")
    if n_ch > 1:
        n = (len(s) // n_ch) * n_ch
        s = s[:n].reshape(-1, n_ch).mean(axis=1).astype(np.int16)
    return {"kind": "audio", "sample_rate": int(sr), "samples": s}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise MediaError("encode_wav wants 1-D int16")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# ------------------------------------------------------------------ PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(blob: bytes) -> dict:
    """Non-interlaced 8-bit-depth PNG, color types gray / RGB /
    gray+alpha / RGBA; all five row filters."""
    if blob[:8] != _PNG_SIG:
        raise MediaError("not a PNG")
    off = 8
    ihdr = None
    idat = []
    while off + 8 <= len(blob):
        (size,) = struct.unpack_from(">I", blob, off)
        cid = blob[off + 4 : off + 8]
        body = blob[off + 8 : off + 8 + size]
        if cid == b"IHDR":
            ihdr = body
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        off += 12 + size  # len + id + crc
    if ihdr is None or not idat:
        raise MediaError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or ctype not in _PNG_CHANNELS:
        raise MediaError(f"unsupported PNG depth/color {depth}/{ctype}")
    if comp != 0 or filt != 0 or interlace != 0:
        raise MediaError("unsupported PNG compression/filter/interlace")
    c = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    rowlen = w * c
    if len(raw) != h * (rowlen + 1):
        raise MediaError("PNG data length mismatch")
    out = np.zeros((h, rowlen), dtype=np.uint8)
    prev = np.zeros(rowlen, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (rowlen + 1)]
        line = np.frombuffer(
            raw, np.uint8, rowlen, y * (rowlen + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub
            rec = line.copy()
            for x in range(c, rowlen):
                rec[x] = (rec[x] + rec[x - c]) & 0xFF
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for x in range(rowlen):
                a = rec[x - c] if x >= c else 0
                rec[x] = (rec[x] + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for x in range(rowlen):
                a = int(rec[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise MediaError(f"bad PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    px = out.reshape(h, w, c)
    return {
        "kind": "image",
        "width": int(w),
        "height": int(h),
        "channels": int(c),
        "pixels": px,
    }


def _png_chunk(cid: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + cid
        + body
        + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """(h, w) / (h, w, c) uint8, c in {1,2,3,4} -> non-interlaced PNG
    with filter 0 rows."""
    if px.ndim == 2:
        px = px[..., None]
    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if px.dtype != np.uint8 or ctype is None:
        raise MediaError("encode_png wants uint8 (h,w,1|2|3|4)")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# ------------------------------------------- JPEG / MP4 header probes
#
# Full pixel/frame decode of these formats genuinely needs an external
# codec (PIL / ffmpeg — not in this sandbox), and stays a clearly-marked
# NotImplementedError in decode_any. But the METADATA a curation
# pipeline filters on (dimensions, channels, duration, frame count) is
# plain public container structure: JFIF marker segments (ITU-T T.81)
# and ISO BMFF boxes (ISO/IEC 14496-12). These probes parse exactly
# that, so JPEG/MP4 rows carry real typed metadata with only the pixel
# decode stubbed.

_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0-15 minus DHT/JPG/DAC


def probe_jpeg(blob: bytes) -> dict:
    """Walk JFIF marker segments to the first SOF frame header; return
    width/height/channels. Pixels are NOT decoded (``pixels: None``)."""
    if blob[:3] != b"\xff\xd8\xff":
        raise MediaError("not a JPEG")
    i = 2
    n = len(blob)
    while i + 4 <= n:
        if blob[i] != 0xFF:
            raise MediaError("bad JPEG marker stream")
        j = i + 1
        while j < n and blob[j] == 0xFF:  # fill bytes are legal
            j += 1
        if j >= n:
            break
        marker = blob[j]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i = j + 1  # standalone markers carry no length
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
            break
        if j + 3 > n:
            raise MediaError("truncated JPEG segment header")
        seg_len = int.from_bytes(blob[j + 1 : j + 3], "big")
        if seg_len < 2:
            raise MediaError("bad JPEG segment length")
        if marker in _SOF_MARKERS:
            if j + 3 + 6 > n:
                raise MediaError("truncated JPEG SOF segment")
            h = int.from_bytes(blob[j + 4 : j + 6], "big")
            w = int.from_bytes(blob[j + 6 : j + 8], "big")
            channels = blob[j + 8]
            if w == 0 or h == 0 or channels == 0:
                raise MediaError("bad JPEG frame dimensions")
            return {
                "kind": "image",
                "width": w,
                "height": h,
                "channels": channels,
                "pixels": None,
            }
        i = j + 1 + seg_len
    raise MediaError("no JPEG SOF marker found")


def encode_jpeg_header(w: int, h: int, channels: int = 3) -> bytes:
    """Header-ONLY JPEG (SOI + JFIF APP0 + SOF0 + EOI, no scan data) —
    a legal marker stream for probe tests; not a decodable image."""
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof_body = b"\x08" + struct.pack(">HHB", h, w, channels)
    for c in range(channels):
        sof_body += bytes([c + 1, 0x11, 0])
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
        + b"\xff\xd9"
    )


def _bmff_boxes(blob: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO-BMFF boxes in a span."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(blob[i : i + 4], "big")
        btype = blob[i + 4 : i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                raise MediaError("truncated MP4 largesize box")
            size = int.from_bytes(blob[i + 8 : i + 16], "big")
            body = i + 16
        elif size == 0:  # box extends to end of span
            size = end - i
        if size < 8 or i + size > end:
            raise MediaError("bad MP4 box size")
        yield btype, body, i + size
        i += size


def _bmff_find(blob: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _bmff_boxes(blob, start, end):
        if t == btype:
            return b, e
    return None


def probe_mp4(blob: bytes) -> dict:
    """Walk the ISO-BMFF box tree: mvhd -> duration, first video trak's
    tkhd -> display dimensions, its stts -> total sample (frame) count.
    Frames are NOT decoded (``frames: None``)."""
    if blob[4:8] != b"ftyp":
        raise MediaError("not an ISO-BMFF file")
    moov = _bmff_find(blob, 0, len(blob), b"moov")
    if moov is None:
        raise MediaError("no moov box")
    mvhd = _bmff_find(blob, moov[0], moov[1], b"mvhd")
    if mvhd is None:
        raise MediaError("no mvhd box")
    ver = blob[mvhd[0]]
    if ver == 1:
        timescale = int.from_bytes(blob[mvhd[0] + 20 : mvhd[0] + 24], "big")
        duration = int.from_bytes(blob[mvhd[0] + 24 : mvhd[0] + 32], "big")
    else:
        timescale = int.from_bytes(blob[mvhd[0] + 12 : mvhd[0] + 16], "big")
        duration = int.from_bytes(blob[mvhd[0] + 16 : mvhd[0] + 20], "big")
    if timescale == 0:
        raise MediaError("zero mvhd timescale")

    width = height = None
    n_frames = None
    for t, b, e in _bmff_boxes(blob, moov[0], moov[1]):
        if t != b"trak":
            continue
        tkhd = _bmff_find(blob, b, e, b"tkhd")
        if tkhd is None:
            continue
        toff = 88 if blob[tkhd[0]] == 1 else 76
        w = int.from_bytes(blob[tkhd[0] + toff : tkhd[0] + toff + 4], "big")
        h = int.from_bytes(
            blob[tkhd[0] + toff + 4 : tkhd[0] + toff + 8], "big"
        )
        if w == 0 or h == 0:
            continue  # non-visual track (audio/hint)
        width, height = w >> 16, h >> 16  # 16.16 fixed point
        mdia = _bmff_find(blob, b, e, b"mdia")
        if mdia:
            minf = _bmff_find(blob, mdia[0], mdia[1], b"minf")
            if minf:
                stbl = _bmff_find(blob, minf[0], minf[1], b"stbl")
                if stbl:
                    stts = _bmff_find(blob, stbl[0], stbl[1], b"stts")
                    if stts:
                        cnt = int.from_bytes(
                            blob[stts[0] + 4 : stts[0] + 8], "big"
                        )
                        total = 0
                        p = stts[0] + 8
                        for _ in range(cnt):
                            total += int.from_bytes(blob[p : p + 4], "big")
                            p += 8
                        n_frames = total
        break
    if width is None:
        raise MediaError("no video track")
    return {
        "kind": "video",
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "duration_s": duration / timescale,
        "frames": None,
    }


def encode_mp4_header(
    w: int, h: int, n_frames: int, timescale: int, duration: int
) -> bytes:
    """Header-ONLY MP4 (ftyp + moov with mvhd/trak/tkhd/mdia tree, no
    mdat) — a legal box tree for probe tests; not decodable video."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"  # version 0, flags: enabled|in-movie|preview
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, rsvd
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
    )
    stts = box(
        b"stts",
        b"\x00\x00\x00\x00"
        + struct.pack(">I", 1)
        + struct.pack(">II", n_frames, max(1, duration // max(1, n_frames))),
    )
    stbl = box(b"stbl", stts)
    minf = box(b"minf", stbl)
    mdhd = box(
        b"mdhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', predefined
    )
    mdia = box(b"mdia", mdhd + minf)
    moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
    return ftyp + moov


def probe_any(blob: bytes) -> dict | None:
    """Header-metadata probe for formats whose full decode is stubbed.
    Returns None when the payload is not a probeable container (the
    caller keeps its original error)."""
    try:
        if blob[:3] == b"\xff\xd8\xff":
            return probe_jpeg(blob)
        if blob[4:8] == b"ftyp":
            return probe_mp4(blob)
    except MediaError:
        return None
    return None


# ------------------------------------------------------------ dispatch


def decode_any(blob: bytes) -> dict:
    """Route a payload by magic to the right decoder. FAKE containers
    are handled by the caller (multimodal.decode_fake); real formats
    without a stdlib decoder raise NotImplementedError so they land in
    the error channel, not as a job failure."""
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return decode_wav(blob)
    if blob[:8] == _PNG_SIG:
        return decode_png(blob)
    if blob[:3] == b"\xff\xd8\xff":
        raise NotImplementedError("JPEG needs an external codec (PIL)")
    if blob[4:8] == b"ftyp":
        raise NotImplementedError("MP4 needs an external codec (ffmpeg)")
    raise MediaError("unrecognized media container")
