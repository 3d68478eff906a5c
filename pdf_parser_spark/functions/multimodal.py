"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched stages.

Decode routes by magic: REAL codecs for BMP / WAV / PNG
(kernels/media_codecs.py — stdlib-only, no PIL/ffmpeg needed), the
deterministic ``FAKE`` container for synth/test payloads, and
NotImplementedError into the per-row error channel for formats that do
need an external codec (JPEG, MP4). Everything Spark-side — schemas,
partition strategy, UDF signatures, Arrow batch shape, error rows — is
the same for all containers.

FAKE container layout (little-endian):
    b'FAKE' | kind u8 (0=image 1=audio 2=video) | meta...
    image: width u16, height u16, channels u8, pixels u8[w*h*c]
    audio: sample_rate u32, n_samples u32, samples i16[n]
    video: width u16, height u16, n_frames u16, frames u8[w*h*n]
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, width int, height int, channels int, "
    "n_frames int, sample_rate int, duration_s double, "
    "mean_intensity double, feature_vec array<float>, error string"
)

_KINDS = {0: "image", 1: "audio", 2: "video"}


def decode_media(blob: bytes) -> dict:
    """Decode any supported container: FAKE (synth), or real BMP / WAV /
    PNG via the stdlib codecs. Unsupported real formats raise
    NotImplementedError — callers map that to an error row, keeping the
    job alive (same error-channel contract as the document pipeline)."""
    if blob[:4] == b"FAKE":
        return decode_fake(blob)
    from ..kernels.media_codecs import decode_any

    d = decode_any(blob)
    if d["kind"] == "audio":
        return {
            "kind": "audio",
            "sample_rate": d["sample_rate"],
            "samples": d["samples"],
        }
    return d


def decode_fake(blob: bytes) -> dict:
    """Deterministic decode of the FAKE container (synth/test payloads)."""
    if blob[:4] != b"FAKE":
        raise NotImplementedError("not a FAKE container")
    kind = _KINDS.get(blob[4], "unknown")
    off = 5
    if kind == "image":
        w, h = struct.unpack_from("<HH", blob, off)
        c = blob[off + 4]
        px = np.frombuffer(blob, np.uint8, w * h * c, off + 5).reshape(h, w, c)
        return {"kind": kind, "width": w, "height": h, "channels": c, "pixels": px}
    if kind == "audio":
        sr, n = struct.unpack_from("<II", blob, off)
        samples = np.frombuffer(blob, np.int16, n, off + 8)
        return {"kind": kind, "sample_rate": sr, "samples": samples}
    if kind == "video":
        w, h, nf = struct.unpack_from("<HHH", blob, off)
        frames = np.frombuffer(blob, np.uint8, w * h * nf, off + 6).reshape(nf, h, w)
        return {"kind": kind, "width": w, "height": h, "frames": frames}
    raise NotImplementedError(f"unknown media kind byte {blob[4]}")


def encode_fake_image(w: int, h: int, c: int, seed: int) -> bytes:
    rng = np.random.Generator(np.random.PCG64(seed))
    px = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    return b"FAKE\x00" + struct.pack("<HH", w, h) + bytes([c]) + px.tobytes()


def encode_fake_audio(sr: int, n: int, seed: int) -> bytes:
    rng = np.random.Generator(np.random.PCG64(seed))
    s = rng.integers(-(2**15), 2**15, n, dtype=np.int16)
    return b"FAKE\x01" + struct.pack("<II", sr, n) + s.tobytes()


def encode_fake_video(w: int, h: int, nf: int, seed: int) -> bytes:
    rng = np.random.Generator(np.random.PCG64(seed))
    f = rng.integers(0, 256, (nf, h, w), dtype=np.uint8)
    return b"FAKE\x02" + struct.pack("<HHH", w, h, nf) + f.tobytes()


def build_demo_media(n: int = 24) -> list[tuple[int, bytes]]:
    """Deterministic mixed-container media set for the contract query
    and its oracle generator: FAKE image/audio/video, real BMP/WAV/PNG,
    plus two rows that exercise the error channel (JPEG magic with no
    codec; garbage bytes). Same id -> same payload, always."""
    from ..kernels import media_codecs as mc

    rows: list[tuple[int, bytes]] = []
    for i in range(n):
        kind = i % 6
        if kind == 0:
            rows.append((i, encode_fake_image(16 + i, 12, (i % 3) + 1, i)))
        elif kind == 1:
            rows.append((i, encode_fake_audio(8000, 1000 + i, i)))
        elif kind == 2:
            rows.append((i, encode_fake_video(8, 6, 5 + (i % 4), i)))
        elif kind == 3:
            rng = np.random.Generator(np.random.PCG64([91, i]))
            px = rng.integers(
                0, 256, (10 + i % 5, 7 + i % 3, 3), dtype=np.uint8
            )
            rows.append((i, mc.encode_bmp(px)))
        elif kind == 4:
            rng = np.random.Generator(np.random.PCG64([92, i]))
            s = rng.integers(-30000, 30000, 500 + i, dtype=np.int16)
            rows.append((i, mc.encode_wav(s, 16000)))
        else:
            rng = np.random.Generator(np.random.PCG64([93, i]))
            px = rng.integers(0, 256, (9, 11, (i % 4) + 1), dtype=np.uint8)
            rows.append((i, mc.encode_png(px)))
    rows.append((n, b"\xff\xd8\xff\xe0no-jpeg-codec-here"))
    rows.append((n + 1, b"not-a-container-at-all"))
    # header-probeable stubs: real JFIF/BMFF structure, no pixel data —
    # metadata columns fill, error_class = decode_stubbed
    rows.append((n + 2, mc.encode_jpeg_header(640, 480, 3)))
    rows.append((n + 3, mc.encode_mp4_header(1280, 720, 300, 600, 6000)))
    return rows


def _featurize_one(media_id: int, blob: bytes) -> dict:
    out = {
        "media_id": media_id, "kind": None, "width": None, "height": None,
        "channels": None, "n_frames": None, "sample_rate": None,
        "duration_s": None, "mean_intensity": None, "feature_vec": None,
        "error": None,
    }
    try:
        d = decode_media(blob)
    except NotImplementedError as e:
        # full decode is stubbed for this container — but if its header
        # metadata is probeable (JPEG SOF / MP4 box tree), surface the
        # real typed metadata and mark only the decode as stubbed
        from ..kernels.media_codecs import probe_any

        p = probe_any(blob)
        if p is None:
            out["error"] = f"no_codec: {str(e)[:80]}"
            return out
        out["kind"] = p["kind"]
        for k in ("width", "height", "channels", "n_frames", "duration_s"):
            if p.get(k) is not None:
                out[k] = p[k]
        out["error"] = f"decode_stubbed: {str(e)[:80]}"
        return out
    except Exception as e:
        out["error"] = f"bad_media: {str(e)[:80]}"
        return out
    out["kind"] = d["kind"]
    if d["kind"] == "image":
        px = d["pixels"]
        out.update(width=d["width"], height=d["height"], channels=d["channels"])
        out["mean_intensity"] = float(px.mean())
        # 16-bin intensity histogram as the stand-in embedding
        hist, _ = np.histogram(px, bins=16, range=(0, 256))
        out["feature_vec"] = (hist / max(1, px.size)).astype(np.float32).tolist()
    elif d["kind"] == "audio":
        s = d["samples"].astype(np.float64)
        out["sample_rate"] = int(d["sample_rate"])
        out["duration_s"] = float(len(s) / d["sample_rate"])
        out["mean_intensity"] = float(np.abs(s).mean())
        # 8-band energy profile over equal time slices
        bands = np.array_split(s, 8)
        out["feature_vec"] = [
            float(np.sqrt((b**2).mean()) / 2**15) for b in bands
        ]
    elif d["kind"] == "video":
        frames = d["frames"]
        out.update(width=d["width"], height=d["height"], n_frames=len(frames))
        # frame sampling: every 2nd frame, mean intensity per sampled frame
        sampled = frames[::2]
        out["mean_intensity"] = float(sampled.mean())
        out["feature_vec"] = [float(f.mean() / 255.0) for f in sampled[:16]]
    return out


def featurize_media(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> typed features. mapInPandas over Arrow
    batches; per-row failures land in the error column. Partitioning:
    media blobs are fat rows — the caller applies the same salted
    repartition + small-Arrow-batch regime as the document pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    _featurize_one(
                        int(i), bytes(b) if b is not None else b""
                    )
                    for i, b in zip(pdf["media_id"], pdf["payload"])
                ]
            )

    return df.select("media_id", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )
