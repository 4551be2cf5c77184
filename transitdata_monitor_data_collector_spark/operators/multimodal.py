"""Multimodal column plumbing (charter extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas pipelines over ``mapInPandas``. The Spark-side
plumbing — schemas, batch iteration, partitioning — is real and tested;
the *codec* itself is stubbed: this container has no image/audio libraries,
so payloads use a deterministic FAKE container format (``FAKEIMG``/
``FAKEAUD`` header + dimensions + body bytes) and ``decode_with_library``
raises ``NotImplementedError`` with the PIL/librosa integration point
clearly marked. Swapping the stub for a real codec changes ONE function;
every schema, UDF signature, and batch shape stays identical.

Scale notes (100 TB of media):
- payloads never leave the executor: decode/feature steps are narrow
  mapInPandas stages, Arrow-batched, no shuffle;
- ``spark.sql.files.maxPartitionBytes`` governs split sizing for large
  binary files; metadata-only queries prune the payload column at the
  parquet scan (columnar projection — verified in tests).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "IMAGE_MAGIC",
    "AUDIO_MAGIC",
    "MEDIA_SCHEMA",
    "IMAGE_META_SCHEMA",
    "FRAME_SAMPLE_SCHEMA",
    "fake_image_payload",
    "synthesize_image_payloads",
    "decode_image_meta",
    "resize_meta",
    "sample_frames",
    "decode_with_library",
]

IMAGE_MAGIC = b"FAKEIMG\x00"
AUDIO_MAGIC = b"FAKEAUD\x00"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_offset_bytes", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def fake_image_payload(doc_id: int, body: bytes) -> bytes:
    """Deterministic stand-in for an encoded image: magic + (w, h) header
    + body. Dimensions derive from doc_id so an external oracle can verify
    the decode without running it."""
    w = 16 + doc_id % 64
    h = 16 + doc_id % 48
    return IMAGE_MAGIC + struct.pack(">II", w, h) + body


def decode_with_library(payload: bytes):  # pragma: no cover - stub
    """REAL-CODEC INTEGRATION POINT. With PIL installed this becomes
    ``Image.open(io.BytesIO(payload))``; librosa/torchaudio for AUDIO_MAGIC
    payloads. Not available in this container."""
    raise NotImplementedError(
        "no image/audio codec available in this environment; the pipeline "
        "uses the deterministic FAKE container format instead"
    )


def _parse_header(payload: bytes) -> tuple[int | None, int | None, bytes]:
    if payload is None or not payload.startswith(IMAGE_MAGIC):
        return None, None, b""
    w, h = struct.unpack(">II", payload[len(IMAGE_MAGIC) : len(IMAGE_MAGIC) + 8])
    return w, h, payload[len(IMAGE_MAGIC) + 8 :]


def synthesize_image_payloads(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents -> MEDIA_SCHEMA rows with fake encoded-image payloads
    (test/bench corpus; a real pipeline reads payloads from the lake)."""
    import pandas as pd

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": "image",
                    "payload": [
                        fake_image_payload(int(i), t.encode("utf-8"))
                        for i, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )
            yield out

    return docs.select(id_col, text_col).mapInPandas(build, MEDIA_SCHEMA)


def decode_image_meta(media: DataFrame) -> DataFrame:
    """Decode step (stubbed codec): parse header, compute pixel count and
    body statistics. Arrow-batched; one pass over payload bytes; no
    shuffle."""
    import numpy as np
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, body = _parse_header(payload)
                if w is None:
                    rows.append((int(doc_id), None, None, None, None, None))
                    continue
                arr = np.frombuffer(body, dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        int(w) * int(h),
                        len(payload),
                        round(float(arr.mean()), 6) if arr.size else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return media.mapInPandas(decode, IMAGE_META_SCHEMA)


def resize_meta(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize step (stubbed codec): recompute target dimensions with
    aspect-ratio-preserving clamp and rewrite the header — the byte-level
    transform a real resizer would do, minus pixel resampling."""
    import pandas as pd

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                w, h, body = _parse_header(payload)
                if w is None:
                    payloads.append(None)
                    continue
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                # REAL CODEC would resample `body` here (PIL Image.resize)
                payloads.append(IMAGE_MAGIC + struct.pack(">II", nw, nh) + body)
            out = pdf.copy()
            out["payload"] = payloads
            yield out

    return media.mapInPandas(resize, MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, stride: int = 4
) -> DataFrame:
    """Frame-sampling step (video analog): emit every ``stride``-th
    fixed-size chunk of the body as a 'frame' row — the fan-out shape
    (one row in, N frame rows out) of a real video sampler."""
    import pandas as pd

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, body = _parse_header(payload)
                n_frames = len(body) // frame_bytes
                for k in range(0, n_frames, stride):
                    off = k * frame_bytes
                    rows.append(
                        (int(doc_id), k, off, body[off : off + frame_bytes])
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields]
            )

    return media.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def extract_features(media: DataFrame, n_bins: int = 64) -> DataFrame:
    """Feature extraction over binary payloads: an L1-normalized byte
    histogram of the body (256 byte values folded into ``n_bins`` bins).

    Unlike the codec this is NOT a stub — a byte histogram is a real
    (if simple) content feature, fully computable without media
    libraries, and deterministic. The output ``array<double>`` plugs
    straight into the embedding operators (cosine top-k / near-dup in
    operators/similarity.py), giving the multimodal near-dup path:
    payload -> feature -> LSH/cosine. A real deployment swaps the
    histogram for a CLIP/audio embedding inside the same mapInPandas
    stage — schema and partitioning are unchanged.

    Narrow Arrow-batched stage, numpy-vectorized per batch (one
    ``bincount`` per payload), no shuffle.
    """
    import numpy as np
    import pandas as pd

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_ids, out_feats = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, body = _parse_header(payload)
                out_ids.append(int(doc_id))
                if body is None or len(body) == 0:
                    out_feats.append(None)
                    continue
                arr = np.frombuffer(body, dtype=np.uint8)
                hist = np.bincount(arr % n_bins, minlength=n_bins).astype(
                    np.float64
                )
                out_feats.append((hist / hist.sum()).tolist())
            yield pd.DataFrame({"doc_id": out_ids, "feature": out_feats})

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio modality: same opaque-binary discipline as images — FAKEAUD header
# (sample rate + sample count) + signed-8-bit PCM body. The "decoder" parses
# the container and the DSP (frame RMS) runs on real bytes; a real codec
# (librosa/torchaudio) swaps in at decode_with_library, nothing else moves.

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_index", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("rms_micro", T.LongType(), True),
    ]
)


def fake_audio_payload(doc_id: int, body: bytes) -> bytes:
    """Deterministic stand-in for encoded audio: magic + (rate, n) header +
    signed-8-bit PCM where sample_i = body_byte_i - 128. Rate derives from
    doc_id so metadata decode is externally verifiable."""
    rate = 8000 + (doc_id % 8) * 1000
    return AUDIO_MAGIC + struct.pack(">II", rate, len(body)) + body


def _parse_audio_header(payload: bytes) -> tuple[int | None, int | None, bytes]:
    if payload is None or not payload.startswith(AUDIO_MAGIC):
        return None, None, b""
    off = len(AUDIO_MAGIC)
    rate, n = struct.unpack(">II", payload[off : off + 8])
    return rate, n, payload[off + 8 :]


def synthesize_audio_payloads(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents -> MEDIA_SCHEMA rows with fake encoded-audio payloads."""
    import pandas as pd

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": "audio",
                    "payload": [
                        fake_audio_payload(int(i), t.encode("utf-8"))
                        for i, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(build, MEDIA_SCHEMA)


def decode_audio_meta(media: DataFrame) -> DataFrame:
    """Metadata decode for audio payloads: container header only, no body
    scan — the cheap pre-filter pass before any DSP."""
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, n, _ = _parse_audio_header(payload)
                if rate is None:
                    rows.append((int(doc_id), None, None, None))
                else:
                    rows.append(
                        (int(doc_id), rate, n, (n * 1000) // rate)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
            )

    return media.mapInPandas(decode, AUDIO_META_SCHEMA)


def audio_frame_energy(media: DataFrame, frame: int = 256) -> DataFrame:
    """Per-frame RMS energy over the PCM body (the VAD / silence-trim
    primitive). Real DSP on real bytes: sum-of-squares per ``frame``-sample
    window via one numpy ``add.reduceat`` per payload, rms =
    sqrt(ss/n) micro-quantized so an external oracle can reproduce it
    bit-for-bit (integer sums; sqrt and divide are correctly-rounded IEEE
    ops). Narrow Arrow-batched stage, no shuffle; the fan-out is bounded
    by n_samples/frame rows per payload."""
    import math

    import numpy as np
    import pandas as pd

    def energize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, body = _parse_audio_header(payload)
                if not body:
                    continue
                s = np.frombuffer(body, dtype=np.uint8).astype(np.int64) - 128
                sq = s * s
                bounds = np.arange(0, len(s), frame)
                ss = np.add.reduceat(sq, bounds)
                for k, ssk in enumerate(ss):
                    n_k = min(frame, len(s) - k * frame)
                    rms = math.sqrt(float(ssk) / n_k)
                    rows.append(
                        (
                            int(doc_id),
                            k,
                            n_k,
                            int(math.floor(rms * 1e6 + 0.5)),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_ENERGY_SCHEMA.fields]
            )

    return media.mapInPandas(energize, FRAME_ENERGY_SCHEMA)


ZCR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_index", T.LongType(), False),
        T.StructField("n_pairs", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def audio_zero_crossings(media: DataFrame, frame: int = 256) -> DataFrame:
    """Per-frame zero-crossing count over the PCM body — the OTHER classic
    VAD feature beside RMS energy (audio_frame_energy): voiced speech has
    low ZCR + high energy, fricatives/noise high ZCR, silence low both.
    A crossing is a sign flip (negative vs non-negative) between
    consecutive samples WITHIN the frame, so the count is a pure integer
    an external oracle reproduces exactly. Same narrow Arrow-batched
    mapInPandas shape as the energy pass."""
    import numpy as np
    import pandas as pd

    def zcr(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, body = _parse_audio_header(payload)
                if not body:
                    continue
                s = np.frombuffer(body, dtype=np.uint8).astype(np.int64) - 128
                neg = s < 0
                for k in range(0, (len(s) + frame - 1) // frame):
                    seg = neg[k * frame : (k + 1) * frame]
                    n_pairs = max(len(seg) - 1, 0)
                    zc = int(np.count_nonzero(seg[1:] != seg[:-1]))
                    rows.append((int(doc_id), k, n_pairs, zc))
            yield pd.DataFrame(
                rows, columns=[f.name for f in ZCR_SCHEMA.fields]
            )

    return media.mapInPandas(zcr, ZCR_SCHEMA)


__all__ += [
    "AUDIO_META_SCHEMA",
    "FRAME_ENERGY_SCHEMA",
    "fake_audio_payload",
    "synthesize_audio_payloads",
    "decode_audio_meta",
    "audio_frame_energy",
    "ZCR_SCHEMA",
    "audio_zero_crossings",
]


# ---------------------------------------------------------------------------
# Perceptual average-hash (aHash) over image payloads. With a real codec the
# 64 cells would be the 8x8 block means of the decoded, downsampled
# grayscale raster (decode_with_library swap point); over the FAKE container
# they are 64 equal spans of the body byte stream — the thresholding,
# banding, and hamming machinery is the production article either way.
# ---------------------------------------------------------------------------

AHASH_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("band_i", T.IntegerType(), False),
        T.StructField("band_v", T.LongType(), False),
    ]
)

_AHASH_CELLS = 64
_AHASH_BAND_BITS = 16


def image_ahash_bands(media: DataFrame) -> DataFrame:
    """64-bit average-hash per image payload, emitted as 4 x 16-bit band
    integers (the LSH join keys; hamming distance re-assembles from
    bit_count over band xors, so no engine ever shifts into bit 63).

    bit_k = mean(cell_k) > mean(all) evaluated as the EXACT integer
    cross-multiplication sum_k * n_total > total_sum * n_k — the whole
    signature is integer arithmetic, bit-reproducible by any engine.
    Payloads shorter than 64 body bytes are skipped (no 8x8 raster).
    """
    import numpy as np
    import pandas as pd

    def sign(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, body = _parse_header(payload)
                n = len(body)
                if n < _AHASH_CELLS:
                    continue
                v = np.frombuffer(body, dtype=np.uint8).astype(np.int64)
                k = (np.arange(n, dtype=np.int64) * _AHASH_CELLS) // n
                sums = np.bincount(k, weights=v, minlength=_AHASH_CELLS)
                sums = sums.astype(np.int64)  # bincount weights are float64;
                # exact for sums < 2^53 (255 * len(body) is far below)
                counts = np.bincount(k, minlength=_AHASH_CELLS)
                total = int(v.sum())
                bits = (sums * n) > (total * counts)
                for b in range(_AHASH_CELLS // _AHASH_BAND_BITS):
                    band = 0
                    for j in range(_AHASH_BAND_BITS):
                        if bits[b * _AHASH_BAND_BITS + j]:
                            band |= 1 << j
                    rows.append((int(doc_id), b, band))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AHASH_BANDS_SCHEMA.fields]
            )

    return media.mapInPandas(sign, AHASH_BANDS_SCHEMA)


FRAME_SUM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("byte_sum", T.LongType(), False),
    ]
)


def frame_byte_sums(frames: DataFrame) -> DataFrame:
    """Per-frame byte sums over sampled frame rows — the integer-exact
    luminance proxy the scene-cut detector differences (with a real
    codec this is the decoded frame's pixel sum; the byte sum over the
    fake container is the same arithmetic on the same plumbing)."""
    import numpy as np
    import pandas as pd

    def sums(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [
                (
                    int(d),
                    int(i),
                    int(np.frombuffer(fr, dtype=np.uint8).astype(np.int64).sum()),
                )
                for d, i, fr in zip(
                    pdf["doc_id"], pdf["frame_index"], pdf["frame"]
                )
                if fr is not None
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SUM_SCHEMA.fields]
            )

    return frames.mapInPandas(sums, FRAME_SUM_SCHEMA)
