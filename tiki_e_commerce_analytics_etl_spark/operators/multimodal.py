"""Multimodal column plumbing for a training-data pipeline.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct.  Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages — the Spark-side contract (schema,
batch shape, partitioning) is real and tested.  The codec step behind
``decoder=`` has a real path (``real_decoder``: PIL for images when
installed, stdlib ``wave`` for WAV audio) that degrades to
NotImplementedError per media type when the codec is absent, and a
deterministic ``fake_decoder`` for plumbing tests without codecs.

Scale notes: binary payloads dominate row size, so
``repartition_for_payload`` sizes partitions by *bytes*, not rows,
before the decode stage — a 100 TB media corpus with default row-count
partitioning would OOM executors on skewed payload sizes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_decoder(payload: bytes, media_type: str) -> list[float]:
    """Deterministic stand-in for a real decode+embed step: an 8-dim
    'feature' derived from payload bytes.  Clearly NOT a real decoder —
    swap for one (PIL/torchaudio/ffmpeg) in production."""
    if payload is None:
        return [0.0] * 8
    return [float(sum(payload[i::8]) % 997) / 997.0 for i in range(8)]


def _riff_chunks(buf: bytes, off: int, end: int):
    """Yield (fourcc, data_start, size) for consecutive RIFF chunks;
    chunk payloads are padded to even sizes per the RIFF spec."""
    while off + 8 <= end:
        fourcc = bytes(buf[off : off + 4])
        size = int.from_bytes(buf[off + 4 : off + 8], "little")
        yield fourcc, off + 8, size
        off = off + 8 + size + (size & 1)


def avi_demux(payload: bytes) -> tuple[int, list[bytes]]:
    """Pure-Python RIFF/AVI container demux — NO codec involved: walks
    the chunk tree, reads ``avih``'s dwMicroSecPerFrame, and collects
    the video stream chunks (``NNdc`` compressed / ``NNdb``
    uncompressed; audio ``NNwb`` and text ``NNtx`` are skipped).
    Returns (usec_per_frame, [frame_payload, ...]) where each frame
    payload is the stream's ENCODED bytes (e.g. one MJPEG image) —
    decoding those remains codec-gated in ``real_decoder``.

    Raises NotImplementedError for anything that is not a RIFF/AVI
    container (the only video container this codec-less environment
    can honestly handle at the byte level).
    """
    if (
        payload is None
        or len(payload) < 12
        or bytes(payload[:4]) != b"RIFF"
        or bytes(payload[8:12]) != b"AVI "
    ):
        raise NotImplementedError(
            "video demux supports RIFF/AVI containers; other formats need "
            "ffmpeg-like tooling this environment lacks"
        )
    usec = 0
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal usec
        for fourcc, dstart, size in _riff_chunks(payload, start, end):
            dend = min(dstart + size, len(payload))
            if fourcc == b"LIST":
                walk(dstart + 4, dend)  # descend hdrl/strl/movi alike
            elif fourcc == b"avih" and size >= 4:
                usec = int.from_bytes(payload[dstart : dstart + 4], "little")
            elif len(fourcc) == 4 and fourcc[2:4] in (b"dc", b"db"):
                frames.append(bytes(payload[dstart:dend]))

    walk(12, min(12 + int.from_bytes(payload[4:8], "little") - 4, len(payload)))
    return (usec or 33333, frames)


def avi_mux(frames: list[bytes], usec_per_frame: int = 40000) -> bytes:
    """Inverse of ``avi_demux``: build a minimal valid RIFF/AVI from
    encoded frame payloads (hdrl LIST with a 56-byte ``avih`` carrying
    dwMicroSecPerFrame, movi LIST of ``00dc`` chunks, RIFF even-size
    padding).  Round-trips through ``avi_demux`` byte-exactly — used
    by tests and the avi_frame_sample oracle query to synthesize
    container payloads deterministically."""

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + len(data).to_bytes(4, "little") + data + pad

    avih = int(usec_per_frame).to_bytes(4, "little") + b"\x00" * 52
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def text_to_avi_udf(n_frames: int = 4, usec_per_frame: int = 40000):
    """Vectorized (Arrow) column builder: UTF-8 text → a valid
    RIFF/AVI whose ``n_frames`` encoded frames are equal-stride slices
    of the text bytes (step = max(len // n_frames, 1), empty slices
    dropped, tail bytes beyond n_frames*step unframed).  The slice
    arithmetic is deliberately SQL-reproducible so the
    avi_frame_sample oracle can predict frame counts/sizes without
    parsing containers."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def to_avi(texts: pd.Series) -> pd.Series:
        def build(t) -> bytes:
            b = (t or "").encode("utf-8")
            step = max(len(b) // n_frames, 1)
            frames = [b[i * step : (i + 1) * step] for i in range(n_frames)]
            return avi_mux([f for f in frames if f], usec_per_frame=usec_per_frame)

        return texts.map(build)

    return to_avi


def avi_frame_sampler(payload: bytes, every_ms: int) -> list[bytes]:
    """Real container-level frame sampling for ``frame_sample``: demux
    the AVI, keep every k-th video chunk where k matches the requested
    sampling interval against the container's own frame rate.  The
    returned frames are still ENCODED bytes — real data, no codec."""
    usec, frames = avi_demux(payload)
    stride = max(1, round((every_ms * 1000) / max(usec, 1)))
    return frames[::stride]


def real_decoder(payload: bytes, media_type: str) -> list[float]:
    """Real decode path with optional codecs: PIL for images (when
    installed), stdlib ``wave`` for WAV audio (always available), and
    the pure-Python RIFF/AVI container demux for video (container
    features are real; per-frame PIXEL decode stays codec-gated).
    Produces a deterministic 8-dim summary feature.  Raises
    NotImplementedError only when the bytes need a codec this
    environment lacks (no PIL → images unavailable; non-AVI video
    containers) — pass ``decoder=fake_decoder`` to exercise the
    plumbing without codecs."""
    if payload is None:
        return [0.0] * 8
    if media_type == "image":
        try:
            from PIL import Image  # optional dependency
        except ImportError as exc:
            raise NotImplementedError(
                "image decoding requires pillow; pass decoder=fake_decoder "
                "for plumbing tests"
            ) from exc
        import io as _io

        import numpy as np

        img = Image.open(_io.BytesIO(payload)).convert("L")
        a = np.asarray(img, dtype=np.float64) / 255.0
        h, w = a.shape
        return [
            float(w) / 4096.0,
            float(h) / 4096.0,
            float(a.mean()),
            float(a.std()),
            float(a[: max(1, h // 2), :].mean()),
            float(a[h // 2 :, :].mean()) if h > 1 else float(a.mean()),
            float(a[:, : max(1, w // 2)].mean()),
            float(a[:, w // 2 :].mean()) if w > 1 else float(a.mean()),
        ]
    if media_type == "audio":
        import io as _io
        import wave as _wave

        import numpy as np

        try:
            with _wave.open(_io.BytesIO(payload), "rb") as wav:
                n_channels = wav.getnchannels()
                sampwidth = wav.getsampwidth()
                framerate = wav.getframerate()
                n_frames = wav.getnframes()
                raw = wav.readframes(n_frames)
        except (_wave.Error, EOFError) as exc:
            raise NotImplementedError(
                "audio decoding supports WAV via stdlib wave; other codecs "
                "need soundfile/torchaudio"
            ) from exc
        # WAV PCM: 8-bit samples are UNSIGNED (centered at 128); wider
        # widths are signed little-endian.
        if sampwidth == 1:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif sampwidth in (2, 4):
            dtype = np.int16 if sampwidth == 2 else np.int32
            x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
            x = x / float(2 ** (8 * sampwidth - 1))
        else:
            raise NotImplementedError(f"unsupported WAV sample width {sampwidth}")
        if x.size == 0:
            x = np.zeros(1)
        zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if x.size > 1 else 0.0
        return [
            float(n_channels),
            float(sampwidth),
            float(framerate) / 48000.0,
            float(n_frames) / max(framerate, 1),  # duration seconds
            float(np.abs(x).mean()),
            float(np.sqrt((x * x).mean())),
            float(np.abs(x).max()),
            zc,
        ]
    if media_type == "video":
        # Container-level features from the pure-Python AVI demux —
        # real byte-level work, no codec: frame count, rate, duration,
        # and the encoded-frame size profile.  Pixel-level decode of
        # the per-frame payloads (MJPEG etc.) would need PIL/ffmpeg;
        # avi_demux raises NotImplementedError for non-AVI containers.
        usec, frames = avi_demux(payload)
        sizes = [len(fr) for fr in frames] or [0]
        n = len(frames)
        return [
            float(n),
            float(usec) / 1e6,
            float(n) * usec / 1e6,  # duration seconds
            float(sum(sizes)) / (1 << 20),
            float(sum(sizes)) / len(sizes) / 4096.0,
            float(min(sizes)) / 4096.0,
            float(max(sizes)) / 4096.0,
            1.0,
        ]
    raise NotImplementedError(
        f"no codec available for media_type={media_type!r}; "
        "pass decoder=fake_decoder for plumbing tests"
    )


def repartition_for_payload(
    df: DataFrame,
    target_partition_bytes: int = 128 << 20,
    total_payload_bytes: int | None = None,
) -> DataFrame:
    """Repartition so each task holds ~target_partition_bytes of
    payload.

    The size estimate costs NO data pass: pass ``total_payload_bytes``
    when known (catalog stats / manifest), else the source files'
    on-disk sizes are summed driver-side (``df.inputFiles()`` is
    metadata-only).  File size is compressed bytes — an underestimate
    of in-memory payload — but binary media payloads barely compress,
    so it lands within a small factor, and the target is a sizing
    heuristic, not a correctness bound."""
    import os
    from urllib.parse import urlparse

    total = total_payload_bytes
    if total is None:
        total = 0
        for uri in df.inputFiles():
            p = urlparse(uri)
            path = p.path if p.scheme in ("file", "") else None
            if path and os.path.exists(path):
                total += os.path.getsize(path)
        if total == 0:
            # Remote storage (s3://, hdfs://) or a derived DataFrame
            # with no input files: no size information is available
            # driver-side.  Returning df UNCHANGED is the safe move —
            # a blind repartition(1) would funnel the whole payload
            # dataset into one task, the exact OOM this helper exists
            # to prevent.  Pass total_payload_bytes (catalog stats /
            # manifest) to get byte-aware sizing in that regime.
            import warnings

            warnings.warn(
                "repartition_for_payload: no local size info for input "
                "files; leaving partitioning unchanged — pass "
                "total_payload_bytes for byte-aware sizing",
                stacklevel=2,
            )
            return df
    n = max(1, int(total / target_partition_bytes) + 1)
    return df.repartition(n)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = real_decoder,
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode+featurize each media row via Arrow-batched mapInPandas.

    The decoder runs once per row inside a pandas batch — Arrow moves
    the binary payloads to Python in columnar blocks rather than
    per-row pickling.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p if p is None or isinstance(p, bytes) else bytes(p), mt)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    media: DataFrame,
    width: int = 224,
    height: int = 224,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize stage: (media_id, payload, meta) → resized payload
    with updated meta dims.  ``resizer`` is the stubbed codec step (no
    image libraries in this container) — the default deterministic fake
    scales the byte length proportionally to the pixel-count change so
    batch/schema/meta plumbing is exercised for real; swap in a
    PIL/opencv-backed callable in production.
    """

    def default_resizer(payload: bytes, w: int, h: int) -> bytes:
        if not payload:
            return b""
        # Deterministic stand-in: repeat/truncate to a size proportional
        # to the target pixel count (clearly NOT a real resampler).
        target = max(1, min(len(payload), (w * h) // 224))
        reps = (target // len(payload)) + 1
        return (payload * reps)[:target]

    do_resize = resizer or default_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            out_meta = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                raw = p if p is None or isinstance(p, bytes) else bytes(p)
                resized = None if raw is None else do_resize(raw, width, height)
                out_payloads.append(resized)
                meta = dict(m) if m is not None else {"mime": None, "duration_ms": None}
                meta["width"], meta["height"] = width, height
                out_meta.append(
                    (meta.get("mime"), width, height, meta.get("duration_ms"))
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": out_payloads,
                    "meta": out_meta,
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(run, MEDIA_SCHEMA)


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
    sampler: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video → sampled frame rows (media_id, frame_idx, frame binary).
    ``sampler`` is the stubbed codec step; the default deterministic
    fake slices the payload so the explode/bookkeeping plumbing is
    exercised for real."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def default_sampler(payload: bytes, every: int) -> list[bytes]:
        if not payload:
            return []
        n = max(1, min(8, len(payload) // 16))
        step = max(1, len(payload) // n)
        return [payload[i * step : (i + 1) * step] for i in range(n)]

    sample = sampler or default_sampler

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[Any] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = p if p is None or isinstance(p, bytes) else bytes(p)
                for i, fr in enumerate(sample(raw, every_ms)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.filter(F.col("media_type") == "video").mapInPandas(run, out_schema)
