"""Minimal pure-Python PNG codec (RFC 2083 / ISO 15948) over stdlib
``zlib``.

Completes the round-6 "un-skip the gated decode paths" push: the
image branch of :func:`.multimodal.real_decoder` was PIL-gated, so
its value test could never run in the driver environment.  PNG is
honestly decodable without a codec library — the only compression is
DEFLATE, which Python ships (``zlib``) — so this module implements
the container: chunk walk (IHDR/PLTE/IDAT/IEND, CRC-verified by
``zlib.crc32``), scanline unfiltering (filter types 0-4 incl. the
Paeth predictor), and gray conversion with the same ITU-R 601 weights
the JPEG path uses.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), interlace 0.  Valid-but-unsupported
encodings (16-bit, Adam7 interlace, 1/2/4-bit depths) raise
NotImplementedError; malformed bytes raise ValueError.

The encoder (gray, filter 0) exists to build deterministic fixtures:
pixel values are chosen by the test, so expected statistics are
arithmetic — no decoder circularity.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def decode(data: bytes) -> np.ndarray:
    """Decode a PNG to a uint8 GRAYSCALE (h, w) array (601 luma for
    color inputs; alpha is ignored — stats describe the pixels)."""
    if data is None or len(data) < len(_SIG) + 12 or not bytes(data).startswith(_SIG):
        raise ValueError("not a PNG (missing signature)")
    pos = len(_SIG)
    width = height = 0
    bit_depth = color_type = interlace = 0
    palette: np.ndarray | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width == 0 or height == 0:
        raise ValueError("PNG missing IHDR")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if bit_depth != 8:
        raise NotImplementedError(f"only 8-bit PNG supported, got {bit_depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"invalid PNG color type {color_type}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError("corrupt PNG IDAT stream") from exc
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int64)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth need the in-progress row — sequential
            # per-pixel, but rows are short and this is a fixture codec
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        rgb = palette[px[:, :, 0]].astype(np.int64)
        y601 = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114 + 500) // 1000
    elif color_type in (0, 4):
        y601 = px[:, :, 0].astype(np.int64)
    else:  # 2 or 6: RGB(A)
        rgb = px[:, :, :3].astype(np.int64)
        y601 = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114 + 500) // 1000
    return np.clip(y601, 0, 255).astype(np.uint8)


def encode_gray(pixels: np.ndarray) -> bytes:
    """Encode a uint8 (h, w) grayscale array as a filter-0 PNG — the
    fixture twin of :func:`decode` (round-trips bit-exactly: DEFLATE
    is lossless)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2 or px.size == 0:
        raise ValueError("encode_gray needs a non-empty 2-D uint8 array")
    h, w = px.shape

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )
