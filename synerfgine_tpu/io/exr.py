"""Minimal OpenEXR scanline reader (NONE/ZIPS/ZIP compression, half/float).

The reference links tinyexr (src/tinyexr_wrapper.cu) to load EXR training
images such as data/image/albert.exr. No EXR library ships in this
environment, so this is a from-scratch decoder of the subset we need:
single-part scanline files, ZIP (deflate) compressed in 16-line blocks with
the OpenEXR byte-delta + two-half deinterleave predictor, HALF/FLOAT/UINT
channels.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 0x01312F76
_PIXTYPE_DTYPE = {0: np.uint32, 1: np.float16, 2: np.float32}


def _read_cstr(buf: bytes, off: int) -> tuple[str, int]:
    end = buf.index(b"\x00", off)
    return buf[off:end].decode("ascii"), end + 1


def _parse_channels(data: bytes):
    chans = []
    off = 0
    while data[off] != 0:
        name, off = _read_cstr(data, off)
        pix_type, _p_linear = struct.unpack_from("<iB", data, off)
        off += 4 + 4  # pixel type + pLinear+reserved
        xs, ys = struct.unpack_from("<ii", data, off)
        off += 8
        chans.append((name, pix_type, xs, ys))
    return chans


def _unpredict_zip(raw: bytes) -> np.ndarray:
    """OpenEXR ZIP post-decompress reconstruction: running byte delta then
    deinterleave from two halves."""
    d = np.frombuffer(raw, np.uint8).astype(np.int64)
    # running reconstruction: out[0] = d[0]; out[i] = out[i-1] + d[i] - 128
    out = (np.cumsum(np.concatenate([d[:1], d[1:] - 128])) % 256).astype(np.uint8)
    n = len(out)
    half = (n + 1) // 2
    inter = np.empty(n, np.uint8)
    inter[0::2] = out[:half]
    inter[1::2] = out[half : half + n // 2]
    return inter


def read_exr(path: str) -> tuple[np.ndarray, list[str]]:
    """Returns (H, W, C) float32 array and channel names (sorted R,G,B,A
    order when present, else alphabetical as stored)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _MAGIC:
        raise ValueError(f"{path}: not an EXR file")
    if version & 0x200:
        raise NotImplementedError("tiled EXR not supported")

    off = 8
    attrs = {}
    while True:
        name, off = _read_cstr(buf, off)
        if not name:
            break
        _typ, off = _read_cstr(buf, off)
        size = struct.unpack_from("<i", buf, off)[0]
        off += 4
        attrs[name] = buf[off : off + size]
        off += size

    chans = _parse_channels(attrs["channels"])
    compression = attrs["compression"][0]
    x0, y0, x1, y1 = struct.unpack("<4i", attrs["dataWindow"])
    width = x1 - x0 + 1
    height = y1 - y0 + 1

    if compression == 0:
        lines_per_block = 1
    elif compression in (2, 3):  # ZIPS, ZIP
        lines_per_block = 1 if compression == 2 else 16
    else:
        raise NotImplementedError(f"EXR compression {compression} unsupported")

    n_blocks = (height + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from(f"<{n_blocks}q", buf, off)

    # bytes per pixel-line per channel
    ch_dtypes = [_PIXTYPE_DTYPE[t] for _, t, _, _ in chans]
    line_bytes = sum(width * np.dtype(dt).itemsize for dt in ch_dtypes)

    planes = {name: np.empty((height, width), np.float32) for name, *_ in chans}
    for bi, boff in enumerate(offsets):
        y, size = struct.unpack_from("<ii", buf, boff)
        data = buf[boff + 8 : boff + 8 + size]
        n_lines = min(lines_per_block, y1 - y + 1)
        expect = line_bytes * n_lines
        if compression != 0:
            if size < expect:
                data = _unpredict_zip(zlib.decompress(data)).tobytes()
            # else: stored uncompressed (encoder fallback)
        arr_off = 0
        for ln in range(n_lines):
            for (name, t, _, _), dt in zip(chans, ch_dtypes):
                nbytes = width * np.dtype(dt).itemsize
                row = np.frombuffer(data, dt, count=width, offset=arr_off)
                planes[name][y - y0 + ln] = row.astype(np.float32)
                arr_off += nbytes

    order = [c for c in ("R", "G", "B", "A") if c in planes]
    if not order:
        order = sorted(planes)
    img = np.stack([planes[c] for c in order], axis=-1)
    return img, order
