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


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
