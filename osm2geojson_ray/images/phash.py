"""64-bit perceptual hash + Hamming distance (vectorized).

phash64: grayscale -> 8x8 block-mean downsample -> mean threshold ->
64-bit signature (mean-hash; DCT-free but shares the property that
near-duplicate pixels give near-identical bits).
"""

from __future__ import annotations

import numpy as np

_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _gray(pixels: np.ndarray) -> np.ndarray:
    """Luma from uint8 RGB, channel-at-a-time: bit-identical to
    ``0.299*p0 + 0.587*p1 + 0.114*p2`` over a float64 copy (scalar
    promotion is exact; += is the same f64 add), but never materializes
    the (…, 3) float64 pixel copy — ~4x less allocation in the synth /
    decode hot path."""
    out = np.multiply(np.ascontiguousarray(pixels[..., 0]), 0.299)
    out += np.multiply(np.ascontiguousarray(pixels[..., 1]), 0.587)
    out += np.multiply(np.ascontiguousarray(pixels[..., 2]), 0.114)
    return out


def _block_mean_8x8(gray: np.ndarray) -> np.ndarray:
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    out = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            out[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    return out


def _block_luma_8x8(pixels: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (8, 8) float64 luma block means via EXACT
    integer channel sums (reduceat), then one luma combine per block —
    no full-resolution float gray array is ever materialized.  The
    allocation per image is the 8x8x3 sum block instead of h*w*8 bytes."""
    h, w = pixels.shape[:2]
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    row_sum = np.add.reduceat(pixels.astype(np.int64), ys[:-1], axis=0)
    blk = np.add.reduceat(row_sum, xs[:-1], axis=1)  # (8, 8, 3) int64
    counts = ((ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]).astype(
        np.float64
    )
    return (
        0.299 * blk[..., 0] + 0.587 * blk[..., 1] + 0.114 * blk[..., 2]
    ) / counts


def phash64(pixels: np.ndarray) -> int:
    g = _block_luma_8x8(pixels)
    bits = (g > g.ravel().mean()).ravel()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v  # signed int64 domain


def phash64_batch(pixel_list) -> np.ndarray:
    return np.array([phash64(p) for p in pixel_list], dtype=np.int64)


_SCRATCH: dict = {}


def _scratch(key: str, shape, dtype) -> np.ndarray:
    """Per-worker pooled intermediate (never escapes the function, so
    unconditional reuse is safe): repeated batches re-fill the same
    pages instead of faulting fresh ones — the synth/phash hot path is
    allocation-bound on shared hosts (BASELINE.md)."""
    arr = _SCRATCH.get(key)
    if arr is None or arr.shape != tuple(shape) or arr.dtype != dtype:
        arr = np.empty(shape, dtype)
        _SCRATCH[key] = arr
    return arr


def phash64_batch_same_size(pixels: np.ndarray) -> np.ndarray:
    """Fully vectorized phash for a (n, h, w, 3) uint8 stack whose h and
    w are divisible by 8 — bit-identical to phash64 per image (exact
    integer block sums, same float combine order and threshold).

    All full-size intermediates live in pooled scratch buffers and the
    block sums stay uint16 when the exact bound fits (255*h*w/64 <
    2^16): fresh allocation per call is just the (n, 64) bool bit
    matrix and the (n,) output."""
    n, h, w, _ = pixels.shape
    if h % 8 or w % 8:
        return phash64_batch(list(pixels))
    # two-step block sums, H axis first, accumulated with EXPLICIT
    # pairwise adds: ndarray.sum over a short strided axis runs ~6x
    # slower than a Python loop of full-width vectorized adds (measured
    # 51 ms -> 10 ms per 7812x16x24 batch)
    dt = np.uint16 if 255 * (h // 8) * (w // 8) < (1 << 16) else np.int32
    p6 = pixels.reshape(n, 8, h // 8, w, 3)
    s1 = _scratch("s1", (n, 8, w, 3), dt)
    np.copyto(s1, p6[:, :, 0], casting="unsafe")
    for j in range(1, h // 8):
        np.add(s1, p6[:, :, j], out=s1)
    s1r = s1.reshape(n, 8, 8, w // 8, 3)
    s2 = _scratch("s2", (n, 8, 8, 3), dt)
    np.copyto(s2, s1r[:, :, :, 0], casting="unsafe")
    for j in range(1, w // 8):
        np.add(s2, s1r[:, :, :, j], out=s2)
    cnt = float((h // 8) * (w // 8))
    # g = (0.299*b0 + 0.587*b1 + 0.114*b2) / cnt with the same add order
    g = _scratch("g", (n, 8, 8), np.float64)
    tmp = _scratch("tmp", (n, 8, 8), np.float64)
    np.multiply(s2[..., 0], 0.299, out=g)
    np.multiply(s2[..., 1], 0.587, out=tmp)
    g += tmp
    np.multiply(s2[..., 2], 0.114, out=tmp)
    g += tmp
    g /= cnt
    gf = g.reshape(n, 64)
    bits = gf > gf.mean(axis=1, keepdims=True)
    # sum(bit_i << i) == little-endian packbits of the bit row
    packed = np.packbits(bits, axis=1, bitorder="little")
    return packed.view(np.uint64).ravel().astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 hash arrays
    (broadcasting allowed: (n,1) vs (1,m) gives the full matrix)."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    view = x.view(np.uint8).reshape(x.shape + (8,))
    return _POPCOUNT8[view].sum(axis=-1).astype(np.int64)
