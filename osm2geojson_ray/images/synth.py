"""Deterministic synthetic image table (BASELINE.json input_hint shape).

Schema (exact): image_id:string, bytes:binary, w:int32, h:int32,
fmt:string, caption:string, phash:int64.

Everything derives from the image index through a splitmix64-style hash
— no wall clock, no global RNG — so any shard can be regenerated
independently (resumable synthesis at 10^12-row scale: the table is
PARTITIONED by index range and each partition's content is a pure
function of its indices).

Each image also has a deterministic (lon, lat) inside a configurable
bbox so point-in-polygon joins against assembled OSM geometries have
exactly countable golden results.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

from .codec import encode_image
from .phash import phash64

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

_MASK = (1 << 64) - 1


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (public-domain PRNG finalizer)."""
    z = (np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK)
    return z ^ (z >> np.uint64(31))


def image_position(idx, bbox: Tuple[float, float, float, float] = (-180.0, -90.0, 180.0, 90.0)):
    """Deterministic lon/lat for image index array within bbox."""
    idx = np.asarray(idx, dtype=np.uint64)
    h1 = splitmix64(idx * np.uint64(2))
    h2 = splitmix64(idx * np.uint64(2) + np.uint64(1))
    fx = (h1 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    fy = (h2 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    lon = bbox[0] + fx * (bbox[2] - bbox[0])
    lat = bbox[1] + fy * (bbox[3] - bbox[1])
    return lon, lat


def _pixels_for(idx: int, w: int, h: int) -> np.ndarray:
    """Deterministic pattern: smooth gradients + hashed phase, uint8."""
    base = splitmix64(np.array([idx], dtype=np.uint64))[0]
    phase = float(base % np.uint64(1000)) / 1000.0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 127.5 * (1 + np.sin(2 * np.pi * (xx / w + phase)))
    g = 127.5 * (1 + np.cos(2 * np.pi * (yy / h + phase * 2)))
    b = 127.5 * (1 + np.sin(2 * np.pi * ((xx + yy) / (w + h) + phase * 3)))
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _pixels_batch(idx: np.ndarray, w: int, h: int, out: Optional[np.ndarray] = None) -> np.ndarray:
    """Vectorized _pixels_for over an index array -> (n, h, w, 3) uint8
    (bit-identical to the per-image version: same float64 expressions)."""
    base = splitmix64(np.asarray(idx, dtype=np.uint64))
    return _pixels_batch_phase(base % np.uint64(1000), w, h, out=out)


def _pixels_batch_phase(
    phase_milli: np.ndarray, w: int, h: int, out: Optional[np.ndarray] = None
) -> np.ndarray:
    """Pixel batch from EXPLICIT integer phases in [0, 1000) — the
    generator core shared by index-keyed synthesis and reference
    regeneration from caption-parsed fields (cross-modal alignment).
    Bit-identical to the original fused form: the phase float is the
    same (base % 1000) -> float64 / 1000 expression.

    The gradients are separable — r varies only with x, g only with y,
    b only with the anti-diagonal x+y — so only n*(w + h + w+h-1)
    transcendentals are evaluated (≈14× fewer than the dense form) and
    broadcast/gathered into the dense pixel block."""
    n = len(phase_milli)
    phase = np.asarray(phase_milli).astype(np.float64) / 1000.0  # (n,)
    p = phase[:, None]
    xs = np.arange(w, dtype=np.float64)
    ys = np.arange(h, dtype=np.float64)
    ds = np.arange(w + h - 1, dtype=np.float64)
    # cast the SMALL per-channel profiles to uint8 BEFORE broadcasting /
    # gathering: float->uint8 conversion is per-element, so casting the
    # (n, w) profile then copying equals casting after the broadcast —
    # but the b-channel gather then materializes an (n, h, w) uint8 temp
    # instead of float64 (8x less fresh allocation in the hot path)
    r_row = (127.5 * (1 + np.sin(2 * np.pi * (xs[None] / w + p)))).astype(np.uint8)
    g_col = (127.5 * (1 + np.cos(2 * np.pi * (ys[None] / h + p * 2)))).astype(np.uint8)
    b_diag = (127.5 * (1 + np.sin(2 * np.pi * (ds[None] / (w + h) + p * 3)))).astype(np.uint8)
    if out is None:
        out = np.empty((n, h, w, 3), dtype=np.uint8)
    out[..., 0] = r_row[:, None, :]
    out[..., 1] = g_col[:, :, None]
    d_idx = (np.arange(h)[:, None] + np.arange(w)[None, :])  # (h, w)
    out[..., 2] = b_diag[:, d_idx]
    return out


_LOSSY_LUT = np.clip(
    (np.arange(256, dtype=np.int16) + 4) // 8 * 8, 0, 255
).astype(np.uint8)

_BUF_POOL: dict = {}


def _pooled_buffer(shape) -> np.ndarray:
    """Per-worker reusable uint8 buffer.  A pooled array is handed out
    wrapped zero-copy into an Arrow column; it is only REUSED when its
    refcount shows no outstanding holder (the fused-stage case, where
    each batch's table dies before the next call).  If a consumer still
    references the previous table (e.g. the stage's output block
    builder when synth is the last op before the object store), the
    refcount stays elevated and a fresh buffer is allocated — pooling
    degrades to the old behavior instead of corrupting live data."""
    import sys

    arr = _BUF_POOL.get(shape)
    # refcount: _BUF_POOL entry + the getrefcount argument == 2
    if arr is not None and sys.getrefcount(arr) == 2:
        return arr
    arr = np.empty(shape, dtype=np.uint8)
    _BUF_POOL[shape] = arr
    return arr


def synth_image_batch(
    start: int,
    count: int,
    *,
    size: Tuple[int, int] = (24, 16),
    lossy_every: int = 4,
) -> pa.Table:
    """One partition of the synthetic table: images [start, start+count)."""
    from .phash import phash64_batch_same_size

    import struct

    w, h = size
    idx = np.arange(start, start + count, dtype=np.uint64)
    # allocation diet: ONE (count, 8+w*h*3) uint8 buffer is the only
    # full-size allocation — pixels are generated straight into its
    # payload view (each row is contiguous, so the (count, h, w, 3)
    # reshape is stride-compatible), the phash reads the same view, the
    # Arrow binary column wraps the buffer zero-copy, and lossy rows
    # quantize in place.  Bit-identical bytes to per-image encode_image.
    hdr = np.frombuffer(b"R8" + struct.pack("<HHBB", w, h, 0, 0), dtype=np.uint8)
    row_len = 8 + w * h * 3
    buf = _pooled_buffer((count, row_len))
    buf[:, :8] = hdr
    pixels = buf[:, 8:].reshape(count, h, w, 3)
    # generate + hash in CHUNKS: per-image work is independent, so the
    # float profile temps and the phash scratch shrink from batch-sized
    # (~45 MB at 31k rows) to chunk-sized (~6 MB) — the stage is bound
    # by the host's shared allocation bandwidth, so resident-scratch
    # bytes convert directly into throughput
    chunk = 4096
    hashes = np.empty(count, dtype=np.int64)
    for lo in range(0, count, chunk):
        hi = min(count, lo + chunk)
        _pixels_batch(idx[lo:hi], w, h, out=pixels[lo:hi])
        hashes[lo:hi] = phash64_batch_same_size(pixels[lo:hi])
    phases = (splitmix64(idx) % np.uint64(1000)).astype(np.int64)
    lossy = (
        (idx % np.uint64(lossy_every)) == 0
        if lossy_every
        else np.zeros(count, dtype=bool)
    )
    if lossy.any():
        # value-only transform -> 256-entry LUT gather (uint8 in/out):
        # identical to clip((v+4)//8*8, 0, 255) per element, without the
        # int16 promotion chain (~6 full-size temps) per batch
        buf[lossy, 8:] = _LOSSY_LUT[buf[lossy, 8:]]
    offsets = (np.arange(count + 1, dtype=np.int32) * row_len)
    blob_arr = pa.Array.from_buffers(
        pa.binary(),
        count,
        [None, pa.py_buffer(offsets), pa.py_buffer(buf.reshape(-1))],
    )
    fmt_arr = pa.Array.from_pandas(np.where(lossy, "rgb5", "rgb8"))
    idx_list = idx.tolist()
    ids = [f"img-{i:012d}" for i in idx_list]
    captions = [
        f"synthetic scene {i} phase {p}" for i, p in zip(idx_list, phases.tolist())
    ]
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.string()),
            blob_arr,
            pa.array(np.full(count, w, dtype=np.int32)),
            pa.array(np.full(count, h, dtype=np.int32)),
            fmt_arr.cast(pa.string()),
            pa.array(captions, pa.string()),
            pa.array(hashes.astype(np.int64)),
        ],
        schema=IMAGE_SCHEMA,
    )


def synth_image_table(
    n: int,
    *,
    size: Tuple[int, int] = (24, 16),
    lossy_every: int = 4,
    partition_rows: Optional[int] = None,
    size_ladder: Optional[list] = None,
):
    """Ray Dataset of n synthetic images, generated IN PARALLEL: a tiny
    index-range dataset fans out to ``map_batches`` workers that each
    synthesize their own partition (no driver-side materialization).

    ``size_ladder``: optional list of (w, h) — partition p uses
    ``size_ladder[p % len(size_ladder)]``, a pure function of the
    partition's start index, so the variable-resolution corpus stays
    deterministic and shard-resumable (and each partition is still
    uniform-size, keeping the same-size fast paths)."""
    import ray.data

    partition_rows = partition_rows or max(1, min(n, 4096))
    starts = list(range(0, n, partition_rows))
    # one block per partition spec — without override_num_blocks the
    # spec rows land in one block and generation runs on ONE task
    parts = ray.data.from_items(
        [{"start": s, "count": min(partition_rows, n - s)} for s in starts],
        override_num_blocks=len(starts),
    )

    def part_size(start: int) -> Tuple[int, int]:
        if size_ladder is None:
            return size
        return size_ladder[(start // partition_rows) % len(size_ladder)]

    def gen(batch):
        tables = [
            synth_image_batch(
                int(s), int(c), size=part_size(int(s)), lossy_every=lossy_every
            )
            for s, c in zip(batch["start"], batch["count"])
        ]
        return pa.concat_tables(tables)

    return parts.map_batches(gen, batch_format="pandas", batch_size=1)
