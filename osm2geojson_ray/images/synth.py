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


def _pixels_batch(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    """Vectorized _pixels_for over an index array -> (n, h, w, 3) uint8
    (bit-identical to the per-image version: same float64 expressions)."""
    base = splitmix64(idx.astype(np.uint64))
    phase = (base % np.uint64(1000)).astype(np.float64) / 1000.0  # (n,)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    p = phase[:, None, None]
    r = 127.5 * (1 + np.sin(2 * np.pi * (xx[None] / w + p)))
    g = 127.5 * (1 + np.cos(2 * np.pi * (yy[None] / h + p * 2)))
    b = 127.5 * (1 + np.sin(2 * np.pi * ((xx + yy)[None] / (w + h) + p * 3)))
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def synth_image_batch(
    start: int,
    count: int,
    *,
    size: Tuple[int, int] = (24, 16),
    lossy_every: int = 4,
) -> pa.Table:
    """One partition of the synthetic table: images [start, start+count)."""
    from .phash import phash64_batch_same_size

    w, h = size
    idx = np.arange(start, start + count, dtype=np.uint64)
    pixels = _pixels_batch(idx, w, h)
    hashes = phash64_batch_same_size(pixels).tolist()
    phases = (splitmix64(idx) % np.uint64(1000)).astype(np.int64)
    ids, blobs, fmts, captions = [], [], [], []
    for j, i in enumerate(range(start, start + count)):
        fmt = "rgb5" if lossy_every and i % lossy_every == 0 else "rgb8"
        blobs.append(encode_image(pixels[j], fmt))
        ids.append(f"img-{i:012d}")
        fmts.append(fmt)
        captions.append(f"synthetic scene {i} phase {int(phases[j])}")
    return pa.Table.from_pydict(
        {
            "image_id": ids,
            "bytes": blobs,
            "w": np.full(count, w, dtype=np.int32),
            "h": np.full(count, h, dtype=np.int32),
            "fmt": fmts,
            "caption": captions,
            "phash": np.array(hashes, dtype=np.int64),
        },
        schema=IMAGE_SCHEMA,
    )


def synth_image_table(
    n: int,
    *,
    size: Tuple[int, int] = (24, 16),
    lossy_every: int = 4,
    partition_rows: Optional[int] = None,
):
    """Ray Dataset of n synthetic images, generated IN PARALLEL: a tiny
    index-range dataset fans out to ``map_batches`` workers that each
    synthesize their own partition (no driver-side materialization)."""
    import ray.data

    partition_rows = partition_rows or max(1, min(n, 4096))
    starts = list(range(0, n, partition_rows))
    # one block per partition spec — without override_num_blocks the
    # spec rows land in one block and generation runs on ONE task
    parts = ray.data.from_items(
        [{"start": s, "count": min(partition_rows, n - s)} for s in starts],
        override_num_blocks=len(starts),
    )

    def gen(batch):
        tables = [
            synth_image_batch(int(s), int(c), size=size, lossy_every=lossy_every)
            for s, c in zip(batch["start"], batch["count"])
        ]
        return pa.concat_tables(tables)

    return parts.map_batches(gen, batch_format="pandas", batch_size=1)
