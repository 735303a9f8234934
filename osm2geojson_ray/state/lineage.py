"""Resumable partitioned output with per-partition lineage records.

Pattern (north_rule "resumable from checkpoint with per-partition
lineage + metrics"):

- output is one parquet directory PER INPUT PARTITION (an input shard /
  key range), written atomically (temp dir + rename);
- a lineage manifest (JSON lines) records each completed partition:
  partition id, input refs, row count, value checksum, wall time;
- a restarted run consults the manifest and SKIPS completed partitions,
  so a crash wastes at most one partition of work.

The driver loop is intentionally simple — partitions are coarse
(hundreds, not millions), and each partition's body is a full Ray Data
pipeline that parallelizes internally.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, List, Optional

import pyarrow as pa


def _column_hash64(col) -> "np.ndarray":
    """Per-row uint64 hash of one column, vectorized per type."""
    import numpy as np
    import pyarrow.compute as pc

    from ..images.synth import splitmix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    nulls = (
        pc.is_null(col).to_numpy(zero_copy_only=False)
        if col.null_count
        else None
    )
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        v = pc.fill_null(col, 0).cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = splitmix64(v.astype(np.uint64))
    elif pa.types.is_floating(t):
        v = pc.fill_null(col, 0.0).cast(pa.float64()).to_numpy(zero_copy_only=False)
        h = splitmix64(v.view(np.uint64))
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        from ..text.analysis import _hash63_batch

        h = _hash63_batch(pc.fill_null(col, "")).view(np.uint64)
    else:
        # exotic types: stringify per row (rare — feature tables are
        # int64/string); falls back rather than failing
        from ..text.analysis import _hash63_batch

        as_str = pa.array(
            [json.dumps(x, sort_keys=True, default=str) for x in col.to_pylist()],
            pa.string(),
        )
        h = _hash63_batch(as_str).view(np.uint64)
    if nulls is not None:
        h = np.where(nulls, np.uint64(0x9E3779B97F4A7C15), h)
    return h


def _table_checksum(tbl: pa.Table) -> str:
    """Order-insensitive value checksum (stable across shuffles):
    vectorized per-column row hashes mixed with a column-name salt,
    combined across rows by wraparound sum — no per-row Python in the
    common (numeric/string) case."""
    import hashlib

    import numpy as np

    from ..images.synth import splitmix64

    n = tbl.num_rows
    if n == 0:
        return "0" * 16
    row = np.zeros(n, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for name in sorted(tbl.column_names):
        salt_seed = np.frombuffer(
            hashlib.sha256(name.encode()).digest()[:8], dtype=np.uint64
        )
        salt = splitmix64(salt_seed)[0]
        with np.errstate(over="ignore"):
            row = row * prime + (_column_hash64(tbl[name]) ^ salt)
    with np.errstate(over="ignore"):
        total = int(row.sum(dtype=np.uint64))
    return f"{total:016x}"


class PartitionedRun:
    """Checkpointed execution of per-partition pipelines."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.manifest_path = os.path.join(out_dir, "_lineage.jsonl")

    def completed(self) -> Dict[str, dict]:
        done = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    rec = json.loads(line)
                    done[rec["partition"]] = rec
        return done

    def partition_dir(self, partition: str) -> str:
        return os.path.join(self.out_dir, f"part={partition}")

    def run(
        self,
        partitions: Iterable[str],
        build: Callable[[str], "pa.Table"],
        *,
        input_refs: Optional[Callable[[str], List[str]]] = None,
        max_concurrent: int = 1,
    ) -> Dict[str, dict]:
        """For each partition id not in the manifest: build its result
        table, write it atomically, append the lineage record.

        ``max_concurrent`` > 1 runs that many partition builds at once
        (driver threads; each body is itself a Ray pipeline, and the
        streaming executor interleaves them) — at 100x shard counts the
        serial loop would leave the cluster idle between shard DAGs.
        Manifest appends stay serialized under a lock, and each
        partition commit remains atomic (temp dir + rename), so a crash
        mid-flight loses at most the in-progress partitions."""
        import pyarrow.parquet as pq

        done = self.completed()
        todo = [p for p in partitions if p not in done]

        def one(part: str) -> dict:
            t0 = time.time()
            tbl = build(part)
            tmp = self.partition_dir(part) + ".tmp"
            final = self.partition_dir(part)
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(tbl, os.path.join(tmp, "data.parquet"))
            if os.path.exists(final):
                import shutil

                shutil.rmtree(final)
            os.rename(tmp, final)
            return {
                "partition": part,
                "rows": tbl.num_rows,
                "checksum": _table_checksum(tbl),
                "inputs": input_refs(part) if input_refs else [],
                "wall_sec": round(time.time() - t0, 3),
            }

        if max_concurrent <= 1:
            for part in todo:
                rec = one(part)
                with open(self.manifest_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                done[part] = rec
            return done

        import threading
        from concurrent.futures import ThreadPoolExecutor

        lock = threading.Lock()

        def worker(part: str):
            rec = one(part)
            with lock:
                with open(self.manifest_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                done[part] = rec

        with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
            list(pool.map(worker, todo))
        return done
