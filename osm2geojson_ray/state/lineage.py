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


def _table_checksum(tbl: pa.Table) -> str:
    """Order-insensitive value checksum (stable across shuffles)."""
    import hashlib

    cols = sorted(tbl.column_names)
    rows = sorted(
        json.dumps({c: row.get(c) for c in cols}, sort_keys=True, default=str)
        for row in tbl.to_pylist()
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
    return h.hexdigest()[:16]


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
    ) -> Dict[str, dict]:
        """For each partition id not in the manifest: build its result
        table, write it atomically, append the lineage record."""
        import pyarrow.parquet as pq

        done = self.completed()
        for part in partitions:
            if part in done:
                continue
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
            rec = {
                "partition": part,
                "rows": tbl.num_rows,
                "checksum": _table_checksum(tbl),
                "inputs": input_refs(part) if input_refs else [],
                "wall_sec": round(time.time() - t0, 3),
            }
            with open(self.manifest_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            done[part] = rec
        return done
