"""Allocation-free compute probe — the scaling CONTROL experiment.

The shared sandbox host caps fresh-page allocation at ~1.3 GB/s
aggregate (BASELINE.md), so allocation-heavy stages cannot show clean
N->4N scaling here no matter how the engine is built.  This probe is
the counterfactual the round-2 verdict asked for: the same Ray Data
execution shape as the engine's scoring stages (map_batches over
blocks, per-worker state built once, vectorized kernel per batch) but
with a FIXED working set — matmuls into preallocated buffers, no
per-batch allocation growth — so the host allocator is not the binding
constraint and measured efficiency reflects the engine's coordination
overhead alone.

Importable (not __main__-pickled) so Ray task workers cache ``_STATE``
per process: first task in a worker pays the init, later tasks reuse
it — the task-pool analogue of actor-pool ``__init__`` state without
per-run actor spawn cost.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_STATE: dict = {}

# cache-resident shapes: q+v+acc ≈ 1.1 MB per worker, so 32 workers fit
# in shared L3 and the probe measures arithmetic scaling, not DRAM write
# bandwidth (Q=V=512,D=256 wrote a 2 MB accumulator per 134 MFLOP —
# ~37 GB of memory writes per run — and capped measured efficiency)
Q, D, V = 128, 512, 128  # per-iteration matmul: 2*Q*D*V = 16.8 MFLOP


def _state():
    st = _STATE.get("s")
    if st is None:
        rng = np.random.RandomState(7)
        _STATE["s"] = st = {
            "q": rng.rand(Q, D),
            "v": rng.rand(D, V),
            "acc": np.empty((Q, V)),
        }
    return st


def score_batch(batch: pa.Table, *, reps: int) -> pa.Table:
    """One probe task: ``reps`` accumulating matmuls into the
    preallocated buffer; a data dependency between iterations keeps
    the loop honest against dead-code elimination."""
    st = _state()
    q, v, acc = st["q"], st["v"], st["acc"]
    checksum = 0.0
    for _ in range(reps):
        np.matmul(q, v, out=acc)
        q[0, 0] = acc[0, 0] * 1e-9  # loop-carried dependency
        checksum += float(acc[Q // 2, V // 2])
    return pa.Table.from_pydict(
        {"task_id": [int(batch["id"][0].as_py())], "checksum": [checksum]},
        schema=pa.schema([("task_id", pa.int64()), ("checksum", pa.float64())]),
    )


def run_probe(n_tasks: int = 768, reps: int = 192) -> int:
    """Fixed total work: n_tasks * reps * 134 MFLOP, spread over the
    task pool as one block per task."""
    import functools

    import ray.data

    specs = ray.data.range(n_tasks, override_num_blocks=n_tasks)
    scored = specs.map_batches(
        functools.partial(score_batch, reps=reps),
        batch_format="pyarrow",
        batch_size=None,
    )
    return scored.count()
