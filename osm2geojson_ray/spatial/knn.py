"""kNN lookups: pHash Hamming and embedding cosine.

Baseline path: brute force — the query side is broadcast once
(``ray.put``), each ``map_batches`` worker computes distances for its
batch vectorized (numpy XOR+popcount / matmul) and emits batch-local
top-k candidates; a final ``groupby(query).map_groups`` keeps the
global top-k.  Scale path: LSH banding (pHash) / IVF coarse clusters
(embeddings) prune candidates before the same reduce.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray

from ..images.phash import hamming64

KNN_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("neighbor_id", pa.int64()),
        ("distance", pa.float64()),
        ("rank", pa.int64()),
    ]
)


def _batch_topk_rows(qids: np.ndarray, ids: np.ndarray, dm: np.ndarray, k: int,
                     max_pairs: int = 1 << 24) -> pa.Table:
    """(q, n) distance matrix -> batch-local top-k candidate table,
    ordered by (distance, neighbor id) per query — ONE lexsort over the
    flattened (query, distance, id) block instead of a Python loop per
    query, chunked over queries so the q x n pair arrays stay bounded
    (a 10^4-query batch against 10^5 rows never materializes 10^9
    pairs at once)."""
    nq, n = dm.shape
    k = min(k, n)
    rows_per_chunk = max(1, max_pairs // max(n, 1))
    parts_q, parts_n, parts_d = [], [], []
    for s in range(0, nq, rows_per_chunk):
        e = min(nq, s + rows_per_chunk)
        m = e - s
        block = dm[s:e]
        # O(n) selection of the k smallest distances per row; ties at
        # the kth distance are then REPAIRED per affected row so the
        # candidate set is exactly the (distance, id)-lexicographic
        # top-k — a dropped equal-distance smaller-id candidate here
        # could win the GLOBAL reduce, so boundary ties must be exact
        part = (
            np.argpartition(block, k - 1, axis=1)[:, :k]
            if k < n
            else np.tile(np.arange(n), (m, 1))
        )
        sel_d = np.take_along_axis(block, part, axis=1)
        kth = sel_d.max(axis=1)
        n_le = (block <= kth[:, None]).sum(axis=1)
        for r in np.flatnonzero(n_le > k):  # rare: ties across the cut
            idx = np.flatnonzero(block[r] <= kth[r])
            part[r] = idx[np.lexsort((ids[idx], block[r][idx]))[:k]]
        cand_d = np.take_along_axis(block, part, axis=1).ravel()
        cand_i = ids[part].ravel()
        # final (distance, id) ordering of the m x k survivors — one
        # small flat lexsort with the query index as primary key
        order = np.lexsort((cand_i, cand_d, np.repeat(np.arange(m), k)))
        parts_q.append(np.repeat(qids[s:e], k))
        parts_n.append(cand_i[order])
        parts_d.append(cand_d[order])
    return pa.Table.from_pydict(
        {
            "query_id": np.concatenate(parts_q),
            "neighbor_id": np.concatenate(parts_n).astype(np.int64),
            "distance": np.concatenate(parts_d).astype(np.float64),
            "rank": np.zeros(nq * k, dtype=np.int64),
        },
        schema=KNN_SCHEMA,
    )


class _HashKnnScorer:
    """Actor-pool stage: batch of (id, phash) -> local top-k rows."""

    def __init__(self, queries_ref, k: int, id_col: str, hash_col: str):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.qhashes = q["hashes"]
        self.k = k
        self.id_col, self.hash_col = id_col, hash_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = batch[self.hash_col].to_numpy(zero_copy_only=False)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(hashes) == 0:
            return KNN_SCHEMA.empty_table()
        dm = hamming64(self.qhashes[:, None], hashes[None, :])  # (q, n)
        return _batch_topk_rows(self.qids, ids, dm, self.k)


def _topk_reduce(ds, k: int, descending: bool = False):
    """Global top-k per query from the batch-local candidates.

    The candidate set is tiny by construction (<= queries x k x blocks
    rows), so ONE remote concat + vectorized lexsort task replaces a
    sort-based ``groupby(query_id).map_groups`` — Ray Data's sort
    shuffle costs ~3 s of fixed latency regardless of size, which
    dominated the whole kNN pipeline."""
    import ray.data as rd

    @ray.remote
    def _reduce(*blocks):
        tbl = pa.concat_tables(blocks, promote_options="default")
        q = tbl["query_id"].to_numpy(zero_copy_only=False)
        d = tbl["distance"].to_numpy(zero_copy_only=False)
        nid = tbl["neighbor_id"].to_numpy(zero_copy_only=False)
        sort_d = -d if descending else d
        # primary query_id, then distance, ties by neighbor id —
        # matching the old per-group sort_values exactly
        order = np.lexsort((nid, sort_d, q))
        qs, dsrt, ns = q[order], d[order], nid[order]
        n = len(qs)
        if n:
            new_q = np.concatenate(([True], qs[1:] != qs[:-1]))
            run_start = np.maximum.accumulate(np.where(new_q, np.arange(n), 0))
            rank = np.arange(n) - run_start + 1
            keep = rank <= k
            return pa.Table.from_pydict(
                {
                    "query_id": qs[keep],
                    "neighbor_id": ns[keep],
                    "distance": dsrt[keep],
                    "rank": rank[keep].astype(np.int64),
                },
                schema=KNN_SCHEMA,
            )
        return KNN_SCHEMA.empty_table()

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(block_ref)
    if not refs:
        return rd.from_arrow(KNN_SCHEMA.empty_table())
    return rd.from_arrow_refs([_reduce.remote(*refs)])


def _probe_filter_task(batch: pa.Table, *, state_ref, vec_col) -> pa.Table:
    """IVF coarse filter in task mode: centroids + probe set fetched
    once per worker process (worker_state cache)."""
    from ..worker_state import cache_key_for_ref, get_or_build

    st = get_or_build(
        ("ivf_state", cache_key_for_ref(state_ref)), lambda: ray.get(state_ref)
    )
    if len(batch) == 0:
        return batch
    from ..vectors import vec_matrix

    vecs = vec_matrix(batch[vec_col])
    vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    d = ((vecs[:, None, :] - st["cents"][None, :, :]) ** 2).sum(axis=2)
    keep = np.isin(d.argmin(axis=1), st["probes"])
    return batch.filter(pa.array(keep))


def _hash_knn_task(batch, *, queries_ref, k, id_col, hash_col):
    from ..worker_state import cache_key_for_ref, get_or_build

    scorer = get_or_build(
        ("hash_knn", cache_key_for_ref(queries_ref), k, id_col, hash_col),
        lambda: _HashKnnScorer(queries_ref=queries_ref, k=k, id_col=id_col, hash_col=hash_col),
    )
    return scorer(batch)


def _cosine_knn_task(batch, *, queries_ref, k, id_col, vec_col):
    from ..worker_state import cache_key_for_ref, get_or_build

    scorer = get_or_build(
        ("cosine_knn", cache_key_for_ref(queries_ref), k, id_col, vec_col),
        lambda: _CosineKnnScorer(queries_ref=queries_ref, k=k, id_col=id_col, vec_col=vec_col),
    )
    return scorer(batch)


def phash_knn(
    items,
    query_ids: np.ndarray,
    query_hashes: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "item_id",
    hash_col: str = "phash",
    concurrency: int = 2,
    batch_size: Optional[int] = None,
):
    """Dataset of (id, phash) x broadcast queries -> global top-k per
    query by Hamming distance (ties broken by neighbor id).

    ``concurrency`` is accepted for API compatibility but IGNORED: the
    scorer runs on the warm task pool (per-worker state cache), which
    auto-scales with the cluster — capping it would starve workers."""
    import functools

    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64),
                   "hashes": np.asarray(query_hashes, dtype=np.int64)})
    # task mode + per-worker scorer cache: the broadcast query set is
    # tiny, so actor-pool spawn would dominate (see worker_state)
    local = items.map_batches(
        functools.partial(_hash_knn_task, queries_ref=ref, k=k,
                          id_col=id_col, hash_col=hash_col),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return _topk_reduce(local, k)


def _topk_rounded_rows(qids: np.ndarray, ids: np.ndarray, raw: np.ndarray,
                       k: int, grid: float = 1e-9) -> pa.Table:
    """Top-k per row by (np.round(raw, 9), id) WITHOUT rounding the full
    q x n matrix (np.round over 10^8 doubles costs ~20s/worker).
    Selection runs on the raw distances with a 2-grid slack: rounding is
    monotone with grid 1e-9, so every candidate of the ROUNDED top-k
    lies within 2e-9 of the kth-smallest raw distance — only that tiny
    survivor set is rounded and lexsorted, and the result is provably
    identical to rounding first."""
    nq, n = raw.shape
    k = min(k, n)
    if k < n:
        part = np.argpartition(raw, k - 1, axis=1)[:, :k]
        kth = np.take_along_axis(raw, part, axis=1).max(axis=1)
        mask = raw <= (kth + 2.0 * grid)[:, None]
    else:
        mask = np.ones((nq, n), dtype=bool)
    rows, cols = np.nonzero(mask)
    d = np.round(raw[rows, cols], 9)
    i = ids[cols]
    order = np.lexsort((i, d, rows))
    rows_s, d_s, i_s = rows[order], d[order], i[order]
    m = len(rows_s)
    newrow = np.concatenate(([True], rows_s[1:] != rows_s[:-1])) if m else np.array([], bool)
    run_start = np.maximum.accumulate(np.where(newrow, np.arange(m), 0)) if m else np.array([], np.int64)
    keep = (np.arange(m) - run_start) < k
    return pa.Table.from_pydict(
        {
            "query_id": qids[rows_s[keep]],
            "neighbor_id": i_s[keep].astype(np.int64),
            "distance": d_s[keep].astype(np.float64),
            "rank": np.zeros(int(keep.sum()), dtype=np.int64),
        },
        schema=KNN_SCHEMA,
    )


class _CosineKnnScorer:
    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        qm = q["matrix"].astype(np.float64)
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return KNN_SCHEMA.empty_table()
        from ..vectors import vec_matrix

        vecs = vec_matrix(batch[self.vec_col])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        raw = 1.0 - self.qm @ (vecs / norms).T  # (q, n)
        return _topk_rounded_rows(self.qids, ids, raw, self.k)


def embedding_knn(
    items,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
    batch_size: Optional[int] = None,
):
    """Brute-force cosine top-k (distance = 1 - cosine, rounded to 1e-9
    so rankings are reproducible across float summation orders).
    ``concurrency`` is accepted for API compatibility but ignored (warm
    task pool; see phash_knn)."""
    import functools

    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64),
                   "matrix": np.asarray(query_matrix)})
    local = items.map_batches(
        functools.partial(_cosine_knn_task, queries_ref=ref, k=k,
                          id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return _topk_reduce(local, k)


def phash_band_pairs(
    items,
    *,
    max_distance: int = 8,
    id_col: str = "item_id",
    hash_col: str = "phash",
    num_partitions: int = 16,
):
    """Near-duplicate pHash pairs via LSH banding: 4 bands of 16 bits —
    hashes within Hamming distance <= 16/bands share at least one exact
    band with high probability; verify with exact Hamming.  Returns
    (a_id, b_id, distance) with a_id < b_id, distinct."""
    def band_rows(batch: pa.Table) -> pa.Table:
        hashes = batch[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keys = np.concatenate(
            [
                ((hashes >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
                * 4
                + b
                for b in range(4)
            ]
        )
        return pa.Table.from_pydict(
            {
                "band_key": pa.array(keys),
                "item_id": pa.array(np.tile(ids, 4)),
                "phash": pa.array(np.tile(hashes.astype(np.int64), 4)),
            },
            schema=pa.schema(
                [("band_key", pa.int64()), ("item_id", pa.int64()), ("phash", pa.int64())]
            ),
        )

    banded = items.map_batches(band_rows, batch_format="pyarrow")

    def partition_pairs(df):
        import pandas as pd

        df = df[df.duplicated("band_key", keep=False)]
        frames = []
        for _, grp in df.groupby("band_key", sort=False):
            ids = grp["item_id"].to_numpy()
            hs = grp["phash"].to_numpy()
            if len(ids) < 2:
                continue
            dm = hamming64(hs[:, None], hs[None, :])
            ai, bi = np.nonzero(np.triu(dm <= max_distance, k=1))
            if len(ai) == 0:
                continue
            a, b = ids[ai], ids[bi]
            swap = a > b
            frames.append(pd.DataFrame({
                "a_id": np.where(swap, b, a),
                "b_id": np.where(swap, a, b),
                "distance": dm[ai, bi],
            }))
        if not frames:
            return pd.DataFrame({"a_id": [], "b_id": [], "distance": []}).astype(
                {"a_id": "int64", "b_id": "int64", "distance": "int64"}
            )
        return pd.concat(frames, ignore_index=True)

    from ..relational import _with_part
    from ..text.dedup import _distinct_pairs

    pairs = (
        _with_part(banded, "band_key", num_partitions)
        .groupby("__part")
        .map_groups(partition_pairs, batch_format="pandas")
    )
    return _distinct_pairs(pairs, num_partitions=num_partitions)


def _ivf_centroids(sample: np.ndarray, n_clusters: int, iters: int = 8) -> np.ndarray:
    """Deterministic mini k-means (fixed iterations, first-K init) on a
    driver-side sample — the coarse quantizer for IVF."""
    n = len(sample)
    n_clusters = min(n_clusters, n)
    cents = sample[:n_clusters].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_clusters):
            mask = assign == c
            if mask.any():
                cents[c] = sample[mask].mean(axis=0)
    return cents


def embedding_knn_ivf(
    items,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_rows: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
    batch_size: Optional[int] = None,
):
    """IVF-style approximate cosine kNN — the 10^12-row scale path.

    1. coarse quantizer: k-means centroids from a driver-side sample;
    2. each batch keeps only vectors whose nearest centroid is among
       the union of every query's ``n_probe`` closest centroids (the
       pruning that makes brute force affordable at scale);
    3. surviving candidates score exactly like ``embedding_knn``.

    Recall < 1.0 by construction; raise ``n_probe`` toward
    ``n_clusters`` to trade speed for exactness.
    """
    sample = np.array(
        [r[vec_col] for r in items.limit(sample_rows).take_all()], dtype=np.float64
    )
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cents = _ivf_centroids(sample, n_clusters)
    qm = np.asarray(query_matrix, dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    qd = ((qm[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = np.unique(np.argsort(qd, axis=1)[:, : min(n_probe, len(cents))].ravel())
    import functools

    state = ray.put({"cents": cents, "probes": probes.astype(np.int64)})
    pruned = items.map_batches(
        functools.partial(_probe_filter_task, state_ref=state, vec_col=vec_col),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return embedding_knn(
        pruned, query_ids, query_matrix, k=k, id_col=id_col, vec_col=vec_col,
        concurrency=concurrency, batch_size=batch_size,
    )
