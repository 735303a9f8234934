"""Arrow list<float> column -> (n, dim) float64 matrix, zero-copy-ish.

Embedding columns arrive as (fixed or variable) list arrays; converting
through ``to_pylist`` builds n*dim Python floats.  ``vec_matrix``
instead flattens the Arrow values buffer straight into numpy and
reshapes — only the dtype cast allocates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def vec_matrix(col) -> np.ndarray:
    """ChunkedArray/Array of list<floating> (no nulls, equal lengths)
    -> (n, dim) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    lengths = pc.list_value_length(col)
    if col.null_count or pc.min(lengths).as_py() != pc.max(lengths).as_py():
        # ragged or null rows: fall back to the safe python path
        return np.array(col.to_pylist(), dtype=np.float64)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(n, -1)


def grouped_centroid(ds, group_col: str, vec_col: str, *, scale: int = 10000,
                     out_col: str = "mean_scaled"):
    """Per-group embedding centroid in LONG format: one output row per
    (group, dimension) with the member count and the integer-scaled
    mean — the cluster-summary / class-prototype aggregate of an
    embedding table.

    Distributed shape: each batch reduces its vectors to per-group
    (sum, count) partials with one stable argsort + ``add.reduceat``
    (no per-row Python, no raw vectors in any shuffle), partials are
    long (group, dim, vsum, n) rows, and ``partial_grouped_agg``'s
    single concat+groupby task finishes — at 10^12 rows only
    #groups x dim x #blocks tiny partial rows move.  The mean is
    emitted integer-scaled with half-away-from-zero rounding so the
    value hash matches SQL ``round()`` (numpy's ``np.round`` is
    half-to-even and would differ on exact .5 boundaries)."""

    def partial(tbl: pa.Table) -> pa.Table:
        g = (
            pc.fill_null(tbl[group_col], 0)
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        M = vec_matrix(tbl[vec_col])
        if len(g) == 0 or M.shape[1] == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.float64()),
                    "n_vecs": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(g, kind="stable")
        gs, Ms = g[order], M[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        sums = np.add.reduceat(Ms, starts, axis=0)
        counts = np.diff(np.r_[starts, len(gs)]).astype(np.int64)
        uniq = gs[starts]
        dim = M.shape[1]
        return pa.table(
            {
                group_col: pa.array(np.repeat(uniq, dim)),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(uniq))),
                "vsum": pa.array(sums.ravel()),
                "n_vecs": pa.array(np.repeat(counts, dim)),
            }
        )

    from .relational import partial_grouped_agg

    agg = partial_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "dim"],
        {"vsum": ("vsum", "sum"), "n_vecs": ("n_vecs", "sum")},
    )

    def finalize(tbl: pa.Table) -> pa.Table:
        s = tbl["vsum"].to_numpy(zero_copy_only=False)
        n = tbl["n_vecs"].to_numpy(zero_copy_only=False)
        mean = s / n * scale
        # DuckDB round(): half away from zero
        scaled = (np.sign(mean) * np.floor(np.abs(mean) + 0.5)).astype(np.int64)
        return pa.table(
            {
                group_col: tbl[group_col],
                "dim": tbl["dim"],
                "n_vecs": tbl["n_vecs"],
                out_col: pa.array(scaled),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def _absmax_scale_ref(ds, vec_col: str):
    """Per-dimension global |x| max of an embedding column as a
    broadcast ``ray.put`` ref: per-batch partials (shuffle-free), one
    tiny remote reduce."""
    import ray as _ray

    def absmax_partial(tbl: pa.Table) -> pa.Table:
        M = vec_matrix(tbl[vec_col])
        if M.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "amax": pa.array([], pa.float64())})
        am = np.abs(M).max(axis=0)
        return pa.table({"dim": pa.array(np.arange(M.shape[1], dtype=np.int64)),
                         "amax": pa.array(am)})

    partials = ds.map_batches(absmax_partial, batch_format="pyarrow")

    @_ray.remote
    def _reduce(*blocks):
        tbl = pa.concat_tables(blocks, promote_options="default")
        d = tbl["dim"].to_numpy(zero_copy_only=False)
        a = tbl["amax"].to_numpy(zero_copy_only=False)
        ndim = int(d.max()) + 1 if len(d) else 0
        out = np.zeros(ndim, dtype=np.float64)
        np.maximum.at(out, d, a)
        return out

    refs = []
    for bundle in partials.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(block_ref)
    if not refs:  # empty input: no scales needed, codes pass is a no-op
        return _ray.put(np.zeros(0, dtype=np.float64))
    return _ray.put(_ray.get(_reduce.remote(*refs)))


def _quantize_matrix(M: np.ndarray, amax: np.ndarray, levels: int) -> np.ndarray:
    """floor((M * levels) / amax) clamped — the exact IEEE double op
    order the DuckDB twin runs, so codes are bit-reproducible."""
    safe = np.where(amax == 0.0, 1.0, amax)
    codes = np.floor((M * float(levels)) / safe[None, :])
    np.clip(codes, -levels, levels, out=codes)
    return codes.astype(np.int64)


def quantize_embeddings(ds, id_col: str, vec_col: str, *, levels: int = 127):
    """Symmetric int8 scalar quantization of an embedding column — the
    4x ANN-index compression step: code = floor(x * levels / absmax_d)
    per dimension, clamped to [-levels, levels].

    Two passes, both shuffle-free: (1) per-batch per-dimension |x| max
    partials -> one tiny reduce for the global per-dim scale (ray.put
    broadcast); (2) one map_batches emits codes.  floor (not round) so
    the gate never hits a rounding-tie: numpy and SQL floor() agree on
    every representable double, whereas round() diverges half-even vs
    half-away.  The quantization expression is (x * levels) / absmax in
    BOTH engines — identical IEEE double op order, so codes are
    bit-reproducible in a DuckDB twin.  Output long (id, dim, code):
    the gate-friendly shape; a production sink would keep codes as a
    fixed_size_list<int8> column.
    """
    import ray as _ray

    scale_ref = _absmax_scale_ref(ds, vec_col)

    def quantize(tbl: pa.Table) -> pa.Table:
        amax = _ray.get(scale_ref)
        M = vec_matrix(tbl[vec_col])
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n, ndim = M.shape if M.size else (0, 0)
        codes = _quantize_matrix(M, amax, levels)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, ndim)),
                "dim": pa.array(np.tile(np.arange(ndim, dtype=np.int64), n)),
                "code": pa.array(codes.ravel()),
            }
        )

    return ds.map_batches(quantize, batch_format="pyarrow")


def int8_dot_topk(ds, id_col: str, vec_col: str, *, k: int = 10,
                  num_queries: int = 4, levels: int = 127,
                  num_partitions: int = 16, dims: "Optional[int]" = None):
    """Quantized exact-re-rank ANN: top-``k`` neighbors per query by
    the EXACT integer dot product of int8 quantization codes — the
    compressed-index scoring pass of a production vector search (codes
    are 4x smaller than float32; int64 accumulation of int8 products is
    overflow-free to 2^46 dims and bit-deterministic, so the gate needs
    no float tolerance).

    Queries = the ``num_queries`` smallest-id vectors (deterministic).
    Scale shape: one shuffle-free absmax pass -> broadcast per-dim
    scale; query codes broadcast once via ``ray.put``; each batch
    quantizes itself and matmuls against the (Q, d) query matrix —
    raw vectors never shuffle; per-batch partial top-k means at most
    Q x k rows leave any block, finished by ``grouped_topk``.  Ties
    break on vec_id ascending; the query itself is excluded.  Output
    (query_id, vec_id, dot).

    ``dims``: score on only the FIRST ``dims`` components (Matryoshka /
    truncated-embedding retrieval) — vectors and queries are sliced
    before quantization; the per-dim absmax scale of a kept dim is
    unchanged by the slice, so truncated codes equal the full run's
    leading codes."""
    import ray as _ray

    from .relational import grouped_topk

    scale_ref = _absmax_scale_ref(ds, vec_col)

    # deterministic query set: the num_queries smallest ids.  Per-batch
    # candidate prune keeps only each block's smallest ids, so the
    # driver sees #blocks x Q rows (same pattern as the kmeans init).
    def head_ids(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return tbl
        keep = np.argsort(ids, kind="stable")[:num_queries]
        return tbl.take(pa.array(np.sort(keep)))

    cand = ds.map_batches(head_ids, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(id_col).head(num_queries)
    q_ids = cand[id_col].to_numpy().astype(np.int64)
    qM = np.stack([np.asarray(v, dtype=np.float64) for v in cand[vec_col]]) \
        if len(cand) else np.empty((0, 0))
    amax = _ray.get(scale_ref)
    if dims is not None:
        qM = qM[:, :dims] if qM.size else qM
        amax = amax[:dims]
    q_codes = _quantize_matrix(qM, amax, levels) if qM.size else \
        np.empty((0, 0), np.int64)
    bundle_ref = _ray.put((q_ids, q_codes))

    out_schema = pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()),
                            ("dot", pa.int64())])

    def score(tbl: pa.Table) -> pa.Table:
        q_ids_, q_codes_ = _ray.get(bundle_ref)
        if len(q_ids_) == 0 or len(tbl) == 0:
            return out_schema.empty_table()
        amax_ = _ray.get(scale_ref)
        M = vec_matrix(tbl[vec_col])
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if dims is not None:
            M = M[:, :dims]
            amax_ = amax_[:dims]
        codes = _quantize_matrix(M, amax_, levels)
        dots = codes @ q_codes_.T  # (n, Q) exact int64
        qs, vs, dd = [], [], []
        for qi, qid in enumerate(q_ids_):
            col = dots[:, qi]
            mask = ids != qid
            cid, cdot = ids[mask], col[mask]
            if len(cid) > k:
                # partial top-k with (dot desc, id asc) tiebreak
                sel = np.lexsort((cid, -cdot))[:k]
                cid, cdot = cid[sel], cdot[sel]
            qs.append(np.full(len(cid), qid, np.int64))
            vs.append(cid)
            dd.append(cdot)
        return pa.Table.from_pydict(
            {"query_id": np.concatenate(qs), "vec_id": np.concatenate(vs),
             "dot": np.concatenate(dd)}, schema=out_schema)

    partials = ds.map_batches(score, batch_format="pyarrow")
    return grouped_topk(partials, "query_id",
                        [("dot", True), ("vec_id", False)], k=k,
                        num_partitions=num_partitions)


def kmeans(ds, id_col: str, vec_col: str, *, k: int = 8, max_iters: int = 20,
           tol: float = 1e-7):
    """Distributed Lloyd's k-means over an embedding column — the
    clustering step of a data-curation pipeline (domain balancing,
    per-cluster sampling).  Returns (assignments Dataset with columns
    (id, cluster), centroids ndarray (k, d), n_iters).

    Scale shape per iteration: centroids broadcast once (ray.put);
    each batch computes the (n, k) distance matrix, argmins, and
    reduces ITSELF to per-cluster (sum, count) partials via
    argsort+reduceat — raw vectors never shuffle and the reduce sees
    only k x d x #blocks tiny rows.  One final assignment pass emits
    (id, cluster).  Deterministic: init = the k smallest-id vectors
    (one tiny driver take on a sorted filter-free head), ties in
    argmin go to the lower cluster index.  Convergence = max centroid
    shift < tol (or max_iters)."""
    import ray as _ray

    # deterministic farthest-point init on a smallest-id sample: first
    # centroid = smallest id, each next = the sample point farthest
    # from the chosen set (ties to smaller id).  Greedy farthest-point
    # avoids the all-seeds-in-one-cluster local optimum that naive
    # first-k seeding hits, with no randomness to break reproducibility.
    sample_cap = max(64 * k, 256)

    def id_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)[:sample_cap]
        return t.select([id_col, vec_col]).take(pa.array(order))

    head = pa.concat_tables(
        [b for b in ds.map_batches(id_partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")],
        promote_options="default",
    )
    order = np.argsort(head[id_col].to_numpy(zero_copy_only=False))[:sample_cap]
    S = vec_matrix(head[vec_col].combine_chunks().take(pa.array(order)))
    if len(S) < k:
        raise ValueError(f"need >= {k} rows to init {k} clusters")
    chosen = [0]
    dmin = ((S - S[0]) ** 2).sum(axis=1)
    while len(chosen) < k:
        nxt = int(np.argmax(dmin))  # argmax ties -> smaller index/id
        chosen.append(nxt)
        dmin = np.minimum(dmin, ((S - S[nxt]) ** 2).sum(axis=1))
    centroids = S[chosen].copy()

    d = centroids.shape[1]

    def partials_for(c_ref):
        def fn(t: pa.Table) -> pa.Table:
            C = _ray.get(c_ref)
            M = vec_matrix(t[vec_col])
            if M.size == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.list_(pa.float64()))})
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin ignores ||x||^2
            scores = M @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
            assign = np.argmax(scores, axis=1)  # ties -> lower index
            order = np.argsort(assign, kind="stable")
            a_s = assign[order]
            starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]])
            sums = np.add.reduceat(M[order], starts, axis=0)
            counts = np.diff(np.r_[starts, len(a_s)])
            return pa.table({
                "cluster": pa.array(a_s[starts].astype(np.int64)),
                "n": pa.array(counts.astype(np.int64)),
                "vsum": pa.array(list(sums)),
            })

        return fn

    n_iters = 0
    for _ in range(max_iters):
        n_iters += 1
        c_ref = _ray.put(centroids)
        parts = ds.map_batches(partials_for(c_ref), batch_format="pyarrow")
        agg_s = np.zeros((k, d), dtype=np.float64)
        agg_n = np.zeros(k, dtype=np.int64)
        for b in parts.iter_batches(batch_format="pyarrow"):
            cl = b["cluster"].to_numpy(zero_copy_only=False)
            nn = b["n"].to_numpy(zero_copy_only=False)
            vs = vec_matrix(b["vsum"])
            np.add.at(agg_s, cl, vs)
            np.add.at(agg_n, cl, nn)
        new = np.where(agg_n[:, None] > 0, agg_s / np.maximum(agg_n, 1)[:, None],
                       centroids)
        shift = float(np.abs(new - centroids).max())
        centroids = new
        if shift < tol:
            break

    c_ref = _ray.put(centroids)

    def assign_fn(t: pa.Table) -> pa.Table:
        C = _ray.get(c_ref)
        M = vec_matrix(t[vec_col])
        scores = M @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
        return pa.table({
            "id": t[id_col].cast(pa.int64()).combine_chunks(),
            "cluster": pa.array(np.argmax(scores, axis=1).astype(np.int64)),
        })

    return ds.map_batches(assign_fn, batch_format="pyarrow"), centroids, n_iters


def rp_lsh_signatures(ds, id_col: str, vec_col: str, *, num_bits: int = 16,
                      levels: int = 127, key_stride: int = 1024):
    """Sign-random-projection LSH signatures (SimHash over embeddings):
    bit j of a vector's signature is the sign of its dot product with
    the j-th pseudo-random ±1 hyperplane — the classic cosine-LSH
    bucketing key (vectors sharing many bits are angularly close).

    Exactness shape: the projection runs over the int8 quantization
    codes (one shuffle-free absmax pass -> broadcast scale), and the
    hyperplanes are ±1 vectors derived from splitmix64(j*stride + dim)
    parity — so every dot product is bit-deterministic int64 arithmetic
    a DuckDB twin replays exactly (no float accumulation order issues).
    Scale shape: signatures are computed per batch with one (n,D)x(D,B)
    integer matmul; raw vectors never shuffle; the (B,D) sign matrix is
    regenerated in-worker (16x64 ints — cheaper than a broadcast).
    Output: (vec_id, sig) with sig = sum(bit_j << j), dot==0 -> bit 1.
    """
    import ray as _ray

    from .images.synth import splitmix64

    if num_bits > 62:
        raise ValueError("num_bits must fit a signed int64 signature")
    scale_ref = _absmax_scale_ref(ds, vec_col)
    weights = (np.int64(1) << np.arange(num_bits, dtype=np.int64))

    def sig_fn(tbl: pa.Table) -> pa.Table:
        amax = _ray.get(scale_ref)
        M = vec_matrix(tbl[vec_col])
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if M.size == 0:
            return pa.table({"vec_id": pa.array(ids),
                             "sig": pa.array(np.zeros(len(ids), np.int64))})
        codes = _quantize_matrix(M, amax, levels)
        d = codes.shape[1]
        if d >= key_stride:
            raise ValueError("key_stride must exceed the embedding dim")
        keys = (np.arange(num_bits, dtype=np.uint64)[:, None] * np.uint64(key_stride)
                + np.arange(d, dtype=np.uint64)[None, :])
        signs = np.where((splitmix64(keys.ravel()) & np.uint64(1)) == 0, 1, -1) \
            .astype(np.int64).reshape(num_bits, d)
        dots = codes @ signs.T
        sig = ((dots >= 0).astype(np.int64) * weights[None, :]).sum(axis=1)
        return pa.table({"vec_id": pa.array(ids), "sig": pa.array(sig)})

    return ds.map_batches(sig_fn, batch_format="pyarrow")


def pq_assign(ds, id_col: str, vec_col: str, *, num_subspaces: int = 8,
              num_centroids: int = 16, levels: int = 127,
              emit_distance: bool = False):
    """Product-quantization CODE ASSIGNMENT — the index-build step of a
    PQ/IVF-PQ vector store: the embedding splits into ``num_subspaces``
    contiguous subvectors and each maps to its nearest codebook entry,
    compressing a D-dim float vector to num_subspaces small ints.

    Deterministic-codebook variant (exactness over training): the
    codebook for subspace m is the int8 quantization codes of the
    ``num_centroids`` smallest-id vectors' m-th subvector — a
    data-derived, SQL-recomputable choice (production would kmeans each
    subspace; the assignment kernel below is identical either way).
    Distances are exact int64 sums of squared int8 code differences, so
    assignments are bit-deterministic; ties break to the smaller
    centroid id.

    Scale shape: one shuffle-free absmax pass -> broadcast per-dim
    scale; the (num_centroids, D) codebook rides one ray.put; each
    batch quantizes itself and computes an (n, C) distance matrix per
    subspace via vectorized broadcasting — raw vectors never shuffle.
    Output long (vec_id, subspace, code_id)."""
    import ray as _ray

    scale_ref = _absmax_scale_ref(ds, vec_col)

    # deterministic codebook source: the num_centroids smallest ids
    # (per-batch prune keeps the driver pull to #blocks x C rows)
    def head_ids(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return tbl
        keep = np.argsort(ids, kind="stable")[:num_centroids]
        return tbl.take(pa.array(np.sort(keep)))

    cand = ds.map_batches(head_ids, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(id_col).head(num_centroids)
    amax = _ray.get(scale_ref)
    cbM = np.stack([np.asarray(v, dtype=np.float64) for v in cand[vec_col]]) \
        if len(cand) else np.empty((0, 0))
    codebook = _quantize_matrix(cbM, amax, levels) if cbM.size else cbM
    cb_ref = _ray.put(codebook)

    def assign(tbl: pa.Table) -> pa.Table:
        cb = _ray.get(cb_ref)
        M = vec_matrix(tbl[vec_col])
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if M.size == 0 or cb.size == 0:
            empty = np.empty(0, np.int64)
            cols = {"vec_id": pa.array(empty), "subspace": pa.array(empty),
                    "code_id": pa.array(empty)}
            if emit_distance:
                cols["dist2"] = pa.array(empty)
            return pa.table(cols)
        codes = _quantize_matrix(M, _ray.get(scale_ref), levels)
        n, d = codes.shape
        sub = d // num_subspaces
        out_codes = np.empty((n, num_subspaces), dtype=np.int64)
        out_d2 = np.empty((n, num_subspaces), dtype=np.int64)
        for m in range(num_subspaces):
            sl = slice(m * sub, (m + 1) * sub)
            diff = codes[:, None, sl] - cb[None, :, sl]  # (n, C, sub)
            dist = np.einsum("ncs,ncs->nc", diff, diff)
            best = np.argmin(dist, axis=1)  # first min = low id
            out_codes[:, m] = best
            out_d2[:, m] = dist[np.arange(n), best]
        cols = {
            "vec_id": pa.array(np.repeat(ids, num_subspaces)),
            "subspace": pa.array(
                np.tile(np.arange(num_subspaces, dtype=np.int64), n)),
            "code_id": pa.array(out_codes.ravel()),
        }
        if emit_distance:
            cols["dist2"] = pa.array(out_d2.ravel())
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")
