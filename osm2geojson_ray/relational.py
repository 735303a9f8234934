"""Generic distributed relational helpers over Ray Data.

``hash_join`` is an explicit partitioned hash join: both sides get a
``__part = key % P`` column, are unioned under a padded superset
schema, and one ``groupby(__part).map_groups`` performs a vectorized
pandas merge per partition.  P Python calls total (one per partition),
never one per key.  Used instead of ``Dataset.join`` because Ray
2.49's join operator builds schema-less partitions from zero-block
inputs and crashes on empty sides (observed on pyarrow Table.join:
"No match ... for key field reference").
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _superset_schema(on: str, l_schema: pa.Schema, r_schema: pa.Schema) -> pa.Schema:
    key_field = l_schema.field(on)
    fields = [key_field]
    for f in l_schema:
        if f.name != on:
            fields.append(f)
    for f in r_schema:
        if f.name != on:
            if f.name in [x.name for x in fields]:
                raise ValueError(f"duplicate non-key column {f.name!r} in join")
            fields.append(f)
    fields.append(pa.field("__side", pa.int8()))
    return pa.schema(fields)


def pad_block_to(batch: pa.Table, superset: pa.Schema, side: int) -> pa.Table:
    """Pad one block to a join superset schema (missing columns become
    nulls) and stamp its ``__side``.  Module-level so producers that
    pre-split a join side with raw tasks (see ``hash_join``'s
    ``ShardedRefs`` inputs) build byte-identical shards to the Dataset
    path."""
    n = len(batch)
    arrays, names = [], []
    for f in superset:
        names.append(f.name)
        if f.name == "__side":
            arrays.append(pa.array(np.full(n, side, dtype=np.int8), type=pa.int8()))
        elif f.name in batch.column_names:
            arrays.append(batch[f.name].cast(f.type) if batch[f.name].type != f.type else batch[f.name])
        else:
            arrays.append(pa.nulls(n, type=f.type))
    return pa.Table.from_arrays(arrays, names=names)


def _pad_side(ds, on: str, own: pa.Schema, superset: pa.Schema, side: int, nparts: int):
    def pad(batch: pa.Table) -> pa.Table:
        return pad_block_to(batch, superset, side)

    return ds.map_batches(pad, batch_format="pyarrow")


def hash_join(
    left,
    right,
    *,
    on: str,
    l_schema: pa.Schema,
    r_schema: pa.Schema,
    how: str = "inner",
    num_partitions: int = 16,
    post_fn=None,
    emit_split_on: "Optional[Tuple[str, int]]" = None,
):
    """Equi-join two Datasets on an int64 key column.

    ``how``: "inner" | "left_outer" | "full_outer" | "left_anti" |
    "left_semi".
    Output schema: key + left columns + right columns (left columns
    only for anti/semi).  full_outer emits unmatched rows of BOTH
    sides (the other side's columns null; the key column taken from
    whichever side has the row).  Robust to empty inputs and arbitrary skew up
    to one partition's rows per worker heap.  ``left_anti`` keeps left
    rows whose key has NO match on the right, ``left_semi`` those WITH
    a match — both via one membership test per partition (duplicate
    right keys are fine — no pre-distinct shuffle, no row duplication
    from many-to-many matches).

    ``post_fn``: applied to each partition's merged table INSIDE the
    join reduce (e.g. padding to a downstream union schema).
    ``emit_split_on=(key2, P2)``: the reduce also splits its (post_fn'd)
    output by the next stage's key and the join returns a
    ``ShardedRefs`` (fused join->exchange; see hash_exchange_map) —
    ``None`` when both inputs are empty.
    """
    superset = _superset_schema(on, l_schema, r_schema)
    out_schema = pa.schema([f for f in superset if f.name not in ("__side", "__part")])
    l_names = [f.name for f in l_schema if f.name != on]
    r_names = [f.name for f in r_schema if f.name != on]
    if how in ("left_anti", "left_semi"):
        out_schema = pa.schema([superset.field(on)] + [l_schema.field(n) for n in l_names])
        pandas_how = None
    else:
        pandas_how = {"inner": "inner", "left_outer": "left",
                      "full_outer": "outer"}[how]

    # A side may arrive as a ``ShardedRefs`` already padded to the
    # superset schema (via ``pad_block_to``) and split on the join key
    # by its producer — the fused raw-task map side skips the Dataset
    # execution AND the per-block split hop entirely.
    lt = left if isinstance(left, ShardedRefs) else _pad_side(
        left, on, l_schema, superset, 0, num_partitions
    )
    rt = right if isinstance(right, ShardedRefs) else _pad_side(
        right, on, r_schema, superset, 1, num_partitions
    )
    if isinstance(lt, ShardedRefs) or isinstance(rt, ShardedRefs):
        both = [lt, rt]
    else:
        both = lt.union(rt)

    def merge_partition(tbl: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        lmask = pc.equal(tbl["__side"], 0)
        lt = tbl.filter(lmask)
        rt = tbl.filter(pc.invert(lmask))
        if how in ("left_anti", "left_semi"):
            lk = lt[on].to_numpy(zero_copy_only=False)
            rk = rt[on].to_numpy(zero_copy_only=False)
            hit = np.isin(lk, rk)
            keep = hit if how == "left_semi" else ~hit
            return lt.select([on] + l_names).filter(pa.array(keep))
        # key-index merge in pandas (flat ints, vectorized); payload
        # columns move via arrow take() so nested types survive
        ldf = pd.DataFrame({"k": lt[on].to_numpy(zero_copy_only=False),
                            "li": np.arange(len(lt))})
        rdf = pd.DataFrame({"k": rt[on].to_numpy(zero_copy_only=False),
                            "ri": np.arange(len(rt))})
        m = ldf.merge(rdf, on="k", how=pandas_how)
        ri_np = m["ri"].to_numpy(dtype="float64", na_value=np.nan)
        ri_mask = np.isnan(ri_np)
        ri = pa.array(np.where(ri_mask, 0, ri_np).astype(np.int64), mask=ri_mask)
        if how == "full_outer":
            # li may also be null (right-only rows); the key comes from
            # whichever side has the row (genuinely-null keys never
            # match, so coalesce(null, null) stays null — correct)
            li_np = m["li"].to_numpy(dtype="float64", na_value=np.nan)
            li_mask = np.isnan(li_np)
            li = pa.array(np.where(li_mask, 0, li_np).astype(np.int64),
                          mask=li_mask)
            lsel = lt.select([on] + l_names)
            key = pc.coalesce(
                lsel[on].take(li).combine_chunks(),
                rt[on].take(ri).combine_chunks(),
            )
            arrays = [key] + [lsel[c].take(li) for c in l_names]
        else:
            li = pa.array(m["li"].to_numpy().astype(np.int64))
            out_l = lt.select([on] + l_names).take(li)
            arrays = [out_l[c] for c in out_l.column_names]
        rt_sel = rt.select(r_names)
        for c in r_names:
            arrays.append(rt_sel[c].take(ri))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    fn = merge_partition if post_fn is None else (
        lambda t, _m=merge_partition, _p=post_fn: _p(_m(t))
    )
    exchanged = hash_exchange_map(
        both, on, num_partitions, fn, emit_split_on=emit_split_on
    )
    if exchanged is None and emit_split_on is None:
        return empty_dataset(out_schema)
    return exchanged


_CRC32_TABLE = None


def _crc32_table() -> np.ndarray:
    """The standard zlib/IEEE crc32 lookup table (poly 0xEDB88320)."""
    global _CRC32_TABLE
    if _CRC32_TABLE is None:
        c = np.arange(256, dtype=np.uint32)
        for _ in range(8):
            c = np.where(c & 1, 0xEDB88320 ^ (c >> 1), c >> 1).astype(np.uint32)
        _CRC32_TABLE = c
    return _CRC32_TABLE


def _crc32_vectorized(arr: pa.Array) -> np.ndarray:
    """zlib.crc32-identical hashes for a string array, computed with
    one vectorized pass per BYTE POSITION (not per row): rows are laid
    out as a padded (n, Lmax) byte matrix straight from the Arrow
    buffers, then the crc recurrence runs Lmax times over all rows at
    once.  Keys are short (ids/names), so Lmax is small; no per-row
    Python in the loop."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_binary())
    arr = pc.fill_null(arr, b"")
    buf_off, buf_data = arr.buffers()[1], arr.buffers()[2]
    # the offsets buffer starts at the array's logical offset
    offsets = np.frombuffer(buf_off, dtype=np.int64, count=len(arr) + 1 + arr.offset)[arr.offset:]
    data = np.frombuffer(buf_data, dtype=np.uint8) if buf_data is not None else np.empty(0, np.uint8)
    lengths = np.diff(offsets)
    lmax = int(lengths.max()) if len(lengths) else 0
    table = _crc32_table()
    crc = np.full(len(arr), 0xFFFFFFFF, dtype=np.uint32)
    if lmax:
        idx = offsets[:-1, None] + np.arange(lmax)[None, :]
        mask = np.arange(lmax)[None, :] < lengths[:, None]
        mat = data[np.where(mask, idx, 0)]
        for j in range(lmax):
            active = mask[:, j]
            cj = crc[active]
            crc[active] = table[(cj ^ mat[active, j]) & 0xFF] ^ (cj >> 8)
    return (crc ^ np.uint32(0xFFFFFFFF)).astype(np.int64)


def _part_of(keys: "pa.ChunkedArray | pa.Array", num_partitions: int) -> np.ndarray:
    """Partition id per row: int keys -> key % P (numpy semantics),
    string keys -> process-stable vectorized crc32 % P.  Null keys
    route deterministically (int nulls as 0, string nulls as "") so
    they land in a real partition instead of vanishing — a null left
    key in a left_outer/left_anti join must still survive the
    exchange."""
    if pa.types.is_integer(keys.type):
        if keys.null_count:
            import pyarrow.compute as pc

            keys = pc.fill_null(keys, 0)
        return keys.to_numpy(zero_copy_only=False).astype(np.int64) % num_partitions
    return _crc32_vectorized(
        keys if not isinstance(keys, pa.ChunkedArray) else keys.combine_chunks()
    ) % num_partitions


def _exchange_split(block: pa.Table, key: str, num_partitions: int):
    """Map side of the exchange: slice one block into per-partition
    shards (argsort + boundary slicing, one pass)."""
    part = np.asarray(_part_of(block[key], num_partitions), dtype=np.int64)
    order = np.argsort(part, kind="stable")
    sorted_parts = part[order]
    taken = block.take(pa.array(order))
    cuts = np.searchsorted(sorted_parts, np.arange(num_partitions + 1))
    return [taken.slice(cuts[p], cuts[p + 1] - cuts[p]) for p in range(num_partitions)]


class ShardedRefs:
    """A PRE-SPLIT exchange stream: ``shards[i][p]`` is the partition-p
    shard emitted by source task i.  Produced by an exchange (or join)
    whose reduce also split its output on the NEXT stage's key
    (``emit_split_on``) — the downstream exchange consumes these refs
    directly, skipping one full barrier + materialize + re-split hop.
    Exchange barriers are FLAT costs (identical at every parallelism
    level), so removing hops directly buys scaling efficiency."""

    def __init__(self, shards: List[list], num_partitions: int):
        self.shards = shards
        self.num_partitions = num_partitions


def hash_exchange_map(
    ds,
    key: str,
    num_partitions: int,
    fn,
    *,
    fn_format: str = "pyarrow",
    emit_split_on: "Optional[Tuple[str, int]]" = None,
    return_refs: bool = False,
):
    """Hash-partition input(s) on ``key`` and apply ``fn`` ONCE per
    partition — the classic two-stage shuffle (map: split each block
    into P shards; reduce: concat a shard from every block, run fn)
    built from raw Ray tasks over the Dataset's blocks.

    This intentionally drops below the Dataset API for the exchange
    itself: Ray Data's ``groupby`` is sort-based (sample + range
    partition + merge), which costs several seconds of fixed latency
    per shuffle regardless of data size.  A hash exchange needs no
    sort and no sampling; partition count is a data property chosen by
    the caller.  The result is re-wrapped as a Dataset
    (``from_arrow_refs``) so everything downstream stays in Ray Data.

    ``ds`` may be a Dataset, a ``ShardedRefs`` (pre-split by ``key``
    with the same partition count), or a list mixing both (a union).
    ``fn`` receives one pyarrow Table (or pandas DataFrame with
    ``fn_format='pandas'``) per partition, with a constant ``__part``
    column appended for drop-in compatibility with the
    ``_with_part().groupby('__part').map_groups(fn)`` pattern.

    ``emit_split_on=(next_key, next_parts)``: the reduce additionally
    splits fn's output by ``next_key`` and returns one object per
    next-partition — the result is a ``ShardedRefs`` for the next
    exchange instead of a Dataset (operator fusion across shuffles).

    ``return_refs=True``: return the raw per-partition object refs
    (one per reduce output, partition order) instead of wrapping them
    in a Dataset — callers that feed BOTH Dataset consumers and raw
    tasks avoid a re-iteration of the wrapped Dataset (each
    ``iter_internal_ref_bundles`` is a streaming-executor spin-up, a
    FLAT cost at every parallelism level)."""
    import ray as _ray

    @_ray.remote
    def _split(block, k, p):
        parts = _exchange_split(block, k, p)
        # with num_returns=1 Ray ships the return value whole: hand back
        # the single shard, not a 1-tuple
        return parts[0] if p == 1 else tuple(parts)

    @_ray.remote
    def _reduce(f, fmt, part_id, *shards):
        tbl = pa.concat_tables(shards, promote_options="default")
        tbl = tbl.append_column(
            "__part", pa.array(np.full(len(tbl), part_id, dtype=np.int64))
        )
        if fmt == "pandas":
            out = f(tbl.to_pandas())
            return pa.Table.from_pandas(out, preserve_index=False)
        return f(tbl)

    @_ray.remote
    def _reduce_split(f, fmt, part_id, k2, p2, *shards):
        tbl = pa.concat_tables(shards, promote_options="default")
        tbl = tbl.append_column(
            "__part", pa.array(np.full(len(tbl), part_id, dtype=np.int64))
        )
        if fmt == "pandas":
            out = pa.Table.from_pandas(f(tbl.to_pandas()), preserve_index=False)
        else:
            out = f(tbl)
        if "__part" in out.column_names:
            out = out.drop_columns(["__part"])
        parts = _exchange_split(out, k2, p2)
        return parts[0] if p2 == 1 else tuple(parts)

    inputs = ds if isinstance(ds, list) else [ds]
    shard_matrices: List[list] = []
    for inp in inputs:
        if inp is None:
            continue
        if isinstance(inp, ShardedRefs):
            if inp.num_partitions != num_partitions:
                raise ValueError(
                    f"pre-split input has {inp.num_partitions} partitions, "
                    f"exchange wants {num_partitions}"
                )
            shard_matrices.extend(inp.shards)
            continue
        # zero-row blocks surface with an EMPTY schema from Ray's
        # executor and would poison the shard concat — drop them via
        # metadata (no block fetch needed)
        block_refs = []
        for bundle in inp.iter_internal_ref_bundles():
            for block_ref, meta in bundle.blocks:
                if meta.num_rows is None or meta.num_rows > 0:
                    block_refs.append(block_ref)
        # num_returns=P: each shard is its own object, so a reduce task
        # fetches ONLY its shard from every block (true all-to-all)
        for b in block_refs:
            r = _split.options(num_returns=num_partitions).remote(b, key, num_partitions)
            shard_matrices.append([r] if num_partitions == 1 else list(r))
    if not shard_matrices:
        return None  # caller supplies the empty-result schema
    fn_ref = _ray.put(fn)
    if emit_split_on is not None:
        k2, p2 = emit_split_on
        out_shards = []
        for p in range(num_partitions):
            r = _reduce_split.options(num_returns=p2).remote(
                fn_ref, fn_format, p, k2, p2, *[s[p] for s in shard_matrices]
            )
            out_shards.append([r] if p2 == 1 else list(r))
        return ShardedRefs(out_shards, p2)
    out_refs = [
        _reduce.remote(fn_ref, fn_format, p, *[s[p] for s in shard_matrices])
        for p in range(num_partitions)
    ]
    if return_refs:
        return out_refs
    return ray.data.from_arrow_refs(out_refs)


def from_arrow_refs_lazy(
    refs, schema: pa.Schema, est_block_bytes: int = 4 << 20, meta=None
):
    """Non-blocking ``ray.data.from_arrow_refs`` for table refs whose
    schema the caller already knows.  The stock constructor launches a
    metadata task per ref and ``ray.get``s them — a DRIVER BARRIER on
    every still-pending upstream task (flat latency at every parallelism
    level).  Here the metadata is supplied locally (known schema,
    unknown row counts, estimated size for backpressure accounting) so
    the Dataset constructs instantly and downstream operators pipeline
    with the producing tasks.

    Constraint: a dataset built this way must pass through at least one
    map/filter before count()/union() (Ray asserts known row counts on
    RAW bundles) — every call site here does — UNLESS ``meta`` is given:
    a list of ``(num_rows, size_bytes)`` per ref (the producing tasks
    report them as a tiny second return), which makes the view fully
    metadata-complete so count()/take/union work directly on the raw
    bundles.  Falls back to the blocking constructor if Ray internals
    change shape."""
    import ray as _ray

    try:
        from ray.data import DataContext
        from ray.data._internal.logical.interfaces import LogicalPlan
        from ray.data._internal.logical.operators.from_operators import FromArrow
        from ray.data._internal.plan import ExecutionPlan
        from ray.data._internal.stats import DatasetStats
        from ray.data.block import BlockMetadata, BlockMetadataWithSchema
        from ray.data.dataset import MaterializedDataset

        if meta is not None:
            mds = [
                BlockMetadataWithSchema(
                    BlockMetadata(num_rows=int(r), size_bytes=int(b),
                                  input_files=None, exec_stats=None),
                    schema=schema,
                )
                for (r, b) in meta
            ]
        else:
            mds = [
                BlockMetadataWithSchema(
                    BlockMetadata(num_rows=None, size_bytes=est_block_bytes,
                                  input_files=None, exec_stats=None),
                    schema=schema,
                )
                for _ in refs
            ]
        plan = ExecutionPlan(
            DatasetStats(metadata={"FromArrow": mds}, parent=None),
            DataContext.get_current().copy(),
        )
        lp = LogicalPlan(FromArrow(list(refs), mds), plan._context)
        return MaterializedDataset(plan, lp)
    except Exception:
        return ray.data.from_arrow_refs(list(refs))


def coalesce_blocks(ds, num_partitions: int):
    """Concatenate a too-fragmented Dataset down to ~num_partitions
    blocks with raw concat tasks — no shuffle, no sort, no row
    movement beyond the concat (cheap alternative to ``repartition``
    when blocks only need consolidating, not rebalancing)."""
    import ray as _ray

    @_ray.remote
    def _concat(*blocks):
        return pa.concat_tables(blocks, promote_options="default")

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(block_ref)
    if not refs:
        return ds
    groups = np.array_split(np.arange(len(refs)), min(num_partitions, len(refs)))
    out = [_concat.remote(*[refs[i] for i in g]) for g in groups if len(g)]
    return ray.data.from_arrow_refs(out)


def _with_part(ds, key: str, num_partitions: int):
    def add(batch: pa.Table) -> pa.Table:
        part = _part_of(batch[key], num_partitions)
        return batch.append_column("__part", pa.array(part.astype(np.int64)))

    return ds.map_batches(add, batch_format="pyarrow")


def distinct_on(ds, key: str, *, num_partitions: int = 16, sort_by=None, subset=None):
    """Keep one row per distinct ``key`` — partition-wise vectorized
    pandas dedup (P Python calls), NOT ``groupby(key)`` whose per-group
    overhead is ~0.1 ms and dominates at high cardinality.

    ``sort_by``: optional column list ordering rows before dedup so
    "first" is deterministic (e.g. min id wins).
    ``subset``: columns defining row identity for the dedup itself
    (default ``[key]``).  When ``key`` is a derived routing hash, pass
    the real identity columns here so a hash collision cannot merge two
    distinct rows — equal subsets always share a hash, so partitioning
    by the hash keeps the dedup complete."""

    def dedup(df):
        if sort_by:
            df = df.sort_values(sort_by, kind="stable")
        return df.drop_duplicates(subset=subset or [key]).drop(columns="__part")

    out = hash_exchange_map(ds, key, num_partitions, dedup, fn_format="pandas")
    if out is None:  # empty input: fall back to the (cheap) groupby path
        return _with_part(ds, key, num_partitions).groupby("__part").map_groups(
            dedup, batch_format="pandas"
        )
    return out


def grouped_count(ds, key: str, *, num_partitions: int = 16, alias: str = "n"):
    """(key, count) pairs — partition-wise pandas value_counts; complete
    because partitioning is by the key itself."""

    def count(df):
        out = df.groupby(key, sort=False).size().reset_index(name=alias)
        return out

    res = hash_exchange_map(ds, key, num_partitions, count, fn_format="pandas")
    if res is None:
        return _with_part(ds, key, num_partitions).groupby("__part").map_groups(
            count, batch_format="pandas"
        )
    return res


def partial_grouped_agg(ds, keys: List[str], aggs: Dict[str, Tuple[str, str]]):
    """Combiner push-down for grouped aggregation: each batch reduces to
    one partial row per group key ("sum"/"count" specs), so only
    #groups x #blocks tiny partial rows reach the final (small) groupby
    — raw rows never shuffle.  ``aggs``: {out_col: (in_col, "sum") |
    (None, "count") | (in_col, "max") | (in_col, "min") |
    (in_col, "xor") | (in_col, "or")} — count partials combine by sum,
    max by max, min by min, xor by xor, or by or (all associative;
    xor is SQL ``bit_xor``, an order-independent integer fingerprint
    aggregate; or is SQL ``bit_or``, the bitmap-index set-union
    aggregate).  The scale
    pattern for low-cardinality keys; for high-cardinality keys use
    hash_exchange_map instead (the xor partial additionally pays one
    per-group reduce call, bounded by that same cardinality)."""
    import pandas as pd

    def _xor_reduce(s):
        return np.bitwise_xor.reduce(s.to_numpy())

    def _or_reduce(s):
        return np.bitwise_or.reduce(s.to_numpy())

    def partial(df):
        # dropna=False: null group keys must aggregate like any other
        # key (matching Dataset.groupby / SQL GROUP BY semantics)
        g = df.groupby(keys, sort=False, dropna=False)
        out = {}
        for out_col, (in_col, how) in aggs.items():
            if how == "sum":
                out[out_col] = g[in_col].sum()
            elif how == "max":
                out[out_col] = g[in_col].max()
            elif how == "min":
                out[out_col] = g[in_col].min()
            elif how == "xor":
                out[out_col] = g[in_col].agg(_xor_reduce)
            elif how == "or":
                out[out_col] = g[in_col].agg(_or_reduce)
            else:
                out[out_col] = g.size()
        return pd.DataFrame(out).reset_index()

    import ray as _ray

    partials = ds.map_batches(partial, batch_format="pandas")

    # final reduce: the partial stream holds <= #groups x #blocks tiny
    # rows, so ONE remote concat+groupby task replaces Ray Data's
    # SORT-based groupby (which pays ~2-4s of fixed sample/sort latency
    # regardless of size — the banked hash-exchange lesson applies to
    # the combine side too)
    @_ray.remote
    def _final(*blocks):
        import pandas as _pd

        frames = [
            b if isinstance(b, _pd.DataFrame) else b.to_pandas() for b in blocks
        ]
        df = _pd.concat(frames, ignore_index=True)
        g = df.groupby(keys, sort=False, dropna=False)

        def _combine(c):
            how = aggs[c][1]
            if how == "max":
                return g[c].max()
            if how == "min":
                return g[c].min()
            if how == "xor":
                return g[c].agg(lambda s: np.bitwise_xor.reduce(s.to_numpy()))
            if how == "or":
                return g[c].agg(lambda s: np.bitwise_or.reduce(s.to_numpy()))
            return g[c].sum()

        out = {c: _combine(c) for c in aggs}
        return pa.Table.from_pandas(_pd.DataFrame(out).reset_index(), preserve_index=False)

    refs = []
    for bundle in partials.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(block_ref)
    if not refs:
        return partials
    return ray.data.from_arrow_refs([_final.remote(*refs)])


def _sort_view(a: np.ndarray, desc: bool) -> np.ndarray:
    """Order-preserving (or order-reversing) view of a sort key for
    np.lexsort.  Descending integers use bitwise complement (exact, no
    overflow, no float round-trip); descending floats negate (exact)."""
    if not desc:
        return a
    if np.issubdtype(a.dtype, np.integer):
        return ~a
    if np.issubdtype(a.dtype, np.floating):
        return -a
    raise TypeError(f"descending sort unsupported for dtype {a.dtype}")


def topk(ds, keys: List[Tuple[str, bool]], *, k: int):
    """Global top-k rows ordered by ``keys`` ([(col, descending)], first
    key primary) WITHOUT a sort shuffle: each batch reduces to its local
    top-k via one vectorized lexsort inside ``map_batches``, then ONE
    remote concat+lexsort task picks the global winners from the tiny
    candidate stream (<= k x blocks rows).  Replaces
    ``Dataset.sort(...).limit(k)``, whose sort is an all-to-all shuffle
    with seconds of fixed sample/sort latency — a scale-killer for a
    LIMIT k (same lesson as spatial/knn._topk_reduce, generalized).
    Null keys are unsupported (raise upstream); string keys ascending
    only."""
    import ray as _ray

    def _order(tbl: pa.Table) -> np.ndarray:
        views = []
        for col, desc in reversed(keys):  # lexsort: last key is primary
            views.append(_sort_view(tbl[col].to_numpy(zero_copy_only=False), desc))
        return np.lexsort(views)

    def local(tbl: pa.Table) -> pa.Table:
        if len(tbl) <= k:
            return tbl
        return tbl.take(pa.array(_order(tbl)[:k]))

    candidates = ds.map_batches(local, batch_format="pyarrow")

    @_ray.remote
    def _final(*blocks):
        tbl = pa.concat_tables(blocks, promote_options="default")
        return tbl.take(pa.array(_order(tbl)[:k]))

    refs = []
    for bundle in candidates.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(block_ref)
    if not refs:
        return candidates
    return ray.data.from_arrow_refs([_final.remote(*refs)])


def grouped_topk(
    ds,
    group_key: str,
    order_keys: List[Tuple[str, bool]],
    *,
    k: int,
    num_partitions: int = 16,
):
    """Per-group top-k (the distributed ``ROW_NUMBER() OVER (PARTITION
    BY g ORDER BY ...) <= k`` pattern) without a sort shuffle: each
    block first reduces to ITS top-k per group via one vectorized
    lexsort + rank-within-group (so at most k x groups-in-block rows
    leave any block), then the slim candidate stream hash-exchanges on
    ``group_key`` and the same kernel runs once per partition where
    every surviving candidate of a group is co-located.  Raw rows never
    shuffle; the exchange carries <= k x groups x blocks rows.

    ``order_keys`` = [(col, descending)], first key primary; callers
    wanting deterministic output must include a unique tiebreak column.
    ``group_key`` must be a non-null integer column (hash-exchange key);
    order columns follow ``_sort_view``'s dtype rules.  Output columns
    = input columns (no rank column), group-interleaved order.
    """

    def local(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        n = len(tbl)
        if n == 0:
            return tbl
        g = tbl[group_key].to_numpy(zero_copy_only=False)
        views = [
            _sort_view(tbl[col].to_numpy(zero_copy_only=False), desc)
            for col, desc in reversed(order_keys)
        ]
        order = np.lexsort(views + [g])  # group is the primary key
        g_sorted = g[order]
        idx = np.arange(n)
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        starts[1:] = g_sorted[1:] != g_sorted[:-1]
        group_start = np.maximum.accumulate(np.where(starts, idx, 0))
        keep = (idx - group_start) < k
        return tbl.take(pa.array(order[keep]))

    candidates = ds.map_batches(local, batch_format="pyarrow")
    out = hash_exchange_map(candidates, group_key, num_partitions, local)
    if out is None:
        return candidates  # empty input: pass the (empty) stream through
    return out


def grouped_quantiles(ds, group_key: str, value_col: str, qs: Dict[str, float], *,
                      n_col=None, interpolate: bool = False):
    """Distributed EXACT quantiles per group for discrete (integer-ish)
    value columns — the exact member of the sketch-aggregate family:
    each block first collapses to a (group, value) -> count histogram
    (partial_grouped_agg, so raw rows never shuffle), the merged
    histogram is one small block by construction, and quantiles read
    off the per-group cdf.  Shuffle volume is bounded by #groups x
    #distinct-values regardless of row count; for continuous values,
    band/bucket them upstream (that is the exact->approximate trade
    every quantile sketch makes).

    Quantile rule matches DuckDB/Postgres ``percentile_disc`` /
    ``quantile_disc``: the first value whose cumulative count reaches
    rank ``max(ceil(q*N), 1)``.  With ``interpolate=True`` it instead
    matches ``quantile_cont`` (type R-7 linear interpolation at
    ``h = q*(N-1)`` between adjacent order statistics, float output) —
    still exact, read off the same merged histogram.  ``qs`` maps
    output column -> q in [0, 1]; ``n_col`` optionally adds the
    per-group row count."""
    import math

    import pandas as pd

    hist = partial_grouped_agg(
        ds.select_columns([group_key, value_col]),
        [group_key, value_col],
        {"__cnt": (None, "count")},
    )

    def finalize(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([group_key, value_col])
        rows = []
        for g, sub in df.groupby(group_key, sort=True):
            v = sub[value_col].to_numpy()
            cum = np.cumsum(sub["__cnt"].to_numpy())
            total = int(cum[-1])
            row = {group_key: g}
            for name, q in qs.items():
                if interpolate:
                    h = q * (total - 1)
                    lo = v[np.searchsorted(cum, int(np.floor(h)) + 1, "left")]
                    hi = v[np.searchsorted(cum, int(np.ceil(h)) + 1, "left")]
                    row[name] = float(lo) + (h - np.floor(h)) * (float(hi) - float(lo))
                else:
                    rank = max(math.ceil(q * total), 1)
                    row[name] = v[np.searchsorted(cum, rank, "left")]
            if n_col:
                row[n_col] = total
            rows.append(row)
        return pd.DataFrame(rows)

    # the merged histogram is ONE block (partial_grouped_agg's final is
    # a single concat+groupby task), so batch_size=None sees it whole
    return hist.map_batches(finalize, batch_format="pandas", batch_size=None)


def _sample_hashes(tbl: pa.Table, key_col: str) -> np.ndarray:
    """Per-row uint64 splitmix64 hash of an integer key column
    (null-safe extraction; nulls hash as key 0)."""
    import pyarrow.compute as pc

    from .images.synth import splitmix64

    keys = (
        pc.fill_null(tbl[key_col], 0)
        .cast(pa.int64())
        .combine_chunks()
        .to_numpy(zero_copy_only=False)
        .astype(np.uint64)
    )
    return splitmix64(keys)


def hash_sample(ds, key_col: str, keep_num: int, keep_den: int):
    """Deterministic hash sampling: keep rows where
    ``splitmix64(key) % keep_den < keep_num`` — the reproducible,
    cluster-stable way to sample a 100-TB table (no RNG state, no
    shuffle, no coordination; every worker makes the identical decision
    for a given key, so reruns/resumes keep the same sample).  The key
    should be a stable integer id; keys must be non-negative for the
    SQL mirror (HUGEINT cast) to agree."""

    def fn(tbl: pa.Table) -> pa.Table:
        keep = _sample_hashes(tbl, key_col) % np.uint64(keep_den) < np.uint64(keep_num)
        return tbl.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_hash_sample(
    ds,
    key_col: str,
    strata_col: str,
    rates: Dict[str, int],
    default_num: int,
    keep_den: int,
):
    """Per-stratum deterministic sampling: a row in stratum ``s`` is
    kept iff ``splitmix64(key) % keep_den < rates.get(s, default_num)``
    — the standard quota-by-language/source shape for training-data
    curation, still shuffle-free.  ``rates`` maps stratum string values
    to keep_num over the common ``keep_den``; unlisted strata (and null)
    use ``default_num``.  Vectorized: strata resolve to per-row
    thresholds via one ``index_in`` dictionary lookup."""
    import pyarrow.compute as pc

    strata_vals = list(rates)
    nums = np.array([rates[s] for s in strata_vals] + [default_num], dtype=np.uint64)
    value_set = pa.array(strata_vals, pa.string())

    def fn(tbl: pa.Table) -> pa.Table:
        h = _sample_hashes(tbl, key_col)
        codes = (
            pc.fill_null(pc.index_in(tbl[strata_col], value_set=value_set), len(strata_vals))
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        keep = h % np.uint64(keep_den) < nums[codes]
        return tbl.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_hash_sample(ds, key_col: str, weight_col: str, keep_den: int,
                         *, max_weight: Optional[int] = None):
    """Deterministic sampling proportional to a per-row INTEGER weight:
    keep a row iff ``splitmix64(key) % keep_den < weight`` — each row's
    inclusion probability is ``weight / keep_den`` (weights clamped to
    [0, keep_den], optionally pre-capped at ``max_weight``).  The
    weighted twin of ``hash_sample``: quality-score- or
    length-proportional curation sampling that stays shuffle-free,
    RNG-state-free and rerun/resume-stable at 100-TB scale, and is
    exactly reproducible by the splitmix64 SQL mirror in pure integer
    arithmetic."""
    import pyarrow.compute as pc

    def fn(tbl: pa.Table) -> pa.Table:
        h = _sample_hashes(tbl, key_col)
        w = (
            pc.fill_null(tbl[weight_col], 0)
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        if max_weight is not None:
            w = np.minimum(w, max_weight)
        w = np.clip(w, 0, keep_den).astype(np.uint64)
        keep = h % np.uint64(keep_den) < w
        return tbl.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def heavy_hitters(
    ds,
    item_col: str,
    *,
    weight_col: Optional[str] = None,
    threshold_num: int,
    threshold_den: int,
    capacity: Optional[int] = None,
    out_col: str = "weight",
):
    """EXACT frequent items above a rational frequency threshold
    (``weight(item) * threshold_den > threshold_num * total``) via a
    Misra-Gries sketch pass + an exact verification pass — the
    two-pass heavy-hitters shape that works at 100 TB because raw rows
    never shuffle in either pass:

    - pass 1: each batch aggregates exactly (dictionary encode +
      bincount), then Misra-Gries-compresses to ``capacity`` rows by
      subtracting the (capacity+1)-th largest weight — a lower-bound
      summary with per-batch error <= W_batch/(capacity+1).  Summed
      over batches the total error is < total/(capacity+1), so with
      capacity >= 4*threshold_den/threshold_num every true heavy
      hitter survives compression (guaranteed-complete candidates).
    - pass 2: candidate items broadcast (one ray.put), rows filter to
      candidates, and a combiner push-down computes EXACT weights; the
      integer cross-multiplied threshold keeps the final filter exact
      (no float frequency compare).

    ``weight_col=None`` counts rows.  ``total`` is the exact global
    weight (one metadata-cheap aggregate pass).  ``item_col`` must be a
    string column (the token/URL/key case); weights int64.  Output:
    (item_col, out_col) for qualifying items only — exact values, the
    sketch only prunes."""
    import pyarrow.compute as pc

    import ray as _ray

    total = int(ds.sum(weight_col) if weight_col else ds.count())
    if total == 0:
        return empty_dataset(
            pa.schema([(item_col, pa.string()), (out_col, pa.int64())])
        )
    m = capacity or int(np.ceil(4.0 * threshold_den / max(threshold_num, 1)))

    def _agg_batch(tbl: pa.Table):
        col = tbl[item_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return None, None
        denc = col.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if weight_col is not None:
            w = tbl[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
            agg = np.bincount(codes, weights=w, minlength=len(denc.dictionary))
            agg = agg.astype(np.int64)
        else:
            agg = np.bincount(codes, minlength=len(denc.dictionary)).astype(np.int64)
        return denc.dictionary, agg

    def summarize(tbl: pa.Table) -> pa.Table:
        items, agg = _agg_batch(tbl)
        empty = pa.table(
            {item_col: pa.array([], pa.string()), "__w": pa.array([], pa.int64())}
        )
        if items is None:
            return empty
        if len(agg) > m:
            # Misra-Gries compression: decrement everything by the
            # (m+1)-th largest weight; survivors keep a lower bound
            delta = np.partition(agg, len(agg) - (m + 1))[len(agg) - (m + 1)]
            agg = agg - delta
        keep = np.flatnonzero(agg > 0)
        if len(keep) == 0:
            return empty
        return pa.table(
            {item_col: items.take(pa.array(keep)), "__w": pa.array(agg[keep])}
        )

    merged = partial_grouped_agg(
        ds.map_batches(summarize, batch_format="pyarrow"),
        [item_col],
        {"__w": ("__w", "sum")},
    ).to_pandas()
    # verify ALL merged candidates exactly (<= capacity x blocks rows;
    # the MG guarantee only says no heavy hitter is MISSING from them)
    cand = pa.array(merged[item_col].tolist(), pa.string())
    ref = _ray.put(cand)

    def exact_filter(tbl: pa.Table) -> pa.Table:
        from .worker_state import cache_key_for_ref, get_or_build

        vocab = get_or_build(
            ("heavy_hitters_cand", cache_key_for_ref(ref)), lambda: _ray.get(ref)
        )
        hit = pc.is_in(tbl[item_col], value_set=vocab)
        cols = [item_col] + ([weight_col] if weight_col else [])
        return tbl.select(cols).filter(hit)

    agg_spec = (
        {out_col: (weight_col, "sum")} if weight_col else {out_col: (None, "count")}
    )
    exact = partial_grouped_agg(
        ds.map_batches(exact_filter, batch_format="pyarrow"), [item_col], agg_spec
    )

    def final_filter(tbl: pa.Table) -> pa.Table:
        w = tbl[out_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # integer cross-multiply: exact rational threshold, no floats
        keep = w * np.int64(threshold_den) > np.int64(threshold_num) * np.int64(total)
        return tbl.filter(pa.array(keep))

    return exact.map_batches(final_filter, batch_format="pyarrow")


def rollup_agg(ds, keys: List[str], aggs: Dict[str, Tuple[Optional[str], str]],
               *, grouping_sets: Optional[List[List[str]]] = None):
    """GROUP BY ROLLUP / CUBE / GROUPING SETS in ONE pass over the
    data: each batch emits stacked partial rows for every grouping set
    (columns outside a set null), then the same single concat+groupby
    reduce as ``partial_grouped_agg`` finishes.  Raw rows never shuffle
    and the data is read once — the naive set-per-groupby plan scans
    len(sets) times.

    Default sets = ROLLUP (full keys, each prefix, grand total); pass
    ``grouping_sets`` explicitly for CUBE (`cube_sets(keys)`) or any
    custom GROUPING SETS.  ``aggs`` like partial_grouped_agg: {out:
    (in_col, "sum") | (None, "count")} — counts become sums of partial
    counts at the reduce.  Set membership is identified by null key
    values, so source key columns must be non-null (same ambiguity SQL
    ROLLUP/CUBE has without GROUPING())."""
    import pandas as pd

    levels = (
        [list(g) for g in grouping_sets]
        if grouping_sets is not None
        else [keys[:i] for i in range(len(keys), -1, -1)]
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        outs = []
        for lv in levels:
            if lv:
                g = df.groupby(lv, sort=False, dropna=False)
                out = {}
                for oc, (ic, how) in aggs.items():
                    out[oc] = g[ic].sum() if how == "sum" else g.size()
                p = pd.DataFrame(out).reset_index()
            else:
                row = {
                    oc: (df[ic].sum() if how == "sum" else len(df))
                    for oc, (ic, how) in aggs.items()
                }
                p = pd.DataFrame([row])
            for k in keys:
                if k not in p.columns:
                    p[k] = None
            outs.append(p[keys + list(aggs)])
        return pd.concat(outs, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas")
    return partial_grouped_agg(
        partials, keys, {oc: (oc, "sum") for oc in aggs}
    )


def hll_registers(ds, key_col: str, *, p: int = 12):
    """HyperLogLog registers for approximate COUNT DISTINCT — THE
    mergeable cardinality sketch: per batch, splitmix64(key) routes to
    register ``h & (m-1)`` with rank ``rho`` = 1 + leading-zero count
    of the remaining 64-p bits; per-batch registers collapse via
    argsort+maximum.reduceat (no per-row Python), and partials merge by
    elementwise MAX (associative — the whole point of the sketch: a
    10^12-row table reduces to m=2^p ints that merge across any
    partitioning).  Output: (register_idx, register) rows for the
    nonzero registers — pure integer values, deterministically
    reproducible (the SQL oracle recomputes them exactly).  Use
    ``hll_estimate`` on the collected registers for the cardinality."""
    m = 1 << p

    def partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .images.synth import splitmix64

        keys = (
            pc.fill_null(tbl[key_col], 0)
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        if len(keys) == 0:
            return pa.table(
                {"register_idx": pa.array([], pa.int64()),
                 "register": pa.array([], pa.int64())}
            )
        h = splitmix64(keys)
        idx = (h & np.uint64(m - 1)).astype(np.int64)
        w = (h >> np.uint64(p)).astype(np.uint64)
        # rho = 1 + leading zeros of the (64-p)-bit stream w; w < 2^52
        # for p >= 12, so float64 log2 is exact at every boundary
        width = 64 - p
        rho = np.where(
            w == 0,
            np.int64(width + 1),
            (width - np.floor(np.log2(np.maximum(w, 1))).astype(np.int64)),
        ).astype(np.int64)
        order = np.argsort(idx, kind="stable")
        idx_s, rho_s = idx[order], rho[order]
        starts = np.flatnonzero(np.r_[True, idx_s[1:] != idx_s[:-1]])
        regs = np.maximum.reduceat(rho_s, starts)
        return pa.table(
            {"register_idx": pa.array(idx_s[starts]),
             "register": pa.array(regs)}
        )

    return partial_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["register_idx"],
        {"register": ("register", "max")},
    )


def grouped_hll_registers(ds, group_col: str, key_col: str, *, p: int = 12):
    """Per-group HyperLogLog registers — the mergeable distinct sketch
    keyed by a group column (e.g. one sketch per DAY): per batch the
    (group, register_idx) -> max(rho) partial collapses via one packed
    argsort+maximum.reduceat (no per-row Python), partials merge by
    grouped MAX.  The output is #groups x <= 2^p tiny integer rows —
    the shape that makes SLIDING-window distinct counts a register
    max-merge over the window's groups instead of a re-scan of raw
    rows.  Register values are bit-identical to hll_registers (same
    splitmix64 route/rho), so a SQL twin recomputes them exactly."""
    m = 1 << p
    width = 64 - p

    def partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .images.synth import splitmix64

        keys = (
            pc.fill_null(tbl[key_col], 0)
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        grp = tbl[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        if len(keys) == 0:
            return pa.table(
                {group_col: grp.slice(0, 0),
                 "register_idx": pa.array([], pa.int64()),
                 "register": pa.array([], pa.int64())}
            )
        h = splitmix64(keys)
        idx = (h & np.uint64(m - 1)).astype(np.int64)
        w = (h >> np.uint64(p)).astype(np.uint64)
        rho = np.where(
            w == 0,
            np.int64(width + 1),
            (width - np.floor(np.log2(np.maximum(w, 1))).astype(np.int64)),
        ).astype(np.int64)
        genc = grp.dictionary_encode()
        gcodes = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed = gcodes * m + idx
        order = np.argsort(packed, kind="stable")
        pk_s, rho_s = packed[order], rho[order]
        starts = np.flatnonzero(np.r_[True, pk_s[1:] != pk_s[:-1]])
        regs = np.maximum.reduceat(rho_s, starts)
        return pa.table(
            {group_col: genc.dictionary.take(pa.array(pk_s[starts] // m)),
             "register_idx": pa.array(pk_s[starts] % m),
             "register": pa.array(regs)}
        )

    return partial_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "register_idx"],
        {"register": ("register", "max")},
    )


def hll_estimate(registers: pa.Table, *, p: int = 12) -> float:
    """Standard HLL cardinality estimate from (register_idx, register)
    rows (absent rows = zero registers): bias-corrected raw estimate
    with the small-range linear-counting correction."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.int64)
    reg[registers["register_idx"].to_numpy()] = registers["register"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if raw <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting
    return float(raw)


def cube_sets(keys: List[str]) -> List[List[str]]:
    """All 2^len(keys) grouping sets of GROUP BY CUBE, for
    ``rollup_agg(grouping_sets=...)``."""
    import itertools

    out: List[List[str]] = []
    for r in range(len(keys), -1, -1):
        out.extend(list(c) for c in itertools.combinations(keys, r))
    return out


def partitioned_window(
    ds,
    part_col: str,
    order_keys: List[Tuple[str, bool]],
    ops: Dict[str, Tuple[Optional[str], str]],
    *,
    num_partitions: int = 16,
):
    """Partitioned window functions — the distributed ``f() OVER
    (PARTITION BY part ORDER BY ...)`` family: one hash exchange on the
    partition key co-locates each group, then every partition computes
    ALL requested windows in one vectorized pass (lexsort + segmented
    cumsum/shift — no per-row Python, no global sort).

    ``ops``: {out_col: (in_col, kind)} with kind one of
      - "cumsum":     running sum of an int64 column (use integer-scaled
                      values for float money: bit-exact, order-robust)
      - "row_number": 1-based rank within the partition
      - "lag":        previous row's value (null at partition starts)
      - "lead":       next row's value (null at partition ends)
      - "first_value": the partition's first value in order
      - "last_value": the partition's last value (SQL LAST_VALUE over
                      the full frame: ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING)
      - "rank":       SQL RANK() where ties are rows sharing ``in_col``
                      (in_col must be one of the order keys; ties share
                      the run-start position, so the result depends only
                      on key VALUES — deterministic even when the
                      trailing tiebreak is dropped from the SQL twin)
      - "dense_rank": SQL DENSE_RANK() over ``in_col`` ties (gap-free)
      - "ntile:N":    SQL NTILE(N) over the FULL order_keys — needs a
                      unique tiebreak in order_keys to be deterministic;
                      the first (size % N) buckets hold one extra row
                      each, matching the SQL distribution exactly
      - "rollsum:K":  SQL SUM(x) OVER (... ROWS BETWEEN K PRECEDING AND
                      CURRENT ROW) — a cumsum difference against the
                      frame start (clamped to the partition start), so
                      the sliding frame costs O(n) not O(nK)
      - "cummax":     running max of an int64 column (SQL MAX(x) OVER
                      (... ROWS UNBOUNDED PRECEDING) — the
                      high-water-mark / watermark primitive)
      - "cummin":     running min, symmetric
      - "rank_den":   the PERCENT_RANK denominator (size-1) as an
                      int64 — emit next to "rank" and gate the exact
                      rational (rank-1)/(size-1) as two integers
                      instead of a float
      - "cume_num":   the CUME_DIST numerator (#rows with order key <=
                      current, within the partition) as an int64 —
                      with "rank_den"+1 as denominator this is the
                      exact CUME_DIST rational

    ``order_keys`` = [(col, descending)]; include a unique tiebreak for
    deterministic output.  Output = input columns + window columns,
    partition-sorted within blocks.  Skew note: one partition key's
    whole group lands on one task — salt upstream if a single key
    approaches block size."""

    def kernel(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        n = len(tbl)
        if n == 0:
            out = tbl
            for out_col, (in_col, kind) in ops.items():
                typ = (
                    tbl.schema.field(in_col).type
                    if kind in ("lag", "lead", "first_value", "last_value")
                    else pa.int64()
                )
                out = out.append_column(out_col, pa.array([], typ))
            return out
        part = tbl[part_col].to_numpy(zero_copy_only=False)
        views = [
            _sort_view(tbl[col].to_numpy(zero_copy_only=False), desc)
            for col, desc in reversed(order_keys)
        ]
        order = np.lexsort(views + [part])
        p_sorted = part[order]
        starts_mask = np.empty(n, dtype=bool)
        starts_mask[0] = True
        starts_mask[1:] = p_sorted[1:] != p_sorted[:-1]
        idx = np.arange(n)
        group_start = np.maximum.accumulate(np.where(starts_mask, idx, 0))
        out = tbl.take(pa.array(order))
        for out_col, (in_col, kind) in ops.items():
            if kind == "row_number":
                out = out.append_column(
                    out_col, pa.array((idx - group_start + 1).astype(np.int64))
                )
            elif kind == "cumsum":
                v = out[in_col].to_numpy(zero_copy_only=False).astype(np.int64)
                cs = np.cumsum(v)
                base = np.where(group_start > 0, cs[group_start - 1], 0)
                out = out.append_column(out_col, pa.array(cs - base))
            elif kind == "lag":
                import pyarrow.compute as pc

                col = out[in_col].combine_chunks()
                # previous row's value, nulled at partition starts
                lagged = col.take(pa.array(np.maximum(idx - 1, 0), pa.int64()))
                lagged = pc.if_else(
                    pa.array(~starts_mask), lagged, pa.scalar(None, col.type)
                )
                out = out.append_column(out_col, lagged)
            elif kind == "lead":
                import pyarrow.compute as pc

                col = out[in_col].combine_chunks()
                # next row's value, nulled at partition ENDS (a row is
                # last in its partition iff the next row starts one)
                ends_mask = np.empty(n, dtype=bool)
                ends_mask[:-1] = starts_mask[1:]
                ends_mask[-1] = True
                led = col.take(pa.array(np.minimum(idx + 1, n - 1), pa.int64()))
                led = pc.if_else(
                    pa.array(~ends_mask), led, pa.scalar(None, col.type)
                )
                out = out.append_column(out_col, led)
            elif kind == "first_value":
                col = out[in_col].combine_chunks()
                out = out.append_column(
                    out_col, col.take(pa.array(group_start, pa.int64()))
                )
            elif kind == "last_value":
                # SQL LAST_VALUE over the FULL partition frame (ROWS
                # BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                col = out[in_col].combine_chunks()
                s = np.flatnonzero(starts_mask)
                sizes = np.diff(np.r_[s, n])
                group_end = np.repeat(s + sizes - 1, sizes)
                out = out.append_column(
                    out_col, col.take(pa.array(group_end, pa.int64()))
                )
            elif kind in ("rank", "dense_rank"):
                v = out[in_col].to_numpy(zero_copy_only=False)
                kc = starts_mask.copy()
                kc[1:] |= v[1:] != v[:-1]
                if kind == "rank":
                    run_start = np.maximum.accumulate(np.where(kc, idx, 0))
                    vals = run_start - group_start + 1
                else:
                    c = np.cumsum(kc.astype(np.int64))
                    vals = c - c[group_start] + 1
                out = out.append_column(out_col, pa.array(vals.astype(np.int64)))
            elif kind.startswith("ntile:"):
                ntiles = int(kind.split(":", 1)[1])
                s = np.flatnonzero(starts_mask)
                sizes = np.diff(np.r_[s, n])
                per_size = np.repeat(sizes, sizes)
                # SQL NTILE: the first (size % N) buckets hold one extra
                # row each, and they come FIRST — piecewise, not r0*N//size
                small = per_size // ntiles
                big = per_size % ntiles
                cutoff = big * (small + 1)
                r0 = idx - group_start
                vals = np.where(
                    r0 < cutoff,
                    r0 // (small + 1),
                    big + (r0 - cutoff) // np.maximum(small, 1),
                ) + 1
                out = out.append_column(out_col, pa.array(vals.astype(np.int64)))
            elif kind.startswith("rollsum:"):
                k = int(kind.split(":", 1)[1])
                v = out[in_col].to_numpy(zero_copy_only=False).astype(np.int64)
                cs = np.cumsum(v)
                lo = np.maximum(idx - k, group_start)
                base = np.where(lo > 0, cs[lo - 1], 0)
                out = out.append_column(out_col, pa.array(cs - base))
            elif kind in ("cummax", "cummin"):
                # segmented running extreme (the high-water-mark /
                # drawdown primitive): contiguous group ids + the
                # C-implemented pandas groupby scan — no Python loop
                import pandas as pd

                v = out[in_col].to_numpy(zero_copy_only=False).astype(np.int64)
                gid = np.cumsum(starts_mask) - 1
                grouped = pd.Series(v).groupby(gid)
                vals = (grouped.cummax() if kind == "cummax"
                        else grouped.cummin()).to_numpy()
                out = out.append_column(out_col, pa.array(vals.astype(np.int64)))
            elif kind == "rank_den":
                s = np.flatnonzero(starts_mask)
                sizes = np.diff(np.r_[s, n])
                per_size = np.repeat(sizes, sizes)
                out = out.append_column(
                    out_col, pa.array((per_size - 1).astype(np.int64))
                )
            elif kind == "cume_num":
                # rows whose order key <= current = index of the NEXT
                # key run start, relative to the partition start
                v = out[in_col].to_numpy(zero_copy_only=False)
                kc = starts_mask.copy()
                kc[1:] |= v[1:] != v[:-1]
                run_starts = np.flatnonzero(kc)
                run_len = np.diff(np.r_[run_starts, n])
                run_end = np.repeat(run_starts + run_len, run_len)
                # clamp run ends at partition boundaries: a run never
                # crosses a partition (kc includes starts_mask)
                out = out.append_column(
                    out_col, pa.array((run_end - group_start).astype(np.int64))
                )
            else:
                raise ValueError(f"unknown window kind {kind!r}")
        return out

    out = hash_exchange_map(ds, part_col, num_partitions, kernel)
    if out is None:
        return ds.map_batches(kernel, batch_format="pyarrow")
    return out


def dataset_from_table(tbl: pa.Table, **kwargs):
    return ray.data.from_arrow(tbl, **kwargs)


def empty_dataset(schema: pa.Schema):
    return ray.data.from_arrow(schema.empty_table())


def union_all(datasets: List["ray.data.Dataset"], schema: Optional[pa.Schema] = None):
    if not datasets:
        if schema is None:
            raise ValueError("union_all of nothing needs a schema")
        return empty_dataset(schema)
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


_CC_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
_CC_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def connected_components(
    edges,
    *,
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int = 16,
    max_iters: int = 50,
):
    """Connected components of an undirected int64 edge list by
    distributed min-label propagation: (node, label) with label = the
    smallest node id in the node's component — the clustering step of
    a dedup pipeline (near-dup pair edges -> keep one doc per label).

    Scale shape: the edge list is exchanged ONCE (both directions) and
    reused every round; each round is one hash-exchange join that
    ships the current (node, label) along edges plus a
    combiner-pushdown grouped min (partial_grouped_agg) — raw edges
    never re-shuffle, and the only materialized state is the labels
    table (one row per node touched by an edge).  Labels only ever
    decrease, so ``sum(label)`` is a strictly decreasing invariant:
    the loop stops the first round it holds still (no separate
    changed-count join).  Rounds needed = component diameter — near-2
    for the clique-ish graphs dedup banding emits; a web-scale
    arbitrary graph would swap in large-star/small-star hashing to cut
    rounds to O(log n) with the same per-round primitives.
    """

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return pa.Table.from_pydict(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])},
            schema=_CC_EDGE_SCHEMA,
        )

    directed = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        u = np.unique(t["src"].to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict(
            {"node": u, "label": u.copy()}, schema=_CC_LABEL_SCHEMA
        )

    labels = partial_grouped_agg(
        directed.map_batches(init_labels, batch_format="pyarrow"),
        ["node"],
        {"label": ("label", "min")},
    ).materialize()
    if labels.count() == 0:
        return labels

    msg_schema = pa.schema([("src", pa.int64()), ("label", pa.int64())])

    def as_msgs(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"src": t["node"], "label": t["label"]}, schema=msg_schema
        )

    def to_cand(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": t["dst"], "label": t["label"]}, schema=_CC_LABEL_SCHEMA
        )

    prev = labels.sum("label")
    for _ in range(max_iters):
        joined = hash_join(
            directed,
            labels.map_batches(as_msgs, batch_format="pyarrow"),
            on="src",
            l_schema=_CC_EDGE_SCHEMA,
            r_schema=msg_schema,
            num_partitions=num_partitions,
        )
        cand = joined.map_batches(to_cand, batch_format="pyarrow").union(labels)
        labels = partial_grouped_agg(
            cand, ["node"], {"label": ("label", "min")}
        ).materialize()
        cur = labels.sum("label")
        if cur == prev:
            return labels
        prev = cur
    # labels still moving when the round budget ran out: returning them
    # would be silently WRONG (e.g. a path graph longer than max_iters).
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds; "
        "raise max_iters (rounds needed = component diameter)"
    )


def bfs_hops(
    edges,
    *,
    a_col: str = "a",
    b_col: str = "b",
    source_mod: int = 16,
    rounds: int = 4,
    num_partitions: int = 16,
):
    """Multi-source BFS hop distance over an undirected int64 edge
    list — min-plus label propagation with a FIXED round budget:
    dist_{r+1}(v) = min(dist_r(v), min over neighbors (dist_r(u)+1)),
    seeded with dist 0 at every vertex divisible by ``source_mod``.
    After ``rounds`` rounds the output is exactly the set of vertices
    within ``rounds`` hops of a source, with their true hop distance
    (monotone: a vertex's label only ever decreases, and a vertex at
    hop h is finalized by round h) — so a fixed-depth unrolled SQL
    twin recomputes it bit-for-bit.

    Scale shape mirrors connected_components: the edge list is
    exchanged ONCE (both directions) and reused every round; each
    round is one hash-exchange join shipping the current (node, dist)
    frontier along edges plus a combiner-pushdown grouped min — raw
    edges never re-shuffle and the only materialized state is the
    (node, dist) table."""

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return pa.Table.from_pydict(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])},
            schema=_CC_EDGE_SCHEMA,
        )

    directed = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    dist_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])

    def init_dists(t: pa.Table) -> pa.Table:
        u = np.unique(t["src"].to_numpy(zero_copy_only=False))
        u = u[u % source_mod == 0]
        return pa.Table.from_pydict(
            {"node": u, "dist": np.zeros(len(u), np.int64)}, schema=dist_schema
        )

    dists = partial_grouped_agg(
        directed.map_batches(init_dists, batch_format="pyarrow"),
        ["node"],
        {"dist": ("dist", "min")},
    ).materialize()
    if dists.count() == 0:
        return dists

    msg_schema = pa.schema([("src", pa.int64()), ("dist", pa.int64())])

    def as_msgs(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"src": t["node"], "dist": t["dist"]}, schema=msg_schema
        )

    def to_cand(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": t["dst"],
                "dist": pc.add(t["dist"], 1).cast(pa.int64()),
            },
            schema=dist_schema,
        )

    for _ in range(rounds):
        joined = hash_join(
            directed,
            dists.map_batches(as_msgs, batch_format="pyarrow"),
            on="src",
            l_schema=_CC_EDGE_SCHEMA,
            r_schema=msg_schema,
            num_partitions=num_partitions,
        )
        cand = joined.map_batches(to_cand, batch_format="pyarrow").union(dists)
        dists = partial_grouped_agg(
            cand, ["node"], {"dist": ("dist", "min")}
        ).materialize()
    return dists


def grouped_argmax(
    ds,
    keys: List[str],
    value_col: str,
    arg_col: str,
    *,
    arg_bits: int = 30,
    out_value: str = "max_value",
    out_arg: str = "best_arg",
):
    """One-pass grouped ARG_MAX — "the row id holding each group's max
    value" — with NO join-back: value and bit-complemented arg pack
    into a single int64 key whose plain ``max`` IS the lexicographic
    (value desc, arg asc) winner, so the existing combiner-pushdown
    max (partial_grouped_agg) is the whole aggregation and ties
    deterministically take the SMALLEST arg.  Requires
    0 <= arg < 2**arg_bits and 0 <= value < 2**(62 - arg_bits)
    (validated per batch).  The packed expression is plain integer
    arithmetic, so a SQL twin can run max(value * 2^B + (2^B-1 - arg))
    verbatim and decode identically."""
    scale = 1 << arg_bits
    comp = scale - 1

    def pack(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        a = t[arg_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if len(a) and (a.min() < 0 or a.max() > comp):
            raise ValueError(f"{arg_col} out of [0, 2**{arg_bits})")
        if len(v) and (v.min() < 0 or v.max() >= (1 << (62 - arg_bits))):
            raise ValueError(f"{value_col} out of [0, 2**{62 - arg_bits})")
        cols = {k: t[k] for k in keys}
        cols["__packed"] = pa.array(v * scale + (comp - a))
        return pa.Table.from_pydict(cols)

    packed = ds.map_batches(pack, batch_format="pyarrow")
    agg = partial_grouped_agg(packed, keys, {"__packed": ("__packed", "max")})

    def decode(t: pa.Table) -> pa.Table:
        p = t["__packed"].to_numpy(zero_copy_only=False)
        cols = {k: t[k] for k in keys}
        cols[out_value] = pa.array(p // scale)
        cols[out_arg] = pa.array(comp - p % scale)
        return pa.Table.from_pydict(cols)

    return agg.map_batches(decode, batch_format="pyarrow")


def grouped_concat(
    ds,
    key: str,
    val_col: str,
    order_col: str,
    *,
    sep: str = ",",
    num_partitions: int = 16,
    out_col: str = "joined",
):
    """GROUP BY key -> string_agg(val ORDER BY order_col) — ordered
    list/string collection per group, fully vectorized: one hash
    exchange co-locates each key, then every partition lexsorts once
    and builds ALL its groups' joined strings in a single
    ``pc.binary_join`` over a ListArray sliced by group offsets — no
    per-row or per-group Python string concat.  Include a unique
    ``order_col`` for a deterministic gate.  Skew note: one key's whole
    group lands on one task (same caveat as partitioned_window)."""
    import pyarrow.compute as pc

    out_schema = pa.schema([(key, pa.int64()), (out_col, pa.string())])

    def kernel(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        n = len(tbl)
        if n == 0:
            return out_schema.empty_table()
        k = tbl[key].to_numpy(zero_copy_only=False)
        o = tbl[order_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, k))
        ks = k[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        offsets = np.r_[starts, n].astype(np.int32)
        vals = tbl[val_col].combine_chunks().take(pa.array(order))
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
        joined = pc.binary_join(la, sep)
        return pa.Table.from_pydict(
            {key: pa.array(ks[starts].astype(np.int64)), out_col: joined},
            schema=out_schema,
        )

    out = hash_exchange_map(ds, key, num_partitions, kernel)
    if out is None:
        return empty_dataset(out_schema)
    return out


def _bloom_positions(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: pos_i = (h1 + i*h2) % m
    (Kirsch–Mitzenmacher), h1/h2 from two splitmix64 streams."""
    from .images.synth import splitmix64

    u = keys.astype(np.uint64, copy=False)
    h1 = splitmix64(u)
    h2 = splitmix64(u ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    i = np.arange(k_hashes, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_semi_join(
    left,
    right_keys,
    *,
    on: str,
    l_schema: pa.Schema,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    num_partitions: int = 16,
):
    """EXACT left-semi join with a broadcast Bloom prefilter: the
    classic pushdown for "big fact table ⋉ selective key set" — the
    filter drops definite non-members BEFORE the exchange, so the
    shuffle carries only plausible matches, and an exact
    ``hash_join(how="left_semi")`` on the survivors removes the Bloom's
    false positives.  Result is therefore exactly the semi join
    (no false negatives: every member's bits were set by construction).

    Scale shape: the right side reduces to an m_bits/8-byte bit array
    (per-batch local ORs -> one OR reduce -> one ray.put broadcast) —
    at 10^12 left rows the prefilter costs one vectorized probe per
    batch and typically removes the vast majority of the exchange
    volume; size m_bits ~ 10x right-key-count for ~1-2 % false
    positives.  ``right_keys``: Dataset with column ``on``.
    """
    import ray as _ray

    def set_bits(t: pa.Table) -> pa.Table:
        keys = t[on].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        bits = np.zeros(m_bits, dtype=bool)
        if len(keys):
            bits[_bloom_positions(keys, m_bits, k_hashes).ravel()] = True
        return pa.table({"words": [np.packbits(bits)]})

    # bounded batch_size keeps the per-batch bit array cheap on huge
    # blocks; the task then emits MULTIPLE one-row partials that Ray
    # coalesces into one multi-row block — _or must fold every row
    partials = right_keys.map_batches(
        set_bits, batch_format="pyarrow", batch_size=4096
    )

    @_ray.remote
    def _or(*blocks):
        # OR EVERY row of every block: Ray Data coalesces multiple
        # per-batch outputs into one block whenever a task processes
        # >1 batch, so a block may hold many packed filters — reading
        # only row 0 would silently drop bits (false negatives).
        out = None
        for b in blocks:
            for w in b["words"].to_pylist():
                w = np.asarray(w, dtype=np.uint8)
                out = w if out is None else (out | w)
        return out

    refs = []
    for bundle in partials.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(block_ref)
    packed = _ray.get(_or.remote(*refs)) if refs else np.zeros(m_bits // 8, np.uint8)
    bits_ref = _ray.put(np.unpackbits(packed).astype(bool))

    def prefilter(t: pa.Table) -> pa.Table:
        bits = _ray.get(bits_ref)
        keys = t[on].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if not len(keys):
            return t
        pos = _bloom_positions(keys, m_bits, k_hashes)
        return t.filter(pa.array(bits[pos].all(axis=1)))

    survivors = left.map_batches(prefilter, batch_format="pyarrow")
    return hash_join(
        survivors,
        right_keys,
        on=on,
        l_schema=l_schema,
        r_schema=pa.schema([(on, pa.int64())]),
        how="left_semi",
        num_partitions=num_partitions,
    )


def intersect_distinct(left, right, *, on: str, num_partitions: int = 16):
    """SQL INTERSECT over one int64 column: distinct left keys that
    also occur on the right — distinct_on (partition-wise dedup) then
    one left_semi hash join; both legs ride the same exchange shape,
    no sort."""
    return hash_join(
        distinct_on(left.select_columns([on]), on, num_partitions=num_partitions),
        right.select_columns([on]),
        on=on,
        l_schema=pa.schema([(on, pa.int64())]),
        r_schema=pa.schema([(on, pa.int64())]),
        how="left_semi",
        num_partitions=num_partitions,
    )


def except_distinct(left, right, *, on: str, num_partitions: int = 16):
    """SQL EXCEPT over one int64 column: distinct left keys with NO
    occurrence on the right (left_anti on the deduped left)."""
    return hash_join(
        distinct_on(left.select_columns([on]), on, num_partitions=num_partitions),
        right.select_columns([on]),
        on=on,
        l_schema=pa.schema([(on, pa.int64())]),
        r_schema=pa.schema([(on, pa.int64())]),
        how="left_anti",
        num_partitions=num_partitions,
    )


_DIFF_SCHEMA = pa.schema([("key", pa.int64()), ("change", pa.string())])


def snapshot_diff(old, new, *, key: str, fp_col: str, num_partitions: int = 16):
    """CDC-style snapshot diff: which keys were ADDED, REMOVED or
    CHANGED between two versions of a table — the incremental-refresh
    primitive (recompute dedup/features only for the delta instead of
    re-reading 100 TB).

    Scale shape: each side reduces to slim (key, fingerprint) rows in
    its own map pass — payloads (text/bytes) never enter the shuffle;
    one hash exchange on the key co-locates both versions of every key
    and a vectorized searchsorted pass classifies.  ``fp_col`` is a
    caller-computed content fingerprint (e.g. crc32/FNV of the
    payload); CHANGED means same key, different fingerprint, so a
    fingerprint collision between the two versions of one key would
    mask a change — use >=64-bit fingerprints where that matters.
    Output: (key, change) with change in {'added','removed','changed'}
    (unchanged keys are dropped).  Precondition: ``key`` is unique
    within each snapshot (a primary key), as in any CDC source."""

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "key": t[key].cast(pa.int64()).combine_chunks(),
                    "fp": t[fp_col].cast(pa.int64()).combine_chunks(),
                    "side": pa.array(
                        np.full(len(t), side, dtype=np.int8), pa.int8()
                    ),
                },
            )

        return fn

    both = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow")
    )

    def classify(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        s = tbl["side"].to_numpy(zero_copy_only=False)
        k = tbl["key"].to_numpy(zero_copy_only=False)
        f = tbl["fp"].to_numpy(zero_copy_only=False)
        ko, fo = k[s == 0], f[s == 0]
        kn, fn_ = k[s == 1], f[s == 1]
        oo = np.argsort(ko, kind="stable")
        ko, fo = ko[oo], fo[oo]
        on = np.argsort(kn, kind="stable")
        kn, fn_ = kn[on], fn_[on]
        # membership + fingerprint lookup via searchsorted (both sorted)
        pos = np.searchsorted(ko, kn)
        pos_c = np.minimum(pos, max(len(ko) - 1, 0))
        in_old = (len(ko) > 0) & (ko[pos_c] == kn) if len(ko) else np.zeros(len(kn), bool)
        added = kn[~in_old]
        changed = kn[in_old & (fo[pos_c] != fn_)] if len(ko) else kn[:0]
        pos2 = np.searchsorted(kn, ko)
        pos2_c = np.minimum(pos2, max(len(kn) - 1, 0))
        in_new = (len(kn) > 0) & (kn[pos2_c] == ko) if len(kn) else np.zeros(len(ko), bool)
        removed = ko[~in_new]
        keys_out = np.concatenate([added, removed, changed])
        change = (
            ["added"] * len(added)
            + ["removed"] * len(removed)
            + ["changed"] * len(changed)
        )
        return pa.Table.from_pydict(
            {"key": keys_out.astype(np.int64), "change": change},
            schema=_DIFF_SCHEMA,
        )

    out = hash_exchange_map(both, "key", num_partitions, classify)
    if out is None:
        return empty_dataset(_DIFF_SCHEMA)
    return out


def grouped_mode(ds, group_key: str, val_col: str, *,
                 count_col: str = "mode_count", num_partitions: int = 16):
    """Statistical MODE per group (SQL ``mode()``, ties to the SMALLEST
    value so the result is deterministic): the most frequent ``val_col``
    per ``group_key``, plus its count.

    Distributed shape — two stages that each keep raw rows off the
    wire: (1) ``partial_grouped_agg`` collapses every block to
    (group, value) -> count partials (combiner push-down; only
    #distinct-pairs x #blocks tiny rows reach the merge), then (2)
    ``grouped_topk`` k=1 ordered (count desc, value asc) picks the
    winner per group — block-local candidate reduction then one slim
    hash exchange on ``group_key``.  Works for string values (the
    lexsort tiebreak is dtype-generic); for dense integer values
    ``grouped_argmax`` over the count table is the single-exchange
    alternative.  Output columns: (group_key, val_col, count_col)."""
    counts = partial_grouped_agg(
        ds.select_columns([group_key, val_col]),
        [group_key, val_col],
        {count_col: (None, "count")},
    )
    return grouped_topk(
        counts, group_key, [(count_col, True), (val_col, False)],
        k=1, num_partitions=num_partitions,
    )


def validate_expectations(ds, rules: Dict[str, "callable"]):
    """Data-quality expectation checks (the Deequ/Great-Expectations
    shape): ``rules`` maps rule name -> a vectorized predicate
    ``pa.Table -> bool ndarray/BooleanArray`` that is TRUE where the
    row VIOLATES the rule.  Returns one row per rule: (rule, n_rows,
    n_violations) — the stop-the-line gate a production pipeline runs
    before publishing a dataset.

    Scale shape: every rule is evaluated vectorized inside ONE
    map_batches pass over the data (a batch emits #rules tiny partial
    rows), and the partials fold in a single small groupby — the data
    is scanned once regardless of rule count, nothing wide ever
    shuffles."""
    names = sorted(rules)

    def partial(t: pa.Table) -> pa.Table:
        n = len(t)
        viol = []
        for name in names:
            v = rules[name](t)
            if isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = v.to_numpy(zero_copy_only=False)
            viol.append(int(np.count_nonzero(np.asarray(v, dtype=bool))))
        return pa.Table.from_pydict(
            {"rule": pa.array(names, pa.string()),
             "n_rows": pa.array([n] * len(names), pa.int64()),
             "n_violations": pa.array(viol, pa.int64())},
        )

    # rule names are a tiny fixed key set: string-keyed pandas groupby
    # in one remote reduce (same shape as partial_grouped_agg's final)
    import ray as _ray

    partials = ds.map_batches(partial, batch_format="pyarrow")

    @_ray.remote
    def _final(*blocks):
        import pandas as _pd

        df = _pd.concat(
            [b.to_pandas() if not isinstance(b, _pd.DataFrame) else b
             for b in blocks],
            ignore_index=True,
        )
        out = df.groupby("rule", sort=True, dropna=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    refs = [
        block_ref
        for bundle in partials.iter_internal_ref_bundles()
        for block_ref, meta in bundle.blocks
        if meta.num_rows is None or meta.num_rows > 0
    ]
    if not refs:
        return empty_dataset(pa.schema(
            [("rule", pa.string()), ("n_rows", pa.int64()),
             ("n_violations", pa.int64())]
        ))
    return ray.data.from_arrow_refs([_final.remote(*refs)])


# ---------------------------------------------------------------- skyline
def _skyline_kernel(x: np.ndarray, y: np.ndarray, n: np.ndarray):
    """Exact 2-D Pareto frontier over weighted points: maximize ``x``,
    minimize ``y``, strict dominance (a pair survives iff no other pair
    has x >= and y <= with at least one strict).  Fully vectorized:
    lexsort -> weight-sum per distinct pair -> min-y representative per
    x -> running-min scan from the largest x.  Returns the surviving
    (x, y, summed n) arrays sorted by x descending."""
    order = np.lexsort((y, x))
    xs, ys, ns = x[order], y[order], n[order]
    new_pair = np.r_[True, (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])]
    starts = np.flatnonzero(new_pair)
    ux, uy = xs[starts], ys[starts]
    un = np.add.reduceat(ns, starts)
    # same x, larger y is strictly dominated by the x-group's min-y row
    first_x = np.r_[True, ux[1:] != ux[:-1]]
    rx, ry, rn = ux[first_x], uy[first_x], un[first_x]
    # scan x descending: survive iff y strictly under every larger-x y
    rx, ry, rn = rx[::-1], ry[::-1], rn[::-1]
    cummin = np.minimum.accumulate(ry)
    keep = np.r_[True, ry[1:] < cummin[:-1]] if len(ry) else np.zeros(0, bool)
    return rx[keep], ry[keep], rn[keep]


def pareto_front(ds, x_col: str = "x", y_col: str = "y", *,
                 max_candidates: int = 200_000):
    """Distributed 2-D Pareto frontier (skyline): the non-dominated
    (x, y) pairs — maximize ``x``, minimize ``y``, strict dominance —
    each with the total count of input rows carrying that exact pair.

    Scale shape: dominance is global, but a locally dominated pair can
    never be globally non-dominated, so each block prunes to ITS
    skyline first (one vectorized lexsort + running-min pass, at most
    one survivor per distinct x in the block).  Every block containing
    a globally surviving pair emits it (local skyline superset-of
    global restricted to the block), so summing partial counts before
    the final prune is exact.  The tiny survivor stream folds in ONE
    exact reduce; survivors beyond ``max_candidates`` raise LOUDLY
    (an adversarial anti-chain keeps everything — pre-bucket x for
    those; never silently truncate).

    Reference analog: none (extends the relational family the same way
    convex_hull extends the spatial one — a dominance aggregate)."""
    import ray as _ray

    schema = pa.schema([(x_col, pa.int64()), (y_col, pa.int64()),
                        ("n", pa.int64())])

    def _prune(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return schema.empty_table()
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if "n" in t.column_names:
            n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        else:
            n = np.ones(len(t), dtype=np.int64)
        kx, ky, kn = _skyline_kernel(x, y, n)
        return pa.Table.from_pydict({x_col: kx, y_col: ky, "n": kn},
                                    schema=schema)

    pruned = ds.map_batches(_prune, batch_format="pyarrow")

    @_ray.remote
    def _final(*blocks):
        tbl = pa.concat_tables(blocks, promote_options="default")
        if len(tbl) > max_candidates:
            raise ValueError(
                f"pareto_front: {len(tbl)} candidates survived local "
                f"pruning (> max_candidates={max_candidates}); pre-bucket "
                "x or raise the cap"
            )
        if len(tbl) == 0:
            return schema.empty_table()
        kx, ky, kn = _skyline_kernel(
            tbl[x_col].to_numpy(zero_copy_only=False),
            tbl[y_col].to_numpy(zero_copy_only=False),
            tbl["n"].to_numpy(zero_copy_only=False),
        )
        return pa.Table.from_pydict({x_col: kx, y_col: ky, "n": kn},
                                    schema=schema)

    refs = [
        block_ref
        for bundle in pruned.iter_internal_ref_bundles()
        for block_ref, meta in bundle.blocks
        if meta.num_rows is None or meta.num_rows > 0
    ]
    if not refs:
        return empty_dataset(schema)
    return ray.data.from_arrow_refs([_final.remote(*refs)])


# ---------------------------------------------------------------- count-min
def cms_registers(ds, key_col: str, *, depth: int = 4, width: int = 1024):
    """Count-Min sketch registers over an integer key column — the
    mergeable point-frequency sketch (HLL's sibling for counts): row r
    of the sketch hashes key k to bucket splitmix64(k*depth + r) %
    width and adds 1; ``cms_estimate`` answers a point query with the
    min over rows, an upper-bounded overestimate (never under).

    Scale shape: one map_batches pass bincounts each batch into the
    (depth x width) counter grid and emits only the NONZERO slots as
    (r, bucket, cnt) rows; partials merge by SUM (counters are
    additive across any partitioning — the whole point), so a 10^12-row
    stream reduces to <= depth*width integers.  Keys must be
    non-negative (SQL-parity HUGEINT hash domain).  Output is the
    register table itself — deterministically reproducible, so the
    DuckDB oracle recomputes it register-exact."""
    dw = depth * width

    def partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .images.synth import splitmix64

        keys = (
            pc.fill_null(tbl[key_col], 0)
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        if len(keys) == 0:
            return pa.table({"r": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        rr = np.arange(depth, dtype=np.uint64)
        kk = (keys[:, None] * np.uint64(depth) + rr[None, :]).ravel()
        h = splitmix64(kk)
        bucket = (h % np.uint64(width)).astype(np.int64)
        ridx = np.tile(np.arange(depth, dtype=np.int64), len(keys))
        cnts = np.bincount(ridx * width + bucket, minlength=dw)
        nz = np.flatnonzero(cnts)
        return pa.table({"r": pa.array(nz // width),
                         "bucket": pa.array(nz % width),
                         "cnt": pa.array(cnts[nz])})

    return partial_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["r", "bucket"],
        {"cnt": ("cnt", "sum")},
    )


def cms_estimate(registers: pa.Table, keys, *, depth: int = 4,
                 width: int = 1024) -> np.ndarray:
    """Point-frequency estimates from collected CMS registers: min over
    sketch rows of the key's counter.  Guaranteed >= the true count."""
    from .images.synth import splitmix64

    grid = np.zeros(depth * width, dtype=np.int64)
    slot = (registers["r"].to_numpy() * width + registers["bucket"].to_numpy())
    grid[slot] = registers["cnt"].to_numpy()
    keys = np.asarray(keys, dtype=np.uint64)
    rr = np.arange(depth, dtype=np.uint64)
    kk = (keys[:, None] * np.uint64(depth) + rr[None, :]).ravel()
    b = (splitmix64(kk) % np.uint64(width)).astype(np.int64)
    ridx = np.tile(np.arange(depth, dtype=np.int64), len(keys))
    return grid[ridx * width + b].reshape(len(keys), depth).min(axis=1)


# ---------------------------------------------------------------- checksum
def table_checksum(ds, key_col: str, group_keys: Optional[List[str]] = None, *,
                   mod_a: int = 2147483647, mod_b: int = 2147483629):
    """Order-independent content checksum — the 100-TB data-validation
    primitive (compare two pipelines' outputs / two table versions
    WITHOUT moving either): per row, splitmix64 of the integer row key;
    per group, the modular sum of those hashes under two independent
    prime moduli plus the row count.  Any dropped, duplicated or
    altered row flips a 62-bit fingerprint; commutative addition makes
    the result independent of partitioning and row order.

    Scale shape: each batch folds to one (group, n, csum_a, csum_b)
    partial with the mod applied PER BATCH (so the downstream int64
    sums stay bounded by #blocks * mod, never rows * mod), partials
    combine through partial_grouped_agg's push-down, and one final
    cheap map re-applies the mod.  Nothing but the slim partials ever
    shuffles."""
    gks = list(group_keys or [])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        from .images.synth import splitmix64

        keys = (
            pc.fill_null(t[key_col], 0)
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        h = splitmix64(keys)
        df = pd.DataFrame({
            "csum_a": (h % np.uint64(mod_a)).astype(np.int64),
            "csum_b": (h % np.uint64(mod_b)).astype(np.int64),
        })
        for g in gks:
            df[g] = t[g].to_numpy(zero_copy_only=False)
        if gks:
            out = (df.groupby(gks, sort=True, dropna=False)
                     .agg(n_rows=("csum_a", "size"), csum_a=("csum_a", "sum"),
                          csum_b=("csum_b", "sum")).reset_index())
        else:
            out = pd.DataFrame({"__g": [0], "n_rows": [len(df)],
                                "csum_a": [int(df["csum_a"].sum())],
                                "csum_b": [int(df["csum_b"].sum())]})
        out["csum_a"] = out["csum_a"] % mod_a
        out["csum_b"] = out["csum_b"] % mod_b
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = partial_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        gks or ["__g"],
        {"n_rows": ("n_rows", "sum"), "csum_a": ("csum_a", "sum"),
         "csum_b": ("csum_b", "sum")},
    )
    if not gks:
        agg = agg.map_batches(lambda t: t.drop_columns(["__g"]),
                              batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        for col, mod in (("csum_a", mod_a), ("csum_b", mod_b)):
            idx = t.column_names.index(col)
            v = t[col].to_numpy(zero_copy_only=False) % mod
            t = t.set_column(idx, col, pa.array(v.astype(np.int64)))
        return t

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------- ohlc
def grouped_ohlc(ds, keys: List[str], time_col: str, value_col: str, *,
                 value_bits: int = 26):
    """Open-high-low-close rollup per group — the time-series bar
    aggregation: open = value at the MIN time, close = value at the MAX
    time, plus high / low / count, in ONE combiner-push-down pass
    (partial_grouped_agg) with NO sort and NO join-back.  The trick is
    the grouped_argmax packing generalized to both ends: min(t*S + v)
    is the lexicographic (t asc, v asc) winner and max(t*S + (S-1-v))
    the (t desc, v asc) winner, so plain min/max partials ARE the
    conditional extremes; ties on t deterministically take the SMALLEST
    value at both ends, and a SQL twin can run the identical packed
    expressions verbatim.

    Requires 0 <= value < 2**value_bits and 0 <= time <
    2**(62 - value_bits) (validated per batch) — e.g. cents within
    2**26 and a within-bucket offset time within 2**36."""
    scale = 1 << value_bits
    comp = scale - 1
    t_max = 1 << (62 - value_bits)

    def pack(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        tt = t[time_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if len(v) and (v.min() < 0 or v.max() > comp):
            raise ValueError(f"{value_col} out of [0, 2**{value_bits})")
        if len(tt) and (tt.min() < 0 or tt.max() >= t_max):
            raise ValueError(f"{time_col} out of [0, 2**{62 - value_bits})")
        cols = {k: t[k] for k in keys}
        cols["__open_p"] = pa.array(tt * scale + v)
        cols["__close_p"] = pa.array(tt * scale + (comp - v))
        cols["__v"] = pa.array(v)
        return pa.Table.from_pydict(cols)

    agg = partial_grouped_agg(
        ds.map_batches(pack, batch_format="pyarrow"),
        keys,
        {
            "__open_p": ("__open_p", "min"),
            "__close_p": ("__close_p", "max"),
            "high": ("__v", "max"),
            "low": ("__v", "min"),
            "n": (None, "count"),
        },
    )

    def decode(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        cols["open"] = pa.array(
            t["__open_p"].to_numpy(zero_copy_only=False) % scale)
        cols["close"] = pa.array(
            comp - t["__close_p"].to_numpy(zero_copy_only=False) % scale)
        for c in ("high", "low", "n"):
            cols[c] = t[c]
        return pa.Table.from_pydict(cols)

    return agg.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------- triangles
def triangle_count(edges, u_col: str = "u", v_col: str = "v", *,
                   num_partitions: int = 16):
    """Exact distributed triangle count over an undirected graph given
    as an edge stream (duplicates and self-loops tolerated) — the
    classic graph-statistics operator, in the degree-ordered-orientation
    shape that bounds work at O(m^1.5) regardless of hot vertices:

    1. canonicalize + dedup edges (hash-route on a mixed pair key,
       dedup on the real endpoint columns);
    2. vertex degrees over the deduped edges (combiner-push-down);
    3. orient every edge from its lower (degree, id) endpoint — a hub
       vertex has high degree, so hubs get few OUT-neighbors and the
       per-vertex wedge fan-out stays bounded by sqrt(m);
    4. wedges: hash-exchange oriented edges on src; per src, enumerate
       out-neighbor pairs in (degree, id) order (vectorized triu per
       group) and pre-count identical wedges locally;
    5. a wedge (a, b) closes a triangle iff the oriented edge a->b
       exists — one hash join on the mixed pair key with an exact
       column equality filter (the mixed key only routes; it never
       merges pairs).

    Every triangle is counted exactly once, from its smallest
    (degree, id) vertex.  Returns a single row (n_edges, n_triangles).
    """
    from .text.dedup import _pair_route_key

    pair_schema = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])

    def canon(t: pa.Table) -> pa.Table:
        u = t[u_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        v = t[v_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        keep = u != v
        u, v = u[keep], v[keep]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        return pa.Table.from_pydict(
            {"a_id": lo, "b_id": hi,
             "pair_key": _pair_route_key(lo, hi)},
            schema=pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()),
                              ("pair_key", pa.int64())]),
        )

    dedup = distinct_on(
        edges.map_batches(canon, batch_format="pyarrow"),
        "pair_key", num_partitions=num_partitions,
        subset=["a_id", "b_id"],
    ).select_columns(["a_id", "b_id"]).materialize()
    n_edges = dedup.count()

    both = dedup.map_batches(
        lambda t: pa.table({"vertex": pa.concat_arrays(
            [t["a_id"].combine_chunks().cast(pa.int64()),
             t["b_id"].combine_chunks().cast(pa.int64())])}),
        batch_format="pyarrow",
    )
    deg = partial_grouped_agg(both, ["vertex"], {"deg": (None, "count")})

    j1 = hash_join(
        dedup.map_batches(lambda t: t.rename_columns(["vertex", "b_id"]),
                          batch_format="pyarrow"),
        deg, on="vertex",
        l_schema=pa.schema([("vertex", pa.int64()), ("b_id", pa.int64())]),
        r_schema=pa.schema([("vertex", pa.int64()), ("deg", pa.int64())]),
        how="inner", num_partitions=num_partitions,
    ).map_batches(
        lambda t: t.rename_columns(["a_id", "vertex", "a_deg"]),
        batch_format="pyarrow",
    )
    j2 = hash_join(
        j1, deg, on="vertex",
        l_schema=pa.schema([("a_id", pa.int64()), ("vertex", pa.int64()),
                            ("a_deg", pa.int64())]),
        r_schema=pa.schema([("vertex", pa.int64()), ("deg", pa.int64())]),
        how="inner", num_partitions=num_partitions,
    )

    ori_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                            ("dst_deg", pa.int64())])

    def orient(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = t["a_deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        ddeg = np.where(a_first, db, da)
        return pa.Table.from_pydict(
            {"src": src, "dst": dst, "dst_deg": ddeg}, schema=ori_schema)

    oriented = j2.map_batches(orient, batch_format="pyarrow")

    wedge_schema = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()),
                              ("n_wedges", pa.int64())])

    def wedges(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        if len(t) == 0:
            return wedge_schema.empty_table()
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        ddeg = t["dst_deg"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, ddeg, src))
        s, d = src[order], dst[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        ends = np.r_[starts[1:], len(s)]
        a_out, b_out = [], []
        for st, en in zip(starts, ends):
            g = en - st
            if g < 2:
                continue
            ii, jj = np.triu_indices(int(g), k=1)
            a_out.append(d[st + ii])
            b_out.append(d[st + jj])
        if not a_out:
            return wedge_schema.empty_table()
        wa = np.concatenate(a_out)
        wb = np.concatenate(b_out)
        # canonicalize the wedge pair by ID: the per-src enumeration
        # above orders out-neighbors by (degree, id), but the closure
        # join matches the deduped edge table, which is (min_id,
        # max_id) — on non-uniform-degree graphs the two orders differ
        wa, wb = np.minimum(wa, wb), np.maximum(wa, wb)
        # local pre-count of identical wedges before anything travels
        key = np.lexsort((wb, wa))
        wa, wb = wa[key], wb[key]
        new = np.r_[True, (wa[1:] != wa[:-1]) | (wb[1:] != wb[:-1])]
        st2 = np.flatnonzero(new)
        cnt = np.diff(np.r_[st2, len(wa)])
        return pa.Table.from_pydict(
            {"a_id": wa[st2], "b_id": wb[st2], "n_wedges": cnt},
            schema=wedge_schema)

    wedged = hash_exchange_map(oriented, "src", num_partitions, wedges)
    one_row = pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                        "n_triangles": pa.array([0], pa.int64())})
    if wedged is None:
        return dataset_from_table(one_row)

    wsum = partial_grouped_agg(
        wedged.map_batches(
            lambda t: t.append_column("pair_key", pa.array(_pair_route_key(
                t["a_id"].to_numpy(zero_copy_only=False),
                t["b_id"].to_numpy(zero_copy_only=False)))),
            batch_format="pyarrow",
        ),
        ["pair_key", "a_id", "b_id"],
        {"n_wedges": ("n_wedges", "sum")},
    )

    edge_keyed = dedup.map_batches(
        lambda t: pa.table({
            "pair_key": pa.array(_pair_route_key(
                t["a_id"].to_numpy(zero_copy_only=False),
                t["b_id"].to_numpy(zero_copy_only=False))),
            "e_a": t["a_id"].combine_chunks().cast(pa.int64()),
            "e_b": t["b_id"].combine_chunks().cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )
    joined = hash_join(
        wsum, edge_keyed, on="pair_key",
        l_schema=pa.schema([("pair_key", pa.int64()), ("a_id", pa.int64()),
                            ("b_id", pa.int64()), ("n_wedges", pa.int64())]),
        r_schema=pa.schema([("pair_key", pa.int64()), ("e_a", pa.int64()),
                            ("e_b", pa.int64())]),
        how="inner", num_partitions=num_partitions,
    )

    def closed(t: pa.Table) -> pa.Table:
        # the mixed key routes; triangle closure needs REAL equality
        ok = (
            (t["a_id"].to_numpy(zero_copy_only=False)
             == t["e_a"].to_numpy(zero_copy_only=False))
            & (t["b_id"].to_numpy(zero_copy_only=False)
               == t["e_b"].to_numpy(zero_copy_only=False))
        )
        n = t["n_wedges"].to_numpy(zero_copy_only=False)[ok]
        return pa.table({"n_tri": pa.array([int(n.sum())], pa.int64())})

    parts = joined.map_batches(closed, batch_format="pyarrow").to_pandas()
    n_tri = int(parts["n_tri"].sum()) if len(parts) else 0
    return dataset_from_table(
        pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                  "n_triangles": pa.array([n_tri], pa.int64())}))


# ---------------------------------------------------------------- pagerank
def pagerank(edges, src_col: str = "src", dst_col: str = "dst", *,
             iterations: int = 3, damping_num: int = 85,
             damping_den: int = 100, scale: int = 1_000_000,
             num_partitions: int = 16):
    """Fixed-iteration PageRank over a directed edge stream in
    ALL-INTEGER arithmetic, so an unrolled SQL twin is bit-exact:
    ranks live in 1/``scale`` units, each vertex's per-edge share is
    ``r // outdeg`` (floor), and the update is
    ``r' = ((den-num)*scale)//den + (num*contrib)//den``.  Dangling
    mass is dropped (both sides of the gate drop it identically).

    Scale shape — the canonical distributed PageRank: directed edges
    dedup once (hash-route on a mixed pair key, identity on the real
    endpoints) and are REUSED every iteration; out-degrees and the
    (vertex, outdeg) base table are combiner-push-down aggregates;
    each iteration is exactly one edges⋈share hash join, one grouped
    sum of slim (dst, share) rows, and one base⋈contrib left join —
    the vertex-scale rank table is materialized per iteration (tiny
    next to edges) and raw edges never re-shuffle.  Overflow bound:
    ``damping_num * n_vertices * scale`` must fit int64.

    Returns (vertex, rank_ppm) with rank_ppm in 1/``scale`` units.
    """
    from .text.dedup import _pair_route_key

    base_r = ((damping_den - damping_num) * scale) // damping_den

    def canon(t: pa.Table) -> pa.Table:
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return pa.Table.from_pydict(
            {"src": s, "dst": d, "pair_key": _pair_route_key(s, d)},
            schema=pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                              ("pair_key", pa.int64())]),
        )

    dedup = distinct_on(
        edges.map_batches(canon, batch_format="pyarrow"),
        "pair_key", num_partitions=num_partitions, subset=["src", "dst"],
    ).select_columns(["src", "dst"]).materialize()

    both = dedup.map_batches(
        lambda t: pa.table({"vertex": pa.concat_arrays(
            [t["src"].combine_chunks().cast(pa.int64()),
             t["dst"].combine_chunks().cast(pa.int64())])}),
        batch_format="pyarrow",
    )
    verts = partial_grouped_agg(both, ["vertex"], {"__n": (None, "count")})
    odeg = partial_grouped_agg(
        dedup.map_batches(
            lambda t: pa.table({"vertex": t["src"].combine_chunks()
                                .cast(pa.int64())}),
            batch_format="pyarrow"),
        ["vertex"], {"odeg": (None, "count")},
    )

    base_schema = pa.schema([("vertex", pa.int64()), ("odeg", pa.int64())])

    def fill_odeg(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"vertex": t["vertex"].combine_chunks().cast(pa.int64()),
             "odeg": pc.fill_null(
                 t["odeg"].combine_chunks().cast(pa.int64()), 0)},
            schema=base_schema)

    base = hash_join(
        verts.select_columns(["vertex"]), odeg, on="vertex",
        l_schema=pa.schema([("vertex", pa.int64())]),
        r_schema=pa.schema([("vertex", pa.int64()), ("odeg", pa.int64())]),
        how="left_outer", num_partitions=num_partitions,
    ).map_batches(fill_odeg, batch_format="pyarrow").materialize()

    rank_schema = pa.schema([("vertex", pa.int64()), ("odeg", pa.int64()),
                             ("r", pa.int64())])
    ranks = base.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(len(t), scale, np.int64))),
        batch_format="pyarrow",
    ).materialize()

    share_schema = pa.schema([("vertex", pa.int64()), ("share", pa.int64())])
    edges_keyed = dedup.map_batches(
        lambda t: t.rename_columns(["vertex", "dst"]),
        batch_format="pyarrow")

    for _ in range(iterations):
        def to_share(t: pa.Table) -> pa.Table:
            od = t["odeg"].to_numpy(zero_copy_only=False)
            r = t["r"].to_numpy(zero_copy_only=False)
            pos = od > 0
            return pa.Table.from_pydict(
                {"vertex": t["vertex"].to_numpy(zero_copy_only=False)[pos],
                 "share": r[pos] // od[pos]},
                schema=share_schema)

        share = ranks.map_batches(to_share, batch_format="pyarrow")
        routed = hash_join(
            edges_keyed, share, on="vertex",
            l_schema=pa.schema([("vertex", pa.int64()), ("dst", pa.int64())]),
            r_schema=share_schema,
            how="inner", num_partitions=num_partitions,
        )
        contrib = partial_grouped_agg(
            routed.map_batches(
                lambda t: pa.table(
                    {"vertex": t["dst"].combine_chunks().cast(pa.int64()),
                     "share": t["share"].combine_chunks().cast(pa.int64())}),
                batch_format="pyarrow"),
            ["vertex"], {"c": ("share", "sum")},
        )

        def update(t: pa.Table) -> pa.Table:
            c = t["c"].to_numpy(zero_copy_only=False)
            c = np.where(np.isnan(c.astype(np.float64)), 0, c).astype(np.int64) \
                if c.dtype != np.int64 else c
            return pa.Table.from_pydict(
                {"vertex": t["vertex"].combine_chunks().cast(pa.int64()),
                 "odeg": t["odeg"].combine_chunks().cast(pa.int64()),
                 "r": base_r + (damping_num * c) // damping_den},
                schema=rank_schema)

        joined = hash_join(
            base, contrib, on="vertex",
            l_schema=base_schema,
            r_schema=pa.schema([("vertex", pa.int64()), ("c", pa.int64())]),
            how="left_outer", num_partitions=num_partitions,
        ).map_batches(
            lambda t: t.set_column(
                t.column_names.index("c"), "c",
                pc.fill_null(t["c"].combine_chunks().cast(pa.int64()), 0)),
            batch_format="pyarrow",
        )
        ranks = joined.map_batches(update, batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda t: pa.Table.from_pydict(
            {"vertex": t["vertex"].combine_chunks().cast(pa.int64()),
             "rank_ppm": t["r"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------- mad
def grouped_mad(ds, group_key: str, value_col: str):
    """Median absolute deviation per group — the robust-statistics
    outlier scale estimate — EXACT for integer-ish values via two
    histogram-quantile passes (grouped_quantiles, percentile_disc
    rule): (1) per-group median; (2) broadcast the tiny (#groups)
    median table and take the median of |x - med|.  Raw rows never
    shuffle in either pass (per-block (group, value) -> count
    partials); the two full scans are inherent to exact MAD.  Output
    (group, med, mad, n)."""
    import pandas as pd
    import ray as _ray

    med_df = grouped_quantiles(ds, group_key, value_col,
                               {"med": 0.5}).to_pandas()
    med_ref = _ray.put(dict(zip(med_df[group_key], med_df["med"])))

    def dev(df: "pd.DataFrame") -> "pd.DataFrame":
        lookup = _ray.get(med_ref)
        m = df[group_key].map(lookup)
        return pd.DataFrame({
            group_key: df[group_key],
            "__dev": (df[value_col] - m).abs().astype("int64"),
        })

    dev_ds = ds.select_columns([group_key, value_col]).map_batches(
        dev, batch_format="pandas")
    mad_df = grouped_quantiles(dev_ds, group_key, "__dev",
                               {"mad": 0.5}, n_col="n").to_pandas()
    out = med_df.merge(mad_df, on=group_key)  # #groups rows: tiny
    return dataset_from_table(pa.Table.from_pandas(out, preserve_index=False))


# ---------------------------------------------------------------- two-hop
def two_hop_counts(edges, u_col: str = "u", v_col: str = "v", *,
                   num_partitions: int = 16):
    """Per-vertex count of distinct vertices within <= 2 undirected
    hops (self excluded) — the friends-of-friends / neighborhood-reach
    statistic: symmetrize + dedup edges once, ONE self-join on the
    middle vertex builds the 2-hop candidate pairs, a pair-key routed
    distinct collapses them with the 1-hop pairs, and a
    combiner-push-down count finishes.

    Scale note: the candidate stream is O(sum deg^2) by the problem's
    definition — the exact variant.  At web scale either pre-cap hub
    adjacency or swap the distinct+count tail for per-vertex HLL
    registers (hll_count_distinct) to bound the exchange; both sides
    of the gate must then apply the same cap/sketch.  Returns
    (vertex, n_reach)."""
    from .text.dedup import _pair_route_key

    sym_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("pair_key", pa.int64())])

    def sym(t: pa.Table) -> pa.Table:
        u = t[u_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        v = t[v_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        keep = u != v
        u, v = u[keep], v[keep]
        a = np.concatenate([u, v])
        b = np.concatenate([v, u])
        return pa.Table.from_pydict(
            {"a": a, "b": b, "pair_key": _pair_route_key(a, b)},
            schema=sym_schema)

    sym_e = distinct_on(
        edges.map_batches(sym, batch_format="pyarrow"),
        "pair_key", num_partitions=num_partitions, subset=["a", "b"],
    ).select_columns(["a", "b"]).materialize()

    # 2-hop candidates: (a -> m -> w); key the join on the middle vertex
    left = sym_e.map_batches(
        lambda t: pa.table({"m": t["b"].combine_chunks().cast(pa.int64()),
                            "a": t["a"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")
    right = sym_e.map_batches(
        lambda t: pa.table({"m": t["a"].combine_chunks().cast(pa.int64()),
                            "w": t["b"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")
    hops2 = hash_join(
        left, right, on="m",
        l_schema=pa.schema([("m", pa.int64()), ("a", pa.int64())]),
        r_schema=pa.schema([("m", pa.int64()), ("w", pa.int64())]),
        how="inner", num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table({"a": t["a"].combine_chunks().cast(pa.int64()),
                            "w": t["w"].combine_chunks().cast(pa.int64())})
        .filter(pc.invert(pc.equal(t["a"], t["w"]))),
        batch_format="pyarrow",
    )
    one_hop = sym_e.map_batches(
        lambda t: t.rename_columns(["a", "w"]), batch_format="pyarrow")

    def keyed(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return t.append_column("pair_key", pa.array(_pair_route_key(a, w)))

    reach = distinct_on(
        hops2.union(one_hop).map_batches(keyed, batch_format="pyarrow"),
        "pair_key", num_partitions=num_partitions, subset=["a", "w"],
    )
    return partial_grouped_agg(
        reach.map_batches(
            lambda t: pa.table({"vertex": t["a"].combine_chunks()
                                .cast(pa.int64())}),
            batch_format="pyarrow"),
        ["vertex"], {"n_reach": (None, "count")},
    )


# ---------------------------------------------------------------- k-core
_KCORE_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
_KCORE_VERT_SCHEMA = pa.schema([("vertex", pa.int64()), ("degree", pa.int64())])


def kcore(edges, k: int, *, a_col: str = "a", b_col: str = "b",
          num_partitions: int = 16, max_iters: int = 64):
    """Maximal k-core of an undirected int64 edge list: the unique
    largest vertex set where every member keeps degree >= k inside the
    set — the standard graph-density filter (drop low-engagement
    vertices and everything that only looked dense because of them).

    Distributed peel (the iterative-algorithm shape shared with
    connected_components / pagerank): symmetrize + pair-dedup the edge
    list ONCE; each round is one combiner-push-down degree count over
    the surviving directed edges plus two slim left-semi hash joins
    that drop edges touching a removed endpoint (directed rows stay
    symmetric because both endpoint filters run on the same survivor
    set).  Surviving-edge count is strictly decreasing, so the loop
    stops the first round nothing drops; rounds = peel depth (bounded
    by max degree / k), raising loudly on a max_iters overrun rather
    than returning a non-core.  Parallel edges collapse (simple-graph
    degrees); self-loops are dropped.

    Returns (vertex, degree): the k-core members with their degree
    INSIDE the core (>= k by construction; empty Dataset when no core
    survives)."""
    from .text.dedup import _pair_route_key

    if k < 1:
        raise ValueError("kcore: k must be >= 1")

    def canon(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        m = a != b
        a, b = a[m], b[m]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.Table.from_pydict(
            {"src": lo, "dst": hi, "pair_key": _pair_route_key(lo, hi)},
            schema=pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                              ("pair_key", pa.int64())]),
        )

    simple = distinct_on(
        edges.map_batches(canon, batch_format="pyarrow"),
        "pair_key", num_partitions=num_partitions, subset=["src", "dst"],
    ).select_columns(["src", "dst"])

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"src": np.concatenate([s, d]), "dst": np.concatenate([d, s])},
            schema=_KCORE_EDGE_SCHEMA,
        )

    directed = simple.map_batches(both_dirs, batch_format="pyarrow").materialize()
    prev_edges = directed.count()
    if prev_edges == 0:
        return empty_dataset(_KCORE_VERT_SCHEMA)

    def swap(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"src": t["dst"], "dst": t["src"]}, schema=_KCORE_EDGE_SCHEMA)

    for _ in range(max_iters):
        deg = partial_grouped_agg(directed, ["src"],
                                  {"degree": (None, "count")})
        survivors = deg.filter(expr=f"degree >= {k}").materialize()
        keys = survivors.select_columns(["src"])
        key_schema = pa.schema([("src", pa.int64())])
        kept = hash_join(
            directed, keys, on="src",
            l_schema=_KCORE_EDGE_SCHEMA, r_schema=key_schema,
            how="left_semi", num_partitions=num_partitions,
        )
        kept = hash_join(
            kept.map_batches(swap, batch_format="pyarrow"), keys, on="src",
            l_schema=_KCORE_EDGE_SCHEMA, r_schema=key_schema,
            how="left_semi", num_partitions=num_partitions,
        ).map_batches(swap, batch_format="pyarrow")
        directed = kept.materialize()
        cur_edges = directed.count()
        if cur_edges == prev_edges:
            return survivors.map_batches(
                lambda t: pa.Table.from_pydict(
                    {"vertex": t["src"], "degree": t["degree"]},
                    schema=_KCORE_VERT_SCHEMA),
                batch_format="pyarrow",
            )
        if cur_edges == 0:
            return empty_dataset(_KCORE_VERT_SCHEMA)
        prev_edges = cur_edges
    raise RuntimeError(
        f"kcore did not converge in {max_iters} peel rounds; "
        "raise max_iters (rounds bounded by max_degree / k)"
    )


# --------------------------------------------------- ordered prefix scan
def ordered_prefix_scan(ds, order_col: str, value_col: str, *,
                        combine: str = "max", num_bands: int = 64,
                        out_col: str = "scan", num_partitions: int = 16):
    """Global EXCLUSIVE PREFIX SCAN over a total order — the
    streaming-watermark / running-balance primitive no per-key window
    can express (partitioned_window scans WITHIN a key; this scans
    across the whole dataset in ``order_col`` order).

    Classic two-phase distributed scan: band the (dense, nonnegative
    integer) order axis into contiguous ranges, (1) one combiner-
    pushdown pass reduces each band to its partial (max or sum), the
    driver folds the <= num_bands partials into per-band EXCLUSIVE
    seeds (a tiny broadcast, never a shuffle), then (2) one band hash
    exchange sorts each band locally and runs the seeded cumulative
    combine shifted by one row.  Every row's ``out_col`` equals the
    combine over ALL strictly-earlier rows globally; the first row
    gets the identity (int64 min for max — callers treat it as "no
    watermark yet" — and 0 for sum).

    Cost: two slim passes + one exchange, O(num_bands) driver state.
    At 10^12 rows raise num_bands so a band fits a worker; the seed
    fold stays trivial."""
    if combine not in ("max", "sum"):
        raise ValueError(f"unsupported combine {combine!r}")

    # keyless max of the order axis: one tiny map+reduce over block refs
    import ray as _ray

    @_ray.remote
    def _blk_max(t):
        col = t[order_col] if not isinstance(t, pa.Table) else t[order_col]
        arr = col.to_numpy(zero_copy_only=False)
        return int(arr.max()) if len(arr) else -1

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(_blk_max.remote(block_ref))
    max_order = max(_ray.get(refs)) if refs else -1
    if max_order < 0:
        return ds
    band_width = max_order // num_bands + 1

    band_col = "__band"

    def with_band(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False)
        return t.append_column(band_col, pa.array(o // band_width))

    banded = ds.map_batches(with_band, batch_format="pyarrow")

    partials = partial_grouped_agg(
        banded.select_columns([band_col, value_col]),
        [band_col],
        {"part": (value_col, combine)},
    ).to_pandas().sort_values(band_col)  # <= num_bands rows: driver fold
    ident = np.int64(np.iinfo(np.int64).min) if combine == "max" else np.int64(0)
    acc = (np.maximum.accumulate if combine == "max" else np.add.accumulate)(
        partials["part"].to_numpy().astype(np.int64)
    )
    seeds = dict(zip(
        partials[band_col].to_numpy(),
        np.r_[ident, acc[:-1]],  # EXCLUSIVE: band k seeds from bands < k
    ))

    def scan_band(t: pa.Table) -> pa.Table:
        if not len(t):
            return t.drop_columns([band_col, "__part"])
        # a partition holds every band with band % P == part id: sort by
        # (band, order), segment by band, seed EACH segment separately
        b = t[band_col].to_numpy(zero_copy_only=False)
        o = t[order_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, b))
        t = t.take(pa.array(order))
        b, o = b[order], o[order]
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.empty(len(v), dtype=np.int64)
        cut = np.flatnonzero(np.r_[True, b[1:] != b[:-1], True])
        for k in range(len(cut) - 1):
            lo, hi = int(cut[k]), int(cut[k + 1])
            seed = seeds[int(b[lo])]
            vs = v[lo:hi]
            if combine == "max":
                run = np.maximum.accumulate(vs)
                out[lo:hi] = np.maximum(np.r_[ident, run[:-1]], seed)
            else:
                run = np.add.accumulate(vs)
                out[lo:hi] = np.r_[np.int64(0), run[:-1]] + seed
        return t.drop_columns([band_col, "__part"]).append_column(
            out_col, pa.array(out)
        )

    return hash_exchange_map(banded, band_col, num_partitions, scan_band)
