"""Temporal join operators: distributed backward as-of join.

Ray Data has no as-of join; the reference engine has none either (its
only joins are the ref-resolution hash lookups, reference main.py:211-229).
This is one of the "operators a large-scale pipeline needs" additions:
event enrichment (attach the most recent reading/order/state at-or-before
each event) is the canonical streaming-warehouse join.

Distributed shape (documented partitioning assumption): both sides are
hash-exchanged on the equality key ``by`` — every (by, *) group lands in
exactly one partition, so the per-partition kernel sees all candidate
right rows for its left rows.  Within a partition the kernel is fully
vectorized: concat both sides, ``lexsort`` by (key, on, side), one
``maximum.accumulate`` over right-row positions, then a key-equality
check validates each candidate (a running max can only leak across key
boundaries into rows that the check rejects).  O((nl+nr) log) per
partition, no per-row Python.

Skew note: a single hot ``by`` key (one user with 10^8 events) bounds a
partition; salt-split such keys upstream and as-of join per salt with a
boundary patch round, as with mega-relations (pipeline/osm.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from .relational import empty_dataset, hash_exchange_map


def _asof_merge_indices(
    lk: np.ndarray, lts: np.ndarray, rk: np.ndarray, rts: np.ndarray, strict: bool
) -> np.ndarray:
    """For each left row (original order): index of the right row with
    equal key and the greatest ``on`` <= left's (< when strict), else
    -1.  Ties on (key, on) resolve to the LAST right row (stable
    lexsort + max position) — deterministic regardless of partitioning
    because all equal-key rows share a partition."""
    nl, nr = len(lk), len(rk)
    key = np.concatenate([lk, rk])
    ts = np.concatenate([lts, rts])
    # side order at EQUAL ts: non-strict puts right first (so the
    # running max sees an equal-ts right row); strict puts left first
    side = np.concatenate(
        [
            np.full(nl, 1 if not strict else 0, np.int8),
            np.full(nr, 0 if not strict else 1, np.int8),
        ]
    )
    order = np.lexsort((side, ts, key))
    is_right = order >= nl
    pos = np.where(is_right, np.arange(nl + nr), -1)
    cand = np.maximum.accumulate(pos)
    key_sorted = key[order]
    valid = (cand >= 0) & (key_sorted[np.maximum(cand, 0)] == key_sorted)
    left_sorted_positions = np.flatnonzero(~is_right)
    left_orig = order[left_sorted_positions]
    cand_l = cand[left_sorted_positions]
    valid_l = valid[left_sorted_positions]
    ridx_sorted = order[np.maximum(cand_l, 0)] - nl
    match = np.full(nl, -1, np.int64)
    match[left_orig] = np.where(valid_l, ridx_sorted, -1)
    return match


def _order_as_int64(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Order column -> int64 numpy (timestamps via epoch cast).  Nulls
    are filled with 0 IN ARROW first: pyarrow converts a column with any
    null through float64, which would silently round valid int64 values
    above 2^53 (callers mask null rows separately, so the fill value is
    never read)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    if col.null_count:
        col = pc.fill_null(col, 0)
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def asof_join(
    left,
    right,
    *,
    by: str,
    on: str,
    l_schema: pa.Schema,
    r_schema: pa.Schema,
    strict: bool = False,
    r_suffix: str = "_r",
    num_partitions: int = 16,
):
    """Backward as-of join (left outer): for each left row, attach the
    right row with ``right[by] == left[by]`` and the greatest
    ``right[on] <= left[on]`` (``<`` when ``strict``); unmatched left
    rows keep nulls.  Right columns are emitted with ``r_suffix``
    (``by`` stays shared).  Left rows with a null ``by``/``on`` are kept
    unmatched; right rows with nulls never match.
    """
    if not r_suffix:
        raise ValueError("r_suffix must be non-empty")
    l_names = [f.name for f in l_schema if f.name != by]
    r_names = [f.name for f in r_schema if f.name != by]
    superset = pa.schema(
        [l_schema.field(by)]
        + [l_schema.field(n) for n in l_names]
        + [pa.field(n + r_suffix, r_schema.field(n).type) for n in r_names]
        + [pa.field("__side", pa.int8())]
    )
    names_all = [f.name for f in superset]
    if len(set(names_all)) != len(names_all):
        raise ValueError(f"column collision after suffixing: {sorted(names_all)}")
    out_schema = pa.schema([f for f in superset if f.name != "__side"])

    def pad(side: int, names, suffix: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            arrays = [batch[by]]
            for f in superset:
                if f.name == by:
                    continue
                if f.name == "__side":
                    arrays.append(pa.array(np.full(n, side, np.int8)))
                else:
                    src = f.name[: -len(suffix)] if side == 1 and f.name.endswith(suffix) else f.name
                    if (side == 1 and f.name.endswith(suffix) and src in names) or (
                        side == 0 and f.name in names
                    ):
                        col = batch[f.name if side == 0 else src]
                        arrays.append(col.cast(f.type) if col.type != f.type else col)
                    else:
                        arrays.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(arrays, schema=superset)

        return fn

    lt = left.map_batches(pad(0, set(l_names), r_suffix), batch_format="pyarrow")
    rt = right.map_batches(pad(1, set(r_names), r_suffix), batch_format="pyarrow")
    both = lt.union(rt)

    on_r = on + r_suffix

    def merge(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lmask = pc.equal(tbl["__side"], 0)
        lt = tbl.filter(lmask)
        rt = tbl.filter(pc.invert(lmask))
        # right rows with null key/on can never match
        r_ok = pc.and_(pc.is_valid(rt[by]), pc.is_valid(rt[on_r]))
        rt = rt.filter(r_ok)
        nl, nr = len(lt), len(rt)
        if nl == 0:
            return out_schema.empty_table()
        l_ok = (
            pc.and_(pc.is_valid(lt[by]), pc.is_valid(lt[on]))
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        match = np.full(nl, -1, np.int64)
        if nr and l_ok.any():
            li = np.flatnonzero(l_ok)
            # null-safe int extraction via _order_as_int64 (fill_null in
            # Arrow first): a single null in the column would otherwise
            # route to_numpy through float64 and round valid keys > 2^53
            lk = _order_as_int64(lt[by])[li]
            lts_np = _order_as_int64(lt[on])[li]
            rk = _order_as_int64(rt[by])
            rts_np = _order_as_int64(rt[on_r])
            match[li] = _asof_merge_indices(lk, lts_np, rk, rts_np, strict)
        matched = match >= 0
        ridx = pa.array(np.maximum(match, 0), mask=~matched)
        arrays = [lt[by]] + [lt[n] for n in l_names]
        for n in r_names:
            arrays.append(rt[n + r_suffix].take(ridx) if nr else pa.nulls(nl, r_schema.field(n).type))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    exchanged = hash_exchange_map(both, by, num_partitions, merge)
    if exchanged is None:
        return empty_dataset(out_schema)
    return exchanged
