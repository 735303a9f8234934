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


def hopping_window_agg(
    ds,
    *,
    t: str,
    width: int,
    hop: int,
    aggs: dict,
    out_ts: str = "w_start",
):
    """Sliding/hopping window aggregate: fixed windows of ``width``
    starting every ``hop`` (int64 units of ``t``, e.g. epoch micros;
    ``width`` must be a multiple of ``hop``).  Each row belongs to
    exactly ``width // hop`` windows, so the explode is a bounded
    constant-factor replicate (np.repeat + tile, no per-row Python),
    after which the aggregation is the ordinary combiner push-down
    (relational.partial_grouped_agg): each block reduces to one partial
    row per window before anything shuffles.  Completes the window
    family next to tumbling (queries.q4) and session (queries.q6).
    ``aggs`` follows partial_grouped_agg: {out: (col|None, "sum"|"count")}.
    Null ``t`` rows are dropped (no window contains them)."""
    import pyarrow.compute as pc

    if width % hop != 0 or width <= 0:
        raise ValueError("width must be a positive multiple of hop")
    fanout = width // hop
    value_cols = sorted({c for c, _ in aggs.values() if c is not None})

    def explode(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.is_valid(tbl[t]))
        tv = _order_as_int64(tbl[t])
        n = len(tv)
        # windows containing t: starts (t//hop - k)*hop for k in 0..fanout-1
        # (floor division also for negative times: numpy // floors)
        base = (tv // hop) * hop
        starts = np.repeat(base, fanout) - np.tile(
            np.arange(fanout, dtype=np.int64) * hop, n
        )
        idx = pa.array(np.repeat(np.arange(n), fanout))
        cols = {out_ts: pa.array(starts, pa.int64())}
        for c in value_cols:
            cols[c] = tbl[c].take(idx)
        return pa.table(cols)

    from .relational import partial_grouped_agg

    return partial_grouped_agg(
        ds.map_batches(explode, batch_format="pyarrow"), [out_ts], aggs
    )


def interval_count_join(
    points,
    intervals,
    *,
    t: str,
    start: str,
    end: str,
    id_col: str,
    band_width: int,
    out_col: str = "n_points",
    num_partitions: int = 16,
):
    """Range/interval join (count form, left-outer on intervals): for
    each interval row, count points with ``start <= point[t] < end``.
    No equality key exists, so the join is banded — the 1-D analog of
    the cover-cell PIP join (spatial/pip.py): the time axis is cut into
    fixed bands of ``band_width`` (int64 units of ``t``, e.g. epoch
    micros), every interval is replicated to each band it overlaps
    (vectorized repeat/arange explode, no per-row Python), every point
    lands in exactly ONE band, and both sides hash-exchange on the band
    id.  Per partition the kernel walks its bands: points sorted once
    per band, each interval's in-band count is a two-``searchsorted``
    difference — a point is counted exactly once globally because it
    exists in exactly one band's point array.  Per-band partial counts
    are pre-split on ``id_col`` at emission (``emit_split_on`` — fused
    exchange) and a second exchange sums them per interval.

    Timestamps are cast to int64 (epoch) null-safely; null ``t`` /
    ``start`` / ``end`` rows are dropped (null times can't match).
    Band width is the skew knob: it bounds replication (intervals
    spanning b bands emit b rows) against per-band point volume, the
    same trade as the cell level in the PIP join.
    """
    import pyarrow.compute as pc

    if band_width <= 0:
        raise ValueError("band_width must be positive")

    def explode_intervals(tbl: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(tbl[start]), pc.is_valid(tbl[end]))
        tbl = tbl.filter(ok)
        s = _order_as_int64(tbl[start])
        e = _order_as_int64(tbl[end])
        ids = tbl[id_col].combine_chunks() if isinstance(tbl[id_col], pa.ChunkedArray) else tbl[id_col]
        ids = ids.cast(pa.int64())  # both sides must share the padded schema
        b0 = s // band_width
        # end is exclusive; empty intervals (e <= s) still emit one row
        # so left-outer zero counts survive to the final sum
        b1 = np.maximum((e - 1) // band_width, b0)
        nb = (b1 - b0 + 1).astype(np.int64)
        row_idx = np.repeat(np.arange(len(tbl)), nb)
        # intra-interval band offset: global arange minus each row's
        # replicate-start (the classic vectorized ragged-range trick)
        offs = np.arange(len(row_idx)) - np.repeat(np.cumsum(nb) - nb, nb)
        return pa.table(
            {
                "__band": pa.array(b0[row_idx] + offs, pa.int64()),
                id_col: ids.take(pa.array(row_idx)),
                "__start": pa.array(s[row_idx], pa.int64()),
                "__end": pa.array(e[row_idx], pa.int64()),
                "__t": pa.nulls(len(row_idx), pa.int64()),
                "__side": pa.array(np.zeros(len(row_idx), np.int8)),
            }
        )

    def band_points(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.is_valid(tbl[t]))
        tv = _order_as_int64(tbl[t])
        n = len(tv)
        return pa.table(
            {
                "__band": pa.array(tv // band_width, pa.int64()),
                id_col: pa.nulls(n, pa.int64()),
                "__start": pa.nulls(n, pa.int64()),
                "__end": pa.nulls(n, pa.int64()),
                "__t": pa.array(tv, pa.int64()),
                "__side": pa.array(np.ones(n, np.int8)),
            }
        )

    iv = intervals.map_batches(explode_intervals, batch_format="pyarrow")
    pts = points.map_batches(band_points, batch_format="pyarrow")

    def count_in_bands(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # split by side BEFORE numpy extraction: the padded columns hold
        # nulls on the other side's rows, and a single null routes
        # to_numpy through float64 (silent precision loss above 2^53)
        iv_mask = pc.equal(tbl["__side"], 0)
        ivt = tbl.filter(iv_mask)
        ptt = tbl.filter(pc.invert(iv_mask))
        iv_band = _order_as_int64(ivt["__band"])
        iv_s = _order_as_int64(ivt["__start"])
        iv_e = _order_as_int64(ivt["__end"])
        iv_ids = ivt[id_col]
        if len(iv_band) == 0:
            return pa.table({id_col: pa.array([], pa.int64()), out_col: pa.array([], pa.int64())})
        pt_band = _order_as_int64(ptt["__band"])
        pt_t = _order_as_int64(ptt["__t"])
        # sort points by (band, t): each band is a contiguous sorted run
        p_order = np.lexsort((pt_t, pt_band))
        pt_band, pt_t = pt_band[p_order], pt_t[p_order]
        counts = np.zeros(len(iv_band), np.int64)
        # per-band slices: a small loop over BANDS (coarse units), all
        # per-interval work inside is two vectorized searchsorteds
        iv_order = np.argsort(iv_band, kind="stable")
        iv_band_sorted = iv_band[iv_order]
        uniq, first = np.unique(iv_band_sorted, return_index=True)
        bounds = np.append(first, len(iv_band_sorted))
        for i, b in enumerate(uniq):
            lo = np.searchsorted(pt_band, b, "left")
            hi = np.searchsorted(pt_band, b, "right")
            if lo == hi:
                continue
            seg = pt_t[lo:hi]
            rows = iv_order[bounds[i] : bounds[i + 1]]
            counts[rows] = np.searchsorted(seg, iv_e[rows], "left") - np.searchsorted(
                seg, iv_s[rows], "left"
            )
        return pa.table({id_col: iv_ids, out_col: pa.array(counts, pa.int64())})

    def sum_partials(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        cnt = tbl[out_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ids, return_inverse=True)
        return pa.table(
            {
                id_col: pa.array(uniq, pa.int64()),
                out_col: pa.array(np.bincount(inv, weights=cnt).astype(np.int64)),
            }
        )

    from .relational import hash_exchange_map as _hxm

    partials = _hxm(
        [iv, pts], "__band", num_partitions, count_in_bands,
        emit_split_on=(id_col, num_partitions),
    )
    if partials is None:
        return empty_dataset(pa.schema([(id_col, pa.int64()), (out_col, pa.int64())]))
    out = _hxm(partials, id_col, num_partitions, sum_partials)
    if out is None:
        return empty_dataset(pa.schema([(id_col, pa.int64()), (out_col, pa.int64())]))
    return out


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


def _pair_gid(a: np.ndarray, b: np.ndarray) -> "tuple[np.ndarray, int]":
    """Exact group ids for (a, b) pairs (one lexsort, no packing — no
    hash-collision risk for arbitrary int64 values).  Returns (gid per
    row, number of groups)."""
    n = len(a)
    if n == 0:
        return np.empty(0, np.int64), 0
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    new = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    gid_sorted = np.cumsum(new) - 1
    gid = np.empty(n, np.int64)
    gid[order] = gid_sorted
    return gid, int(gid_sorted[-1]) + 1


def _band_route(by: np.ndarray, band: np.ndarray) -> np.ndarray:
    """Deterministic int64 routing key for a (by, band) pair — mixes the
    band in so one hot ``by`` key spreads across partitions.  Collisions
    only co-locate groups (kernels regroup on the exact pair)."""
    from .images.synth import splitmix64

    u = by.astype(np.uint64, copy=False)
    b = band.astype(np.uint64, copy=False)
    return (
        splitmix64(u ^ splitmix64(b + np.uint64(0x9E3779B97F4A7C15)))
        >> np.uint64(1)
    ).astype(np.int64)


def asof_join_banded(
    left,
    right,
    *,
    by: str,
    on: str,
    band_width: int,
    l_schema: pa.Schema,
    r_schema: pa.Schema,
    strict: bool = False,
    r_suffix: str = "_r",
    num_partitions: int = 16,
):
    """Backward as-of join with HOT-KEY skew handling: identical
    semantics to :func:`asof_join`, but both sides route on
    ``(by, on // band_width)`` instead of ``by`` alone, so a single hot
    equality key (one user holding 90 % of the event log — the common
    real shape) spreads across partitions instead of bounding one
    worker's heap.  Mirrors the mega-relation salting in pipeline/osm.py
    and the band machinery of :func:`interval_count_join`.

    Three-round shape (rounds 2–3 touch only boundary data):
      1. exchange on (by, band): per-partition IN-BAND as-of; matched
         left rows finish here.  Also emits, per (by, band): the band's
         latest right row (a summary) and, where in-band-unmatched left
         rows exist, a band token — both one row per group.
      2. tiny exchange of summaries + tokens on ``by``: each token band
         b gets the summary of the greatest summary band < b (its rows'
         ``on`` < b*band_width <= any left ``on`` in band b, so the
         carry is always admissible, strict included).
      3. exchange of the in-band-unmatched rows + patches on the SAME
         (by, band) routing: attach the carry payload (or keep nulls).

    Tie note: equal (by, on) right rows resolve to the last row in
    partition order, as in asof_join; with a hot key the band routing
    changes which order that is — byte-parity with asof_join requires
    tie-free (by, on) right rows (true for all gated inputs).

    ``band_width`` is the skew knob: small bands spread a hot key wider
    but make more rows take the round-3 patch path."""
    import pyarrow.compute as pc

    from .relational import hash_exchange_map

    if band_width <= 0:
        raise ValueError("band_width must be positive")
    if not r_suffix:
        raise ValueError("r_suffix must be non-empty")

    l_names = [f.name for f in l_schema if f.name != by]
    r_names = [f.name for f in r_schema if f.name != by]
    out_schema = pa.schema(
        [l_schema.field(by)]
        + [l_schema.field(n) for n in l_names]
        + [pa.field(n + r_suffix, r_schema.field(n).type) for n in r_names]
    )
    names_all = [f.name for f in out_schema] + ["__side", "__band", "__bb", "__kind"]
    if len(set(names_all)) != len(names_all):
        raise ValueError(f"column collision after suffixing: {sorted(names_all)}")
    # exchange schema: out columns + side/band/routing/kind markers
    ex_schema = pa.schema(
        list(out_schema)
        + [
            pa.field("__side", pa.int8()),
            pa.field("__band", pa.int64()),
            pa.field("__bb", pa.int64()),
            pa.field("__kind", pa.int8()),
        ]
    )
    on_r = on + r_suffix

    def pad(side: int):
        names = set(l_names) if side == 0 else set(r_names)

        def fn(batch: pa.Table) -> pa.Table:
            if side == 1:
                # right rows with null key/on can never match
                batch = batch.filter(
                    pc.and_(pc.is_valid(batch[by]), pc.is_valid(batch[on]))
                )
            n = len(batch)
            on_np = _order_as_int64(batch[on]) if n else np.empty(0, np.int64)
            band = on_np // band_width
            by_np = _order_as_int64(batch[by]) if n else np.empty(0, np.int64)
            if side == 0:
                # null by/on left rows: park in band 0 (kernel emits
                # them unmatched without consulting the band)
                ok = (
                    pc.and_(pc.is_valid(batch[by]), pc.is_valid(batch[on]))
                    .to_numpy(zero_copy_only=False)
                    .astype(bool)
                )
                band = np.where(ok, band, 0)
            arrays = []
            for f in ex_schema:
                if f.name == by:
                    arrays.append(batch[by])
                elif f.name == "__side":
                    arrays.append(pa.array(np.full(n, side, np.int8)))
                elif f.name == "__band":
                    arrays.append(pa.array(band))
                elif f.name == "__bb":
                    arrays.append(pa.array(_band_route(by_np, band)))
                elif f.name == "__kind":
                    arrays.append(pa.array(np.zeros(n, np.int8)))
                else:
                    src = (
                        f.name[: -len(r_suffix)]
                        if side == 1 and f.name.endswith(r_suffix)
                        else f.name
                    )
                    if (side == 1 and f.name.endswith(r_suffix) and src in names) or (
                        side == 0 and f.name in names and not f.name.endswith(r_suffix)
                    ):
                        col = batch[src if side == 1 else f.name]
                        arrays.append(col.cast(f.type) if col.type != f.type else col)
                    else:
                        arrays.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(arrays, schema=ex_schema)

        return fn

    def _emit(tbl: pa.Table, *, kind: int, take=None, r_from=None, r_take=None,
              band=None) -> pa.Table:
        """Build ex_schema rows from a base table slice: l cols from
        ``tbl`` (optionally .take(take)), r cols from ``r_from`` rows
        ``r_take`` (mask -1 -> null), __band/__kind constants/arrays."""
        base = tbl.take(pa.array(take)) if take is not None else tbl
        n = len(base)
        arrays = []
        for f in ex_schema:
            if f.name == "__side":
                arrays.append(pa.array(np.zeros(n, np.int8)))
            elif f.name == "__kind":
                arrays.append(pa.array(np.full(n, kind, np.int8)))
            elif f.name == "__band":
                arrays.append(
                    pa.array(band) if band is not None else pa.nulls(n, pa.int64())
                )
            elif f.name == "__bb":
                if band is not None:
                    by_np = _order_as_int64(base[by])
                    arrays.append(pa.array(_band_route(by_np, band)))
                else:
                    arrays.append(pa.nulls(n, pa.int64()))
            elif f.name == by or not f.name.endswith(r_suffix) or f.name[: -len(r_suffix)] not in r_names:
                arrays.append(base[f.name])
            else:  # an r-suffixed payload column
                if r_from is None:
                    arrays.append(pa.nulls(n, f.type))
                else:
                    ridx = pa.array(np.maximum(r_take, 0), mask=r_take < 0)
                    arrays.append(r_from[f.name].take(ridx))
        return pa.Table.from_arrays(arrays, schema=ex_schema)

    def kernel1(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        lmask = pc.equal(tbl["__side"], 0)
        lt = tbl.filter(lmask)
        rt = tbl.filter(pc.invert(lmask))
        nl, nr = len(lt), len(rt)
        if nl == 0 and nr == 0:
            return ex_schema.empty_table()
        outs = []
        l_ok = (
            pc.and_(pc.is_valid(lt[by]), pc.is_valid(lt[on]))
            .to_numpy(zero_copy_only=False)
            .astype(bool)
            if nl
            else np.empty(0, bool)
        )
        if nl and (~l_ok).any():
            # null-key left rows are FINAL unmatched (kind 0, null r)
            outs.append(_emit(lt, kind=0, take=np.flatnonzero(~l_ok)))
        li = np.flatnonzero(l_ok)
        if len(li):
            lby = _order_as_int64(lt[by])[li]
            lband = _order_as_int64(lt["__band"])[li]
            lts_np = _order_as_int64(lt[on])[li]
            rby = _order_as_int64(rt[by])
            rband = _order_as_int64(rt["__band"])
            rts_np = _order_as_int64(rt[on_r])
            gid, _ = _pair_gid(
                np.concatenate([lby, rby]), np.concatenate([lband, rband])
            )
            match = _asof_merge_indices(
                gid[: len(li)], lts_np, gid[len(li):], rts_np, strict
            )
            hit = match >= 0
            if hit.any():
                outs.append(
                    _emit(lt, kind=0, take=li[hit], r_from=rt, r_take=match[hit])
                )
            if (~hit).any():
                miss = li[~hit]
                outs.append(_emit(lt, kind=1, take=miss, band=lband[~hit]))
                # band tokens: one per unmatched (by, band)
                tgid, tn = _pair_gid(lby[~hit], lband[~hit])
                first = np.full(tn, -1, np.int64)
                # last write wins -> use reversed first-occurrence
                first[tgid[::-1]] = np.arange(len(tgid))[::-1]
                outs.append(
                    _emit(lt, kind=3, take=miss[first], band=lband[~hit][first])
                )
        if nr:
            # per-(by, band) summary: latest right row (max on, last in
            # partition order on ties)
            rby = _order_as_int64(rt[by])
            rband = _order_as_int64(rt["__band"])
            rts_np = _order_as_int64(rt[on_r])
            sgid, sn = _pair_gid(rby, rband)
            order = np.lexsort((np.arange(nr), rts_np, sgid))
            last = np.zeros(sn, np.int64)
            last[sgid[order]] = order  # ascending scan: final write = max
            sum_tbl = rt.take(pa.array(last))
            # right-side rows already carry null l cols; r payload is
            # taken from the summary rows themselves
            outs.append(
                _emit(
                    sum_tbl,
                    kind=2,
                    r_from=sum_tbl,
                    r_take=np.arange(sn),
                    band=_order_as_int64(sum_tbl["__band"]),
                )
            )
        return pa.concat_tables(outs) if outs else ex_schema.empty_table()

    def kernel2(tbl: pa.Table) -> pa.Table:
        # summaries (kind 2) + tokens (kind 3), all bands of a by-key
        # co-located: each token band gets the greatest summary band
        # strictly below it
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        smask = pc.equal(tbl["__kind"], 2)
        st = tbl.filter(smask)
        tt = tbl.filter(pc.invert(smask))
        if len(tt) == 0 or len(st) == 0:
            return ex_schema.empty_table()
        s_by = _order_as_int64(st[by])
        s_band = _order_as_int64(st["__band"])
        t_by = _order_as_int64(tt[by])
        t_band = _order_as_int64(tt["__band"])
        # "greatest summary band strictly below the token band" IS a
        # strict backward as-of on (key=by, on=band) — reuse the
        # vectorized merge kernel
        idx = _asof_merge_indices(t_by, t_band, s_by, s_band, strict=True)
        have = idx >= 0
        if not have.any():
            return ex_schema.empty_table()
        # patches: kind 4 rows keyed (by, band of the TOKEN), r payload
        # from the chosen summary
        return _emit(
            tt.take(pa.array(np.flatnonzero(have))),
            kind=4,
            r_from=st,
            r_take=idx[have],
            band=t_band[have],
        )

    def kernel3(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        umask = pc.equal(tbl["__kind"], 1)
        ut = tbl.filter(umask)
        ptbl = tbl.filter(pc.invert(umask))
        nu = len(ut)
        if nu == 0:
            return out_schema.empty_table()
        u_by = _order_as_int64(ut[by])
        u_band = _order_as_int64(ut["__band"])
        p_by = _order_as_int64(ptbl[by])
        p_band = _order_as_int64(ptbl["__band"])
        gid, ng = _pair_gid(
            np.concatenate([u_by, p_by]), np.concatenate([u_band, p_band])
        )
        lookup = np.full(ng, -1, np.int64)
        lookup[gid[nu:]] = np.arange(len(p_by))
        ridx_np = lookup[gid[:nu]]
        ridx = pa.array(np.maximum(ridx_np, 0), mask=ridx_np < 0)
        arrays = [ut[by]] + [ut[n] for n in l_names]
        for n in r_names:
            col = n + r_suffix
            arrays.append(
                ptbl[col].take(ridx) if len(ptbl) else pa.nulls(nu, r_schema.field(n).type)
            )
        return pa.Table.from_arrays(arrays, schema=out_schema)

    lt = left.map_batches(pad(0), batch_format="pyarrow")
    rt = right.map_batches(pad(1), batch_format="pyarrow")

    round1 = hash_exchange_map([lt, rt], "__bb", num_partitions, kernel1)
    if round1 is None:
        return empty_dataset(out_schema)

    def pick(kinds):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["__kind"], value_set=pa.array(kinds, pa.int8())))

        return fn

    done = round1.map_batches(pick([0]), batch_format="pyarrow").map_batches(
        lambda t: t.select([f.name for f in out_schema]), batch_format="pyarrow"
    )
    boundary = round1.map_batches(pick([2, 3]), batch_format="pyarrow")
    unmatched = round1.map_batches(pick([1]), batch_format="pyarrow")

    patches = hash_exchange_map(boundary, by, num_partitions, kernel2)
    round3_in = [unmatched] if patches is None else [unmatched, patches]
    patched = hash_exchange_map(round3_in, "__bb", num_partitions, kernel3)
    if patched is None:
        return done
    return done.union(patched)


def interval_coverage(ds, *, by: str, start_col: str, end_col: str,
                      num_partitions: int = 16):
    """UNION-of-intervals per group: total covered length and island
    (maximal merged run) count — the gaps-and-islands aggregate
    (per-user active time from overlapping sessions, per-region sensor
    uptime).  Touching intervals (next.start == running max end) MERGE;
    island breaks only on a strict gap, matching the SQL twin's
    ``start > max(end) OVER (... 1 PRECEDING)`` break rule.

    Distributed shape: ONE hash exchange on ``by`` (slim (by, s, e)
    int64 rows), then each partition runs a single vectorized pass:
    lexsort by (group, start, end), segmented running-max-of-end via a
    rebased group-offset packed key (one np.maximum.accumulate — the
    monotone group prefix makes the global cummax a per-group cummax),
    island starts from the strict-gap test, per-island extents with
    maximum.reduceat, per-group totals with add.reduceat.  No per-row
    or per-group Python.  The packed key bounds #groups x time-span
    per partition to 2^62 (checked, loud raise — rebase/band upstream
    for wider spans).

    Output: (by, covered, n_islands), one row per group.  Requires
    int64 start/end with start <= end (validated)."""
    out_fields = [(by, pa.int64()), ("covered", pa.int64()),
                  ("n_islands", pa.int64())]
    out_schema = pa.schema(out_fields)

    def kernel(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        n = len(tbl)
        if n == 0:
            return out_schema.empty_table()
        g = tbl[by].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        s = tbl[start_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        e = tbl[end_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if (s > e).any():
            raise ValueError("interval_coverage: start > end row")
        order = np.lexsort((e, s, g))
        g, s, e = g[order], s[order], e[order]
        gstart = np.empty(n, dtype=bool)
        gstart[0] = True
        gstart[1:] = g[1:] != g[:-1]
        grp = np.cumsum(gstart) - 1  # dense group rank, partition-local
        base = int(s.min())
        s0 = s - base
        e0 = e - base
        span = int(e0.max()) + 1
        n_groups = int(grp[-1]) + 1
        if n_groups * span >= (1 << 62):
            raise ValueError(
                "interval_coverage packed key would overflow: "
                f"{n_groups} groups x span {span}; band the 'on' axis upstream"
            )
        key = grp * span + e0
        prev_ckey = np.empty(n, dtype=np.int64)
        prev_ckey[0] = -1
        prev_ckey[1:] = np.maximum.accumulate(key)[:-1]
        # for non-start rows the prefix max key is from THIS group
        # (group keys strictly dominate all earlier groups'), so the
        # decode prev_ckey - grp*span is the group's running max end
        brk = gstart | (s0 > prev_ckey - grp * span)
        starts = np.flatnonzero(brk)
        isl_len = np.maximum.reduceat(e0, starts) - s0[starts]
        isl_g = g[starts]
        gi = np.flatnonzero(np.r_[True, isl_g[1:] != isl_g[:-1]])
        covered = np.add.reduceat(isl_len, gi)
        n_isl = np.diff(np.r_[gi, len(isl_len)])
        return pa.Table.from_pydict(
            {by: isl_g[gi], "covered": covered.astype(np.int64),
             "n_islands": n_isl.astype(np.int64)},
            schema=out_schema,
        )

    slim = ds.select_columns([by, start_col, end_col])
    out = hash_exchange_map(slim, by, num_partitions, kernel)
    if out is None:
        return empty_dataset(out_schema)
    return out


def status_periods(ds, *, by: str, on: str, status_col: str,
                   order_col: str, num_partitions: int = 16):
    """SCD2-style period build (gaps-and-islands run collapse): fold a
    per-group ordered event stream into validity periods — one row per
    maximal run of consecutive equal ``status_col`` values, with the
    run's first/last ``on`` and its event count.  This is the
    change-data step that turns an event log into a slowly-changing
    dimension history (status effective from start_on until the next
    period's start).

    Distributed shape: ONE hash exchange on ``by`` (slim 4-column
    rows), then each partition is a single vectorized pass — lexsort
    by (by, on, order_col), dictionary-encode the status strings to
    int codes, run breaks where the group or code changes, and
    per-run extents/counts via flatnonzero + diff.  No per-row or
    per-group Python.  ``order_col`` must make the sort total within a
    group (ties on ``on`` broken by it) or period boundaries would
    depend on partitioning.

    Output: (by, status, start_on, end_on, n_events), end_on = the
    run's LAST event time (closed interval; the successor period's
    start_on is the open end for SCD2 semantics).

    Skew note: one group lands in one partition (the asof_join
    caveat); band the ``on`` axis upstream for a pathological hot
    group."""
    out_schema = pa.schema([
        (by, pa.int64()), ("status", pa.string()),
        ("start_on", pa.int64()), ("end_on", pa.int64()),
        ("n_events", pa.int64()),
    ])

    def kernel(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        n = len(tbl)
        if n == 0:
            return out_schema.empty_table()
        g = tbl[by].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        o = tbl[on].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        o2 = tbl[order_col].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        order = np.lexsort((o2, o, g))
        g, o = g[order], o[order]
        st = tbl[status_col].combine_chunks().take(pa.array(order))
        dic = st.dictionary_encode()
        codes = np.asarray(dic.indices)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (g[1:] != g[:-1]) | (codes[1:] != codes[:-1])
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], n] - 1
        return pa.Table.from_pydict(
            {by: g[starts], "status": st.take(pa.array(starts)),
             "start_on": o[starts], "end_on": o[ends],
             "n_events": np.diff(np.r_[starts, n]).astype(np.int64)},
            schema=out_schema,
        )

    slim = ds.select_columns([by, on, status_col, order_col])
    out = hash_exchange_map(slim, by, num_partitions, kernel)
    if out is None:
        return empty_dataset(out_schema)
    return out
