"""Distributed OSM stitching pipeline (Ray-Data-first re-expression of
the reference's refs_index walk, SURVEY.md §3.4).

Stages (all shuffles are one-pass HASH EXCHANGES,
``relational.hash_exchange_map`` — no sort, no sampling):

1. one source scan -> Arrow elements (ELEMENT_SCHEMA), lazily split by
   ``type`` with per-type column pruning
2. J1  way⋈node: pure-Arrow edge explode, hash join on node id, then a
   FUSED way exchange whose reduce assembles coordinates vectorized
   (lexsort + reduceat) into ``list<struct<lon,lat>>`` columns —
   node order is semantic (way-node order, main.py:288)
3. way conversion: ``map_batches`` with the broadcast classifier;
   closed rings become polygons per P6-P8
4. J3/J4 relation⋈way: member edges join the way payload (element
   columns ride natively, element dicts built only per member); a
   rel_id exchange runs the SAME assembly kernels the document
   converter uses; nested relations resolve over bounded extra rounds
   scheduled from the tiny nested-edge list; relations above
   ``salt_member_threshold`` take the skew-safe path (member
   conversion as a flat parallel map BEFORE the exchange)
5. J6 used-filter: consumers emit (used_id, consumer) pairs; the id
   set reduces remotely (driver passes a ref) into broadcast
   anti-filter actors, or a left_anti exchange as the big-set fallback
   (bare-id collision semantics, main.py:171)

Partitioning keys: node id (J1), way id (J1 regroup + J3/J4), relation
id (ring assembly), bare id (used-filter fallback).  Exchange outputs
are ref-backed datasets: multi-consumer reads re-read object refs
without recompute, so no materialize barriers sit between stages.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..classify import DEFAULT_CLASSIFIER, PolygonClassifier
from ..geom import assemble
from ..geom.kernels import is_valid_polygon, repr_f64_strs
from ..model.schema import ELEMENT_SCHEMA, elements_table, row_to_element
from ..relational import hash_join

FEATURE_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("element_type", pa.string()),
        ("element_id", pa.int64()),
        ("geom_type", pa.string()),
        ("geometry_json", pa.string()),
        ("properties_json", pa.string()),
    ]
)

USED_SCHEMA = pa.schema([("used_id", pa.int64()), ("consumer_id", pa.int64())])

# way-element columns carried through the member join (a way element
# never has "members"); dict construction happens only per member row
_MEMBER_EL_FIELDS = [f for f in ELEMENT_SCHEMA if f.name != "members"]

MEMBER_EDGE_SCHEMA = pa.schema(
    [
        ("way_id", pa.int64()),
        ("rel_id", pa.int64()),
        ("member_idx", pa.int64()),
        ("role", pa.string()),
    ]
)

EDGE_SCHEMA = pa.schema(
    [("node_id", pa.int64()), ("way_id", pa.int64()), ("edge_seq", pa.int64())]
)
COORDS_SCHEMA = pa.schema(
    [("node_id", pa.int64()), ("n_lon", pa.float64()), ("n_lat", pa.float64())]
)
from ..model.schema import COORD, MEMBER  # noqa: E402  (struct<lon,lat>)

WAY_COORDS_SCHEMA = pa.schema(
    [
        ("way_id", pa.int64()),
        ("resolved", pa.bool_()),
        ("coords", pa.list_(COORD)),
        ("used_nodes", pa.list_(pa.int64())),
    ]
)


def elements_dataset(elements: List[dict], *, override_num_blocks: Optional[int] = None):
    """Build an elements Dataset from parsed element dicts (test/small
    path).  At scale, read sharded files instead:
    ``ray.data.read_binary_files(paths).flat_map(parse shard)``."""
    tbl = elements_table(elements)
    return ray.data.from_arrow(tbl, override_num_blocks=override_num_blocks)


def _const_str(value: str, n: int) -> pa.Array:
    """Length-n constant string column without a Python list build."""
    return pa.repeat(pa.scalar(value), n)


def _empty(schema: pa.Schema):
    return ray.data.from_arrow(schema.empty_table())


def join_safe(left, right, *, on: str, l_schema: pa.Schema, r_schema: pa.Schema,
              join_type: str, num_partitions: int, post_fn=None,
              emit_split_on=None):
    """Partitioned hash join (see relational.hash_join).  Ray's native
    Dataset.join crashes on empty-input partitions in 2.49, so joins go
    through the explicit groupby-based implementation."""
    return hash_join(
        left,
        right,
        on=on,
        l_schema=l_schema,
        r_schema=r_schema,
        how=join_type,
        num_partitions=num_partitions,
        post_fn=post_fn,
        emit_split_on=emit_split_on,
    )


def _rel_block_scan(batch: pa.Table):
    """ONE pure-Arrow pass over a relation block: way-member edges
    (list_flatten + parent indices + struct_field — no Python row loop)
    plus the nested-relation (child, parent) edge lists."""
    t = batch.select(["id", "members", "center"])
    t = t.filter(pc.and_(pc.is_valid(t["members"]), pc.is_null(t["center"])))
    members = t["members"].combine_chunks()
    ids = t["id"].combine_chunks()
    flat = pc.list_flatten(members)
    rel_id = pc.take(ids, pc.list_parent_indices(members))
    lens = pc.list_value_length(members).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64), nan=0).astype(np.int64)
    total = int(lens.sum())
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    m_idx = pa.array(np.arange(total, dtype=np.int64) - starts)
    mtype = pc.struct_field(flat, "type")
    keep = pc.fill_null(
        pc.and_(
            pc.equal(mtype, "way"),
            pc.is_null(pc.struct_field(flat, "geometry")),
        ),
        False,
    )
    out = pa.Table.from_arrays(
        [
            pc.struct_field(flat, "ref"),
            rel_id,
            m_idx,
            pc.fill_null(pc.struct_field(flat, "role"), ""),
        ],
        schema=MEMBER_EDGE_SCHEMA,
    )
    edges = out.filter(keep)
    nested = pc.fill_null(pc.equal(mtype, "relation"), False)
    child = pc.struct_field(flat, "ref").filter(nested).to_pylist()
    parent = rel_id.filter(nested).to_pylist()
    return edges, child, parent


@ray.remote(num_returns=2)
def _rel_scan_task(block: pa.Table):
    """(way-member edges table, small sched/count tuple): the edges stay
    in the object store for the member join; only the tiny scheduling
    payload (nested edges, present ids, member counts) is ray.get to the
    driver — the member explode, the nested scan and the mega count
    share ONE task wave and ONE driver barrier."""
    edges, child, parent = _rel_block_scan(block)
    ids = block["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    e_ids, e_cnt = np.unique(
        edges["rel_id"].to_numpy(zero_copy_only=False), return_counts=True
    )
    return edges, (child, parent, ids, e_ids.astype(np.int64),
                   e_cnt.astype(np.int64))


def explode_members(batch: pa.Table) -> pa.Table:
    """Member-edge explode of one relation block (MEMBER_EDGE_SCHEMA)."""
    return _rel_block_scan(batch)[0]


_USED_ID_SHARDS = 8


def _fetch_used_ids(ids_ref):
    """Worker-cached fetch of the broadcast used-id set.  ``ids_ref``
    is either one ObjectRef (a single sorted unique array) or a list of
    refs — residue-class shards (``id % len(list)``), produced by the
    parallel sharded merge in features().  Fetched once per WORKER
    process (worker_state cache keyed by the ref hex(es))."""
    import ray as _ray

    from ..worker_state import cache_key_for_ref, get_or_build

    if isinstance(ids_ref, (list, tuple)):
        key = ("used_ids", tuple(cache_key_for_ref(r) for r in ids_ref))
        return get_or_build(key, lambda: tuple(_ray.get(list(ids_ref))))
    return get_or_build(
        ("used_ids", cache_key_for_ref(ids_ref)), lambda: _ray.get(ids_ref)
    )


def _used_keep_mask(ids, el):
    """keep[i] = el[i] NOT in the used set.  ``ids`` is one sorted
    unique int64 array, or a tuple of residue-class shards (shard s
    holds ids with ``id % S == s``, each sorted unique) — membership
    then runs as one searchsorted per shard over that residue's
    elements (numpy %: non-negative for a positive divisor on both
    sides, so negative editor ids route consistently)."""
    n = len(el)
    if isinstance(ids, tuple):
        keep = np.ones(n, dtype=bool)
        if not n:
            return keep
        S = len(ids)
        r = el % S
        for s, shard in enumerate(ids):
            if not len(shard):
                continue
            m = r == s
            if not m.any():
                continue
            sub = el[m]
            pos = np.minimum(np.searchsorted(shard, sub), len(shard) - 1)
            keep[m] = shard[pos] != sub
        return keep
    if not len(ids) or not n:
        return np.ones(n, dtype=bool)
    pos = np.minimum(np.searchsorted(ids, el), len(ids) - 1)
    return ids[pos] != el


def _anti_filter_task(batch: pa.Table, *, ids_ref) -> pa.Table:
    """Used-ref anti-filter in warm-task mode: the sorted id set is
    fetched once per WORKER process (worker_state cache keyed by the
    broadcast ref) and membership runs as one searchsorted per batch —
    actor-pool state without the per-query actor spawn storm."""
    ids = _fetch_used_ids(ids_ref)
    el = batch["element_id"].to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(_used_keep_mask(ids, el)))


def _prefilter_used(batch: pa.Table, ids_ref, col: str) -> pa.Table:
    """Bare-id used-ref anti-filter (J6) applied BEFORE feature
    conversion: same broadcast id set and same membership predicate as
    ``_anti_filter_task``, but fused into the head of the conversion
    kernels so a used element is never converted and its feature row
    never hits the object store.  On the 2.4M-node bench ~60% of nodes
    are way members — skipping them removes both their conversion cost
    and the whole post-union filter hop (a read+rewrite of every
    feature block, which cannot fuse across the union)."""
    ids = _fetch_used_ids(ids_ref)
    if not len(batch):
        return batch
    el = batch[col].to_numpy(zero_copy_only=False)
    keep = _used_keep_mask(ids, el)
    if keep.all():
        return batch
    return batch.filter(pa.array(keep))


class OsmPipeline:
    """Distributed elements -> GeoJSON-feature-rows pipeline."""

    def __init__(
        self,
        classifier: Optional[PolygonClassifier] = None,
        filter_used_refs: bool = True,
        max_relation_rounds: int = 3,
        num_partitions: int = 16,
        debug_timing: bool = False,
        used_filter_strategy: str = "broadcast",
        salt_member_threshold: int = 256,
        stage_gate: bool = True,
        consume_mode: str = "tasks",
    ):
        self.classifier = classifier or DEFAULT_CLASSIFIER
        self.filter_used_refs = filter_used_refs
        self.max_relation_rounds = max_relation_rounds
        self.num_partitions = num_partitions
        self.debug_timing = debug_timing
        self.used_filter_strategy = used_filter_strategy
        # relations with more than this many way members take the
        # skew-safe path: member conversion runs as a flat parallel map
        # BEFORE the rel_id exchange, so a mega-relation's partition
        # carries only ready-made coordinate chains (0 disables)
        self.salt_member_threshold = salt_member_threshold
        # "tasks" (default): the final node/way/relation feature
        # conversions run as raw tasks chained off the exchange-output
        # refs and features() returns a metadata-complete ref-backed
        # Dataset.  Measured motivation (8-cpu bench host): consuming
        # the same three conversion legs through the nested
        # union(node, way, rel) DAG took 4.4-4.6 s where the legs
        # summed to 2.6 s run back-to-back — the union execution's
        # branch sequencing + executor spin-ups are FLAT costs at
        # every parallelism level.  "stream" keeps the lazy
        # map_batches/union DAG: pick it when the feature stream is
        # larger than the object store and the sink must apply
        # backpressure to the conversion itself (task mode
        # materializes feature blocks before features() returns —
        # spillable, but not backpressured).  The shuffle used-filter
        # strategy always streams (its anti-join is a Dataset op).
        self.consume_mode = consume_mode
        # wait for the exchange/assembly output refs BEFORE handing the
        # final consume DAG to the streaming executor.  The shuffle
        # outputs are materialized by construction (that is what a hash
        # exchange produces), so this adds no storage — it only stops
        # the conversion branches from time-slicing cores against the
        # exchange raw tasks.  Measured on the 32-cpu bench host
        # (2.4M nodes / 240k ways / 6k rels, 6 alternating reps):
        # overlapped 7.1-8.5 s wall / 93-118 cpu·s vs phase-gated
        # 4.8-5.4 s / 62-64 cpu·s — the memory-bus contention from
        # running the (bandwidth-bound) exchange under a full
        # conversion wave inflates its cpu-seconds ~50%, a net loss at
        # EVERY parallelism level (8-cpu legs: 12.3-13.9 s vs
        # 9.8-11.7 s).  On a multi-node cluster each node has its own
        # memory bus, so the gate is togglable; single-box it wins.
        self.stage_gate = stage_gate
        # populated during features(): materialized intermediates the
        # metrics view derives from (A5 missing-member accounting)
        self._ways_resolved = None
        self._round_outs: List = []
        self._round_out_refs: List = []
        self._t0 = None

    def _tick(self, label, ds=None):
        import time as _time

        if not self.debug_timing:
            return ds
        if ds is not None:
            ds = ds.materialize()
        now = _time.time()
        if self._t0 is not None:
            print(f"[osm-pipeline] {label}: {now - self._t0:.1f}s", flush=True)
        self._t0 = now
        return ds

    def _gate(self, *ref_groups):
        """Block until the given exchange-output refs are READY (no
        fetch): see ``stage_gate`` in ``__init__`` for the measured
        rationale.  Safe no-op when gating is off or refs are empty."""
        if not self.stage_gate:
            return
        import ray as _ray

        refs = [
            r
            for g in ref_groups
            for r in (g or [])
            if isinstance(r, _ray.ObjectRef)
        ]
        if refs:
            _ray.wait(refs, num_returns=len(refs), fetch_local=False)

    # ------------------------------------------------------------------
    def features(self, elements) -> "ray.data.Dataset":
        """elements -> GeoJSON feature rows.

        ``elements`` is either an elements ``ray.data.Dataset`` (any
        upstream pipeline) or a parquet path / list of paths, in which
        case the scan is FUSED into the type-split tasks (_read_split):
        the decoded element table — the widest table in the pipeline —
        skips its own object-store round-trip."""
        clf = self.classifier
        nparts = self.num_partitions
        # reset per run: metrics() and the used-id reduce read these
        self._round_outs = []
        self._round_out_refs = []

        # ONE STREAMING source scan: blocks are consumed as the read (or
        # any upstream op) produces them and the type-split tasks chain
        # off each block immediately, so the parquet decode OVERLAPS the
        # downstream explode/pad/split waves instead of sitting behind a
        # materialize() barrier (a FLAT cost at every parallelism
        # level).  Per-type COLUMN PRUNING applies in the split (nodes
        # never carry members/geometry; relations never carry
        # lat/lon/nodes) — downstream pad_to_fused / row_to_element
        # treat absent columns as nulls.
        _meta_cols = [
            "tags_keys", "tags_values", "timestamp", "version",
            "changeset", "user", "uid",
        ]
        node_cols = ["seq", "type", "id", "lat", "lon"] + _meta_cols
        way_cols = ["seq", "type", "id", "nodes", "geometry", "center",
                    "bounds"] + _meta_cols
        rel_cols = ["seq", "type", "id", "members", "center",
                    "bounds"] + _meta_cols

        import ray as _ray

        from ..relational import (
            ShardedRefs,
            _exchange_split,
            _superset_schema,
            from_arrow_refs_lazy,
            pad_block_to,
        )

        # ---- J1 kernels + schemas (defined up front so the map side of
        # the way⋈node join runs as raw tasks chained directly off the
        # type split — no Dataset execution, no driver barrier) --------
        def explode_way_edges(batch: pa.Table) -> pa.Table:
            """Pure-Arrow list explode: list_flatten + list_parent_indices,
            edge_seq from per-list offsets (no Python row loop)."""
            t = batch.select(["id", "nodes", "geometry", "center"])
            mask = pc.and_(
                pc.and_(pc.is_valid(t["nodes"]), pc.is_null(t["geometry"])),
                pc.is_null(t["center"]),
            )  # inline geometry / center short-circuits skip the join
            t = t.filter(mask)
            nodes = t["nodes"].combine_chunks()
            ids = t["id"].combine_chunks()
            flat = pc.list_flatten(nodes)
            way_id = pc.take(ids, pc.list_parent_indices(nodes))
            lens = pc.list_value_length(nodes).to_numpy(zero_copy_only=False).astype(np.int64)
            total = int(lens.sum())
            starts = np.repeat(np.cumsum(lens) - lens, lens)
            seq = pa.array(np.arange(total, dtype=np.int64) - starts)
            return pa.Table.from_arrays([flat, way_id, seq], schema=EDGE_SCHEMA)

        def node_coords(batch: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [batch["id"], batch["lon"], batch["lat"]], names=["node_id", "n_lon", "n_lat"]
            )

        # FUSED regroup-and-attach: edge rows and full way rows are
        # tagged into one stream and co-partitioned by way_id; each
        # partition assembles its ways vectorized (numpy lexsort +
        # boundary splits) and attaches the results to the way elements
        # directly — one shuffle where a regroup + join would be two
        element_plus_way = ELEMENT_SCHEMA.append(pa.field("way_id", pa.int64()))
        edge_cols = pa.schema(
            [
                ("edge_seq", pa.int64()),
                ("node_id", pa.int64()),
                ("n_lon", pa.float64()),
                ("n_lat", pa.float64()),
            ]
        )
        fused_schema_fields = (
            [pa.field("way_id", pa.int64()), pa.field("__kind", pa.int8())]
            + [f for f in element_plus_way if f.name != "way_id"]
            + list(edge_cols)
        )
        fused_schema = pa.schema(fused_schema_fields)

        def pad_to_fused(batch: pa.Table, kind: int) -> pa.Table:
            n = len(batch)
            arrays = []
            for f in fused_schema:
                if f.name == "__kind":
                    arrays.append(pa.array(np.full(n, kind, dtype=np.int8)))
                elif f.name in batch.column_names:
                    arrays.append(batch[f.name])
                else:
                    arrays.append(pa.nulls(n, type=f.type))
            return pa.Table.from_arrays(arrays, schema=fused_schema)

        join_superset = _superset_schema("node_id", EDGE_SCHEMA, COORDS_SCHEMA)

        # ONE-PASS type split as a raw-task wave (num_returns=3): each
        # element block is scanned once and the three column-pruned type
        # tables stay in the object store as refs.
        def _split_body(block: pa.Table):
            names = set(block.column_names)

            def pick(tname, cols):
                t = block.filter(pc.equal(block["type"], tname))
                return t.select([c for c in cols if c in names])

            return (
                pick("node", node_cols),
                pick("way", way_cols),
                pick("relation", rel_cols),
            )

        @_ray.remote(num_returns=3)
        def _split_types(*blocks):
            block = (
                blocks[0]
                if len(blocks) == 1
                else pa.concat_tables(blocks, promote_options="default")
            )
            return _split_body(block)

        # READ FUSION: when the source is a parquet path, decode the
        # row groups INSIDE the split task — the decoded element table
        # (the widest table in the whole pipeline) never makes an
        # object-store round-trip of its own; only the three pruned
        # type tables are written.  Row groups are the read-parallelism
        # unit, exactly as in ray.data.read_parquet.
        @_ray.remote(num_returns=3)
        def _read_split(path: str, rgs):
            import pyarrow.parquet as _pq

            return _split_body(_pq.ParquetFile(path).read_row_groups(list(rgs)))

        @_ray.remote
        def _way_map(block: pa.Table):
            """Fused raw-task map side for one way block: join-superset-
            padded edge shards (split by node_id, feeding the node join)
            PLUS fused kind-0 way shards (split by way_id, feeding the
            assembly exchange) — 2P returns from one scan of the block."""
            e = pad_block_to(explode_way_edges(block), join_superset, 0)
            eshards = _exchange_split(e, "node_id", nparts)
            wk = pad_to_fused(block.append_column("way_id", block["id"]), 0)
            wshards = _exchange_split(wk, "way_id", nparts)
            return tuple(eshards) + tuple(wshards)

        @_ray.remote
        def _node_map(block: pa.Table):
            c = pad_block_to(node_coords(block), join_superset, 1)
            shards = _exchange_split(c, "node_id", nparts)
            return shards[0] if nparts == 1 else tuple(shards)

        node_refs, way_split_refs, rel_blocks = [], [], []
        _ROWS_PER_SPLIT = 65536
        total_rows = 0

        if isinstance(elements, (str, os.PathLike)) or (
            isinstance(elements, list)
            and elements
            and all(isinstance(p, (str, os.PathLike)) for p in elements)
        ):
            # fused read+split over parquet row groups (see _read_split)
            import pyarrow.parquet as _pq

            paths = (
                [os.fspath(elements)]
                if isinstance(elements, (str, os.PathLike))
                else [os.fspath(p) for p in elements]
            )
            el_names = set()
            for p in paths:
                pf = _pq.ParquetFile(p)
                el_names |= set(pf.schema_arrow.names)
                group, grows = [], 0
                for i in range(pf.metadata.num_row_groups):
                    r = pf.metadata.row_group(i).num_rows
                    if r == 0:
                        continue
                    group.append(i)
                    grows += r
                    total_rows += r
                    if grows >= _ROWS_PER_SPLIT:
                        n_r, w_r, r_r = _read_split.remote(p, tuple(group))
                        node_refs.append(n_r)
                        way_split_refs.append(w_r)
                        rel_blocks.append(r_r)
                        group, grows = [], 0
                if group:
                    n_r, w_r, r_r = _read_split.remote(p, tuple(group))
                    node_refs.append(n_r)
                    way_split_refs.append(w_r)
                    rel_blocks.append(r_r)
        else:
            el_schema = elements.schema()
            el_names = set(
                el_schema.names if el_schema is not None else ELEMENT_SCHEMA.names
            )

            # STREAM the source: launch a type-split task per ~right-
            # sized group of blocks as they land (tiny blocks are
            # grouped by row count — a concat inside the task, not a
            # shuffle)
            def _launch_split(blocks):
                n_r, w_r, r_r = _split_types.remote(*blocks)
                node_refs.append(n_r)
                way_split_refs.append(w_r)
                rel_blocks.append(r_r)

            pending, pending_rows = [], 0
            for bundle in elements.iter_internal_ref_bundles():
                for block_ref, meta in bundle.blocks:
                    if meta.num_rows is not None and meta.num_rows == 0:
                        continue
                    pending.append(block_ref)
                    pending_rows += (
                        meta.num_rows
                        if meta.num_rows is not None
                        else _ROWS_PER_SPLIT
                    )
                    if pending_rows >= _ROWS_PER_SPLIT:
                        _launch_split(pending)
                        pending, pending_rows = [], 0
                    total_rows += meta.num_rows or 0
            if pending:
                _launch_split(pending)

        # under-parallel source (few huge blocks): re-slice the split
        # outputs with one extra task wave so the map waves and the lazy
        # Dataset consumers (convert_nodes) see ~nparts blocks.  Rare —
        # bench/CLI fix their block count at the read; the wave only
        # triggers on big single-block in-memory sources.
        if len(node_refs) < max(2, nparts // 2) and total_rows > 100_000:
            k = -(-nparts // max(1, len(node_refs)))

            @_ray.remote
            def _slice_k(t: pa.Table):
                step = -(-max(len(t), 1) // k)
                return tuple(t.slice(i * step, step) for i in range(k))

            def _reslice(refs):
                out = []
                for r in refs:
                    out.extend(_slice_k.options(num_returns=k).remote(r))
                return out

            node_refs = _reslice(node_refs)
            way_split_refs = _reslice(way_split_refs)
            rel_blocks = _reslice(rel_blocks)

        # launch the join map side + the relation scan wave NOW — the
        # tasks chain off the split refs, so they start per block as the
        # splits (and the reads feeding them) finish
        way_rets = [
            _way_map.options(num_returns=2 * nparts).remote(w)
            for w in way_split_refs
        ]
        node_rets = [
            _node_map.options(num_returns=nparts).remote(n) for n in node_refs
        ]
        edge_refs, sched_refs = [], []
        for b in rel_blocks:
            e, s = _rel_scan_task.remote(b)
            edge_refs.append(e)
            sched_refs.append(s)

        def _sub_schema(cols):
            return pa.schema(
                [ELEMENT_SCHEMA.field(c) for c in cols if c in el_names]
            )

        # NON-BLOCKING Dataset view over the node split refs (schema is
        # statically known) for the convert_nodes consumer
        nodes = from_arrow_refs_lazy(node_refs, _sub_schema(node_cols))
        self._tick("split")

        # ---- J1: way ⋈ node -----------------------------------------
        # The map side already ran as raw tasks (_way_map/_node_map):
        # wrap the padded, pre-split shards as ShardedRefs and feed them
        # straight into the join (skips the map-side Dataset execution
        # AND the per-block split hop — both FLAT costs at every level).
        P = nparts
        edge_side = ShardedRefs([list(r[:P]) for r in way_rets], P)
        ways_keyed = ShardedRefs([list(r[P:]) for r in way_rets], P)
        coord_side = ShardedRefs(
            [[r] if P == 1 else list(r) for r in node_rets], P
        )
        # FUSED join->exchange: the node-id join's reduce pads its
        # output to the fused schema and splits it by way_id in place
        # (ShardedRefs) — the way_id exchange consumes those refs
        # directly, skipping one barrier + materialize + re-split hop
        # of the full edge stream (a FLAT cost at every CPU level)
        edge_sharded = join_safe(
            edge_side,
            coord_side,
            on="node_id",
            l_schema=EDGE_SCHEMA,
            r_schema=COORDS_SCHEMA,
            join_type="left_outer",
            num_partitions=nparts,
            post_fn=lambda t: pad_to_fused(t, 1),
            emit_split_on=("way_id", nparts),
        )

        out_resolved_schema = pa.schema(
            list(element_plus_way)
            + [
                pa.field("resolved", pa.bool_()),
                pa.field("coords", pa.list_(COORD)),
                pa.field("used_nodes", pa.list_(pa.int64())),
            ]
        )

        def assemble_and_attach(tbl: pa.Table) -> pa.Table:
            """Fully vectorized per-partition way assembly: lexsort the
            joined edges, reduceat over way runs, and emit coordinates as
            Arrow ``list<struct<lon,lat>>`` (zero JSON through the
            shuffle).  Unresolved ways get an empty coords list +
            ``resolved=False`` and a used-node PREFIX up to the first
            missing node (reference prefix-marking semantics)."""
            kinds = tbl["__kind"].to_numpy(zero_copy_only=False)
            emask = kinds == 1
            edges_t = tbl.filter(pa.array(emask))
            ways_t = tbl.filter(pa.array(~emask))
            way_ids = edges_t["way_id"].to_numpy(zero_copy_only=False)
            seqs = edges_t["edge_seq"].to_numpy(zero_copy_only=False)
            lons = edges_t["n_lon"].to_numpy(zero_copy_only=False)
            lats = edges_t["n_lat"].to_numpy(zero_copy_only=False)
            node_ids = edges_t["node_id"].to_numpy(zero_copy_only=False)
            if lons.dtype == object:
                lons = np.where(np.equal(lons, None), np.nan, lons).astype(np.float64)
                lats = np.where(np.equal(lats, None), np.nan, lats).astype(np.float64)
            order = np.lexsort((seqs, way_ids))
            way_ids, lons, lats, node_ids = (
                way_ids[order], lons[order], lats[order], node_ids[order]
            )
            found = ~np.isnan(lons)
            n_edges = len(way_ids)
            if n_edges:
                bounds = np.flatnonzero(np.diff(way_ids)) + 1
                starts = np.concatenate(([0], bounds))
                ends = np.concatenate((bounds, [n_edges]))
                lens = ends - starts
                uniq_ids = way_ids[starts]
                all_found = np.logical_and.reduceat(found, starts)
                idx = np.arange(n_edges)
                first_miss = np.minimum.reduceat(
                    np.where(found, n_edges, idx), starts
                )
                cut = np.where(all_found, ends, np.minimum(first_miss, ends))
                per_edge_cut = np.repeat(cut, lens)
                keep_used = idx < per_edge_cut
                used_vals = node_ids[keep_used]
                used_counts = np.add.reduceat(keep_used.astype(np.int64), starts)
                # reduceat on an all-False run yields the identity issue
                # only for empty segments; lens>0 always here
                keep_c = np.repeat(all_found, lens)
                c_lon, c_lat = lons[keep_c], lats[keep_c]
                c_counts = np.where(all_found, lens, 0)
            else:
                uniq_ids = np.array([], dtype=np.int64)
                all_found = np.array([], dtype=bool)
                used_vals = np.array([], dtype=np.int64)
                used_counts = np.array([], dtype=np.int64)
                c_lon = c_lat = np.array([], dtype=np.float64)
                c_counts = np.array([], dtype=np.int64)
            used_offsets = np.concatenate(([0], np.cumsum(used_counts))).astype(np.int32)
            used_list = pa.ListArray.from_arrays(
                pa.array(used_offsets, pa.int32()), pa.array(used_vals, pa.int64())
            )
            c_offsets = np.concatenate(([0], np.cumsum(c_counts))).astype(np.int32)
            coords_list = pa.ListArray.from_arrays(
                pa.array(c_offsets, pa.int32()),
                pa.StructArray.from_arrays(
                    [pa.array(c_lon), pa.array(c_lat)], names=["lon", "lat"]
                ),
            )
            # align edge-derived arrays to the way element rows
            w_ids = ways_t["way_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(uniq_ids, w_ids)
            pos_c = np.minimum(pos, max(len(uniq_ids) - 1, 0))
            hit = (
                (pos < len(uniq_ids)) & (uniq_ids[pos_c] == w_ids)
                if len(uniq_ids)
                else np.zeros(len(w_ids), dtype=bool)
            )
            arrays = [ways_t[f.name] for f in element_plus_way]
            if len(uniq_ids):
                take_idx = pa.array(np.where(hit, pos_c, 0).astype(np.int64), mask=~hit)
                arrays += [
                    pa.array(np.where(hit, all_found[pos_c], False), mask=~hit),
                    coords_list.take(take_idx).cast(pa.list_(COORD)),
                    used_list.take(take_idx),
                ]
            else:
                n_w = len(w_ids)
                arrays += [
                    pa.nulls(n_w, pa.bool_()),
                    pa.nulls(n_w, pa.list_(COORD)),
                    pa.nulls(n_w, pa.list_(pa.int64())),
                ]
            return pa.Table.from_arrays(arrays, schema=out_resolved_schema)

        from ..relational import hash_exchange_map

        # raw per-partition refs + a Dataset view over the SAME refs:
        # the member join, the used-id reduce and the Dataset consumers
        # all read these refs directly — re-wrapping and re-iterating a
        # Dataset per consumer would pay one streaming-executor spin-up
        # each (flat cost at every parallelism level)
        ways_refs = hash_exchange_map(
            [ways_keyed, edge_sharded], "way_id", nparts, assemble_and_attach,
            return_refs=True,
        )
        if ways_refs is None:
            ways_refs = []
            ways_resolved = _empty(out_resolved_schema)
        else:
            ways_refs = list(ways_refs)
            ways_resolved = from_arrow_refs_lazy(ways_refs, out_resolved_schema)
        self._tick("ways_resolved (fused join+assembly)")
        self._ways_resolved = ways_resolved

        # used pairs from the way⋈node stage (pure-Arrow list explode)
        def used_from_ways(batch: pa.Table) -> pa.Table:
            t = batch.select(["way_id", "used_nodes"])
            t = t.filter(pc.is_valid(t["used_nodes"]))
            un = t["used_nodes"].combine_chunks()
            used = pc.list_flatten(un)
            cons = pc.take(t["way_id"].combine_chunks(), pc.list_parent_indices(un))
            return pa.Table.from_arrays([used, cons], schema=USED_SCHEMA)

        used_nodes = ways_resolved.map_batches(used_from_ways, batch_format="pyarrow")
        self._tick("ways_resolved join")

        # ---- standalone way conversion ------------------------------
        def convert_ways(batch: pa.Table, *, ids_ref=None):
            """Way -> LineString/Polygon with a TEMPLATED fast path (like
            convert_nodes): join-resolved ways with no inline geometry /
            center / meta get their geometry JSON string-built from the
            Arrow coords column and their properties from a memoized
            tags template — no element dicts, no per-way way_to_shape.
            Rows needing the full semantics (inline geometry, center,
            meta fields, invalid rings requiring buffer(0) repair) fall
            back to the exact per-row path."""
            if ids_ref is not None:
                batch = _prefilter_used(batch, ids_ref, "id")
                if len(batch) == 0:
                    return FEATURE_SCHEMA.empty_table()
            n = len(batch)
            coords_np, offs = _list_coords_view(batch["coords"])
            resolved_np = batch["resolved"].to_numpy(zero_copy_only=False)
            geom_null = pc.is_null(batch["geometry"]).to_numpy(zero_copy_only=False)
            center_null = pc.is_null(batch["center"]).to_numpy(zero_copy_only=False)
            meta_simple = np.ones(n, dtype=bool)
            for colname in ("timestamp", "version", "user", "uid"):
                meta_simple &= pc.is_null(batch[colname]).to_numpy(zero_copy_only=False)
            res_true = np.array([r == True for r in resolved_np], dtype=bool)  # noqa: E712
            fast = res_true & geom_null & center_null & meta_simple

            seqs = batch["seq"].to_numpy(zero_copy_only=False)
            ids = batch["id"].to_numpy(zero_copy_only=False)
            tk_col = batch["tags_keys"].to_pylist()
            tv_col = batch["tags_values"].to_pylist()
            nodes_col = batch["nodes"].to_pylist()

            # whole-column Arrow string build (repr_f64_strs is byte-
            # identical to Python repr == json.dumps float formatting):
            # one point string per coordinate, then one ", "-joined body
            # per way via a list rewrap + binary_join — no per-point
            # Python loop, no per-way slice join.
            pt_arr = pc.binary_join_element_wise(
                "[", repr_f64_strs(coords_np[:, 0]),
                ", ", repr_f64_strs(coords_np[:, 1]), "]", "",
            )
            bodies = pc.binary_join(
                pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), pt_arr),
                ", ",
            ).to_pylist()
            first_pts = pt_arr.take(
                pa.array(np.minimum(offs[:-1], max(len(pt_arr) - 1, 0)))
            ).to_pylist() if len(pt_arr) else [""] * n
            # per-way coordinate-value ring closure, vectorized
            lens = offs[1:] - offs[:-1]
            if len(coords_np):
                f_idx = np.minimum(offs[:-1], len(coords_np) - 1)
                l_idx = np.minimum(np.maximum(offs[1:] - 1, 0), len(coords_np) - 1)
                value_closed_v = (coords_np[f_idx] == coords_np[l_idx]).all(axis=1) & (lens > 0)
            else:
                value_closed_v = np.zeros(n, dtype=bool)
            # str(list_of_ids) formatting, vectorized: '[1, 2]' == str([1, 2])
            nodes_cc = batch["nodes"].combine_chunks()
            nodes_strs = pc.binary_join_element_wise(
                "[",
                pc.binary_join(pc.cast(nodes_cc, pa.list_(pa.string())), ", "),
                "]", "",
            ).to_pylist()

            # memoized per-tags-combo classification + tags JSON
            tag_cache: Dict[tuple, tuple] = {}

            def tag_info(i: int) -> tuple:
                tk, tv = tk_col[i], tv_col[i]
                nd = nodes_col[i]
                closed = bool(nd) and nd[0] == nd[-1]
                key = (tuple(tk) if tk is not None else None,
                       tuple(tv) if tv is not None else None, closed)
                hit = tag_cache.get(key)
                if hit is None:
                    tags = dict(zip(tk, tv)) if tk is not None else None
                    is_poly = clf.is_polygon(tags, ring_closed=closed)
                    tags_json = json.dumps(tags) if tags is not None else None
                    hit = (is_poly, tags_json)
                    tag_cache[key] = hit
                return hit

            out_seq: list = []
            out_id: list = []
            out_gtype: list = []
            out_geom: list = []
            out_props: list = []
            slow_idx: list = []
            ids_list = ids.tolist()
            seqs_list = seqs.tolist()
            for i in np.flatnonzero(fast):
                o0, o1 = int(offs[i]), int(offs[i + 1])
                npts = o1 - o0
                if npts < 2:
                    continue  # way_to_shape: not enough coords -> skipped
                is_poly, tags_json = tag_info(i)
                if is_poly:
                    # coordinate-value closure (close_ring), distinct
                    # from the node-id closure used for classification
                    value_closed = bool(value_closed_v[i])
                    ring_len = npts if value_closed else npts + 1
                    if ring_len < 4:
                        continue  # degenerate polygon -> skipped
                    ring = coords_np[o0:o1].tolist()
                    if not value_closed:
                        ring.append(ring[0])
                    if not is_valid_polygon([ring]):
                        slow_idx.append(int(i))  # buffer(0) repair path
                        continue
                    body = bodies[i]
                    if not value_closed:
                        body += ", " + first_pts[i]
                    geom = '{"type": "Polygon", "coordinates": [[' + body + "]]}"
                    gtype = "Polygon"
                else:
                    geom = (
                        '{"type": "LineString", "coordinates": ['
                        + bodies[i]
                        + "]}"
                    )
                    gtype = "LineString"
                props = '{"type": "way", "id": ' + str(ids_list[i])
                if tags_json is not None:
                    props += ', "tags": ' + tags_json
                props += ', "nodes": ' + nodes_strs[i] + "}"
                out_seq.append(seqs_list[i])
                out_id.append(ids_list[i])
                out_gtype.append(gtype)
                out_geom.append(geom)
                out_props.append(props)

            fast_tbl = pa.Table.from_arrays(
                [
                    pa.array(out_seq, pa.int64()),
                    pa.array(["way"] * len(out_seq), pa.string()),
                    pa.array(out_id, pa.int64()),
                    pa.array(out_gtype, pa.string()),
                    pa.array(out_geom, pa.string()),
                    pa.array(out_props, pa.string()),
                ],
                schema=FEATURE_SCHEMA,
            )

            slow_mask = ~fast
            slow_rows = np.concatenate(
                [np.flatnonzero(slow_mask), np.asarray(slow_idx, dtype=np.int64)]
            ).astype(np.int64) if (slow_mask.any() or slow_idx) else np.empty(0, np.int64)
            if not len(slow_rows):
                return fast_tbl
            feats = []
            sub = batch.drop_columns(["coords", "used_nodes"]).take(pa.array(slow_rows))
            rows = sub.to_pylist()
            for j, row in enumerate(rows):
                i = int(slow_rows[j])
                el = row_to_element(row)
                resolved = resolved_np[i]
                if resolved == True:  # noqa: E712  (None-aware tri-state)
                    el["_coords"] = coords_np[offs[i] : offs[i + 1]].tolist()
                elif (
                    resolved == False  # noqa: E712
                    and el.get("nodes")
                    and not el.get("geometry")
                    and "center" not in el
                ):
                    el["_unresolved"] = True
                shape = None
                if not el.get("_unresolved"):
                    shape = assemble.way_to_shape(dict(el), {}, clf)
                if shape is not None:
                    feats.append(_feature_row(row["seq"], "way", row["id"], shape))
            return pa.concat_tables([fast_tbl, _feature_table(feats)])

        # ---- relations ----------------------------------------------
        rel_tables = self._relations(rel_blocks, edge_refs, sched_refs,
                                     ways_refs, nparts)
        rel_features, used_rel = rel_tables
        if self.debug_timing:
            rel_features = self._tick("relations", rel_features)

        # ---- J6 used-id broadcast set, built BEFORE the conversion
        # datasets so the bare-id anti-filter fuses into the conversion
        # kernels (see _prefilter_used): the used set is a plain int64
        # id set — orders of magnitude smaller than the feature rows
        # (which carry geometry JSON).  The partial id sets reduce as
        # RAW TASKS over refs that already exist (ways_resolved
        # partitions + the packed relation-round outputs): no extra
        # Dataset execution, no shuffle of the wide side.  The
        # "shuffle" strategy is the fallback when even the id set
        # outgrows worker memory.
        import functools

        ids_ref = None
        if self.filter_used_refs and self.used_filter_strategy == "broadcast":

            # RESIDUE-SHARDED id-set reduce: the old single _merge_ids
            # task re-sorted the full concatenated id stream (~8M raw
            # ids -> 1.0 s measured at EVERY parallelism level, serial
            # on the critical path right before the conversions).  Each
            # source task now emits S per-residue (id % S) sorted
            # shards and S merge tasks run in parallel, each sorting
            # 1/S of the stream; the conversion kernels membership-test
            # per shard (_used_keep_mask).
            S = _USED_ID_SHARDS

            def _shard_ids(a: np.ndarray):
                r = a % S
                return tuple(np.unique(a[r == s]) for s in range(S))

            @_ray.remote(num_returns=S)
            def _ids_from_ways(block: pa.Table):
                t = block.select(["used_nodes"])
                t = t.filter(pc.is_valid(t["used_nodes"]))
                flat = pc.list_flatten(t["used_nodes"].combine_chunks())
                return _shard_ids(flat.to_numpy(zero_copy_only=False))

            @_ray.remote(num_returns=S)
            def _ids_from_packed(block: pa.Table):
                t = block.filter(pc.equal(block["kind"], "used"))
                return _shard_ids(
                    t["used_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                )

            @_ray.remote
            def _merge_ids(*arrs):
                parts = [a for a in arrs if len(a)] or [np.array([], dtype=np.int64)]
                return np.unique(np.concatenate(parts))

            partials = [list(_ids_from_ways.remote(b)) for b in ways_refs]
            partials += [
                list(_ids_from_packed.remote(r)) for r in self._round_out_refs
            ]
            if partials:
                ids_ref = [
                    _merge_ids.remote(*[row[s] for row in partials])
                    for s in range(S)
                ]
            else:
                ids_ref = _ray.put(np.array([], dtype=np.int64))
            # nested relations may be used members themselves — their
            # features are few, so the post-conversion filter hop stays
            # for the relation branch only
            rel_features = rel_features.map_batches(
                functools.partial(_anti_filter_task, ids_ref=ids_ref),
                batch_format="pyarrow",
            )

        way_features = ways_resolved.map_batches(
            functools.partial(convert_ways, ids_ref=ids_ref),
            batch_format="pyarrow",
        )
        if self.debug_timing:
            way_features = self._tick("way_features", way_features)

        # ---- nodes --------------------------------------------------
        def convert_nodes(batch: pa.Table, *, ids_ref=None) -> pa.Table:
            """node -> Point with NO Python loop over the bulk: geometry
            JSON and simple-node properties are whole-column Arrow joins
            over ``repr_f64_strs`` (byte-identical to Python ``repr``,
            hence to json.dumps formatting — see geom/kernels.py) and an
            int64->string cast (integers format identically in Arrow and
            CPython).  Only tagged/meta nodes (a few %) take the exact
            per-row element_props projection, scattered back with one
            ``if_else``."""
            if ids_ref is not None:
                batch = _prefilter_used(batch, ids_ref, "id")
                if len(batch) == 0:
                    return FEATURE_SCHEMA.empty_table()
            n = len(batch)
            geom = pc.binary_join_element_wise(
                '{"type": "Point", "coordinates": [',
                repr_f64_strs(batch["lon"].to_numpy(zero_copy_only=False)),
                ", ",
                repr_f64_strs(batch["lat"].to_numpy(zero_copy_only=False)),
                "]}",
                "",
            )
            simple = np.ones(n, dtype=bool)
            for col in ("tags_keys", "timestamp", "version", "user", "uid"):
                simple &= pc.is_null(batch[col]).to_numpy(zero_copy_only=False)
            props = pc.binary_join_element_wise(
                '{"type": "node", "id": ',
                pc.cast(batch["id"].combine_chunks(), pa.string()),
                "}",
                "",
            )
            complex_idx = np.flatnonzero(~simple)
            if len(complex_idx):
                sub = batch.take(pa.array(complex_idx))
                repl = np.full(n, "", dtype=object)
                for j, row in enumerate(sub.to_pylist()):
                    el = row_to_element(row)
                    repl[complex_idx[j]] = json.dumps(assemble.element_props(el))
                props = pc.if_else(pa.array(simple), props,
                                   pa.array(repl, pa.string()))
            return pa.Table.from_arrays(
                [
                    batch["seq"],
                    _const_str("node", n),
                    batch["id"],
                    _const_str("Point", n),
                    geom,
                    props,
                ],
                schema=FEATURE_SCHEMA,
            )

        node_features = nodes.map_batches(
            functools.partial(convert_nodes, ids_ref=ids_ref),
            batch_format="pyarrow",
        )
        if self.debug_timing:
            node_features = self._tick("node_features", node_features)

        # ---- task-mode consume (see consume_mode in __init__) --------
        if (
            self.consume_mode == "tasks"
            and not self.debug_timing
            and (
                not self.filter_used_refs
                or self.used_filter_strategy == "broadcast"
            )
        ):
            if self.stage_gate:
                ids_group = (
                    []
                    if ids_ref is None
                    else (ids_ref if isinstance(ids_ref, list) else [ids_ref])
                )
                self._gate(ways_refs, self._round_out_refs, ids_group)
            # ids_ref travels INSIDE a list so Ray does not auto-deref
            # it — the conversion kernels worker-cache the fetched set
            ids_box = [ids_ref] if ids_ref is not None else None

            @_ray.remote(num_returns=2)
            def _conv_task(kind, block, box):
                iref = box[0] if box is not None else None
                if kind == 0:
                    out = convert_nodes(block, ids_ref=iref)
                elif kind == 1:
                    out = convert_ways(block, ids_ref=iref)
                else:
                    out = _unpack_feature(block)
                    if iref is not None and len(out):
                        out = _anti_filter_task(out, ids_ref=iref)
                out = out.combine_chunks()
                return out, (len(out), out.nbytes)

            pairs = [_conv_task.remote(0, b, ids_box) for b in node_refs]
            pairs += [_conv_task.remote(1, b, ids_box) for b in ways_refs]
            pairs += [
                _conv_task.remote(2, r, ids_box) for r in self._round_out_refs
            ]
            if not pairs:
                return _empty(FEATURE_SCHEMA)
            # the ONE consume barrier: tiny (rows, bytes) tuples — the
            # feature blocks themselves stay in the object store
            metas = _ray.get([p[1] for p in pairs])
            kept = [
                (p[0], m) for p, m in zip(pairs, metas) if m[0] > 0
            ]
            if not kept:
                return _empty(FEATURE_SCHEMA)
            return from_arrow_refs_lazy(
                [r for r, _ in kept],
                FEATURE_SCHEMA,
                meta=[m for _, m in kept],
            )

        features = node_features.union(way_features).union(rel_features)
        if self.debug_timing:
            features = self._tick("features union", features)
        if not self.filter_used_refs:
            self._gate(ways_refs, self._round_out_refs)
            return features

        # ---- J6 anti-join on bare id --------------------------------
        if self.used_filter_strategy == "broadcast":
            # the filter already ran fused inside the conversion
            # kernels (and as the small rel_features hop) — nothing
            # left to do but gate on the exchange outputs + id set
            self._gate(
                ways_refs,
                self._round_out_refs,
                ids_ref if isinstance(ids_ref, list) else [ids_ref],
            )
            return features
        # shuffle path: one left_anti hash join on bare id
        used = used_nodes.union(used_rel)
        if self.debug_timing:
            used = self._tick("used union", used)
        used_keys = used.map_batches(
            lambda t: pa.Table.from_arrays([t["used_id"]], names=["element_id"]),
            batch_format="pyarrow",
        )
        self._gate(ways_refs, self._round_out_refs)
        return join_safe(
            features,
            used_keys,
            on="element_id",
            l_schema=FEATURE_SCHEMA,
            r_schema=pa.schema([("element_id", pa.int64())]),
            join_type="left_anti",
            num_partitions=nparts,
        )

    # ------------------------------------------------------------------
    def _relations(self, rel_blocks, edge_refs, sched_refs, ways_refs, nparts):
        """Bounded multi-round relation resolution (nested relations).

        All relation-side inputs arrive as RAW REFS (no Dataset
        executions — streaming-executor spin-ups are FLAT costs at every
        parallelism level; the round-3 scaling gap lived here):
        ``rel_blocks`` — the relation blocks from the one-pass type
        split; ``edge_refs``/``sched_refs`` — the _rel_scan_task wave's
        outputs, launched by features() BEFORE the way join so the scan
        never queues behind exchange work; ``ways_refs`` — the way_id
        exchange's per-partition refs in partition order (block p holds
        way_id % len(ways_refs) == p — validated inside the join tasks).
        """
        clf = self.classifier
        import ray as _ray

        # ---- PARTITION-WISE member join (no re-exchange of ways) ----
        # ways_resolved partition p already holds way_id % nparts == p
        # (it is the way_id exchange's output, one block per partition).
        # Split the member-edge table (small: only relation members) the
        # same way and join per partition; each join task emits member
        # payload rows PRE-SPLIT by rel_id (ShardedRefs) for the round
        # exchanges.  Removes one full way_id exchange + barrier and the
        # per-round member re-splits — all FLAT latency at every level.
        # fully columnar payload stream: member rows (kind=1) carry the
        # joined way element columns + coords; relation rows (kind=0)
        # carry their OWN element columns plus the members struct-list —
        # no JSON payload anywhere in the stitch exchange
        ext_payload_schema = pa.schema(
            [
                ("rel_id", pa.int64()),
                ("kind", pa.int8()),
                ("members", pa.list_(MEMBER)),
                ("resolved", pa.bool_()),
                ("coords", pa.list_(COORD)),
                ("way_id", pa.int64()),
            ]
            + [f for f in _MEMBER_EL_FIELDS]
            + [pa.field("member_idx", pa.int64()), pa.field("role", pa.string())]
        )

        from ..relational import ShardedRefs, _exchange_split

        @_ray.remote
        def _edge_split(block, p):
            parts = _exchange_split(block, "way_id", p)
            return parts[0] if p == 1 else tuple(parts)

        @_ray.remote
        def _member_join_split(p2, part_id, n_ways_parts, ways_block, *edge_shards):
            import pandas as _pd

            edges_t = pa.concat_tables(edge_shards, promote_options="default")
            wt = ways_block.drop_columns(["used_nodes"])
            # partition-layout invariant: this join routes edges by
            # way_id % n_ways_parts and assumes ways_resolved block
            # part_id holds exactly that residue class (the way_id
            # exchange's one-block-per-partition output).  A re-blocked
            # / reordered ways input would otherwise mis-route edges
            # SILENTLY (empty inner joins -> relations assembled without
            # members); validate the whole block vectorized and fail loud.
            wk_check = wt["way_id"].to_numpy(zero_copy_only=False)
            if len(wk_check) and not (wk_check % n_ways_parts == part_id).all():
                raise RuntimeError(
                    "ways_resolved block layout violates way_id % "
                    f"{n_ways_parts} == {part_id}; the partition-wise "
                    "member join requires the hash exchange's block order"
                )
            ldf = _pd.DataFrame(
                {"k": edges_t["way_id"].to_numpy(zero_copy_only=False),
                 "li": np.arange(len(edges_t))}
            )
            rdf = _pd.DataFrame(
                {"k": wt["way_id"].to_numpy(zero_copy_only=False),
                 "ri": np.arange(len(wt))}
            )
            m = ldf.merge(rdf, on="k", how="inner")
            li = pa.array(m["li"].to_numpy().astype(np.int64))
            ri = pa.array(m["ri"].to_numpy().astype(np.int64))
            n = len(m)
            arrays = [
                edges_t["rel_id"].take(li),
                pa.array(np.ones(n, dtype=np.int8)),
                pa.nulls(n, pa.list_(MEMBER)),
                wt["resolved"].take(ri),
                wt["coords"].take(ri).combine_chunks().cast(pa.list_(COORD))
                if n
                else pa.nulls(0, pa.list_(COORD)),
                edges_t["way_id"].take(li),
            ]
            arrays += [wt[f.name].take(ri) for f in _MEMBER_EL_FIELDS]
            arrays += [edges_t["member_idx"].take(li), edges_t["role"].take(li)]
            out = pa.Table.from_arrays(arrays, schema=ext_payload_schema)
            parts = _exchange_split(out, "rel_id", p2)
            return parts[0] if p2 == 1 else tuple(parts)

        # ways_refs ARE the way_id exchange's per-partition outputs, in
        # partition order (features() hands the raw refs through — no
        # Dataset re-iteration, and _member_join_split validates the
        # residue-class layout per block)
        ways_blocks = list(ways_refs)
        member_sharded = None
        if edge_refs and ways_blocks:
            edge_mat = []
            for b in edge_refs:
                r = _edge_split.options(num_returns=len(ways_blocks)).remote(
                    b, len(ways_blocks)
                )
                edge_mat.append([r] if len(ways_blocks) == 1 else list(r))
            out_shards = []
            for p, wb in enumerate(ways_blocks):
                r = _member_join_split.options(num_returns=nparts).remote(
                    nparts, p, len(ways_blocks), wb, *[s[p] for s in edge_mat]
                )
                out_shards.append([r] if nparts == 1 else list(r))
            member_sharded = ShardedRefs(out_shards, nparts)
        def _rel_payload_project(batch: pa.Table) -> pa.Table:
            """Pure columnar projection: the relation's own element
            columns + its members struct-list ride the exchange
            natively (the old path json.dumps'd every relation
            element — the last JSON in the stitch path)."""
            n = len(batch)
            cols = set(batch.column_names)
            return pa.Table.from_arrays(
                [
                    batch["id"],
                    pa.array(np.zeros(n, dtype=np.int8)),
                    batch["members"].combine_chunks().cast(pa.list_(MEMBER))
                    if "members" in cols
                    else pa.nulls(n, pa.list_(MEMBER)),
                    pa.nulls(n, pa.bool_()),
                    pa.nulls(n, pa.list_(COORD)),
                    pa.nulls(n, pa.int64()),
                ]
                + [
                    batch[f.name] if f.name in cols else pa.nulls(n, f.type)
                    for f in _MEMBER_EL_FIELDS
                ]
                + [pa.nulls(n, pa.int64()), pa.nulls(n, pa.string())],
                schema=ext_payload_schema,
            )

        # relation payload rows PRE-SPLIT by rel_id ONCE for ALL rounds
        # (raw tasks over the relation blocks), LAUNCHED BEFORE the
        # scheduling barrier so the split work overlaps the driver wait
        @_ray.remote
        def _rel_payload_split(block, p):
            parts = _exchange_split(_rel_payload_project(block), "rel_id", p)
            return parts[0] if p == 1 else tuple(parts)

        rel_payload_sharded = None
        if rel_blocks:
            rp_shards = []
            for b in rel_blocks:
                r = _rel_payload_split.options(num_returns=nparts).remote(b, nparts)
                rp_shards.append([r] if nparts == 1 else list(r))
            rel_payload_sharded = ShardedRefs(rp_shards, nparts)

        # the ONE driver barrier of the relation stage: nested edges,
        # present ids and member counts all come from the _rel_scan_task
        # wave (everything else launched above keeps computing meanwhile)
        sched_out = _ray.get(sched_refs)
        children_of: Dict[int, List[int]] = {}
        all_rel_ids: set = set()
        count_out = []
        for child, parent, ids, e_ids, e_cnt in sched_out:
            for c, p in zip(child, parent):
                children_of.setdefault(p, []).append(c)
            all_rel_ids.update(ids.tolist())
            count_out.append((e_ids, e_cnt))

        child_ids = {c for cs in children_of.values() for c in cs}
        present_children = child_ids & all_rel_ids

        # depth(rid): rounds a relation must wait for its present child
        # relations; cycles / too-deep chains degrade to the final lumped
        # round like the reference (skip+warn on unresolved refs)
        max_r = self.max_relation_rounds
        nested_ids = set(children_of) | present_children
        # iterative Kahn-style rounds (no recursion — a deep parent
        # chain must not hit the interpreter recursion limit): resolve
        # nodes whose present kids are all resolved; anything left at
        # the end sits on a cycle and lumps into the final round
        kids_of: Dict[int, List[int]] = {
            rid: [c for c in children_of.get(rid, []) if c in present_children]
            for rid in nested_ids
        }
        parents_of: Dict[int, List[int]] = {}
        unresolved_kids: Dict[int, int] = {}
        for rid, kids in kids_of.items():
            unresolved_kids[rid] = len(kids)
            for c in kids:
                parents_of.setdefault(c, []).append(rid)
        depth_memo: Dict[int, int] = {}
        ready = [rid for rid, n in unresolved_kids.items() if n == 0]
        while ready:
            nxt: List[int] = []
            for rid in ready:
                kids = kids_of[rid]
                depth_memo[rid] = (
                    min(max_r, 1 + max(depth_memo[c] for c in kids)) if kids else 0
                )
                for p in parents_of.get(rid, []):
                    unresolved_kids[p] -= 1
                    if unresolved_kids[p] == 0:
                        nxt.append(p)
            ready = nxt
        for rid in nested_ids:  # cycle members: final lumped round
            depth_memo.setdefault(rid, max_r)
        later_ids = sorted(rid for rid, d in depth_memo.items() if d > 0)
        n_rounds = 1 + (max(depth_memo.values(), default=0) if later_ids else 0)

        # ---- mega-relation detection (skew-safe path) ----------------
        # a relation with more members than the threshold would make its
        # rel_id exchange partition carry an outsized payload AND pay
        # per-member Python conversion inside one task.  Such relations
        # (excluding nested ones, which need the round machinery) are
        # pulled out of the normal rounds and handled by
        # _relations_salted.  The count aggregation is distributed; only
        # the tiny mega id list reaches the driver.
        mega_ids: List[int] = []
        if self.salt_member_threshold:
            thr = self.salt_member_threshold
            if count_out:
                all_ids = np.concatenate([p[0] for p in count_out])
                all_cnt = np.concatenate([p[1] for p in count_out])
                uids, inv = np.unique(all_ids, return_inverse=True)
                totals = np.bincount(inv, weights=all_cnt.astype(np.float64))
                heavy = set(uids[totals > thr].tolist())
            else:
                heavy = set()
            nested_involved = set(depth_memo)
            mega_ids = sorted(heavy - nested_involved)

        round_filters: List = []  # (mode, sorted int64 ndarray or None)
        excl_round0 = sorted(set(later_ids) | set(mega_ids))
        later_arr = np.array(excl_round0, dtype=np.int64) if excl_round0 else None
        round_filters.append(("not_in", later_arr))
        for d in range(1, n_rounds):
            ids_d = sorted(rid for rid, dd in depth_memo.items() if dd == d)
            round_filters.append(("in", np.array(ids_d, dtype=np.int64)))

        resolved_shapes: Dict[int, Optional[dict]] = {}
        feature_tables = []
        used_tables = []

        both = [x for x in (rel_payload_sharded, member_sharded) if x is not None]

        for round_no, (mode, ids_arr) in enumerate(round_filters):
            shapes_ref = resolved_shapes  # closure: broadcast of prior rounds

            # ONE shuffle per round over the SHARED pre-split payload +
            # member shards; rows of other rounds ride along unconverted
            # (the round filter runs vectorized inside the reduce)
            def convert_partition(
                tbl: pa.Table, _shapes=shapes_ref, _mode=mode, _ids=ids_arr
            ) -> pa.Table:
                kinds = tbl["kind"].to_numpy(zero_copy_only=False)
                rel_ids = tbl["rel_id"].to_numpy(zero_copy_only=False)
                coords_np, offs = _list_coords_view(tbl["coords"])
                resolved_np = tbl["resolved"].to_numpy(zero_copy_only=False)
                mem_mask = kinds == 1
                rel_rows = np.flatnonzero(kinds == 0)
                if _mode == "not_in":
                    if _ids is not None and len(rel_rows):
                        rel_rows = rel_rows[~np.isin(rel_ids[rel_rows], _ids)]
                elif len(rel_rows):
                    rel_rows = rel_rows[np.isin(rel_ids[rel_rows], _ids)]
                members_by_rel: Dict[int, list] = {}
                for i in np.flatnonzero(mem_mask):
                    members_by_rel.setdefault(int(rel_ids[i]), []).append(int(i))
                # pythonize ONLY the member rows this round's relations
                # reference (the shards carry every round's members)
                needed = [
                    mi
                    for i in rel_rows
                    for mi in members_by_rel.get(int(rel_ids[i]), [])
                ]
                mem_el_rows = (
                    tbl.take(pa.array(needed, pa.int64()))
                    .select([f.name for f in _MEMBER_EL_FIELDS])
                    .to_pylist()
                )
                mem_pos = {mi: j for j, mi in enumerate(needed)}
                # relation elements rebuilt from their own columns (the
                # members struct-list included) — rel rows only, so the
                # pythonize cost is one dict per relation this round
                rel_el_rows = (
                    tbl.take(pa.array(rel_rows, pa.int64()))
                    .select([f.name for f in _MEMBER_EL_FIELDS] + ["members"])
                    .to_pylist()
                )
                feats, used_u, used_c, out_shapes = [], [], [], []
                for ri, i in enumerate(rel_rows):
                    rrow = rel_el_rows[ri]
                    el = row_to_element(rrow)
                    rec = {"seq": rrow["seq"], "id": rrow["id"]}
                    index: Dict[str, dict] = {}
                    for mi in members_by_rel.get(int(rel_ids[i]), []):
                        wel = row_to_element(mem_el_rows[mem_pos[mi]])
                        if resolved_np[mi] == True:  # noqa: E712
                            wel["_coords"] = coords_np[offs[mi] : offs[mi + 1]].tolist()
                        index[assemble.ref_key("way", wel["id"])] = wel
                    for m in el.get("members", []):
                        if m["type"] == "relation" and m["ref"] in _shapes:
                            index[assemble.ref_key("relation", m["ref"])] = {
                                "type": "relation",
                                "id": m["ref"],
                                "_shape": _shapes[m["ref"]],
                            }
                    shape = assemble.relation_to_shape(el, index, clf)
                    for _key, target in index.items():
                        if "used" in target:
                            used_u.append(target["id"])
                            used_c.append(target["used"])
                    out_shapes.append((rec["id"], shape["shape"] if shape else None))
                    if shape is not None:
                        feats.append(_feature_row(rec["seq"], "relation", rec["id"], shape))
                ft = _feature_table(feats)
                ut = pa.Table.from_pydict(
                    {"used_id": used_u, "consumer_id": used_c}, schema=USED_SCHEMA
                )
                st = pa.Table.from_pydict(
                    {
                        "rel_id": [x[0] for x in out_shapes],
                        "shape_json": [json.dumps(x[1]) if x[1] else None for x in out_shapes],
                    },
                    schema=pa.schema([("rel_id", pa.int64()), ("shape_json", pa.string())]),
                )
                return _pack_multi({"features": ft, "used": ut, "shapes": st})

            from ..relational import hash_exchange_map

            round_refs = hash_exchange_map(
                both, "rel_id", nparts, convert_partition, return_refs=True
            )
            if round_refs is None:
                round_out = _empty(_PACKED_SCHEMA)
            else:
                # ref-backed exchange output: the Dataset view (lazy, no
                # metadata barrier) and the raw refs (used-id reduce)
                # share the same objects — relation reduces overlap the
                # final consuming execution instead of stalling the driver
                from ..relational import from_arrow_refs_lazy

                round_out = from_arrow_refs_lazy(list(round_refs), _PACKED_SCHEMA)
                self._round_out_refs.extend(round_refs)
            self._round_outs.append(round_out)

            feature_tables.append(
                round_out.filter(expr="kind == 'feature'").map_batches(
                    _unpack_feature, batch_format="pyarrow"
                )
            )
            used_tables.append(
                round_out.filter(expr="kind == 'used'").map_batches(
                    _unpack_used, batch_format="pyarrow"
                )
            )
            # Only shapes of relations that are CHILDREN of a later-round
            # parent are collected to the driver (the nested set is tiny);
            # the full shape stream — every multipolygon geometry — stays
            # distributed.
            if present_children and round_no < n_rounds - 1:
                need_arr = pa.array(sorted(present_children), pa.int64())

                def pick_child_shapes(t: pa.Table, _need=need_arr) -> pa.Table:
                    t = t.filter(pc.equal(t["kind"], "shape")).select(
                        ["rel_id", "shape_json"]
                    )
                    return t.filter(pc.is_in(t["rel_id"], value_set=_need))

                for r in round_out.map_batches(
                    pick_child_shapes, batch_format="pyarrow"
                ).take_all():
                    resolved_shapes[r["rel_id"]] = (
                        json.loads(r["shape_json"]) if r["shape_json"] else None
                    )

        if mega_ids:
            mega_refs = self._relations_salted(
                rel_blocks, member_sharded, mega_ids, nparts
            )
            mega_out = None
            if mega_refs is not None:
                from ..relational import from_arrow_refs_lazy

                mega_out = from_arrow_refs_lazy(list(mega_refs), _PACKED_SCHEMA)
                self._round_out_refs.extend(mega_refs)
            if mega_out is not None:
                self._round_outs.append(mega_out)
                feature_tables.append(
                    mega_out.filter(expr="kind == 'feature'").map_batches(
                        _unpack_feature, batch_format="pyarrow"
                    )
                )
                used_tables.append(
                    mega_out.filter(expr="kind == 'used'").map_batches(
                        _unpack_used, batch_format="pyarrow"
                    )
                )

        if feature_tables:
            rel_features = feature_tables[0]
            for t in feature_tables[1:]:
                rel_features = rel_features.union(t)
        else:
            rel_features = _empty(FEATURE_SCHEMA)
        if used_tables:
            used_rel = used_tables[0]
            for t in used_tables[1:]:
                used_rel = used_rel.union(t)
        else:
            used_rel = _empty(USED_SCHEMA)
        return rel_features, used_rel


    # ------------------------------------------------------------------
    def _relations_salted(self, rel_blocks, member_sharded, mega_ids, nparts):
        """Skew-safe assembly for relations with huge member lists
        (BASELINE.json north_rule: 'ways/relations spanning cells
        handled via explicit salted-skew repartitioning').

        The normal path co-partitions RAW member payloads (way element
        columns + coords) by rel_id and converts every member inside the
        relation's one partition — a 60k-member boundary relation makes
        that partition both byte-heavy and Python-heavy.  Here the
        per-member conversion (classifier, ring closing) runs FLAT, one
        raw task per (source block x mega partition) shard of the member
        join's ShardedRefs — skew-immune because a mega relation's
        members are spread over every source block — and only ready-made
        coordinate chains enter the per-partition assembly.  The
        assembly tail (_shapes_to_multipolygon / linemerge) runs over
        chains ordered by member_idx, so output is bit-identical to the
        normal path.

        Raw-task plumbing end to end (no Dataset execution): a mega
        relation's rows live ONLY in shard partition rel_id % nparts,
        so conversion touches |sources| x |mega partitions| small shards
        and assembly is one task per mega partition.

        Not routed here (stay on the normal path): nested relations
        (need the round machinery) and member ways resolving BY REF to
        other member ways (need the full relation-wide refs index).
        """
        clf = self.classifier
        import ray as _ray

        mega_arr = pa.array(sorted(mega_ids), pa.int64())
        P = member_sharded.num_partitions if member_sharded is not None else nparts
        mega_parts = sorted({int(r) % P for r in mega_ids})

        chain_schema = pa.schema(
            [
                ("rel_id", pa.int64()),
                ("kind", pa.int8()),  # 0 = relation payload, 1 = chain
                ("payload", pa.string()),
                ("member_idx", pa.int64()),
                ("role", pa.string()),
                ("line", pa.list_(COORD)),
                ("way_id", pa.int64()),
                ("used", pa.bool_()),
            ]
        )

        def convert_members(tbl: pa.Table) -> pa.Table:
            """Flat per-member conversion — the Python-heavy half of the
            relation stage, now spread over every block."""
            n = len(tbl)
            coords_np, offs = _list_coords_view(tbl["coords"])
            resolved = tbl["resolved"].to_numpy(zero_copy_only=False)
            rel_ids = tbl["rel_id"].to_numpy(zero_copy_only=False)
            way_ids = tbl["way_id"].to_numpy(zero_copy_only=False)
            m_idx = tbl["member_idx"].to_numpy(zero_copy_only=False)
            roles = tbl["role"].to_pylist()
            el_rows = tbl.select([f.name for f in _MEMBER_EL_FIELDS]).to_pylist()
            lines, used_flags, payloads_out = [], [], []
            for i in range(n):
                wel = row_to_element(el_rows[i])
                if resolved[i] == True:  # noqa: E712
                    wel["_coords"] = coords_np[offs[i] : offs[i + 1]].tolist()
                member = {
                    "type": "way",
                    "ref": int(way_ids[i]),
                    "role": roles[i],
                    "used": int(rel_ids[i]),
                }
                index = {assemble.ref_key("way", wel["id"]): wel}
                try:
                    shape = assemble.way_to_shape(member, index, clf)
                except Exception:
                    shape = None
                used_flags.append(bool(wel.get("used") is not None))
                line = None
                payload = None
                if shape is not None:
                    s = shape["shape"]
                    if s["type"] == "Polygon":
                        line = s["coordinates"][0]
                    elif s["type"] == "LineString":
                        line = s["coordinates"]
                    else:
                        payload = json.dumps(s)
                    # A by-ref member whose way buffer(0)-split into a
                    # MultiPolygon re-classifies as "LineString" whose
                    # coordinates are NESTED (the member dict has no
                    # tags).  Nested coordinates can't ride the flat
                    # line column — ship the shape JSON in the
                    # (member-row-unused) payload column instead; the
                    # assembly tail passes s["coordinates"] through
                    # exactly like the in-process path does.
                    if line is not None and len(line) and not isinstance(
                        line[0][0], (int, float)
                    ):
                        payload = json.dumps({"type": s["type"], "coordinates": line})
                        line = None
                lines.append(line)
                payloads_out.append(payload)
            counts = [len(l) if l is not None else 0 for l in lines]
            values = [p for l in lines if l for p in l]
            line_col = pa.ListArray.from_arrays(
                pa.array(
                    np.concatenate(([0], np.cumsum(counts))).astype(np.int32),
                    pa.int32(),
                ),
                pa.array(
                    [{"lon": p[0], "lat": p[1]} for p in values], COORD
                )
                if values
                else pa.array([], COORD),
            )
            return pa.Table.from_arrays(
                [
                    pa.array(rel_ids),
                    pa.array(np.ones(n, dtype=np.int8)),
                    pa.array(payloads_out, pa.string()),
                    pa.array(m_idx),
                    pa.array(roles, pa.string()),
                    line_col,
                    pa.array(way_ids),
                    pa.array(used_flags, pa.bool_()),
                ],
                schema=chain_schema,
            )

        def rel_payload_s(batch: pa.Table) -> pa.Table:
            rows = [
                {"el": row_to_element(r), "seq": r["seq"], "id": r["id"]}
                for r in batch.to_pylist()
            ]
            n = len(rows)
            return pa.Table.from_arrays(
                [
                    pa.array([r["id"] for r in rows], pa.int64()),
                    pa.array(np.zeros(n, dtype=np.int8)),
                    pa.array([json.dumps(r) for r in rows], pa.string()),
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.string()),
                    pa.nulls(n, pa.list_(COORD)),
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.bool_()),
                ],
                schema=chain_schema,
            )

        def assemble_partition(tbl: pa.Table) -> pa.Table:
            kinds = tbl["kind"].to_numpy(zero_copy_only=False)
            rel_ids = tbl["rel_id"].to_numpy(zero_copy_only=False)
            payloads = tbl["payload"].to_pylist()
            m_idx = tbl["member_idx"].to_numpy(zero_copy_only=False)
            roles = tbl["role"].to_pylist()
            way_ids = tbl["way_id"].to_numpy(zero_copy_only=False)
            used_np = tbl["used"].to_numpy(zero_copy_only=False)
            line_np, offs = _list_coords_view(tbl["line"])
            lens = np.diff(offs)
            chains_by_rel: Dict[int, list] = {}
            for i in np.flatnonzero(kinds == 1):
                chains_by_rel.setdefault(int(rel_ids[i]), []).append(int(i))
            feats, used_u, used_c, out_shapes = [], [], [], []
            for i in np.flatnonzero(kinds == 0):
                rec = json.loads(payloads[i])
                el = rec["el"]
                rows = sorted(
                    chains_by_rel.get(int(rel_ids[i]), []), key=lambda r: m_idx[r]
                )
                # used-marking parity: ONLY the multipolygon dispatch
                # marks way members (the multiline path never sets
                # member["used"], reference main.py — see map.osm's
                # associatedStreet relation whose house ways stay in
                # the output)
                is_mp = "center" not in el and clf.is_polygon(
                    el.get("tags"), ring_closed=assemble.element_ring_closed(el)
                )
                if is_mp:
                    for r in rows:
                        if used_np[r] == True:  # noqa: E712
                            used_u.append(int(way_ids[r]))
                            used_c.append(int(rel_ids[i]))
                # walk el["members"] in order: chains for joined ways,
                # inline-geometry members converted locally (they never
                # entered the member join)
                chain_by_midx = {int(m_idx[r]): r for r in rows}
                shapes = []
                for mi, m in enumerate(el.get("members", [])):
                    if m.get("type") != "way":
                        continue
                    if m.get("geometry") is not None:
                        ms = assemble.way_to_shape(dict(m), {}, clf)
                        if ms is not None:
                            s = ms["shape"]
                            coords = (
                                s["coordinates"][0]
                                if s["type"] == "Polygon"
                                else s["coordinates"]
                            )
                            shapes.append((m.get("role") or "", coords, m["ref"]))
                        continue
                    r = chain_by_midx.get(mi)
                    if r is not None and lens[r] > 0:
                        shapes.append(
                            (
                                roles[r],
                                line_np[offs[r] : offs[r + 1]].tolist(),
                                int(way_ids[r]),
                            )
                        )
                    elif r is not None and payloads[r] is not None:
                        # MultiPolygon member shape shipped as JSON
                        # (buffer(0) split): pass its coordinates through
                        # exactly like multipolygon_relation_to_shape's
                        # non-Polygon branch
                        s = json.loads(payloads[r])
                        shapes.append((roles[r], s["coordinates"], int(way_ids[r])))
                shape = assemble.relation_tail_from_lines(el, shapes, clf)
                out_shapes.append((rec["id"], shape["shape"] if shape else None))
                if shape is not None:
                    feats.append(
                        _feature_row(rec["seq"], "relation", rec["id"], shape)
                    )
            ft = _feature_table(feats)
            ut = pa.Table.from_pydict(
                {"used_id": used_u, "consumer_id": used_c}, schema=USED_SCHEMA
            )
            st = pa.Table.from_pydict(
                {
                    "rel_id": [x[0] for x in out_shapes],
                    "shape_json": [
                        json.dumps(x[1]) if x[1] else None for x in out_shapes
                    ],
                },
                schema=_SHAPE_SCHEMA,
            )
            return _pack_multi({"features": ft, "used": ut, "shapes": st})

        @_ray.remote
        def _convert_mega_shard(shard: pa.Table) -> pa.Table:
            t = shard.filter(pc.is_in(shard["rel_id"], value_set=mega_arr))
            return convert_members(t)

        @_ray.remote
        def _mega_rel_payload(block: pa.Table) -> pa.Table:
            return rel_payload_s(
                block.filter(pc.is_in(block["id"], value_set=mega_arr))
            )

        @_ray.remote
        def _assemble_mega(p, n_rel, *tables):
            rel_tables, chain_tables = tables[:n_rel], tables[n_rel:]
            rel_tbl = pa.concat_tables(rel_tables, promote_options="default")
            ids = rel_tbl["rel_id"].to_numpy(zero_copy_only=False)
            rel_tbl = rel_tbl.filter(pa.array(ids % P == p))
            tbl = pa.concat_tables(
                [rel_tbl, *chain_tables], promote_options="default"
            )
            return assemble_partition(tbl)

        conv_by_part = {p: [] for p in mega_parts}
        if member_sharded is not None:
            for src in member_sharded.shards:
                for p in mega_parts:
                    conv_by_part[p].append(_convert_mega_shard.remote(src[p]))
        rel_refs = [_mega_rel_payload.remote(b) for b in rel_blocks]
        if not rel_refs:
            return None  # no relation blocks: no mega output
        return [
            _assemble_mega.remote(p, len(rel_refs), *rel_refs, *conv_by_part[p])
            for p in mega_parts
        ]

    # ------------------------------------------------------------------
    def metrics(self):
        """Per-stage metrics table from the last ``features()`` run
        (A5 accounting): way resolution counts and per-relation
        conversion outcomes.  Aggregated vectorized from the
        materialized intermediates — no extra passes over the data."""
        rows = []
        if self._ways_resolved is not None:
            def way_stats(batch: pa.Table) -> pa.Table:
                res = batch["resolved"]
                n = len(batch)
                n_resolved = int(pc.sum(pc.fill_null(res.cast(pa.int8()), 0)).as_py() or 0)
                n_joined = n - res.null_count
                return pa.Table.from_pydict(
                    {
                        "stage": ["way_resolution"],
                        "rows_in": [n],
                        "rows_ok": [n_resolved],
                        "rows_failed": [n_joined - n_resolved],
                    }
                )

            for row in (
                self._ways_resolved.map_batches(way_stats, batch_format="pyarrow")
                .take_all()
            ):
                rows.append(row)
        def shape_stats(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["kind"], "shape"))
            n = len(t)
            ok = n - t["shape_json"].null_count
            return pa.Table.from_pydict(
                {"rows_in": [n], "rows_ok": [ok], "rows_failed": [n - ok]}
            )

        for i, ro in enumerate(self._round_outs):
            # per-batch counts computed in tasks; only the tiny count rows
            # reach the driver
            for r in ro.map_batches(shape_stats, batch_format="pyarrow").take_all():
                rows.append({"stage": f"relation_round_{i}", **r})
        import pandas as pd

        df = pd.DataFrame(rows, columns=["stage", "rows_in", "rows_ok", "rows_failed"])
        return df.groupby("stage", as_index=False).sum()


# ---------------------------------------------------------------------
def _list_coords_view(col: "pa.ChunkedArray"):
    """(N,2) float view + int offsets for a list<struct<lon,lat>> column;
    null/empty lists contribute zero-length slices."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lens = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(zero_copy_only=False)
    offs = np.concatenate(([0], np.cumsum(lens.astype(np.int64))))
    values = arr.flatten()
    if len(values):
        coords_np = np.stack(
            [
                values.field("lon").to_numpy(zero_copy_only=False),
                values.field("lat").to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
    else:
        coords_np = np.empty((0, 2), dtype=np.float64)
    return coords_np, offs


def _feature_row(seq, el_type, el_id, shape) -> dict:
    return {
        "seq": seq,
        "element_type": el_type,
        "element_id": el_id,
        "geom_type": shape["shape"]["type"],
        "geometry_json": json.dumps(shape["shape"]),
        "properties_json": json.dumps(shape["properties"]),
    }


def _feature_table(rows: List[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=FEATURE_SCHEMA)


_SHAPE_SCHEMA = pa.schema([("rel_id", pa.int64()), ("shape_json", pa.string())])
# wide columnar multiplex of the three per-round outputs: no per-row JSON
# wrapping — each section's columns ride natively, absent sections null
_PACKED_SCHEMA = pa.schema(
    [pa.field("kind", pa.string())]
    + list(FEATURE_SCHEMA)
    + list(USED_SCHEMA)
    + list(_SHAPE_SCHEMA)
)


def _pack_multi(parts: Dict[str, pa.Table]) -> pa.Table:
    sections = []
    for kind, tbl in (("feature", parts["features"]), ("used", parts["used"]),
                      ("shape", parts["shapes"])):
        n = len(tbl)
        arrays = [pa.array([kind] * n, pa.string())]
        for f in _PACKED_SCHEMA:
            if f.name == "kind":
                continue
            arrays.append(tbl[f.name] if f.name in tbl.column_names else pa.nulls(n, f.type))
        sections.append(pa.Table.from_arrays(arrays, schema=_PACKED_SCHEMA))
    return pa.concat_tables(sections)


def _unpack_feature(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.equal(batch["kind"], "feature")).select(
        [f.name for f in FEATURE_SCHEMA]
    )


def _unpack_used(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.equal(batch["kind"], "used")).select(
        [f.name for f in USED_SCHEMA]
    )


def features_to_geojson(features_ds) -> dict:
    """Collect a (small) feature Dataset into a FeatureCollection in
    document order — the conformance-test sink."""
    rows = features_ds.take_all()
    rows.sort(key=lambda r: r["seq"])
    return {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": json.loads(r["properties_json"]),
                "geometry": json.loads(r["geometry_json"]),
            }
            for r in rows
        ],
    }
