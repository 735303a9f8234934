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

from typing import List, Optional

import numpy as np
import pyarrow as pa

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
    fields.append(pa.field("__part", pa.int64()))
    return pa.schema(fields)


def _pad_side(ds, on: str, own: pa.Schema, superset: pa.Schema, side: int, nparts: int):
    def pad(batch: pa.Table) -> pa.Table:
        n = len(batch)
        arrays, names = [], []
        for f in superset:
            names.append(f.name)
            if f.name == "__side":
                arrays.append(pa.array(np.full(n, side, dtype=np.int8), type=pa.int8()))
            elif f.name == "__part":
                keys = batch[on].to_numpy(zero_copy_only=False)
                arrays.append(pa.array((keys % nparts).astype(np.int64)))
            elif f.name in batch.column_names:
                arrays.append(batch[f.name].cast(f.type) if batch[f.name].type != f.type else batch[f.name])
            else:
                arrays.append(pa.nulls(n, type=f.type))
        return pa.Table.from_arrays(arrays, names=names)

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
):
    """Equi-join two Datasets on an int64 key column.

    ``how``: "inner" | "left_outer" | "left_anti".  Output schema: key +
    left columns + right columns (left columns only for anti).  Robust
    to empty inputs and arbitrary skew up to one partition's rows per
    worker heap.  ``left_anti`` keeps left rows whose key has NO match
    on the right (duplicate right keys are fine — no pre-distinct
    shuffle needed).
    """
    superset = _superset_schema(on, l_schema, r_schema)
    out_schema = pa.schema([f for f in superset if f.name not in ("__side", "__part")])
    l_names = [f.name for f in l_schema if f.name != on]
    r_names = [f.name for f in r_schema if f.name != on]
    if how == "left_anti":
        out_schema = pa.schema([superset.field(on)] + [l_schema.field(n) for n in l_names])
        pandas_how = None
    else:
        pandas_how = {"inner": "inner", "left_outer": "left"}[how]

    lt = _pad_side(left, on, l_schema, superset, 0, num_partitions)
    rt = _pad_side(right, on, r_schema, superset, 1, num_partitions)
    both = lt.union(rt)

    def merge_partition(tbl: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        lmask = pc.equal(tbl["__side"], 0)
        lt = tbl.filter(lmask)
        rt = tbl.filter(pc.invert(lmask))
        if how == "left_anti":
            lk = lt[on].to_numpy(zero_copy_only=False)
            rk = rt[on].to_numpy(zero_copy_only=False)
            keep = ~np.isin(lk, rk)
            return lt.select([on] + l_names).filter(pa.array(keep))
        # key-index merge in pandas (flat ints, vectorized); payload
        # columns move via arrow take() so nested types survive
        ldf = pd.DataFrame({"k": lt[on].to_numpy(zero_copy_only=False),
                            "li": np.arange(len(lt))})
        rdf = pd.DataFrame({"k": rt[on].to_numpy(zero_copy_only=False),
                            "ri": np.arange(len(rt))})
        m = ldf.merge(rdf, on="k", how=pandas_how)
        li = pa.array(m["li"].to_numpy().astype(np.int64))
        ri_np = m["ri"].to_numpy(dtype="float64", na_value=np.nan)
        ri_mask = np.isnan(ri_np)
        ri = pa.array(np.where(ri_mask, 0, ri_np).astype(np.int64), mask=ri_mask)
        out_l = lt.select([on] + l_names).take(li)
        arrays = [out_l[c] for c in out_l.column_names]
        rt_sel = rt.select(r_names)
        for c in r_names:
            arrays.append(rt_sel[c].take(ri))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return both.groupby("__part").map_groups(merge_partition, batch_format="pyarrow")


def _with_part(ds, key: str, num_partitions: int):
    def add(batch: pa.Table) -> pa.Table:
        keys = batch[key]
        if pa.types.is_integer(keys.type):
            part = keys.to_numpy(zero_copy_only=False) % num_partitions
        else:
            # process-STABLE hash (builtin str hash is per-process
            # randomized and would scatter equal keys across partitions)
            import zlib

            part = np.array(
                [zlib.crc32(str(x).encode()) % num_partitions for x in keys.to_pylist()],
                dtype=np.int64,
            )
        return batch.append_column("__part", pa.array(part.astype(np.int64)))

    return ds.map_batches(add, batch_format="pyarrow")


def distinct_on(ds, key: str, *, num_partitions: int = 16, sort_by=None):
    """Keep one row per distinct ``key`` — partition-wise vectorized
    pandas dedup (P Python calls), NOT ``groupby(key)`` whose per-group
    overhead is ~0.1 ms and dominates at high cardinality.

    ``sort_by``: optional column list ordering rows before dedup so
    "first" is deterministic (e.g. min id wins)."""

    def dedup(df):
        if sort_by:
            df = df.sort_values(sort_by, kind="stable")
        return df.drop_duplicates(subset=[key]).drop(columns="__part")

    return _with_part(ds, key, num_partitions).groupby("__part").map_groups(
        dedup, batch_format="pandas"
    )


def grouped_count(ds, key: str, *, num_partitions: int = 16, alias: str = "n"):
    """(key, count) pairs — partition-wise pandas value_counts; complete
    because partitioning is by the key itself."""

    def count(df):
        out = df.groupby(key, sort=False).size().reset_index(name=alias)
        return out

    return _with_part(ds, key, num_partitions).groupby("__part").map_groups(
        count, batch_format="pandas"
    )


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
