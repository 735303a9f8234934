"""Arrow schema for the OSM elements Dataset.

One row per element; absent fields are nulls (the reference's dicts are
sparse, SURVEY.md §1.5).  Blocks move zero-copy through the object
store; group kernels convert the few rows they touch back to plain
dicts via :func:`rows_to_elements`.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import pyarrow as pa

COORD = pa.struct([("lon", pa.float64()), ("lat", pa.float64())])
MEMBER = pa.struct(
    [
        ("type", pa.string()),
        ("ref", pa.int64()),
        ("role", pa.string()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("geometry", pa.list_(COORD)),
    ]
)

ELEMENT_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),  # document order (output ordering is semantic)
        ("type", pa.string()),
        ("id", pa.int64()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("nodes", pa.list_(pa.int64())),
        ("geometry", pa.list_(COORD)),
        ("members", pa.list_(MEMBER)),
        ("center", COORD),
        ("bounds", pa.struct(
            [
                ("minlat", pa.float64()),
                ("minlon", pa.float64()),
                ("maxlat", pa.float64()),
                ("maxlon", pa.float64()),
            ]
        )),
        ("tags_keys", pa.list_(pa.string())),
        ("tags_values", pa.list_(pa.string())),
        ("timestamp", pa.string()),
        ("version", pa.int64()),
        ("changeset", pa.int64()),
        ("user", pa.string()),
        ("uid", pa.int64()),
    ]
)
# tags are carried as parallel key/value lists rather than pa.map_:
# map arrays round-trip awkwardly through some Ray Data paths, and the
# reference's dict iteration ORDER is semantic (areaKeys first-match
# quirk, classify.py) — parallel lists preserve it exactly.


def _coord_struct(d: Optional[dict]) -> Optional[dict]:
    if d is None:
        return None
    return {"lon": float(d["lon"]), "lat": float(d["lat"])}


def elements_to_rows(elements: Iterable[dict]) -> List[dict]:
    rows = []
    for seq, el in enumerate(elements):
        tags = el.get("tags")
        members = el.get("members")
        rows.append(
            {
                "seq": seq,
                "type": el.get("type"),
                "id": el.get("id"),
                "lat": float(el["lat"]) if "lat" in el else None,
                "lon": float(el["lon"]) if "lon" in el else None,
                "nodes": list(el["nodes"]) if "nodes" in el else None,
                "geometry": [_coord_struct(g) for g in el["geometry"]]
                if "geometry" in el
                else None,
                "members": [
                    {
                        "type": m.get("type"),
                        "ref": m.get("ref"),
                        "role": m.get("role"),
                        "lat": float(m["lat"]) if "lat" in m else None,
                        "lon": float(m["lon"]) if "lon" in m else None,
                        "geometry": [_coord_struct(g) for g in m["geometry"]]
                        if "geometry" in m
                        else None,
                    }
                    for m in members
                ]
                if members is not None
                else None,
                "center": _coord_struct(el.get("center")),
                "bounds": el.get("bounds"),
                "tags_keys": list(tags.keys()) if tags is not None else None,
                "tags_values": list(tags.values()) if tags is not None else None,
                "timestamp": el.get("timestamp"),
                "version": el.get("version"),
                "changeset": el.get("changeset"),
                "user": el.get("user"),
                "uid": el.get("uid"),
            }
        )
    return rows


def elements_table(elements: Iterable[dict]) -> pa.Table:
    return pa.Table.from_pylist(elements_to_rows(elements), schema=ELEMENT_SCHEMA)


_META_KEYS = ("timestamp", "version", "changeset", "user", "uid")


def row_to_element(row: Dict) -> dict:
    """Inverse of elements_to_rows for one row (nulls dropped, key order
    matching the reference parsers so property dicts compare equal)."""
    el: dict = {}
    if row.get("role") is not None:
        el["role"] = row["role"]
    if row.get("id") is not None:
        el["id"] = row["id"]
    if row.get("lat") is not None:
        el["lat"] = row["lat"]
    if row.get("lon") is not None:
        el["lon"] = row["lon"]
    for k in _META_KEYS:
        if row.get(k) is not None:
            el[k] = row[k]
    el["type"] = row["type"]
    tk, tv = row.get("tags_keys"), row.get("tags_values")
    if tk is not None:
        el["tags"] = dict(zip(list(tk), list(tv)))
    if row.get("members") is not None:
        el["members"] = [
            {
                k: v
                for k, v in [
                    ("type", m.get("type")),
                    ("ref", m.get("ref")),
                    ("role", m.get("role")),
                    ("lat", m.get("lat")),
                    ("lon", m.get("lon")),
                    (
                        "geometry",
                        [{"lon": g["lon"], "lat": g["lat"]} for g in m["geometry"]]
                        if m.get("geometry") is not None
                        else None,
                    ),
                ]
                if v is not None
            }
            for m in row["members"]
        ]
    if row.get("bounds") is not None:
        el["bounds"] = dict(row["bounds"])
    if row.get("geometry") is not None:
        el["geometry"] = [{"lon": g["lon"], "lat": g["lat"]} for g in row["geometry"]]
    if row.get("nodes") is not None:
        el["nodes"] = list(row["nodes"])
    if row.get("center") is not None:
        el["center"] = dict(row["center"])
    return el


def rows_to_elements(batch: pa.Table) -> List[dict]:
    return [row_to_element(r) for r in batch.to_pylist()]
