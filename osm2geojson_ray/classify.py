"""Polygon/line tag classifier (reference parity: main.py:368-447).

Pure broadcastable functions: the rule tables are tiny and captured in
closures / precompiled lookup dicts, never shuffled.  Precedence
(main.py:381-409):

    area=no -> line
    area=yes -> polygon
    type=multipolygon -> polygon
    open ring (inline geometry or node refs) -> line
    blacklist hit -> line
    blacklisted key, value not listed, no whitelist for key -> polygon
    polygon="all" key present -> polygon
    whitelist hit -> polygon
    default -> line
    ... and a final areaKeys "linear exception" veto (main.py:368-374,
    first-matching-tag-only quirk preserved).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from ._tag_rules import AREA_KEYS, POLYGON_FEATURES


class PolygonClassifier:
    """Precompiled classifier over tag dicts.

    Build once on the driver, broadcast by closure capture into
    ``map_batches`` stages (the compiled tables are a few KB).
    """

    def __init__(
        self,
        polygon_features: Optional[Sequence[dict]] = None,
        area_keys: Optional[Mapping[str, Mapping[str, bool]]] = None,
    ):
        self.rules = list(polygon_features) if polygon_features is not None else POLYGON_FEATURES
        self.area_keys = dict(area_keys) if area_keys is not None else AREA_KEYS
        # Keys that have at least one whitelist rule (used by the
        # blacklist-without-whitelist branch, main.py:434-440).
        self._whitelisted_keys = {r["key"] for r in self.rules if r["polygon"] == "whitelist"}

    # -- rule pass (main.py:412-447) ------------------------------------
    def rule_pass(self, tags: Mapping[str, str]) -> bool:
        rules = self.rules
        # First pass: blacklists take precedence.
        for rule in rules:
            if rule["polygon"] == "blacklist" and rule["key"] in tags:
                if tags[rule["key"]] in rule["values"]:
                    return False
        # Second pass: whitelist / "all" / bare-blacklist-key rules, in
        # rule-file order (order is semantic: first matching rule wins).
        for rule in rules:
            if rule["key"] in tags:
                if rule["polygon"] == "blacklist" and rule["key"] not in self._whitelisted_keys:
                    return True
                if rule["polygon"] == "all":
                    return True
                if rule["polygon"] == "whitelist" and tags[rule["key"]] in rule["values"]:
                    return True
        return False

    # -- areaKeys linear exception (main.py:368-374) --------------------
    def is_exception(self, tags: Mapping[str, str]) -> bool:
        # Reference quirk: only the FIRST tag (dict iteration order)
        # present in areaKeys is consulted.
        for key in tags:
            if key in self.area_keys:
                return bool(self.area_keys[key].get(tags[key], False))
        return False

    # -- full precedence chain (main.py:381-409) ------------------------
    def is_polygon(
        self,
        tags: Optional[Mapping[str, str]],
        *,
        ring_closed: Optional[bool] = None,
    ) -> bool:
        """Classify one element.

        ``ring_closed`` is the pre-computed closure check over inline
        geometry or node refs (None when the element has neither, e.g.
        relations).
        """
        if not tags:
            return False
        area = tags.get("area")
        if area == "no":
            return False
        if area == "yes":
            return True
        if tags.get("type") == "multipolygon":
            return True
        if ring_closed is False:
            return False
        if self.rule_pass(tags):
            return not self.is_exception(tags)
        return False


DEFAULT_CLASSIFIER = PolygonClassifier()


def element_ring_closed(el: dict) -> Optional[bool]:
    """Closure check exactly as the reference orders it (main.py:399-404):
    BOTH checks apply independently — an element carrying an open inline
    geometry OR an open node-ref list is open; None when neither present."""
    closed = None
    geom = el.get("geometry")
    if geom:
        a, b = geom[0], geom[-1]
        if a["lat"] != b["lat"] or a["lon"] != b["lon"]:
            return False
        closed = True
    nodes = el.get("nodes")
    if nodes:
        if nodes[0] != nodes[-1]:
            return False
        closed = True
    return closed


def is_geometry_polygon(
    el: dict,
    area_keys: Optional[Mapping] = None,
    polygon_features: Optional[Sequence[dict]] = None,
) -> bool:
    """Reference-signature convenience wrapper (main.py:381-409)."""
    if area_keys is None and polygon_features is None:
        clf = DEFAULT_CLASSIFIER
    else:
        clf = PolygonClassifier(polygon_features, area_keys)
    return clf.is_polygon(el.get("tags"), ring_closed=element_ring_closed(el))
