"""Classifier precedence tests (mirrors reference tests/test_polygon_logic.py)."""

from osm2geojson_ray.classify import DEFAULT_CLASSIFIER, is_geometry_polygon


def poly(tags, **extra):
    el = {"type": "way", "tags": tags}
    el.update(extra)
    return is_geometry_polygon(el)


def test_no_tags():
    assert is_geometry_polygon({"type": "way"}) is False


def test_area_no_wins():
    assert poly({"area": "no", "building": "yes"}) is False


def test_area_yes_wins():
    assert poly({"area": "yes", "highway": "primary"}) is True


def test_multipolygon_type():
    assert poly({"type": "multipolygon"}) is True


def test_open_ring_is_line():
    assert poly({"building": "yes"}, nodes=[1, 2, 3]) is False
    assert poly({"building": "yes"}, nodes=[1, 2, 3, 1]) is True


def test_open_inline_geometry_is_line():
    g_open = [{"lat": 0, "lon": 0}, {"lat": 1, "lon": 1}]
    g_closed = g_open + [{"lat": 0, "lon": 0}]
    assert poly({"building": "yes"}, geometry=g_open) is False
    assert poly({"building": "yes"}, geometry=g_closed) is True


def test_both_geometry_and_nodes_checked():
    # issue-6: inline geometry closed but node refs open -> line
    g_closed = [{"lat": 0, "lon": 0}, {"lat": 1, "lon": 1}, {"lat": 0, "lon": 0}]
    assert poly({"building": "yes"}, geometry=g_closed, nodes=[1, 2, 3]) is False


def test_whitelist_all():
    assert poly({"building": "yes"}, nodes=[1, 2, 1]) is True
    assert poly({"building": "anything"}, nodes=[1, 2, 1]) is True


def test_blacklist():
    # highway is a blacklist-and-whitelist key: services/rest_area whitelisted
    assert poly({"highway": "services"}, nodes=[1, 2, 1]) is True
    assert poly({"highway": "primary"}, nodes=[1, 2, 1]) is False


def test_blacklist_over_all():
    # issue-7: highway=steps blacklisted even when another "all" key present
    assert poly({"highway": "steps", "indoor": "yes"}, nodes=[1, 2, 1]) is False


def test_barrier_wall_not_polygon():
    # barrier=wall: not on the barrier whitelist -> line even when closed
    assert poly({"barrier": "wall"}, nodes=[1, 2, 1]) is False
    # city_wall IS whitelisted
    assert poly({"barrier": "city_wall"}, nodes=[1, 2, 1]) is True


def test_area_keys_exception():
    # golf has polygon="all" but areaKeys flags golf=path as linear
    assert poly({"golf": "green"}, nodes=[1, 2, 1]) is True
    assert poly({"golf": "path"}, nodes=[1, 2, 1]) is False
    # leisure=track / slipway are linear exceptions to leisure="all"
    assert poly({"leisure": "track"}, nodes=[1, 2, 1]) is False
    assert poly({"leisure": "park"}, nodes=[1, 2, 1]) is True


def test_first_tag_quirk():
    # only the FIRST tag present in areaKeys is consulted
    clf = DEFAULT_CLASSIFIER
    assert clf.is_exception({"golf": "path"}) is True
    assert clf.is_exception({"amenity": "fountain", "golf": "path"}) is False
