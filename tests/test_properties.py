"""Property-based tests (hypothesis) for the pure kernels: codecs, cells,
PIP, apply_changes semantics vs an independent spec implementation."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wikibrain_spark import codecs
from wikibrain_spark.geo import cells, pip

# numeric kernels must be warning-clean (expected div/overflow regimes are
# suppressed inside the kernels via np.errstate); a RuntimeWarning here is a
# real numeric defect, not noise — fail loudly.
pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")

finite_lat = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
finite_lon = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)


@given(finite_lat, finite_lon)
@settings(max_examples=200, deadline=None)
def test_geotag_header_roundtrip(lat, lon):
    payload = codecs.pack_header("ppm", 4, 4, lat, lon)
    got_lat, got_lon = codecs.extract_geotag(payload)
    assert got_lat == lat and got_lon == lon  # bit-exact
    b_lat, b_lon = codecs.extract_geotags_batch([payload])
    assert b_lat[0] == lat and b_lon[0] == lon


@given(finite_lat, finite_lon, st.integers(min_value=0, max_value=13))
@settings(max_examples=200, deadline=None)
def test_hexlite_center_fixpoint(lat, lon, res):
    cell = cells.hexlite_cell(np.array([lat]), np.array([lon]), res)
    clat, clon = cells.hexlite_center(cell)
    again = cells.hexlite_cell(clat, clon, res)
    assert cell[0] == again[0]


@given(finite_lat, finite_lon, st.integers(min_value=1, max_value=12),
       st.integers(min_value=0, max_value=11))
@settings(max_examples=100, deadline=None)
def test_hexlite_parent_contains_child_center(lat, lon, res, coarser):
    if coarser >= res:
        return
    child = cells.hexlite_cell(np.array([lat]), np.array([lon]), res)
    parent = cells.hexlite_parent(child, coarser)
    # the child's center must encode into the parent at the coarser res
    clat, clon = cells.hexlite_center(child)
    assert parent[0] == cells.hexlite_cell(clat, clon, coarser)[0]


@given(st.integers(min_value=3, max_value=64), st.integers(min_value=3, max_value=64),
       st.sampled_from(["ppm", "bmp", "pngz"]), st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_lossless_codec_roundtrip_any_size(h, w, fmt, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out, meta = codecs.decode_image(codecs.encode_image(img, fmt, 0.0, 0.0))
    assert np.array_equal(out, img)
    assert (meta["w"], meta["h"]) == (w, h)


@given(st.integers(min_value=8, max_value=48), st.integers(min_value=8, max_value=48),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=20, deadline=None)
def test_dctq_psnr_any_size(h, w, seed):
    rng = np.random.default_rng(seed)
    # worst case: pure noise
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out, _ = codecs.decode_image(codecs.encode_image(img, "dctq", 0.0, 0.0))
    assert codecs.psnr(img, out) >= 40.0


@given(st.lists(st.tuples(finite_lat, finite_lon), min_size=3, max_size=10),
       finite_lat, finite_lon)
@settings(max_examples=100, deadline=None)
def test_pip_point_far_outside_bbox_is_outside(ring, lat, lon):
    rl = np.array([p[0] for p in ring])
    rn = np.array([p[1] for p in ring])
    if lat > rl.max() or lat < rl.min():  # outside the lat range: no crossings
        assert not pip.points_in_ring(np.array([lat]), np.array([lon]), rl, rn)[0]


# ---- apply_changes vs an independent spec implementation -----------------

def _apply_spec(tags: dict, changes: list) -> tuple[bool, dict]:
    """Direct implementation of the documented CAS semantics
    (reference apply_changes.py:5-20), used as the property oracle."""
    tags = dict(tags)
    for change in changes:
        for k, v in change["from"].items():
            if v is not None:
                if tags.get(k) != v:
                    return False, tags
                del tags[k]
            else:
                if k in tags:
                    return False, tags
        for k, v in change["to"].items():
            if tags.get(k) is not None:
                return False, tags
            if v is not None:
                tags[k] = v
    return True, tags


keys = st.sampled_from(["a", "b", "c", "d"])
vals = st.one_of(st.none(), st.sampled_from(["1", "2", "3"]))
change = st.fixed_dictionaries({
    "from": st.dictionaries(keys, vals, max_size=2),
    "to": st.dictionaries(keys, vals, max_size=2),
})


@given(st.dictionaries(keys, st.sampled_from(["1", "2", "3"]), max_size=3),
       st.lists(change, max_size=3))
@settings(max_examples=60, deadline=None)
def test_apply_changes_matches_spec(spark, tags, changes):
    from wikibrain_spark.operators.apply_changes import CHANGES_TYPE, apply_tag_changes

    df = spark.createDataFrame([(tags, changes)], f"tags map<string,string>, changes {CHANGES_TYPE}")
    row = apply_tag_changes(df).collect()[0]
    ok_spec, tags_spec = _apply_spec(tags, changes)
    assert row["prereq_ok"] == ok_spec
    if ok_spec:
        assert dict(row["new_tags"]) == tags_spec
