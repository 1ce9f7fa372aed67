"""range_join semantics: binned equi-join == the raw theta join, including
overlapping intervals, boundary [lo, hi) exclusivity, bin-boundary values,
and left-join NULL survival."""

import sys

import pytest

sys.path.insert(0, ".")
from geopetl_spark.operators.range_join import range_join  # noqa: E402


@pytest.fixture(scope="module")
def frames(spark):
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 24.9), (3, 25.0), (4, 50.0), (5, 99.99), (6, 100.0), (7, 500.0)],
        "pid int, v double",
    )
    ivs = spark.createDataFrame(
        [(10, 0.0, 25.0), (11, 0.0, 100.0), (12, 25.0, 50.0), (13, 100.0, 100.0)],
        "iid int, lo double, hi double",
    )
    return pts, ivs


def _pairs(df):
    return sorted((r.pid, r.iid) for r in df.select("pid", "iid").collect())


def test_matches_theta_join_exactly(frames):
    pts, ivs = frames
    got = _pairs(range_join(pts, ivs, "v", "lo", "hi", bin_width=30.0))
    want = _pairs(
        pts.join(ivs, (pts.v >= ivs.lo) & (pts.v < ivs.hi))
    )
    assert got == want
    # overlapping intervals both match; hi is exclusive; empty interval matches nothing
    assert (1, 10) in got and (1, 11) in got          # overlap
    assert (3, 10) not in got and (3, 12) in got      # hi-exclusive boundary
    assert all(iid != 13 for _, iid in got)           # empty [100, 100)


@pytest.mark.parametrize("w", [1.0, 25.0, 1000.0])
def test_bin_width_never_changes_results(frames, w):
    pts, ivs = frames
    base = _pairs(range_join(pts, ivs, "v", "lo", "hi", bin_width=30.0))
    assert _pairs(range_join(pts, ivs, "v", "lo", "hi", bin_width=w)) == base


def test_left_join_keeps_unmatched_points(frames):
    pts, ivs = frames
    out = range_join(pts, ivs, "v", "lo", "hi", bin_width=30.0, how="left")
    rows = {r.pid: r for r in out.where("iid is null").collect()}
    assert set(rows) == {6, 7}  # 100.0 and 500.0 fall in no interval
    assert out.columns == ["pid", "v", "iid", "lo", "hi"]


def test_bad_args_raise(frames):
    pts, ivs = frames
    with pytest.raises(ValueError):
        range_join(pts, ivs, "v", "lo", "hi", bin_width=0)
    with pytest.raises(ValueError):
        range_join(pts, ivs, "v", "lo", "hi", bin_width=1.0, how="full")
