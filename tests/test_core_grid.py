import math

import numpy as np
import pytest

from hyperres.core.crs import CRS
from hyperres.core.grid import (
    Grid, Window, intersect_bounds, snap_extent_to_anchor,
    s2_anchored_target_grid,
)


def s2_grid():
    # 10 m UTM grid, origin at a typical S2 tile corner
    return Grid(CRS.utm(33, True), 399960.0, 5800020.0, 10.0, 10.0, 1200, 1200)


def test_bounds_and_shape():
    g = s2_grid()
    l, b, r, t = g.bounds
    assert l == 399960.0 and t == 5800020.0
    assert r == 399960.0 + 12000.0
    assert b == 5800020.0 - 12000.0
    assert g.shape == (1200, 1200)


def test_geotransform_roundtrip():
    g = s2_grid()
    g2 = Grid.from_geotransform(g.crs, g.geotransform, g.width, g.height)
    assert g2 == g


def test_rotated_geotransform_rejected():
    with pytest.raises(ValueError):
        Grid.from_geotransform(CRS.geographic(),
                               (0, 1, 0.1, 0, 0, -1), 10, 10)


def test_pixel_center_roundtrip():
    g = s2_grid()
    x, y = g.xy_of(3, 7)
    col, row = g.colrow_of(x, y)
    assert abs(col - 3) < 1e-9 and abs(row - 7) < 1e-9
    xs, ys = g.pixel_center_coords()
    assert xs[0] == 399960.0 + 5.0
    assert ys[0] == 5800020.0 - 5.0


def test_window_of_bounds():
    g = s2_grid()
    win = g.window_of((400060.0, 5799020.0, 400560.0, 5800020.0))
    assert win == Window(10, 0, 50, 100)
    sub = g.window_grid(win)
    assert sub.x0 == 400060.0 and sub.y0 == 5800020.0
    assert sub.shape == (100, 50)


def test_intersect_bounds():
    a = (0.0, 0.0, 10.0, 10.0)
    b = (5.0, -5.0, 15.0, 5.0)
    assert intersect_bounds(a, b) == (5.0, 0.0, 10.0, 5.0)
    assert intersect_bounds(a, (20.0, 20.0, 30.0, 30.0)) is None


def test_snap_inward_matches_reference_compute_te():
    """Oracle re-derivation of _compute_te (emit_proj.py:354-382)."""
    x0, y0 = 399960.0, 5800020.0
    inter = (400013.0, 5798777.0, 409559.0, 5799991.0)
    xres = yres = 60.0
    eps = 1e-9
    left = x0 + math.ceil(((inter[0] - x0) / xres) - eps) * xres
    right = x0 + math.floor(((inter[2] - x0) / xres) + eps) * xres
    top = y0 - math.ceil(((y0 - inter[3]) / yres) - eps) * yres
    bottom = y0 - math.floor(((y0 - inter[1]) / yres) + eps) * yres
    got = snap_extent_to_anchor(inter, (x0, y0), xres, yres)
    assert got == (left, bottom, right, top)
    # snapped edges land on the 60 m lattice anchored at the S2 origin
    for v, o in [(got[0], x0), (got[2], x0)]:
        assert abs(((v - o) / 60.0) % 1.0) < 1e-9
    # inside the input extent
    assert got[0] >= inter[0] and got[2] <= inter[2]
    assert got[1] >= inter[1] and got[3] <= inter[3]


def test_snap_exact_alignment_is_identity():
    b = (399960.0 + 120.0, 5800020.0 - 600.0, 399960.0 + 600.0, 5800020.0)
    got = snap_extent_to_anchor(b, (399960.0, 5800020.0), 60.0, 60.0)
    assert got == b


def test_s2_anchored_target_grid():
    s2 = s2_grid()
    # EMIT-ish geographic grid overlapping the S2 tile
    lon0, lat0 = s2.crs.to_geographic(s2.x0 + 2000.0, s2.y0 - 2000.0)
    emit = Grid(CRS.geographic(), float(lon0), float(lat0),
                0.000542, 0.000542, 150, 150)
    tgt = s2_anchored_target_grid(emit, s2, 60.0, 60.0)
    assert tgt.crs == s2.crs
    assert tgt.dx == 60.0 and tgt.dy == 60.0
    # anchored to S2 origin lattice
    assert abs(((tgt.x0 - s2.x0) / 60.0) % 1.0) < 1e-9
    assert abs(((s2.y0 - tgt.y0) / 60.0) % 1.0) < 1e-9
    # inside the S2 extent
    sl, sb, sr, st = s2.bounds
    tl, tb, tr, tt = tgt.bounds
    assert tl >= sl and tr <= sr and tb >= sb and tt <= st


def test_s2_res_divisibility_enforced():
    s2 = Grid(CRS.utm(33, True), 0.0, 0.0, 7.0, 7.0, 100, 100)
    emit = Grid(CRS.utm(33, True), 10.0, -10.0, 60.0, 60.0, 5, 5)
    with pytest.raises(ValueError, match="integer multiple"):
        s2_anchored_target_grid(emit, s2, 60.0, 60.0)


def test_bounds_in_geographic():
    s2 = s2_grid()
    l, b, r, t = s2.bounds_in(CRS.geographic())
    assert l < r and b < t
    assert 10.0 < l < 16.0 and 50.0 < b < 54.0  # zone 33 N vicinity
