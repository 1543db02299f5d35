"""Granule toolkit: raw-space subsetting, multi-granule mosaics, browse
orthos — the EMIT toolkit operations beyond the main product pipeline
(reference: EMIT_data/emit_tools.py ``spatial_subset`` :529-619,
``merge_emit`` :631-704, ``ortho_browse`` :707-736)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

from ..core.constants import GLT_NODATA_VALUE, NO_DATA_VALUE
from ..core.crs import CRS
from ..core.grid import Grid
from ..catalog.geometry import LonLatPolygon
from ..io.granule import EmitGranule, apply_glt
from ..kernels.glt import orthorectify


@dataclass
class RawSubset:
    data: np.ndarray          # (h, w, B) raw-space subset
    glt: np.ndarray           # (Ho', Wo', 2) re-based 1-based GLT
    ortho_grid: Grid          # cropped ortho grid
    raw_window: Tuple[int, int, int, int]  # (row0, row1, col0, col1)


def spatial_subset(granule: EmitGranule,
                   polygon: LonLatPolygon) -> RawSubset:
    """Subset a granule in raw (swath) space to the pixels that map into
    ``polygon`` (lon/lat), with a re-based GLT so the subset remains
    orthorectifiable — emit_tools.spatial_subset semantics (:529-619)."""
    og = granule.ortho_grid
    xs, ys = og.pixel_center_coords()
    lon, lat = np.meshgrid(xs, ys)
    inside = polygon.contains_points(lon, lat)

    glt = granule.glt
    valid = np.all(glt != GLT_NODATA_VALUE, axis=-1) & inside
    if not valid.any():
        raise ValueError("Polygon selects no valid GLT cells")

    gx = glt[..., 0][valid] - 1
    gy = glt[..., 1][valid] - 1
    row0, row1 = int(gy.min()), int(gy.max()) + 1
    col0, col1 = int(gx.min()), int(gx.max()) + 1

    # ortho crop to the polygon's cell bbox
    oy, ox = np.nonzero(inside)
    or0, or1 = int(oy.min()), int(oy.max()) + 1
    oc0, oc1 = int(ox.min()), int(ox.max()) + 1
    sub_glt = glt[or0:or1, oc0:oc1].copy()
    sub_valid = np.all(sub_glt != GLT_NODATA_VALUE, axis=-1)
    # re-base to the raw window (stay 1-based, 0 = nodata); entries that
    # fall outside the window become nodata
    gx2 = sub_glt[..., 0] - col0
    gy2 = sub_glt[..., 1] - row0
    ok = (sub_valid & (gx2 >= 1) & (gx2 <= col1 - col0)
          & (gy2 >= 1) & (gy2 <= row1 - row0))
    sub_glt[..., 0] = np.where(ok, gx2, 0)
    sub_glt[..., 1] = np.where(ok, gy2, 0)

    data = granule.read_cube()[row0:row1, col0:col1, :]
    from dataclasses import replace
    sub_grid = replace(og,
                       x0=og.x0 + oc0 * og.dx,
                       y0=og.y0 - or0 * og.dy,
                       width=oc1 - oc0, height=or1 - or0)
    return RawSubset(data=data, glt=sub_glt, ortho_grid=sub_grid,
                     raw_window=(row0, row1, col0, col1))


def merge_emit(granules: Sequence[EmitGranule],
               resolution_deg: Optional[Tuple[float, float]] = None
               ) -> Tuple[np.ndarray, Grid]:
    """Mosaic multiple orthorectified granules onto a shared geographic
    grid, first-granule-wins where footprints overlap — the merge_emit /
    rioxarray.merge_arrays behaviour (:631-704). Returns
    ((H, W, B) float32 with -9999 nodata, grid)."""
    if not granules:
        raise ValueError("No granules to merge")
    b = granules[0].n_bands
    for g in granules[1:]:
        if g.n_bands != b:
            raise ValueError("Granules have differing band counts")

    grids = [g.ortho_grid for g in granules]
    if resolution_deg is None:
        dx = min(gr.dx for gr in grids)
        dy = min(gr.dy for gr in grids)
    else:
        dx, dy = resolution_deg
    left = min(gr.bounds[0] for gr in grids)
    bottom = min(gr.bounds[1] for gr in grids)
    right = max(gr.bounds[2] for gr in grids)
    top = max(gr.bounds[3] for gr in grids)
    width = int(np.ceil((right - left) / dx))
    height = int(np.ceil((top - bottom) / dy))
    out_grid = Grid(CRS.geographic(), left, top, dx, dy, width, height)

    out = np.full((height, width, b), NO_DATA_VALUE, dtype=np.float32)
    for g in granules:
        ortho = np.asarray(orthorectify(g.read_cube(), g.glt))
        # nearest placement of this granule's cells onto the mosaic grid
        gr = g.ortho_grid
        rows = np.round((out_grid.y0 - (gr.y0 - (np.arange(gr.height) + 0.5)
                                        * gr.dy)) / out_grid.dy - 0.5
                        ).astype(int)
        cols = np.round((((gr.x0 + (np.arange(gr.width) + 0.5) * gr.dx)
                          - out_grid.x0) / out_grid.dx) - 0.5).astype(int)
        rr = np.clip(rows, 0, height - 1)
        cc = np.clip(cols, 0, width - 1)
        block = out[np.ix_(rr, cc)]
        valid_src = ortho[..., 0] != NO_DATA_VALUE
        take = valid_src & (block[..., 0] == NO_DATA_VALUE)  # first wins
        block[take] = ortho[take]
        out[np.ix_(rr, cc)] = block
    return out, out_grid


def ortho_browse(rgb_raw: np.ndarray, glt: np.ndarray,
                 fill: float = 0.0) -> np.ndarray:
    """Orthorectify a browse RGB image through the GLT
    (emit_tools.ortho_browse :707-736)."""
    out = apply_glt(rgb_raw.astype(np.float32), np.asarray(glt),
                    fill_value=fill)
    if rgb_raw.dtype == np.uint8:
        return np.clip(out, 0, 255).astype(np.uint8)
    return out
