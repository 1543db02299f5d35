"""Fused orthowarp vs reference-semantics two-step path at scale
(half-granule so both fit in HBM): agreement must be at float32 level
away from masked borders."""
import sys
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from hyperres.core.crs import CRS
    from hyperres.core.grid import Grid, s2_anchored_target_grid
    from hyperres.kernels.glt import glt_gather, prepare_glt
    from hyperres.kernels.warp import (orthowarp_taploop,
                                       source_index_field,
                                       warp_interpolate_taploop)
    from hyperres.testing import scenes

    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    raw_h, raw_w, n_bands = int(1242 * scale), int(1280 * scale), 285
    rng = np.random.default_rng(0)
    wl, good = scenes.emit_wavelength_grid(n_bands)
    spectra = scenes.endmember_spectra(wl)
    utm = CRS.utm(33, True)
    cx, cy, th = 450000.0, 5770000.0, np.radians(13.0)
    rows, cols = np.meshgrid(np.arange(raw_h), np.arange(raw_w),
                             indexing="ij")
    u = (cols - raw_w / 2.0) * 60.0
    v = -(rows - raw_h / 2.0) * 60.0
    rx = cx + u * np.cos(th) - v * np.sin(th)
    ry = cy + u * np.sin(th) + v * np.cos(th)
    a = scenes.abundance_maps(rx, ry)
    raw = np.clip(a @ spectra, 0.005, 0.95).astype(np.float32)
    del a
    lon, lat = utm.to_geographic(rx, ry)
    res_x = 60.0 / 111320.0 / np.cos(np.radians(float(lat.mean())))
    res_y = 60.0 / 111320.0
    lon0 = float(lon.min()) - res_x
    lat0 = float(lat.max()) + res_y
    ow = int(np.ceil((float(lon.max()) + res_x - lon0) / res_x))
    oh = int(np.ceil((lat0 - (float(lat.min()) - res_y)) / res_y))
    og = Grid(CRS.geographic(), lon0, lat0, res_x, res_y, ow, oh)
    oxs, oys = og.pixel_center_coords()
    olon, olat = np.meshgrid(oxs, oys)
    oux, ouy = utm.from_geographic(olon, olat)
    du = (oux - cx) * np.cos(th) + (ouy - cy) * np.sin(th)
    dv = -(oux - cx) * np.sin(th) + (ouy - cy) * np.cos(th)
    ci = np.round(du / 60.0 + raw_w / 2.0).astype(np.int64)
    ri = np.round(-dv / 60.0 + raw_h / 2.0).astype(np.int64)
    inside = (ri >= 0) & (ri < raw_h) & (ci >= 0) & (ci < raw_w)
    glt = np.zeros((oh, ow, 2), dtype=np.int32)
    glt[..., 0] = np.where(inside, ci + 1, 0)
    glt[..., 1] = np.where(inside, ri + 1, 0)
    s2_x0 = np.floor(float(oux.min()) / 60.0) * 60.0
    s2_y0 = np.ceil(float(ouy.max()) / 60.0) * 60.0
    s2g = Grid(utm, s2_x0, s2_y0, 10.0, 10.0,
               int((float(oux.max()) - s2_x0) // 10.0),
               int((s2_y0 - float(ouy.min())) // 10.0))
    utm60 = s2_anchored_target_grid(og, s2g, 60.0, 60.0)
    flat_idx, valid = prepare_glt(glt, (raw_h, raw_w))
    wr, wc = source_index_field(og, utm60)

    raw_j = jax.device_put(raw)
    flat_j = jax.device_put(flat_idx)
    valid_j = jax.device_put(valid)
    wr_j = jax.device_put(wr)
    wc_j = jax.device_put(wc)

    fused = np.asarray(orthowarp_taploop(
        raw_j, flat_j, valid_j, wr_j, wc_j, method="cubic",
        fill=-9999.0, row_chunks=64))
    ortho = glt_gather(raw_j, flat_j, valid_j, fill_value=-9999.0)
    two = np.asarray(warp_interpolate_taploop(
        ortho, wr_j, wc_j, nodata=-9999.0, method="cubic", fill=-9999.0))
    both_valid = (fused != -9999.0) & (two != -9999.0)
    diff = np.abs(fused - two)[both_valid]
    agree_valid = float(((fused == -9999.0) == (two == -9999.0)).mean())
    print(f"shape {fused.shape}; valid-mask agreement {agree_valid:.6f}")
    print(f"abs diff on mutually valid: max {diff.max():.2e}, "
          f"p99.9 {np.percentile(diff, 99.9):.2e}, "
          f"median {np.median(diff):.2e}")
    assert agree_valid > 0.9999
    assert np.percentile(diff, 99.9) < 1e-4
    print("PASS")


if __name__ == "__main__":
    main()
