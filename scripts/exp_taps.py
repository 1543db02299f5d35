import jax.numpy as jnp
"""Micro-profile: is the orthowarp dominated by gathers (taps) or by the
slice-update machinery? Compare bilinear (4 taps) vs cubic (16 taps)."""
import sys, time
import numpy as np

def main():
    import jax
    # inline minimal setup (same scene build as exp_orthowarp)
    from hyperres.core.crs import CRS
    from hyperres.core.grid import Grid, s2_anchored_target_grid
    from hyperres.kernels.glt import prepare_glt
    from hyperres.kernels.warp import orthowarp_taploop, source_index_field
    from hyperres.testing import scenes
    raw_h, raw_w, n_bands = 1242, 1280, 285
    rng = np.random.default_rng(0)
    wl, good = scenes.emit_wavelength_grid(n_bands)
    spectra = scenes.endmember_spectra(wl)
    utm = CRS.utm(33, True)
    cx, cy, th = 450000.0, 5770000.0, np.radians(13.0)
    rows, cols = np.meshgrid(np.arange(raw_h), np.arange(raw_w), indexing="ij")
    u = (cols - raw_w/2)*60.; v = -(rows - raw_h/2)*60.
    rx = cx + u*np.cos(th) - v*np.sin(th); ry = cy + u*np.sin(th) + v*np.cos(th)
    a = scenes.abundance_maps(rx, ry)
    raw = np.clip(a @ spectra, 0.005, 0.95).astype(np.float32); del a
    lon, lat = utm.to_geographic(rx, ry)
    res_x = 60./111320./np.cos(np.radians(float(lat.mean()))); res_y = 60./111320.
    lon0 = float(lon.min())-res_x; lat0 = float(lat.max())+res_y
    ow = int(np.ceil((float(lon.max())+res_x-lon0)/res_x))
    oh = int(np.ceil((lat0-(float(lat.min())-res_y))/res_y))
    og = Grid(CRS.geographic(), lon0, lat0, res_x, res_y, ow, oh)
    oxs, oys = og.pixel_center_coords(); olon, olat = np.meshgrid(oxs, oys)
    oux, ouy = utm.from_geographic(olon, olat)
    du = (oux-cx)*np.cos(th)+(ouy-cy)*np.sin(th)
    dv = -(oux-cx)*np.sin(th)+(ouy-cy)*np.cos(th)
    ci = np.round(du/60.+raw_w/2).astype(np.int64)
    ri = np.round(-dv/60.+raw_h/2).astype(np.int64)
    inside = (ri>=0)&(ri<raw_h)&(ci>=0)&(ci<raw_w)
    glt = np.zeros((oh,ow,2),dtype=np.int32)
    glt[...,0]=np.where(inside,ci+1,0); glt[...,1]=np.where(inside,ri+1,0)
    s2_x0=np.floor(float(oux.min())/60.)*60.; s2_y0=np.ceil(float(ouy.max())/60.)*60.
    s2g = Grid(utm, s2_x0, s2_y0, 10., 10.,
               int((float(oux.max())-s2_x0)//10.), int((s2_y0-float(ouy.min()))//10.))
    utm60 = s2_anchored_target_grid(og, s2g, 60., 60.)
    flat_idx, valid = prepare_glt(glt, (raw_h, raw_w))
    wr, wc = source_index_field(og, utm60)
    raw_j = jax.device_put(raw); flat_j = jax.device_put(flat_idx)
    valid_j = jax.device_put(valid)
    wr_j = jax.device_put(wr); wc_j = jax.device_put(wc)
    jax.block_until_ready(raw_j)
    raw16_j = jax.device_put(raw.astype(jnp.bfloat16))
    jax.block_until_ready(raw16_j)
    import jax.numpy as jnp2
    for method, rj in (("cubic-bf16", raw16_j), ("cubic", raw_j),
                       ("bilinear", raw_j)):
        use = rj
        m = method.split("-")[0]
        out = orthowarp_taploop(use, flat_j, valid_j, wr_j, wc_j,
                                method=m, fill=-9999.0, row_chunks=64)
        jax.block_until_ready(out)
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = orthowarp_taploop(use, flat_j, valid_j, wr_j, wc_j,
                                    method=m, fill=-9999.0,
                                    row_chunks=64)
            jax.block_until_ready(out)
            _ = np.asarray(out[:1, :1])
            runs.append(time.perf_counter() - t0)
        print(f"{method}: {[f'{t:.3f}' for t in runs]}", flush=True)
        out.delete(); del out
        time.sleep(2)


if __name__ == "__main__":
    main()
