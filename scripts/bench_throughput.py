"""Sustained multi-granule throughput: process several granules
back-to-back through the single jitted pipeline (shapes shared, so the
compile is amortised), each granule ingested through the production
streaming path (chunked u16-quantized transfer overlapped with device
assembly; HYPERRES_TP_TRANSFER=f32 for bit-exact upload). Reports
granules/minute."""
import queue
import threading
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from hyperres.core.config import OTConfig
    from hyperres.core.crs import CRS
    from hyperres.core.grid import Grid, s2_anchored_target_grid
    from hyperres.fusion.sampling import sample_valid_pixels_device
    from hyperres.kernels.glt import prepare_glt
    from hyperres.kernels.lstsq import polyfit, polyval_channels
    from hyperres.kernels.sinkhorn import ot_barycentric_targets
    from hyperres.kernels.srf import build_srf_weight_matrix, srf_synthesize
    from hyperres.kernels.stats import shared_percentile_stretch
    from hyperres.kernels.warp import (orthowarp_two_pass,
                                       scanline_cstar,
                                       separable_index_axes,
                                       separable_resample_matmul,
                                       separable_weight_matrix,
                                       source_index_field)
    from hyperres.spectral import builtin_srf
    from hyperres.testing import scenes

    import os
    scale = float(os.environ.get("HYPERRES_TP_SCALE", "1.0"))
    raw_h = max(64, int(1242 * scale))
    raw_w = max(64, int(1280 * scale))
    n_bands = 285
    n_granules = int(os.environ.get("HYPERRES_TP_GRANULES", "3"))
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
    cstar = scanline_cstar(wr, wc, og.height)
    sep = separable_index_axes(utm60, s2g)
    srf3 = builtin_srf("S2A", bands=["B2", "B3", "B4"])
    W3, _, _ = build_srf_weight_matrix(wl, srf3, good)
    uxs, uys = utm60.pixel_center_coords()
    UX, UY = np.meshgrid(uxs, uys)

    def gen_granule(seed):
        a = scenes.abundance_maps(rx, ry, seed=seed)
        raw = np.clip(a @ spectra, 0.005, 0.95).astype(np.float32)
        a60 = scenes.abundance_maps(UX, UY, seed=seed)
        s2rgb = np.clip(a60 @ (spectra @ np.asarray(W3)), 0, 1).astype(
            np.float32)
        return raw, s2rgb

    ot_cfg = OTConfig()

    def pipe(raw_j, flat_j, valid_j, wr_j, wc_j, cstar_j, W_j, s2rgb_j,
             Wr10, Wc10, key):
        utm_cube = orthowarp_two_pass(raw_j, flat_j, valid_j, wr_j, wc_j,
                                      cstar_j, method="cubic",
                                      fill=-9999.0)
        synth = srf_synthesize(utm_cube, W_j, fast=True)
        valid60 = (utm_cube[..., 0] != -9999.0)
        sim_n = shared_percentile_stretch(synth[..., ::-1], valid60)
        ref_n = shared_percentile_stretch(s2rgb_j[..., ::-1], valid60)
        k1, k2 = jax.random.split(key)
        Xs, _ = sample_valid_pixels_device(sim_n, valid60,
                                           ot_cfg.n_samples, k1)
        Ys, _ = sample_valid_pixels_device(ref_n, valid60,
                                           ot_cfg.n_samples, k2)
        Ybar = ot_barycentric_targets(Xs, Ys, reg=ot_cfg.reg,
                                      num_itermax=ot_cfg.num_itermax,
                                      stop_thr=ot_cfg.stop_thr)
        coeffs = jnp.stack([polyfit(Xs[:, c], Ybar[:, c], 4)
                            for c in range(3)])
        sim10 = separable_resample_matmul(sim_n, Wr10, Wc10, fill=jnp.nan)
        fused = jnp.clip(polyval_channels(coeffs, sim10), 0.0, 1.0)
        # sanity scalar computed on device: a host-side strided fetch
        # compiles a pathological gather program on the tunnel (~30s+)
        return fused, jnp.nanmean(fused)

    jitted = jax.jit(pipe)
    flat_j = jax.device_put(flat_idx)
    valid_j = jax.device_put(valid)
    wr_j = jax.device_put(wr)
    cstar_j = jax.device_put(cstar)
    wc_j = jax.device_put(wc)
    W_j = jax.device_put(np.asarray(W3))
    Wr10 = jax.device_put(separable_weight_matrix(sep[0], utm60.height,
                                                  "bilinear"))
    Wc10 = jax.device_put(separable_weight_matrix(sep[1], utm60.width,
                                                  "bilinear"))

    # pre-generate all granules: fabricating the synthetic world is
    # test-data creation, not framework work (a real deployment reads
    # granules from disk, which the prefetch pipeline overlaps)
    print("pre-generating granules ...", flush=True)
    granules = [gen_granule(i) for i in range(n_granules + 1)]

    from hyperres.io.ingest import stream_cube_to_device
    transfer = os.environ.get("HYPERRES_TP_TRANSFER", "u16")

    def upload(raw):
        return stream_cube_to_device(
            lambda b0, b1: raw[..., b0:b1], raw.shape, transfer=transfer)

    # warmup (compile) on granule 0
    raw, s2rgb = granules[0]
    fused, _ = jitted(upload(raw), flat_j, valid_j, wr_j, wc_j, cstar_j,
                      W_j, jax.device_put(s2rgb), Wr10, Wc10,
                      jax.random.PRNGKey(0))
    jax.block_until_ready(fused)
    fused.delete()
    print("warmup done", flush=True)

    t0 = time.perf_counter()
    done = 0
    for raw, s2rgb in granules[1:]:
        t_up0 = time.perf_counter()
        raw_j = upload(raw)
        jax.block_until_ready(raw_j)
        t_up = time.perf_counter() - t_up0
        fused, sanity = jitted(raw_j, flat_j, valid_j, wr_j, wc_j,
                               cstar_j, W_j, jax.device_put(s2rgb), Wr10,
                               Wc10, jax.random.PRNGKey(done + 1))
        jax.block_until_ready(fused)
        assert np.isfinite(float(sanity))
        fused.delete()
        done += 1
        print(f"granule {done} done at "
              f"{time.perf_counter() - t0:.1f}s "
              f"(ingest {t_up:.1f}s, {transfer})", flush=True)
    total = time.perf_counter() - t0
    print(f"throughput: {done} granules in {total:.1f}s = "
          f"{done / total * 60:.1f} granules/min "
          f"(incl. host->device upload per granule)", flush=True)


if __name__ == "__main__":
    main()
