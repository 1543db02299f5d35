"""Benchmark: full EMIT granule ortho + SRF synthesis + OT/poly fusion
to 10 m on one chip — the BASELINE.md north-star workload
("full granule ortho + SRF synth + fusion to 10 m < 2 s, 1x TPU v5e").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value is the end-to-end device pipeline wall-clock (after compilation)
and vs_baseline = north_star_seconds / value (>1 means faster than the
2 s target).

Scene: synthetic full-granule scale (raw 1242x1280x285, the implied real
EMIT granule size, SURVEY.md section 6) generated in memory. Stages
timed (all device, one warm-up iteration for compile):
  1. GLT gather of the 285-band cube onto the geographic ortho grid,
  2. cubic warp onto the S2-anchored UTM 60 m grid (2-step like the
     reference's gdalwarp path),
  3. SRF band synthesis (B2/B3/B4) as the trapz-weight matmul,
  4. shared percentile stretch + Sinkhorn OT (5000x5000, reg 0.05) +
     degree-4 polynomial fit,
  5. bilinear upsample of the matched bands to the 10 m grid + polyval.

Environment knobs: HYPERRES_BENCH_SCALE (default 1.0) scales the raw
granule dims for quick smoke runs; HYPERRES_BENCH_WARP ("two_pass"
default, "taploop" for the exact gather kernel); HYPERRES_BENCH_RUNS,
HYPERRES_BENCH_STAGES, HYPERRES_BENCH_U16_UPLOAD.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    t_setup0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    from hyperres.utils import enable_compilation_cache
    enable_compilation_cache()  # repeat runs skip the minutes-scale
    #                             axon warm-up compile entirely

    from hyperres.core.config import OTConfig
    from hyperres.core.grid import s2_anchored_target_grid
    from hyperres.fusion.sampling import sample_valid_pixels_device
    from hyperres.kernels.glt import prepare_glt
    from hyperres.kernels.lstsq import polyfit, polyval_channels
    from hyperres.kernels.sinkhorn import ot_barycentric_targets
    from hyperres.kernels.srf import build_srf_weight_matrix, srf_synthesize
    from hyperres.kernels.stats import shared_percentile_stretch
    from hyperres.kernels.warp import (
        orthowarp_taploop, orthowarp_two_pass, scanline_cstar,
        separable_index_axes, separable_resample_matmul,
        separable_weight_matrix, source_index_field,
    )
    from hyperres.spectral import builtin_srf
    from hyperres.testing import scenes

    scale = float(os.environ.get("HYPERRES_BENCH_SCALE", "1.0"))
    raw_h = max(64, int(1242 * scale))
    raw_w = max(64, int(1280 * scale))
    n_bands = 285
    north_star_s = 2.0

    devs = jax.devices()
    log(f"devices: {devs}")

    # ---------------- host: synthesize a full-scale scene ----------------
    log(f"generating scene raw={raw_h}x{raw_w}x{n_bands} ...")
    rng = np.random.default_rng(0)
    wl, good = scenes.emit_wavelength_grid(n_bands)
    spectra = scenes.endmember_spectra(wl)

    from hyperres.core.crs import CRS
    from hyperres.core.grid import Grid
    utm = CRS.utm(33, True)
    # swath geometry like the scene factory, sized to the raw dims
    cx, cy = 450000.0, 5770000.0
    th = np.radians(13.0)

    rows, cols = np.meshgrid(np.arange(raw_h), np.arange(raw_w),
                             indexing="ij")
    u = (cols - raw_w / 2.0) * 60.0
    v = -(rows - raw_h / 2.0) * 60.0
    rx = cx + u * np.cos(th) - v * np.sin(th)
    ry = cy + u * np.sin(th) + v * np.cos(th)
    # f32 accumulation: the f64 matmul product + full-cube f64 noise +
    # their sum would peak ~11 GB host RSS at full scale
    a = scenes.abundance_maps(rx, ry).astype(np.float32)
    raw = a @ spectra.astype(np.float32)
    del a
    noise = rng.standard_normal(size=(raw_h, raw_w, n_bands),
                                dtype=np.float32)
    noise *= np.float32(0.002)
    raw += noise
    del noise
    np.clip(raw, 0.005, 0.95, out=raw)

    lon, lat = utm.to_geographic(rx, ry)
    res_x = 60.0 / 111320.0 / np.cos(np.radians(float(lat.mean())))
    res_y = 60.0 / 111320.0
    lon0 = float(lon.min()) - res_x
    lat0 = float(lat.max()) + res_y
    ow = int(np.ceil((float(lon.max()) + res_x - lon0) / res_x))
    oh = int(np.ceil((lat0 - (float(lat.min()) - res_y)) / res_y))
    ortho_grid = Grid(CRS.geographic(), lon0, lat0, res_x, res_y, ow, oh)
    log(f"ortho grid: {oh}x{ow}")

    # GLT (1-based) for the ortho grid
    oxs, oys = ortho_grid.pixel_center_coords()
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

    # S2 grid covering the swath (10 m, origin on the 60 m lattice)
    sw_l = float(oux.min())
    sw_t = float(ouy.max())
    s2_x0 = np.floor(sw_l / 60.0) * 60.0
    s2_y0 = np.ceil(sw_t / 60.0) * 60.0
    s2_w = int((float(oux.max()) - s2_x0) // 10.0)
    s2_h = int((s2_y0 - float(ouy.min())) // 10.0)
    s2_grid = Grid(utm, s2_x0, s2_y0, 10.0, 10.0, s2_w, s2_h)
    utm60 = s2_anchored_target_grid(ortho_grid, s2_grid, 60.0, 60.0)
    log(f"UTM 60 m grid: {utm60.height}x{utm60.width}; "
        f"10 m grid: {s2_h}x{s2_w}")

    # real S2 RGB at 60 m (serves as the fusion target; the downsample
    # phase is folded in by sampling the world straight at 60 m)
    uxs, uys = utm60.pixel_center_coords()
    UX, UY = np.meshgrid(uxs, uys)
    a60 = scenes.abundance_maps(UX, UY)
    srf3 = builtin_srf("S2A", bands=["B2", "B3", "B4"])
    W3, _, _ = build_srf_weight_matrix(wl, srf3, good)
    s2_rgb_60 = np.clip(a60 @ (spectra @ np.asarray(W3)), 0, 1).astype(
        np.float32)  # (H60, W60, 3) in B2,B3,B4 order
    del a60

    # host-precomputed index fields (f64 CRS math -> f32 indices)
    flat_idx, valid = prepare_glt(glt, (raw_h, raw_w))
    wr, wc = source_index_field(ortho_grid, utm60)  # TM inverse field
    warp_kernel = os.environ.get("HYPERRES_BENCH_WARP", "two_pass")
    cstar = (scanline_cstar(wr, wc, ortho_grid.height)
             if warp_kernel == "two_pass" else None)
    sep = separable_index_axes(utm60, s2_grid)
    t_setup = time.perf_counter() - t_setup0
    log(f"setup done in {t_setup:.1f}s")

    # ---------------- device pipeline ----------------
    # One jitted program produces BOTH the 285-band UTM DATA product and
    # the fused 10 m output; XLA then manages all intermediate liveness,
    # and only the two outputs survive the launch. (The remote axon
    # backend frees buffers asynchronously, so multi-program structures
    # with large cross-program arrays proved OOM-prone.)
    ot_cfg = OTConfig()

    def full_pipeline(raw_j, flat_j, valid_j, wr_j, wc_j, cstar_j, W_j,
                      s2rgb_j, Wr10, Wc10, key):
        # 1+2. fused GLT + cubic warp straight to the S2-anchored grid.
        # two_pass: Catmull-Smith scanline warp as banded MXU matmuls
        # (default; ~2.6x the taploop gather kernel, sub-1e-3 deviation
        # at nodata boundaries only); taploop: exact gather kernel.
        if warp_kernel == "two_pass":
            utm_cube = orthowarp_two_pass(raw_j, flat_j, valid_j, wr_j,
                                          wc_j, cstar_j, method="cubic",
                                          fill=-9999.0)
        else:
            utm_cube = orthowarp_taploop(raw_j, flat_j, valid_j, wr_j,
                                         wc_j, method="cubic",
                                         fill=-9999.0, row_chunks=64)
        # 3. SRF synthesis -> B2,B3,B4 at 60 m (MXU matmul)
        synth = srf_synthesize(utm_cube, W_j, fast=True)
        valid60 = (utm_cube[..., 0] != -9999.0)
        # 4. shared stretch + Sinkhorn OT + degree-4 polynomial fit
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
        # 5. 10 m upsample as two MXU matmuls + polyval
        sim10 = separable_resample_matmul(sim_n, Wr10, Wc10, fill=jnp.nan)
        fused = jnp.clip(polyval_channels(coeffs, sim10), 0.0, 1.0)
        return utm_cube, fused, coeffs

    jitted = jax.jit(full_pipeline)

    log("uploading inputs ...")
    t_up0 = time.perf_counter()
    # production transfer path: chunked per-band-affine u16 quantization
    # overlapped with host->HBM transfer and device-side assembly
    # (hyperres.io.ingest — the same path orthorectify_granule uses).
    # HYPERRES_BENCH_TRANSFER=f32 ships the raw float cube instead.
    transfer = os.environ.get("HYPERRES_BENCH_TRANSFER", "u16")
    if os.environ.get("HYPERRES_BENCH_U16_UPLOAD") == "0":  # back-compat
        transfer = "f32"
    from hyperres.io.ingest import stream_cube_to_device
    raw_j = stream_cube_to_device(
        lambda b0, b1: raw[..., b0:b1], raw.shape, transfer=transfer,
        chunk_bands=32, depth=3)
    raw_j.block_until_ready()
    t_ingest = time.perf_counter() - t_up0
    log(f"raw cube streamed in {t_ingest:.2f}s ({transfer})")
    flat_j = jax.device_put(flat_idx)
    valid_j = jax.device_put(valid)
    wr_j = jax.device_put(wr)
    wc_j = jax.device_put(wc)
    cstar_j = (jax.device_put(cstar) if cstar is not None
               else jnp.zeros((1, 1), jnp.float32))
    W_j = jax.device_put(np.asarray(W3))
    s2rgb_j = jax.device_put(s2_rgb_60)
    Wr10 = jax.device_put(separable_weight_matrix(
        sep[0], utm60.height, "bilinear"))
    Wc10 = jax.device_put(separable_weight_matrix(
        sep[1], utm60.width, "bilinear"))
    key = jax.random.PRNGKey(0)
    jax.block_until_ready((raw_j, flat_j, wr_j, s2rgb_j, Wr10))
    t_upload = time.perf_counter() - t_up0
    log(f"upload done in {t_upload:.2f}s "
        f"({raw.nbytes * {'u16': 0.5, 'u12': 0.375, 'f32': 1.0}[transfer] / 1e9:.2f} GB "
        f"{transfer} raw cube)")

    jit_probe = jax.jit(lambda x: x[::997, ::997])

    log("compiling + warmup ...")
    t_c0 = time.perf_counter()
    utm_cube, fused, coeffs = jitted(raw_j, flat_j, valid_j, wr_j, wc_j,
                                     cstar_j, W_j, s2rgb_j, Wr10, Wc10,
                                     key)
    jax.block_until_ready(fused)
    _ = np.asarray(jit_probe(fused))
    utm_shape = utm_cube.shape
    utm_cube.delete()
    fused.delete()
    del utm_cube, fused, coeffs
    _ = float(jnp.sum(jnp.zeros(8)))  # hard sync
    time.sleep(2.0)                   # let async frees land on the remote
    log(f"warmup (incl. compile): {time.perf_counter() - t_c0:.2f}s; "
        f"UTM product {utm_shape}")

    if os.environ.get("HYPERRES_BENCH_STAGES"):
        # tunnel overhead reference: trivial program + tiny readback
        tiny = jax.jit(lambda x: x * 2.0)
        z = jnp.zeros((8, 8))
        _ = np.asarray(tiny(z))
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(tiny(z))
            log(f"tunnel noop roundtrip: {time.perf_counter() - t0:.3f}s")

        # diagnostic: time each stage as its own program
        def stage_ortho(raw_j, flat_j, valid_j, wr_j, wc_j):
            if warp_kernel == "two_pass":
                return orthowarp_two_pass(raw_j, flat_j, valid_j, wr_j,
                                          wc_j, cstar_j, method="cubic",
                                          fill=-9999.0)
            return orthowarp_taploop(raw_j, flat_j, valid_j, wr_j, wc_j,
                                     method="cubic", fill=-9999.0,
                                     row_chunks=64)

        def stage_fit(utm_cube, W_j, s2rgb_j, key):
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
            return sim_n, coeffs

        def stage_up(sim_n, coeffs, Wr10, Wc10):
            sim10 = separable_resample_matmul(sim_n, Wr10, Wc10,
                                              fill=jnp.nan)
            return jnp.clip(polyval_channels(coeffs, sim10), 0.0, 1.0)

        # stage-at-a-time: warm up, time, free the warm-up result, and
        # sync before moving on, so only one stage's intermediates plus
        # the chain's carry live at once (the remote backend frees
        # buffers asynchronously — holding all three stage outputs OOMs)
        def timed_stage(name, fn, *args):
            warm = fn(*args)
            jax.block_until_ready(warm)
            time.sleep(1.0)
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
            log(f"stage {name}: {time.perf_counter() - t0:.3f}s")
            for leaf in jax.tree_util.tree_leaves(warm):
                leaf.delete()
            _ = float(jnp.sum(jnp.zeros(8)))
            time.sleep(2.0)
            return out

        try:
            u = timed_stage("orthowarp", jax.jit(stage_ortho), raw_j,
                            flat_j, valid_j, wr_j, wc_j)
            sim_n, coeffs_s = timed_stage("srf+stretch+ot+fit",
                                          jax.jit(stage_fit), u, W_j,
                                          s2rgb_j, key)
            u.delete()
            fz = timed_stage("upsample+apply", jax.jit(stage_up), sim_n,
                             coeffs_s, Wr10, Wc10)
            fz.delete()
            sim_n.delete()
            _ = float(jnp.sum(jnp.zeros(8)))
            time.sleep(2.0)
        except Exception as exc:  # diagnostics must never kill the bench
            log(f"stage diagnostics failed: {exc!r}")

    n_runs = max(1, int(os.environ.get("HYPERRES_BENCH_RUNS", "1")))
    times = []
    fused_np = coeffs_np = fused_shape = None
    for i in range(n_runs):
        run_key = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        utm_cube, fused, coeffs = jitted(raw_j, flat_j, valid_j, wr_j,
                                         wc_j, cstar_j, W_j, s2rgb_j,
                                         Wr10, Wc10, run_key)
        jax.block_until_ready(fused)
        _ = np.asarray(jit_probe(fused))
        times.append(time.perf_counter() - t0)
        fused_shape = fused.shape
        if i == n_runs - 1:
            fused_np = np.asarray(fused)
            coeffs_np = np.asarray(coeffs)
        utm_cube.delete()
        fused.delete()
        del utm_cube, fused, coeffs
        _ = float(jnp.sum(jnp.zeros(8)))
        time.sleep(2.0)
    elapsed = min(times)
    log(f"runs: {[f'{t:.3f}' for t in times]}; fused shape {fused_shape}")

    finite_frac = float(np.isfinite(fused_np).mean())
    ok = finite_frac > 0.3 and float(np.nanmax(fused_np)) <= 1.0
    log(f"output sane: {ok} (finite frac {finite_frac:.3f}); "
        f"coeffs: {coeffs_np.round(3).tolist()}")

    print(json.dumps({
        "metric": "emit_granule_ortho_srf_fusion_to_10m",
        "value": round(elapsed, 4),
        "unit": "seconds",
        "vs_baseline": round(north_star_s / elapsed, 3),
        # honest steady-state numbers on this host/tunnel: the raw-cube
        # host->HBM ingest (streamed, u16-quantized by default) and the
        # ingest-inclusive wall clock for a fresh granule
        "ingest_s": round(t_ingest, 3),
        "ingest_inclusive_s": round(t_ingest + elapsed, 3),
        "transfer": transfer,
    }))


if __name__ == "__main__":
    main()
