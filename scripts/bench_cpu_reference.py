"""CPU reference baseline at full granule scale.

BASELINE.md: the reference publishes no numbers, so the framework
measures them itself. This times NumPy implementations with the
*reference's exact semantics* for each hot stage on the host CPU
(the reference's own compute substrate for everything except gdalwarp,
which ran in GDAL's C++ — the vectorised NumPy cubic warp here is a
generous stand-in):

  1. GLT gather in 32-band chunks (emit_proj.py:969-987 verbatim shape),
  2. cubic warp of the 285-band ortho cube to the UTM grid (16-tap
     vectorised NumPy; gdalwarp proxy),
  3. SRF trapz synthesis per band (synth.py:41-43 formula),
  4. linear-domain Sinkhorn 5000x5000, 300 iterations (ot.sinkhorn
     semantics) + np.polyfit deg 4,
  5. bilinear upsample of 3 bands to the 10 m grid + np.polyval.

Usage: python scripts/bench_cpu_reference.py [scale]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def cubic_kernel(t, a=-0.5):
    at = np.abs(t)
    w1 = (a + 2) * at ** 3 - (a + 3) * at ** 2 + 1
    w2 = a * at ** 3 - 5 * a * at ** 2 + 8 * a * at - 4 * a
    return np.where(at <= 1, w1, np.where(at < 2, w2, 0.0))


def main():
    from hyperres.core.crs import CRS
    from hyperres.core.grid import Grid, s2_anchored_target_grid
    from hyperres.kernels.warp import separable_index_axes, \
        source_index_field
    from hyperres.testing import scenes

    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    raw_h = max(64, int(1242 * scale))
    raw_w = max(64, int(1280 * scale))
    n_bands = 285
    timings = {}

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
    s2_x0 = np.floor(float(oux.min()) / 60.0) * 60.0
    s2_y0 = np.ceil(float(ouy.max()) / 60.0) * 60.0
    s2g = Grid(utm, s2_x0, s2_y0, 10.0, 10.0,
               int((float(oux.max()) - s2_x0) // 10.0),
               int((s2_y0 - float(ouy.min())) // 10.0))
    utm60 = s2_anchored_target_grid(og, s2g, 60.0, 60.0)
    print(f"raw {raw_h}x{raw_w}x{n_bands}; ortho {oh}x{ow}; "
          f"utm60 {utm60.height}x{utm60.width}; "
          f"10m {s2g.height}x{s2g.width}", flush=True)

    # ---- 1. GLT gather, 32-band chunks (the reference hot loop) ----
    t0 = time.perf_counter()
    gy = np.where(inside, ri, 0)
    gx = np.where(inside, ci, 0)
    ortho = np.full((oh, ow, n_bands), -9999.0, dtype=np.float32)
    for b0 in range(0, n_bands, 32):
        b1 = min(b0 + 32, n_bands)
        raw_blk = raw[:, :, b0:b1]
        out_blk = np.full((oh, ow, b1 - b0), -9999.0, dtype=np.float32)
        out_blk[inside, :] = raw_blk[gy[inside], gx[inside], :]
        ortho[:, :, b0:b1] = out_blk
    timings["glt_gather_chunks"] = time.perf_counter() - t0
    print(f"1. GLT gather (32-band chunks): "
          f"{timings['glt_gather_chunks']:.2f}s", flush=True)

    # ---- 2. cubic warp to UTM (vectorised numpy, gdalwarp proxy) ----
    t0 = time.perf_counter()
    wr, wc = source_index_field(og, utm60)
    r0 = np.floor(wr).astype(np.int64)
    c0 = np.floor(wc).astype(np.int64)
    tr = (wr - r0).astype(np.float32)
    tc = (wc - c0).astype(np.float32)
    wr_taps = [cubic_kernel(tr + 1), cubic_kernel(tr),
               cubic_kernel(1 - tr), cubic_kernel(2 - tr)]
    wc_taps = [cubic_kernel(tc + 1), cubic_kernel(tc),
               cubic_kernel(1 - tc), cubic_kernel(2 - tc)]
    acc = np.zeros((utm60.height, utm60.width, n_bands), dtype=np.float32)
    wacc = np.zeros((utm60.height, utm60.width, 1), dtype=np.float32)
    for i, dr in enumerate((-1, 0, 1, 2)):
        rr = np.clip(r0 + dr, 0, oh - 1)
        rin = (r0 + dr >= 0) & (r0 + dr < oh)
        for j, dc in enumerate((-1, 0, 1, 2)):
            cc2 = np.clip(c0 + dc, 0, ow - 1)
            cin = (c0 + dc >= 0) & (c0 + dc < ow)
            vblk = ortho[rr, cc2, :]
            ok = (rin & cin)[..., None] & (vblk != -9999.0)
            w = np.where(ok, (wr_taps[i] * wc_taps[j])[..., None], 0.0)
            acc += np.where(ok, vblk, 0.0) * w
            wacc += w[..., :1] * 0 + w.mean(-1, keepdims=True) * 0 + w[..., :1]
    good_w = np.abs(wacc) > 1e-6
    utm_cube = np.where(good_w, acc / np.where(good_w, wacc, 1), -9999.0)
    timings["cubic_warp"] = time.perf_counter() - t0
    print(f"2. cubic warp 285 bands: {timings['cubic_warp']:.2f}s",
          flush=True)
    del acc, wacc, ortho

    # ---- 3. SRF trapz synthesis (reference formula, 3 bands) ----
    from hyperres.spectral import builtin_srf
    t0 = time.perf_counter()
    srf = builtin_srf("S2A", bands=["B2", "B3", "B4"])
    synth = {}
    for band, (lam, rsp) in srf.items():
        rsp_on = np.interp(wl, lam, rsp, left=0.0, right=0.0) * good
        num = np.trapezoid(utm_cube * rsp_on[None, None, :], x=wl, axis=-1)
        den = np.trapezoid(rsp_on, x=wl)
        synth[band] = num / (den + 1e-32)
    timings["srf_trapz"] = time.perf_counter() - t0
    print(f"3. SRF trapz (3 bands): {timings['srf_trapz']:.2f}s",
          flush=True)

    # ---- 4. Sinkhorn 5000^2 x 300 + polyfit deg 4 ----
    t0 = time.perf_counter()
    X = rng.random((5000, 3))
    Y = rng.random((5000, 3))
    M = ((X[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    K = np.exp(-M / 0.05)
    uu = np.ones(5000) / 5000
    vv = np.ones(5000) / 5000
    av = np.ones(5000) / 5000
    bv = np.ones(5000) / 5000
    for _ in range(300):
        uu = av / (K @ vv + 1e-300)
        vv = bv / (K.T @ uu + 1e-300)
    P = uu[:, None] * K * vv[None, :]
    Ybar = (P @ Y) / (P.sum(1, keepdims=True) + 1e-32)
    for c in range(3):
        np.polyfit(X[:, c], Ybar[:, c], 4)
    timings["sinkhorn_polyfit"] = time.perf_counter() - t0
    print(f"4. Sinkhorn 5000^2 x300 + polyfit: "
          f"{timings['sinkhorn_polyfit']:.2f}s", flush=True)

    # ---- 5. bilinear upsample 3 bands to 10 m + polyval ----
    t0 = time.perf_counter()
    sep = separable_index_axes(utm60, s2g)
    rows1, cols1 = sep
    r0u = np.clip(np.floor(rows1).astype(np.int64), 0, utm60.height - 2)
    c0u = np.clip(np.floor(cols1).astype(np.int64), 0, utm60.width - 2)
    tru = (rows1 - r0u)[:, None, None].astype(np.float32)
    tcu = (cols1 - c0u)[None, :, None].astype(np.float32)
    sim = np.stack([synth[b] for b in ("B4", "B3", "B2")], axis=-1)
    up = ((1 - tru) * (1 - tcu) * sim[r0u][:, c0u]
          + (1 - tru) * tcu * sim[r0u][:, c0u + 1]
          + tru * (1 - tcu) * sim[r0u + 1][:, c0u]
          + tru * tcu * sim[r0u + 1][:, c0u + 1])
    coeffs = np.array([[0.1, -0.2, 0.3, 0.5, 0.05]] * 3)
    for c in range(3):
        np.polyval(coeffs[c], up[..., c])
    timings["upsample_polyval"] = time.perf_counter() - t0
    print(f"5. bilinear upsample + polyval: "
          f"{timings['upsample_polyval']:.2f}s", flush=True)

    total = sum(timings.values())
    print(f"TOTAL CPU reference proxy: {total:.2f}s")

    # Canonical host normalization: single-threaded NumPy throughput
    # varies ~2.5x across hosts, so the proxy total alone is not
    # reproducible. Calibrate with two single-core probes bracketing
    # the proxy's op mix (BLAS matmul = upper envelope; the cubic
    # kernel profile = the elementwise mix the warp/SRF stages
    # actually run) and report them alongside, so any host's proxy
    # can be normalized: work_const = total * elementwise_GFLOPs.
    gflops = {}
    a = rng.random((2048, 2048)).astype(np.float64)
    t0 = time.perf_counter()
    for _ in range(3):
        a @ a
    gflops["matmul_f64"] = 3 * 2 * 2048 ** 3 / (
        time.perf_counter() - t0) / 1e9
    t = (rng.random(4_000_000) * 4 - 2).astype(np.float64)
    t0 = time.perf_counter()
    for _ in range(5):
        cubic_kernel(t)
    # ~13 flops/element in the cubic profile (3 mul+2 add per cubic x2
    # branches evaluated + abs + 2 compares/selects)
    gflops["cubic_profile"] = 5 * 13 * t.size / (
        time.perf_counter() - t0) / 1e9
    print(f"host calibration (single core): "
          f"matmul {gflops['matmul_f64']:.1f} GFLOP/s, "
          f"cubic profile {gflops['cubic_profile']:.2f} GFLOP/s, "
          f"normalized work = total x cubic = "
          f"{total * gflops['cubic_profile']:.0f} GFLOP-equiv")

    import json
    print(json.dumps({"metric": "cpu_reference_proxy_total",
                      "value": round(total, 2), "unit": "seconds",
                      "stages": {k: round(v, 2)
                                 for k, v in timings.items()},
                      "host_gflops": {k: round(v, 2)
                                      for k, v in gflops.items()},
                      "normalized_gflop_equiv": round(
                          total * gflops["cubic_profile"], 1)}))


if __name__ == "__main__":
    main()
