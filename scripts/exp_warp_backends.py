"""Warp backend/precision sweep at full granule scale on the device.

Reproduces the measurements in docs/BENCHMARK.md:

    PYTHONPATH=. python scripts/exp_warp_backends.py

Compares orthowarp variants standalone (each its own program, slice-only
readback so nothing multi-GB is ever downloaded): taploop gathers, XLA
two-pass at highest/high, Pallas two-pass at highest/default.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hyperres.core.crs import CRS
    from hyperres.core.grid import Grid
    from hyperres.kernels import warp as kw
    from hyperres.kernels.glt import prepare_glt

    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    utm = CRS.utm(33, True)
    raw_h = max(64, int(1242 * scale))
    raw_w = max(64, int(1280 * scale))
    B = 285
    cx, cy, th = 500000.0, 5800000.0, np.deg2rad(12.0)
    rr, cc = np.meshgrid(np.arange(raw_h), np.arange(raw_w),
                         indexing="ij")
    du = (cc - raw_w / 2.0) * 60.0
    dv = -(rr - raw_h / 2.0) * 60.0
    X = cx + du * np.cos(th) - dv * np.sin(th)
    Y = cy + du * np.sin(th) + dv * np.cos(th)
    lon, lat = utm.to_geographic(X, Y)
    res = 0.000558
    og = Grid(CRS.geographic(), lon.min() - 2 * res, lat.max() + 2 * res,
              res, res, int((lon.max() - lon.min()) / res) + 4,
              int((lat.max() - lat.min()) / res) + 4)
    oxs, oys = og.pixel_center_coords()
    olon, olat = np.meshgrid(oxs, oys)
    oux, ouy = utm.from_geographic(olon, olat)
    du2 = (oux - cx) * np.cos(th) + (ouy - cy) * np.sin(th)
    dv2 = -(oux - cx) * np.sin(th) + (ouy - cy) * np.cos(th)
    ci = np.round(du2 / 60.0 + raw_w / 2.0).astype(np.int64)
    ri = np.round(-dv2 / 60.0 + raw_h / 2.0).astype(np.int64)
    inside = (ri >= 0) & (ri < raw_h) & (ci >= 0) & (ci < raw_w)
    glt = np.zeros(olon.shape + (2,), np.int32)
    glt[..., 0] = np.where(inside, ci + 1, 0)
    glt[..., 1] = np.where(inside, ri + 1, 0)
    flat_idx, vmask = prepare_glt(glt, (raw_h, raw_w))
    ug = Grid(utm, np.floor(oux.min() / 60) * 60,
              np.ceil(ouy.max() / 60) * 60, 60.0, 60.0,
              int((oux.max() - oux.min()) / 60) - 1,
              int((ouy.max() - ouy.min()) / 60) - 1)
    wr, wc = kw.source_index_field(og, ug)
    cstar = kw.scanline_cstar(wr, wc, og.height)
    phase = np.linspace(0, np.pi, B).astype(np.float32)
    raw = (0.45 + 0.35 * np.sin(X[..., None] / 900.0 + phase)
           * np.cos(Y[..., None] / 1100.0)).astype(np.float32)

    dev = [jax.device_put(jnp.asarray(a))
           for a in (raw, flat_idx, vmask, wr, wc)]
    cstar_d = jax.device_put(jnp.asarray(cstar))
    for a in dev:
        a.block_until_ready()
    print(f"devices {jax.devices()}; ortho {og.height}x{og.width} "
          f"dst {ug.height}x{ug.width}", flush=True)

    variants = [
        ("taploop", lambda *a: kw.orthowarp_taploop(
            *a, method="cubic", row_chunks=64)),
        ("two_pass xla/highest", lambda *a: kw.orthowarp_two_pass(
            *a, cstar_d, method="cubic", precision="highest")),
        ("two_pass xla/high", lambda *a: kw.orthowarp_two_pass(
            *a, cstar_d, method="cubic", precision="high")),
        ("two_pass pallas/highest", lambda *a: kw.orthowarp_two_pass(
            *a, cstar_d, method="cubic", precision="highest",
            backend="pallas")),
        ("two_pass pallas/bf16", lambda *a: kw.orthowarp_two_pass(
            *a, cstar_d, method="cubic", precision="default",
            backend="pallas")),
    ]
    ref = None
    for name, make in variants:
        fn = jax.jit(lambda *a, mk=make: mk(*a)[::13, ::13, ::37])
        try:
            sl = np.asarray(fn(*dev))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        if ref is None:
            ref = sl
        _ = float(jnp.sum(jnp.zeros(8)))
        time.sleep(3.0)
        times = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(fn(*dev))
            times.append(time.time() - t0)
            time.sleep(2.0)
        both = (sl != -9999.0) & (ref != -9999.0)
        rel = (np.abs(sl - ref) / (np.abs(ref) + 1.0))[both]
        print(f"{name}: runs {['%.3f' % t for t in times]} "
              f"rel-err-vs-taploop max {rel.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
