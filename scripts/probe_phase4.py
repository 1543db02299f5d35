"""Standalone timed probe of fused-program PHASE 4: the 60 m -> 10 m
bilinear upsample + polynomial apply epilogue (demo nb cell 81 phase 4 /
s2_emit/poly_regression.py:65-84 semantics).

Round-4 verdict: phase 4 was the single largest stage after the warp
(~60 ms) yet only ever measured BY SUBTRACTION ("residual estimate",
docs/BENCHMARK.md MFU table) — this gives it the same dedicated-probe
treatment the banded warp got. Each variant is one jitted program at
the exact full-granule bench geometry (UTM 60 m 1523x1550 -> 10 m
9140x9309, integer 6x anchored grids), timed post-compile min-of-N on
the real chip.

Variants:
  cminor          the (H, W, C)-throughout path (up_layout="cminor")
  cmajor          the shipped default: channel-major upsample + Horner,
                  transpose to (H, W, 3) at the end (up_layout="cmajor")
  cmajor_notrans  cmajor minus the final (3,H,W)->(H,W,3) moveaxis —
                  isolates the output-transpose cost
  up_only         the bare valid-renormalised upsample (no polyval/mask
                  epilogue) — isolates interpolation vs epilogue
  pallas          fused single-kernel upsample+polyval+mask
                  (kernels.pallas_ops.pallas_phase4_cmajor), if present

Usage: python scripts/probe_phase4.py [--scale 1.0] [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hyperres.utils import enable_compilation_cache
    enable_compilation_cache()

    from hyperres.core.crs import CRS
    from hyperres.core.grid import Grid
    from hyperres.kernels.lstsq import polyval_channels, polyval_channels_cmajor
    from hyperres.kernels.warp import (
        separable_fast_spec, separable_resample_fast,
        separable_resample_fast_cmajor,
    )

    # the exact bench geometry (BENCH_r04: UTM 60 m 1523x1550, 10 m
    # 9140x9309, shared origin, integer 6x)
    h60 = max(32, int(1523 * args.scale))
    w60 = max(32, int(1550 * args.scale))
    h10 = h60 * 6 + 2
    w10 = w60 * 6 + 9
    utm = CRS.utm(33, True)
    g60 = Grid(utm, 399960.0, 5800020.0, 60.0, 60.0, w60, h60)
    g10 = Grid(utm, 399960.0, 5800020.0, 10.0, 10.0, w10, h10)

    def axes64(src, dst):
        xs, ys = dst.pixel_center_coords()
        cols, _ = src.colrow_of(xs, src.y0)
        _, rows = src.colrow_of(src.x0, ys)
        return np.asarray(rows, np.float64), np.asarray(cols, np.float64)

    u64 = axes64(g60, g10)
    fr = separable_fast_spec(u64[0], h60, "bilinear")
    fc = separable_fast_spec(u64[1], w60, "bilinear")
    assert fr is not None and fc is not None, "fast spec must hold"
    print(f"grids: 60m {h60}x{w60} -> 10m {h10}x{w10} "
          f"({h10 * w10 / 1e6:.1f} Mpx, x3 channels "
          f"{h10 * w10 * 3 * 4 / 1e9:.2f} GB out)", file=sys.stderr)

    rng = np.random.default_rng(0)
    emit_n = rng.random((h60, w60, 3)).astype(np.float32)
    valid = np.ones((h60, w60), bool)
    valid[: h60 // 8] = False          # an invalid swath like real scenes
    valid[:, : w60 // 10] = False
    coeffs = np.array([[-0.065, -0.261, 0.657, 0.566, 0.072],
                       [0.029, -0.419, 0.691, 0.607, 0.060],
                       [0.279, -0.978, 1.115, 0.484, 0.070]], np.float32)

    emit_j = jax.device_put(jnp.asarray(emit_n))
    emit_cm_j = jax.device_put(jnp.moveaxis(jnp.asarray(emit_n), -1, 0))
    valid_j = jax.device_put(jnp.asarray(valid))
    coeffs_j = jax.device_put(jnp.asarray(coeffs))

    # ---- variants (mirroring fusion/fused.py _fusion_core phase 4) ----
    @jax.jit
    def v_cminor(emit_n, valid60, params):
        sim10 = separable_resample_fast(emit_n, fr, fc, fill=jnp.nan,
                                        valid_mask=valid60)
        mask10 = jnp.isfinite(sim10).all(axis=-1)
        mapped10 = jnp.clip(polyval_channels(params,
                                             jnp.nan_to_num(sim10)),
                            0.0, 1.0)
        return jnp.where(mask10[..., None], mapped10, jnp.nan)

    def cmajor_body(emit_cm, valid60, params):
        sim10_cm = separable_resample_fast_cmajor(
            emit_cm, fr, fc, fill=jnp.nan, valid_mask=valid60)
        mask10 = jnp.isfinite(sim10_cm).all(axis=0)
        val = polyval_channels_cmajor(params, jnp.nan_to_num(sim10_cm))
        return jnp.where(mask10[None], jnp.clip(val, 0.0, 1.0),
                         jnp.nan)

    @jax.jit
    def v_cmajor(emit_cm, valid60, params):
        return jnp.moveaxis(cmajor_body(emit_cm, valid60, params), 0, -1)

    @jax.jit
    def v_cmajor_notrans(emit_cm, valid60, params):
        return cmajor_body(emit_cm, valid60, params)

    @jax.jit
    def v_up_only(emit_cm, valid60):
        return separable_resample_fast_cmajor(
            emit_cm, fr, fc, fill=jnp.nan, valid_mask=valid60)

    variants = {
        "cminor": lambda: v_cminor(emit_j, valid_j, coeffs_j),
        "cmajor": lambda: v_cmajor(emit_cm_j, valid_j, coeffs_j),
        "cmajor_notrans": lambda: v_cmajor_notrans(emit_cm_j, valid_j,
                                                   coeffs_j),
        "up_only": lambda: v_up_only(emit_cm_j, valid_j),
    }

    try:
        from hyperres.kernels.pallas_ops import pallas_phase4
        @jax.jit
        def v_pallas(emit_cm, valid60, params):
            return pallas_phase4(emit_cm, valid60, params, fr, fc)
        variants["pallas"] = lambda: v_pallas(emit_cm_j, valid_j,
                                              coeffs_j)
    except ImportError:
        print("pallas_phase4 not available; skipping", file=sys.stderr)

    results = {}
    ref = None
    for name, fn in variants.items():
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        tbest = min(times)
        results[name] = tbest
        extra = ""
        if name == "cminor":
            ref = np.asarray(out)
        elif name in ("cmajor", "pallas") and ref is not None:
            got = np.asarray(out)
            both = np.isfinite(ref) & np.isfinite(got)
            err = float(np.abs(np.where(both, ref - got, 0.0)).max())
            samemask = bool((np.isfinite(ref) == np.isfinite(got)).all())
            extra = f"  max|err| vs cminor {err:.2e} mask_match={samemask}"
        if hasattr(out, "delete"):
            out.delete()
        print(f"{name:>15}: {tbest * 1e3:8.2f} ms  "
              f"(compile+first {t_compile:.1f}s){extra}", file=sys.stderr)
    print(results)


if __name__ == "__main__":
    main()
