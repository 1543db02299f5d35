"""Round-4 TPU measurement queue (VERDICT item 3): the staged A/Bs
round 3 could not run through the tunnel outage.

1. SR-predict engines at granule scale (85 Mpx, 10 -> 32 bands):
   fused Pallas kernel vs the batched-fori XLA program (device
   program seconds only — upload/readback are engine-independent).
2. Sampler top_k vs approx_max_k at the OT fit scale (60 m grid,
   ~2.4 Mpx, 5000 samples).

Prints one JSON line. Usage: python scripts/probe_r4.py [--scale 1.0]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, n=3):
    fn()  # warmup / compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hyperres.utils import enable_compilation_cache
    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    res = {}

    # ---- 1. SR predict engines at 85 Mpx ----
    from hyperres.core.config import RidgeSRConfig
    from hyperres.fusion import RidgeSpectralSR
    from hyperres.kernels.lstsq import poly_selector_matrices
    from hyperres.kernels.pallas_ops import pallas_sr_predict_u16

    h = max(64, int(9140 * args.scale))
    w = max(64, int(9309 * args.scale))
    bx, by = 10, 32
    n = h * w
    # n_pad divisible by BOTH the XLA fori batch (512k) and the Pallas
    # tile (8192): the kernel then neither pads nor tail-slices — an
    # eager pad/slice of the 3.4 GB upload OOMs the axon backend
    batch = 512_000
    align = 8_192_000  # lcm(512000, 8192)
    n_pad = -(-n // align) * align
    rng = np.random.default_rng(0)
    Xt = rng.random((200_000, bx)).astype(np.float32)
    Yt = np.clip(0.15 + 0.5 * Xt[:, :1] + 0.2 * Xt[:, 1:2]
                 + 0.05 * rng.random((200_000, by)), 0.01,
                 0.99).astype(np.float32)
    model = RidgeSpectralSR(bx, by,
                            RidgeSRConfig(degree=3, batch_pixels=batch))
    model.fit(Xt, Yt)
    jax.block_until_ready(model.params.W)
    log(f"SR model fitted; predicting {n / 1e6:.1f} Mpx")

    X = rng.random((n_pad, bx), dtype=np.float32)
    valid = np.ones(n_pad, dtype=bool)
    valid[: n // 20] = False
    Xj = jax.device_put(X)
    vj = jax.device_put(valid)
    jax.block_until_ready((Xj, vj))

    p = model.params
    sels, f = poly_selector_matrices(bx, 3, False)
    selsj = tuple(jnp.asarray(sm) for sm in sels)

    def run_pallas():
        q = pallas_sr_predict_u16(Xj, vj, p.x_mean, p.x_std, selsj,
                                  p.W, p.intercept)
        q.block_until_ready()
        return q

    def run_xla():
        q = model._predict_quant_batches(p, Xj, vj, batch)
        q.block_until_ready()
        return q

    # parity on a FRESH 8M-row upload (holding BOTH full-scale u16
    # outputs next to the 3.4 GB input would exceed the HBM budget;
    # and a Pallas call on an eager SLICE of a large uploaded array
    # RESOURCE_EXHAUSTs on the axon backend — isolated repro round 4 —
    # so parity inputs are their own small device arrays)
    n_par = min(8_192_000, n_pad)   # multiple of the 8192-row Pallas
    #                 tile: no pad copy, no eager tail slice (both OOM
    #                 the axon backend at multi-GB residency)
    Xs = jax.device_put(X[:n_par])
    vs = jax.device_put(valid[:n_par])
    del X, valid
    qp = pallas_sr_predict_u16(Xs, vs, p.x_mean, p.x_std, selsj,
                               p.W, p.intercept)
    qx = model._predict_quant_batches(p, Xs, vs, 512_000)
    eq = jax.jit(lambda a, b: (jnp.mean((a == b).all(-1)),
                               jnp.max(jnp.abs(a.astype(jnp.int32)
                                               - b.astype(jnp.int32)))))
    frac_eq, max_dq = (float(x) for x in eq(qp, qx))
    qp.delete()
    qx.delete()
    Xs.delete()
    vs.delete()
    t_pallas = timeit(lambda: run_pallas().delete())
    t_xla = timeit(lambda: run_xla().delete())
    res["sr_predict"] = {
        "mpx": round(n / 1e6, 1),
        "pallas_s": round(t_pallas, 4),
        "xla_s": round(t_xla, 4),
        "speedup": round(t_xla / t_pallas, 2),
        "pallas_px_per_s": round(n / t_pallas),
        "rows_bitexact_frac": round(frac_eq, 6),
        "max_dq_u16": max_dq,
    }
    log(f"SR predict: pallas {t_pallas:.3f}s vs xla {t_xla:.3f}s "
        f"({t_xla / t_pallas:.1f}x); rows equal {frac_eq:.4f}, "
        f"max |dq| {max_dq}")
    Xj.delete()
    vj.delete()

    # ---- 2. sampler top_k vs approx_max_k ----
    from hyperres.fusion.sampling import sample_valid_pixels_device

    hh, ww = max(64, int(1523 * args.scale)), max(64, int(1550 * args.scale))
    img = jnp.asarray(rng.random((hh, ww, 3), dtype=np.float32))
    mask = jnp.asarray(rng.random((hh, ww)) > 0.3)
    key = jax.random.PRNGKey(0)

    for meth in ("exact", "approx"):
        s = jax.jit(lambda i, m, k, _m=meth: sample_valid_pixels_device(
            i, m, 5000, k, method=_m))
        t = timeit(lambda: jax.block_until_ready(s(img, mask, key)))
        res[f"sampler_{meth}_s"] = round(t, 5)
    log(f"sampler: exact {res['sampler_exact_s']}s vs approx "
        f"{res['sampler_approx_s']}s")

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
