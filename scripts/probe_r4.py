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

    # ---- 1. SR predict engines at granule scale ----
    from hyperres.core.config import RidgeSRConfig
    from hyperres.fusion import RidgeSpectralSR
    from hyperres.kernels.lstsq import poly_selector_matrices
    from hyperres.kernels.pallas_ops import pallas_sr_predict_u16_cmajor

    h = max(64, int(9140 * args.scale))
    w = max(64, int(9309 * args.scale))
    bx, by = 10, 32
    n = h * w
    # aligned to lcm(fori batch, pallas column tile): the kernels then
    # neither pad nor tail-slice (device pads/slices of multi-GB
    # uploads OOM the axon backend)
    batch = 512_000
    ct = 8_192
    align = 8_192_000  # lcm(512000, 16384)
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

    p = model.params
    sels, f = poly_selector_matrices(bx, 3, False)
    selsj = tuple(jnp.asarray(sm) for sm in sels)

    Xh = rng.random((bx, n_pad), dtype=np.float32)   # channel-major host
    vh = np.ones(n_pad, dtype=np.float32)
    vh[: n // 20] = 0.0

    def build_cm(n_rows):
        X16 = np.zeros((16, n_rows), np.float32)
        X16[:bx] = Xh[:, :n_rows]
        X16[15] = vh[:n_rows]
        return X16

    # parity on an 8.2M-px slice (fresh small uploads)
    n_par = min(align, n_pad)
    Xs16 = jax.device_put(build_cm(n_par))
    qp = pallas_sr_predict_u16_cmajor(Xs16, p.x_mean, p.x_std, selsj,
                                      p.W, p.intercept, tile_cols=ct)
    Xs = jax.device_put(np.ascontiguousarray(Xh[:, :n_par].T))
    vs = jax.device_put(vh[:n_par].astype(bool))
    qx = model._predict_quant_batches(p, Xs, vs, batch)
    eq = jax.jit(lambda a, b: (jnp.mean((a == b).all(0)),
                               jnp.max(jnp.abs(a.astype(jnp.int32)
                                               - b.astype(jnp.int32)))))
    frac_eq, max_dq = (float(x) for x in eq(qp, qx.T))
    for arr in (qp, qx, Xs16, Xs, vs):
        arr.delete()
    log(f"parity ({n_par / 1e6:.1f} Mpx): cols equal {frac_eq:.4f}, "
        f"max |dq| {max_dq}")

    # timing: pallas cmajor (channel-major upload), then XLA
    X16j = jax.device_put(build_cm(n_pad))
    X16j.block_until_ready()

    def run_pallas():
        q = pallas_sr_predict_u16_cmajor(X16j, p.x_mean, p.x_std,
                                         selsj, p.W, p.intercept,
                                         tile_cols=ct)
        q.block_until_ready()
        return q

    t_pallas = timeit(lambda: run_pallas().delete())
    X16j.delete()
    Xj = jax.device_put(np.ascontiguousarray(Xh.T))
    vj = jax.device_put(vh.astype(bool))
    jax.block_until_ready((Xj, vj))
    del Xh, vh

    def run_xla():
        q = model._predict_quant_batches(p, Xj, vj, batch)
        q.block_until_ready()
        return q

    t_xla = timeit(lambda: run_xla().delete())
    Xj.delete()
    vj.delete()
    res["sr_predict"] = {
        "mpx": round(n / 1e6, 1),
        "mpx_timed": round(n_pad / 1e6, 1),
        "pallas_cmajor_s": round(t_pallas, 4),
        "xla_s": round(t_xla, 4),
        "speedup": round(t_xla / t_pallas, 2),
        "pallas_px_per_s": round(n_pad / t_pallas),
        "cols_bitexact_frac": round(frac_eq, 6),
        "max_dq_u16": max_dq,
    }
    log(f"SR predict: pallas-cmajor {t_pallas:.3f}s vs xla "
        f"{t_xla:.3f}s ({t_xla / t_pallas:.1f}x) at {n_pad / 1e6:.0f} "
        f"Mpx")

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
