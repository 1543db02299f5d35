"""Granule-scale spectral-SR 10 m product benchmark (round-3 verdict
item 6): run ``predict_cube_u16`` at the full 9140x9309x(10 -> 32)
scale on the TPU and report px/s + end-to-end seconds.

The workload is Spectral_matching.ipynb cells 8/27 at real scale: a
degree-3 ridge model mapping 10 S2 bands to 32 EMIT bands in logit
space, evaluated over every valid 10 m pixel and quantized to the u16
product convention — as ONE device program (fori_loop over fixed
200k-px batches; no per-batch host round-trip).

Usage: python scripts/bench_sr_granule.py [--scale 1.0]
Prints a JSON summary line.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--batch", type=int, default=200_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hyperres.utils import enable_compilation_cache
    enable_compilation_cache()

    from hyperres.core.config import RidgeSRConfig
    from hyperres.fusion import RidgeSpectralSR

    h = max(64, int(9140 * args.scale))
    w = max(64, int(9309 * args.scale))
    bx, by = 10, 32
    log(f"devices: {jax.devices()}")
    log(f"scene: {bx} bands x {h}x{w} -> {by} bands "
        f"({h * w / 1e6:.1f} Mpx)")

    rng = np.random.default_rng(0)
    # train on synthetic correlated data (the model's numerics, not its
    # skill, are under test)
    Xt = rng.random((200_000, bx)).astype(np.float32)
    Yt = np.clip(0.15 + 0.5 * Xt[:, :1] + 0.2 * Xt[:, 1:2]
                 + 0.05 * rng.random((200_000, by)), 0.01,
                 0.99).astype(np.float32)
    model = RidgeSpectralSR(bx, by, RidgeSRConfig(degree=3,
                                                  batch_pixels=args.batch))
    t0 = time.perf_counter()
    model.fit(Xt, Yt)
    jax.block_until_ready(model.params.W)
    t_fit = time.perf_counter() - t0
    log(f"fit (200k px, degree 3): {t_fit:.3f}s; "
        f"{model.params.W.shape[0]} features")

    # full-scale 10 m input cube (host f32). Generated blockwise to
    # bound RSS; a few percent of pixels are invalid (nodata swath).
    cube = rng.random((bx, h, w), dtype=np.float32)
    cube[:, : h // 20, :] = np.nan

    # one warm-up at full scale (compile), then timed runs
    log("compiling + warmup ...")
    t0 = time.perf_counter()
    q = model.predict_cube_u16(cube, batch_pixels=args.batch)
    t_warm = time.perf_counter() - t0
    log(f"warmup incl. compile + transfers: {t_warm:.2f}s")

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        q = model.predict_cube_u16(cube, batch_pixels=args.batch)
        times.append(time.perf_counter() - t0)
    e2e = min(times)

    # isolate the device program from the host prep + transfers:
    X = np.nan_to_num(cube.reshape(bx, -1).T)
    n = h * w
    n_pad = -(-n // args.batch) * args.batch
    X = np.pad(X, ((0, n_pad - n), (0, 0)))
    valid = np.ones(n_pad, dtype=bool)
    Xj = jax.device_put(jnp.asarray(X))
    vj = jax.device_put(jnp.asarray(valid))
    jax.block_until_ready(Xj)
    qd = model._predict_quant_batches(model.params, Xj, vj, args.batch)
    qd.block_until_ready()  # warm
    t0 = time.perf_counter()
    qd = model._predict_quant_batches(model.params, Xj, vj, args.batch)
    qd.block_until_ready()
    t_dev = time.perf_counter() - t0

    n_valid = int((q != 65535).all(0).sum())
    out = {
        "metric": "spectral_sr_10m_product",
        "mpx": round(h * w / 1e6, 2),
        "bands_in": bx,
        "bands_out": by,
        "fit_s": round(t_fit, 3),
        "device_program_s": round(t_dev, 4),
        "device_px_per_s": round(h * w / t_dev),
        "e2e_s": round(e2e, 3),
        "e2e_px_per_s": round(h * w / e2e),
        "valid_px": n_valid,
        "batch": args.batch,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
