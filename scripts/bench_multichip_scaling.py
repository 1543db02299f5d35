"""Multi-device SPMD overhead/scaling sweep on a virtual CPU mesh.

Runs the two production SPMD programs — the sharded two-pass scanline
orthowarp and the data-parallel ridge training step — at a FIXED total
problem size over 1/2/4/8 virtual CPU devices and reports post-compile
wall-clock per step.

Read the result for what this environment can measure: the driver
provides one real TPU chip, and this host exposes a single CPU core, so
virtual devices add no compute — the curve isolates the COST of the SPMD
decomposition (partitioning + halo exchange + psum) at constant work.
Flat time across mesh sizes means the decomposition itself is cheap and
real multi-chip speedup is bounded by hardware, not by the program
structure. Correctness of the decompositions is covered by
tests/test_tiling_parallel.py and the driver dryrun.

Each mesh size runs in a fresh subprocess (the JAX backend must be
configured before first device touch).

Usage: python scripts/bench_multichip_scaling.py [--json out.json]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
n = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={n}")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", n)
import numpy as np
import jax.numpy as jnp
from hyperres.core.config import RidgeSRConfig
from hyperres.fusion import RidgeSpectralSR
from hyperres.kernels.glt import prepare_glt
from hyperres.kernels.warp import scanline_cstar
from hyperres.parallel import make_mesh, sharded_orthowarp_two_pass
from hyperres.parallel.ops import data_parallel_ridge_fit

rng = np.random.default_rng(0)
mesh = make_mesh((n,), ("data",), devices=jax.devices()[:n])

def timeit(fn, reps=3):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps

# ---- sharded two-pass orthowarp: fixed total 384x384x16 ----
ho = wo = hd = wd = 384
hr, wr, nb = 256, 260, 16
glt = np.zeros((ho, wo, 2), np.int32)
glt[..., 0] = rng.integers(1, wr + 1, (ho, wo))
glt[..., 1] = rng.integers(1, hr + 1, (ho, wo))
flat_idx, vmask = prepare_glt(glt, (hr, wr))
raw = rng.random((hr, wr, nb), dtype=np.float64).astype(np.float32)
r = np.arange(hd, dtype=np.float32)[:, None]
j = np.arange(wd, dtype=np.float32)[None, :]
wrows = (r * (ho / hd) + 0.002 * j) + 0 * j
wcols = (j * (wo / wd) + 0.001 * r) + 0 * r
cstar = scanline_cstar(wrows, wcols, ho)
fi, vm = jnp.asarray(flat_idx), jnp.asarray(vmask)
rawd = jnp.asarray(raw)
wrd, wcd, csd = jnp.asarray(wrows), jnp.asarray(wcols), jnp.asarray(cstar)

def warp_step():
    out = sharded_orthowarp_two_pass(rawd, fi, vm, wrd, wcd, csd, mesh,
                                     halo=48)
    jax.block_until_ready(out)

t_warp = timeit(warp_step)

# ---- data-parallel ridge fit: fixed total 65536 x 10 -> 32 ----
N, bx, by = 1 << 16, 10, 32
X = rng.random((N, bx), dtype=np.float64).astype(np.float32)
Y = np.clip(0.2 + 0.4 * X[:, :1] + 0.1
            * rng.random((N, by)).astype(np.float32), 0.01, 0.99)
model = RidgeSpectralSR(bx, by, RidgeSRConfig(degree=3))
Xd, Yd = jnp.asarray(X), jnp.asarray(Y)

def fit_step():
    params = data_parallel_ridge_fit(model, Xd, Yd, mesh)
    jax.block_until_ready(params.W)

t_fit = timeit(fit_step)
print(json.dumps({"n_devices": n, "orthowarp_s": round(t_warp, 4),
                  "ridge_fit_s": round(t_fit, 4)}))
""".replace("json.dumps", "__import__('json').dumps")


def main():
    results = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run([sys.executable, "-c", CHILD, str(n)],
                             capture_output=True, text=True, env=env,
                             cwd=REPO, timeout=1200)
        if out.returncode != 0:
            print(f"n={n} FAILED:\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        line = out.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        results.append(rec)
        print(line)
    if "--json" in sys.argv:
        dst = sys.argv[sys.argv.index("--json") + 1]
        with open(dst, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
