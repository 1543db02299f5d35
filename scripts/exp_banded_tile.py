"""A/B the banded warp kernels' tile geometry on real hardware.

The banded two-pass warp re-reads each source sample ~NB x (window
NB*128 per DT=128 destination samples). Wider destination tiles
amortize the window DMA: (nblk=5, dtile=384) reads ~6.7 B/output vs
the default (3, 128)'s 12 B/output, at the cost of more MXU FLOPs
(wider contraction) and more VMEM. This probe times
pallas_banded_two_pass at granule scale across geometries, checks
feasibility per geometry, and verifies outputs against the default.

Run on the real TPU (one config per process — granule-scale buffers
plus axon's asynchronous frees OOM when configs share a process):
    for cfg in 3,128,32 4,256,32 5,384,16; do \
        BANDED_CONFIG=$cfg python scripts/exp_banded_tile.py; done
Env: HYPERRES_BENCH_SCALE (default 1.0), BANDED_RUNS (default 3),
BANDED_CONFIG="nblk,dtile,group" (default the shipped 3,128,32).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from hyperres.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    scale = float(os.environ.get("HYPERRES_BENCH_SCALE", "1.0"))
    n_runs = int(os.environ.get("BANDED_RUNS", "3"))
    wk = build_workload(scale, "auto", scene_cache=True)
    plan = wk["plan"]

    from hyperres.io.ingest import stream_cube_to_device
    from hyperres.kernels.pallas_ops import (banded_spans_ok,
                                             pallas_banded_two_pass)
    raw = wk["raw"]
    raw_j = stream_cube_to_device(
        lambda b0, b1: raw[..., b0:b1], raw.shape, transfer="u16",
        chunk_bands=32, depth=3)
    raw_j.block_until_ready()
    time.sleep(2.0)

    b = raw.shape[-1]

    @jax.jit
    def make_src_ext(r):
        v = jnp.take(r.reshape(-1, b), plan._flat.reshape(-1),
                     axis=0).reshape(*plan._flat.shape, b)
        valid = plan._valid.astype(jnp.float32)[..., None]
        return jnp.concatenate([v * valid, valid], axis=-1)

    src_ext = make_src_ext(raw_j)
    src_ext.block_until_ready()
    raw_j.delete()
    time.sleep(2.0)
    rows, cstar = plan._wr, plan._cstar
    cstar_np = np.asarray(cstar)
    rows_t_np = np.asarray(rows).T
    print(f"src_ext {src_ext.shape}, out ({rows.shape}, C)", flush=True)

    probe = jax.jit(lambda x: x[::997, ::997])
    nblk, dtile, group = (int(v) for v in os.environ.get(
        "BANDED_CONFIG", "3,128,32").split(","))
    ok = (banded_spans_ok(cstar_np, group=group, nblk=nblk,
                          dtile=dtile)
          and banded_spans_ok(rows_t_np, group=group, nblk=nblk,
                              dtile=dtile))
    tag = f"nblk={nblk} dtile={dtile} group={group}"
    if not ok:
        print(f"{tag:28s}: infeasible (span check)", flush=True)
        return
    jf = jax.jit(lambda s: pallas_banded_two_pass(
        s, rows, cstar, method="cubic", precision="highest",
        group=group, nblk=nblk, dtile=dtile))
    try:
        tc0 = time.perf_counter()
        out = jf(src_ext)
        out.block_until_ready()
        tc = time.perf_counter() - tc0
    except Exception as e:
        print(f"{tag:28s}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return
    chk = float(jnp.nansum(out[::31, ::37]))
    times = []
    for _ in range(n_runs):
        out.delete()
        _ = float(jnp.sum(jnp.zeros(8)))
        time.sleep(1.5)
        t0 = time.perf_counter()
        out = jf(src_ext)
        _ = np.asarray(probe(out))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    print(f"{tag:28s}: {min(times) * 1e3:8.1f} ms  (compile "
          f"{tc:.1f} s; runs {[f'{t * 1e3:.0f}' for t in times]}; "
          f"checksum {chk:.6e})", flush=True)


if __name__ == "__main__":
    main()
