"""Probe: batch the banded pass-1 k-loop into one dot_general per step.

The shipped banded kernels issue `group` sequential (DT, W)x(W, C)
dots per grid step; measurements (exp_banded_tile.py) show the kernels
are bound by per-dot overhead, not MXU throughput or window DMA. This
probe times a pass-1 variant whose kernel builds the (RG, DT, W)
weight tensor and runs ONE batched dot_general per window block, with
one full-block output write instead of RG strided writes.

Run on the real TPU:  python scripts/exp_banded_batch.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from hyperres.utils import enable_compilation_cache
from hyperres.kernels.pallas_ops import (
    _BANDED_DTILE, _BANDED_NBLK, _BANDED_WBLK, _banded_compiler_params,
    _banded_pass1, _banded_profile, _round_up,
)


def banded_pass1_batched(src, pos, method="cubic", group=32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, s, c = src.shape
    d = pos.shape[1]
    W, NB, DT = _BANDED_WBLK, _BANDED_NBLK, _BANDED_DTILE
    RG = int(group)
    s_pad = _round_up(max(s, NB * W), W)
    d_pad = _round_up(d, DT)
    n_pad = _round_up(n, RG)
    if s_pad != s or n_pad != n:
        src = jnp.pad(src, ((0, n_pad - n), (0, s_pad - s), (0, 0)))
    if d_pad != d or n_pad != n:
        pos = jnp.pad(pos, ((0, n_pad - n), (0, d_pad - d)),
                      constant_values=1e6)
    starts = jnp.clip(
        jnp.floor((pos.reshape(n_pad // RG, RG, d_pad // DT, DT)
                   .min((1, 3)) - 2.5) / W),
        0, s_pad // W - NB).astype(jnp.int32)
    profile = _banded_profile(method)

    def kernel(st_ref, pos_ref, *refs):
        i = pl.program_id(0)
        j = pl.program_id(1)
        s_refs, o_ref = refs[:-1], refs[-1]
        s0 = (st_ref[i, j] * W).astype(jnp.float32)
        acc = None
        p = pos_ref[...]  # (RG, DT)
        for nb, s_ref in enumerate(s_refs):
            offs = jax.lax.broadcasted_iota(
                jnp.int32, (RG, DT, W), 2).astype(jnp.float32) + (
                    s0 + nb * W)
            w = profile(p[:, :, None] - offs)        # (RG, DT, W)
            dd = jax.lax.dot_general(
                w, s_ref[...],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (RG, DT, C)
            acc = dd if acc is None else acc + dd
        o_ref[...] = acc

    def _spec(nb):
        return pl.BlockSpec((RG, W, c),
                            lambda i, j, st, nb=nb: (i, st[i, j] + nb, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // RG, d_pad // DT),
        in_specs=[pl.BlockSpec((RG, DT), lambda i, j, st: (i, j))]
        + [_spec(nb) for nb in range(NB)],
        out_specs=pl.BlockSpec((RG, DT, c), lambda i, j, st: (i, j, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad, c), jnp.float32),
        compiler_params=_banded_compiler_params(
            window_bytes=RG * NB * W * c * 4,
            out_bytes=RG * DT * c * 4),
        interpret=False)(starts, pos, *([src] * NB))


def main():
    enable_compilation_cache()
    wk = build_workload(1.0, "auto", scene_cache=True)
    plan = wk["plan"]
    raw = wk["raw"]
    b = raw.shape[-1]
    from hyperres.io.ingest import stream_cube_to_device
    raw_j = stream_cube_to_device(
        lambda b0, b1: raw[..., b0:b1], raw.shape, transfer="u16",
        chunk_bands=32, depth=3)
    raw_j.block_until_ready()

    @jax.jit
    def mk_src(r):
        v = jnp.take(r.reshape(-1, b), plan._flat.reshape(-1), axis=0)
        v = v.reshape(*plan._flat.shape, b)
        valid = plan._valid.astype(jnp.float32)[..., None]
        return jnp.concatenate([v * valid, valid], axis=-1)

    src_ext = mk_src(raw_j)
    src_ext.block_until_ready()
    raw_j.delete()
    time.sleep(2)
    cstar = plan._cstar
    probe = jax.jit(lambda x: x[::997, ::997])

    def bench(tag, fn):
        jf = jax.jit(fn)
        try:
            out = jf(src_ext)
            out.block_until_ready()
        except Exception as e:
            print(f"{tag:24s}: FAILED {str(e)[:600]}", flush=True)
            return None
        chk = float(jnp.nansum(out[::31, ::37]))
        ts = []
        for _ in range(3):
            out.delete()
            _ = float(jnp.sum(jnp.zeros(8)))
            time.sleep(1.5)
            t0 = time.perf_counter()
            out = jf(src_ext)
            _ = np.asarray(probe(out))
            out.block_until_ready()
            ts.append(time.perf_counter() - t0)
        out.delete()
        _ = float(jnp.sum(jnp.zeros(8)))
        time.sleep(1.5)
        print(f"{tag:24s}: {min(ts)*1e3:7.1f} ms  checksum {chk:.6e}",
              flush=True)

    bench("pass1 k-loop (shipped)",
          lambda s: _banded_pass1(s, cstar, "cubic", "highest", False,
                                  group=32))
    bench("pass1 batched dot",
          lambda s: banded_pass1_batched(s, cstar, group=32))


if __name__ == "__main__":
    main()
