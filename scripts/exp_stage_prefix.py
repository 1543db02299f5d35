"""Attribute the fused-plan end-to-end time by timing DCE'd prefixes.

The MFU audit (docs/BENCHMARK.md) sums the *standalone* stage numbers
to ~218 ms against a measured ~341-377 ms end-to-end. This probe times
jitted programs that return only a PREFIX of the full program's
outputs, so XLA dead-code-eliminates everything downstream;
consecutive differences attribute wall-clock to stages as they run
inside the fused program (same scheduler, same layouts, same fusion
opportunities — unlike standalone per-stage microbenches).

Each prefix runs in its OWN process (the axon backend frees
asynchronously; stacking six granule-scale programs in one process
OOMs even though each fits). The persistent compile cache makes the
per-process compile a one-time cost.

Run on the real TPU:
    for p in noop P0 P1 P2 P3 P4 P5; do PREFIX=$p python scripts/exp_stage_prefix.py; done
Env: HYPERRES_BENCH_SCALE (default 1.0), PREFIX_RUNS (default 3).
All timings include one tunnel round trip (tiny strided readback, same
as bench.py) — subtract the 'noop' row to compare stages.
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
    which = os.environ.get("PREFIX", "P5")
    scale = float(os.environ.get("HYPERRES_BENCH_SCALE", "1.0"))
    n_runs = int(os.environ.get("PREFIX_RUNS", "3"))
    probe = jax.jit(lambda x: x[::997, ::997])

    if which == "noop":
        tiny = jax.jit(lambda x: x * 2.0)
        z = jnp.zeros((8, 8))
        _ = np.asarray(tiny(z))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(tiny(z))
            ts.append(time.perf_counter() - t0)
        print(f"noop        : {min(ts) * 1e3:8.1f} ms  "
              f"(runs {[f'{t * 1e3:.0f}' for t in ts]})", flush=True)
        return

    wk = build_workload(scale, "auto", scene_cache=True)
    plan = wk["plan"]
    f = plan._fusion
    st = f.statics
    warp = plan.warp_statics

    from hyperres.io.ingest import stream_cube_to_device
    raw = wk["raw"]
    raw_j = stream_cube_to_device(
        lambda b0, b1: raw[..., b0:b1], raw.shape, transfer="u16",
        chunk_bands=32, depth=3)
    raw_j.block_until_ready()
    s2_dn_j = jax.device_put(wk["s2_dn"])
    s2_j = plan.prepare_s2(s2_dn_j)
    jax.block_until_ready(s2_j)
    s2_dn_j.delete()
    time.sleep(3.0)  # let async ingest staging frees land (axon)
    key = jax.random.PRNGKey(1)

    from hyperres.core.constants import NO_DATA_VALUE
    from hyperres.fusion.fused import _fusion_core, _phase2_s2_60
    from hyperres.kernels.srf import srf_synthesize
    from hyperres.kernels.stats import shared_percentile_stretch
    from hyperres.kernels.warp import orthowarp_two_pass

    def warp_stage(raw):
        return orthowarp_two_pass(
            raw, plan._flat, plan._valid, plan._wr, plan._wc,
            plan._cstar, method=warp.resampling, fill=NO_DATA_VALUE,
            backend=warp.backend, banded_group=warp.banded_group)

    # Outputs accumulate: every prefix also materializes everything the
    # previous one did (utm_cube is a real output of the full program,
    # so it is included from P0 on).
    def p0(raw, s2, key):
        return {"utm_cube": warp_stage(raw)}

    def p1(raw, s2, key):
        utm = warp_stage(raw)
        return {"utm_cube": utm,
                "synth": srf_synthesize(utm, f._Wsrf, fast=True)}

    def p2(raw, s2, key):
        out = p1(raw, s2, key)
        out["s2_60"] = _phase2_s2_60(st, s2, f._Wr60, f._Wc60)
        return out

    def _common(raw, s2):
        utm = warp_stage(raw)
        synth = srf_synthesize(utm, f._Wsrf, fast=True)
        valid60 = (jnp.isfinite(synth).all(axis=-1)
                   & (synth[..., 0] > 0)
                   & (utm[..., 0] != st.emit_nodata))
        s2_60 = _phase2_s2_60(st, s2, f._Wr60, f._Wc60)
        valid60 = valid60 & jnp.isfinite(s2_60).all(axis=-1)
        return utm, synth, s2_60, valid60

    def p3(raw, s2, key):
        utm, synth, s2_60, valid60 = _common(raw, s2)
        emit_n = shared_percentile_stretch(synth[..., ::-1], valid60,
                                           st.pmin, st.pmax)
        s2_n = shared_percentile_stretch(s2_60[..., ::-1], valid60,
                                         st.pmin, st.pmax)
        return {"utm_cube": utm, "synth": synth, "s2_60": s2_60,
                "emit_n": emit_n, "s2_n": s2_n}

    def p4(raw, s2, key):
        utm, synth, s2_60, valid60 = _common(raw, s2)
        from hyperres.fusion.sampling import sample_valid_pixels_device
        from hyperres.kernels.lstsq import polyfit
        from hyperres.kernels.sinkhorn import ot_barycentric_targets
        emit_n = shared_percentile_stretch(synth[..., ::-1], valid60,
                                           st.pmin, st.pmax)
        s2_n = shared_percentile_stretch(s2_60[..., ::-1], valid60,
                                         st.pmin, st.pmax)
        k1, k2 = jax.random.split(key)
        Xs, wxs = sample_valid_pixels_device(emit_n, valid60,
                                             st.ot.n_samples, k1)
        Ys, wys = sample_valid_pixels_device(s2_n, valid60,
                                             st.ot.n_samples, k2)
        Xs = jnp.where(wxs[:, None] > 0, Xs, 0.0)
        Ys = jnp.where(wys[:, None] > 0, Ys, 0.0)
        Ybar = ot_barycentric_targets(
            Xs, Ys, reg=st.ot.reg, num_itermax=st.ot.num_itermax,
            stop_thr=st.ot.stop_thr, wx=wxs, wy=wys)
        coeffs = jnp.stack([polyfit(Xs[:, ch], Ybar[:, ch], st.degree,
                                    w=wxs) for ch in range(3)])
        return {"utm_cube": utm, "synth": synth, "s2_60": s2_60,
                "emit_n": emit_n, "s2_n": s2_n, "coeffs": coeffs}

    def p5(raw, s2, key):  # the full shipped program body
        utm = warp_stage(raw)
        out = _fusion_core(st, utm, s2, f._Wsrf, f._Wr60, f._Wc60,
                           f._Wr10, f._Wc10, key)
        out["utm_cube"] = utm
        return out

    fn = {"P0": p0, "P1": p1, "P2": p2, "P3": p3, "P4": p4, "P5": p5}[which]
    jf = jax.jit(fn)
    tc0 = time.perf_counter()
    out = jf(raw_j, s2_j, key)
    jax.block_until_ready(out)
    tc = time.perf_counter() - tc0
    times = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        out = jf(raw_j, s2_j, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
        _ = np.asarray(probe(out["utm_cube"]))
        times.append(time.perf_counter() - t0)
    print(f"{which:12s}: {min(times) * 1e3:8.1f} ms  "
          f"(compile+warm {tc:.1f} s; runs "
          f"{[f'{t * 1e3:.0f}' for t in times]})", flush=True)


if __name__ == "__main__":
    main()
