"""Fit-stage micro-profile at full scale: Sinkhorn iteration count at
convergence, sort-based vs histogram-based stretch timing."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from hyperres.kernels.sinkhorn import (sinkhorn_log, sqeuclidean_cdist)
    from hyperres.kernels.stats import (histogram_percentile,
                                        masked_percentile,
                                        shared_percentile_stretch)

    rng = np.random.default_rng(0)

    # --- Sinkhorn convergence at reference parameters ---
    X = rng.random((5000, 3)).astype(np.float32)
    Y = (rng.random((5000, 3)) * 0.8 + 0.1).astype(np.float32)
    M = sqeuclidean_cdist(jnp.asarray(X), jnp.asarray(Y))
    a = jnp.full((5000,), 1 / 5000, jnp.float32)
    b = jnp.full((5000,), 1 / 5000, jnp.float32)
    P, err = sinkhorn_log(a, b, M, 0.05, num_itermax=300, stop_thr=1e-6)
    jax.block_until_ready(P)
    t0 = time.perf_counter()
    P, err = sinkhorn_log(a, b, M, 0.05, num_itermax=300, stop_thr=1e-6)
    jax.block_until_ready(P)
    t_sink = time.perf_counter() - t0
    print(f"sinkhorn 5000^2: {t_sink:.3f}s, final err {float(err):.2e}",
          flush=True)

    # --- stretch: sort vs histogram ---
    img = rng.random((1523, 1550, 3)).astype(np.float32)
    mask = rng.random((1523, 1550)) > 0.3
    img_j = jax.device_put(img)
    mask_j = jax.device_put(mask)
    out = shared_percentile_stretch(img_j, mask_j)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = shared_percentile_stretch(img_j, mask_j)
    jax.block_until_ready(out)
    print(f"sort-based stretch (3ch): {time.perf_counter()-t0:.3f}s",
          flush=True)
    q = histogram_percentile(img_j[..., 0], mask_j,
                             jnp.asarray([2.0, 98.0]))
    jax.block_until_ready(q)
    t0 = time.perf_counter()
    for c in range(3):
        q = histogram_percentile(img_j[..., c], mask_j,
                                 jnp.asarray([2.0, 98.0]))
    jax.block_until_ready(q)
    print(f"histogram percentiles (3ch): {time.perf_counter()-t0:.3f}s",
          flush=True)


if __name__ == "__main__":
    main()
