import numpy as np
import jax.numpy as jnp
import pytest

from hyperres.kernels.pallas_ops import (
    pallas_quantize_u16, pallas_srf_synthesize, srf_synthesize_auto,
)
from hyperres.kernels.srf import build_srf_weight_matrix, srf_synthesize
from hyperres.kernels.stats import quantize_u16
from hyperres.spectral.srf_tables import builtin_srf
from hyperres.testing.scenes import emit_wavelength_grid


def test_pallas_srf_matches_xla(rng):
    wl, good = emit_wavelength_grid(96)
    W, _, _ = build_srf_weight_matrix(wl, builtin_srf("S2A"), good)
    cube = rng.random((17, 23, 96)).astype(np.float32)
    valid = rng.random((17, 23)) > 0.3
    want = np.asarray(srf_synthesize(jnp.asarray(cube), jnp.asarray(W),
                                     jnp.asarray(valid)))
    got_flat = pallas_srf_synthesize(
        jnp.asarray(cube.reshape(-1, 96)), jnp.asarray(W),
        jnp.asarray(valid.reshape(-1)), tile_rows=128)
    got = np.asarray(got_flat).reshape(17, 23, -1)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_pallas_srf_no_mask(rng):
    wl, _ = emit_wavelength_grid(64)
    W, _, _ = build_srf_weight_matrix(wl, builtin_srf("S2A",
                                                      bands=["B2", "B4"]))
    cube = rng.random((40, 64)).astype(np.float32)
    got = np.asarray(pallas_srf_synthesize(jnp.asarray(cube),
                                           jnp.asarray(W), tile_rows=128))
    want = cube @ np.asarray(W)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_srf_synthesize_auto_dispatch(rng):
    wl, _ = emit_wavelength_grid(32)
    W, _, _ = build_srf_weight_matrix(wl, builtin_srf("S2A", bands=["B3"]))
    cube = rng.random((9, 11, 32)).astype(np.float32)
    a = np.asarray(srf_synthesize_auto(jnp.asarray(cube), jnp.asarray(W),
                                       use_pallas=False))
    b = np.asarray(srf_synthesize_auto(jnp.asarray(cube), jnp.asarray(W),
                                       use_pallas=True))
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)


def test_pallas_quantize_matches_xla(rng):
    x = rng.random((300, 7)).astype(np.float32) * 1.4 - 0.2
    valid = rng.random((300, 7)) > 0.2
    want = np.asarray(quantize_u16(jnp.asarray(x), 0.0, 1.0,
                                   jnp.asarray(valid), nodata_u16=0))
    got = np.asarray(pallas_quantize_u16(jnp.asarray(x), 0.0, 1.0,
                                         jnp.asarray(valid), nodata_u16=0,
                                         tile_rows=128))
    np.testing.assert_array_equal(got, want)
