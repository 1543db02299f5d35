"""Debiased entropic OT (round-4 verdict item 8).

The raw entropic barycentric map contracts targets toward the
reference's mean — the documented pipeline-vs-method PSNR gap is this
shrinkage, faithful to POT at the same reg (s2_emit/color.py:100-104).
``OTConfig(debias=True)`` subtracts the self-transport's contraction
(Sinkhorn-divergence correction): these tests pin that the correction
(a) restores the spread the raw map loses, (b) is identity-preserving
when source == reference, and (c) threads through both fusion engines
with the reference default unchanged.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hyperres.core.config import OTConfig, PolyFusionConfig
from hyperres.core.crs import CRS
from hyperres.core.grid import Grid
from hyperres.kernels.sinkhorn import ot_barycentric_targets


def _targets(X, Y, debias, reg=0.05):
    return np.asarray(ot_barycentric_targets(
        jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32),
        reg=reg, debias=debias))


def test_debias_restores_spread():
    rng = np.random.default_rng(0)
    X = rng.normal(0.5, 0.12, size=(600, 3))
    Y = X + np.array([0.08, -0.05, 0.03])  # same shape, translated
    raw = _targets(X, Y, debias=False)
    deb = _targets(X, Y, debias=True)
    for ch in range(3):
        s_y = Y[:, ch].std()
        assert raw[:, ch].std() < 0.9 * s_y  # the entropic blur is real
        assert abs(deb[:, ch].std() - s_y) < abs(raw[:, ch].std() - s_y)
    # and for a pure translation the debiased map is near-exact
    assert np.abs(deb - Y).mean() < 0.25 * np.abs(raw - Y).mean()


def test_debias_identity_preserving():
    rng = np.random.default_rng(1)
    X = rng.uniform(0.1, 0.9, size=(400, 3))
    deb = _targets(X, X, debias=True)
    raw = _targets(X, X, debias=False)
    assert np.abs(deb - X).max() < 1e-4   # T_XY == T_XX cancels exactly
    assert np.abs(raw - X).mean() > 1e-3  # while the raw map shrinks


@pytest.mark.parametrize("engine", ["fused", "phases"])
def test_debias_through_engines(engine):
    from hyperres.pipeline import fuse_pair

    rng = np.random.default_rng(2)
    utm = CRS.utm(33, True)
    h60, w60 = 36, 40
    emit_grid = Grid(utm, 500000.0, 5800020.0, 60.0, 60.0, w60, h60)
    s2_grid = Grid(utm, 500000.0, 5800020.0, 10.0, 10.0, w60 * 6, h60 * 6)
    from hyperres.testing.scenes import emit_wavelength_grid
    wl, _ = emit_wavelength_grid(48)
    cube = (0.15 + 0.5 * rng.random((h60, w60, 48))).astype(np.float32)
    stack = (0.1 + 0.6 * rng.random((3, h60 * 6, w60 * 6))
             ).astype(np.float32)

    outs = {}
    for debias in (False, True):
        cfg = PolyFusionConfig(ot=OTConfig(n_samples=512, debias=debias))
        res = fuse_pair(cube, wl, emit_grid, stack, s2_grid,
                        config=cfg, engine=engine)
        m = np.asarray(res.matched_60m)
        assert np.isfinite(m[np.isfinite(m)]).all()
        outs[debias] = m
    both = np.isfinite(outs[False]) & np.isfinite(outs[True])
    # the option is live (changes the fit) without breaking the product
    assert np.abs(outs[False][both] - outs[True][both]).max() > 1e-6
    assert np.nanmax(np.abs(outs[True])) <= 1.5
