import numpy as np
import jax.numpy as jnp
import pytest

from hyperres.core.config import OTConfig, RidgeSRConfig
from hyperres.fusion import (
    apply_affine, apply_poly, calibrate_linear, fit_ot_affine, fit_ot_poly,
    flatten_pixels, histogram_match_rgb, ot_match_rgb_sinkhorn,
    RidgeSpectralSR,
)


def make_pair(rng, h=60, w=70, shift=0.15, gain=0.8):
    """src/ref RGB pairs related by a monotone map, plus a mask."""
    src = rng.random((h, w, 3)).astype(np.float32) * 0.7 + 0.1
    ref = np.clip(gain * src + shift, 0, 1).astype(np.float32)
    mask = rng.random((h, w)) > 0.2
    return src, ref, mask


# -------------------------------------------------------------- linear ----

def test_calibrate_linear_recovers_gain_offset(rng):
    pseudo = rng.random((3, 40, 50)).astype(np.float32) * 0.5 + 0.2
    a_true = [1.3, 0.9, 1.1]
    b_true = [0.02, -0.01, 0.05]
    real = np.stack([a_true[k] * pseudo[k] + b_true[k] for k in range(3)])
    valid = np.ones((40, 50), dtype=bool)
    corrected, params = calibrate_linear(pseudo, real, valid)
    for k in range(3):
        assert abs(params[k][0] - a_true[k]) < 1e-3
        assert abs(params[k][1] - b_true[k]) < 1e-3
    np.testing.assert_allclose(corrected, real, atol=1e-3)


def test_calibrate_linear_identity_fallback(rng):
    pseudo = rng.random((1, 10, 10)).astype(np.float32)
    real = pseudo * 2.0
    valid = np.zeros((10, 10), dtype=bool)
    valid[0, :5] = True  # 5 < 50 samples
    corrected, params = calibrate_linear(pseudo, real, valid)
    assert params[0] == (1.0, 0.0)
    np.testing.assert_allclose(corrected, pseudo, atol=1e-6)


# ----------------------------------------------------------- histogram ----

def test_histogram_match_shifts_distribution(rng):
    src, ref, mask = make_pair(rng)
    out = histogram_match_rgb(src, ref, mask)
    assert out.shape == src.shape
    for c in range(3):
        # matched distribution quantiles align with the reference's
        got_q = np.percentile(out[..., c][mask], [25, 50, 75])
        ref_q = np.percentile(ref[..., c][mask], [25, 50, 75])
        np.testing.assert_allclose(got_q, ref_q, atol=0.02)
    # outside the mask: untouched (up to the final clip)
    np.testing.assert_allclose(out[~mask], np.clip(src[~mask], 0, 1),
                               atol=1e-6)


def test_histogram_match_identity(rng):
    src, _, mask = make_pair(rng)
    out = histogram_match_rgb(src, src, mask)
    np.testing.assert_allclose(out[mask], src[mask], atol=5e-3)


def test_histogram_match_cross_shape_reference(rng):
    """The reference distribution may come from a different raster/mask
    than the source (the 10 m apply matching against the 60 m stretched
    reference)."""
    src = rng.random((60, 62, 3)).astype(np.float32)
    ref = np.clip(0.3 + 0.2 * rng.standard_normal((20, 21, 3)), 0, 1
                  ).astype(np.float32)
    src_mask = rng.random((60, 62)) > 0.2
    ref_mask = rng.random((20, 21)) > 0.3
    out = histogram_match_rgb(src, ref, src_mask, ref_mask=ref_mask)
    assert out.shape == src.shape
    for c in range(3):
        got_q = np.percentile(out[..., c][src_mask], [25, 50, 75])
        ref_q = np.percentile(ref[..., c][ref_mask], [25, 50, 75])
        np.testing.assert_allclose(got_q, ref_q, atol=0.03)
    np.testing.assert_allclose(out[~src_mask],
                               np.clip(src[~src_mask], 0, 1), atol=1e-6)


# ------------------------------------------------------------------ OT ----

def test_ot_affine_recovers_affine_map(rng):
    """With small entropic reg the OT barycentric map recovers the true
    affine relation. (At the reference default reg=0.05 the plan is
    diffuse and shrinks the gain toward the mean — an inherent Sinkhorn
    property shared with POT, covered by the next test.)"""
    src, ref, mask = make_pair(rng, shift=0.1, gain=0.85)
    A, t = fit_ot_affine(src, ref, mask,
                         OTConfig(n_samples=3000, reg=0.003,
                                  num_itermax=2000))
    np.testing.assert_allclose(np.diag(A), [0.85] * 3, atol=0.03)
    np.testing.assert_allclose(t, [0.1] * 3, atol=0.03)
    out = apply_affine(src, A, t, mask)
    np.testing.assert_allclose(out[mask], ref[mask], atol=0.04)


def test_ot_match_rgb_full_path(rng):
    src, ref, mask = make_pair(rng)
    out = ot_match_rgb_sinkhorn(src, ref, mask, n_samples=600)
    err_before = np.abs(src[mask] - ref[mask]).mean()
    err_after = np.abs(out[mask] - ref[mask]).mean()
    # reg=0.05 (reference default) leaves entropic shrinkage; expect a
    # clear improvement, not exact recovery
    assert err_after < 0.75 * err_before
    # means align closely after matching
    np.testing.assert_allclose(out[mask].mean(0), ref[mask].mean(0),
                               atol=0.03)
    # unmasked pixels unchanged
    np.testing.assert_array_equal(out[~mask], src[~mask])


def test_ot_match_too_few_pixels_returns_copy(rng):
    src, ref, _ = make_pair(rng, h=4, w=4)
    mask = np.zeros((4, 4), dtype=bool)
    out = ot_match_rgb_sinkhorn(src, ref, mask)
    np.testing.assert_array_equal(out, src)


def test_ot_poly_identity_fallback(rng):
    src, ref, _ = make_pair(rng, h=8, w=8)
    mask = np.zeros((8, 8), dtype=bool)
    mask[0, :4] = True  # < 200 pixels
    coeffs = fit_ot_poly(src, ref, mask, deg=3)
    assert coeffs.shape == (3, 4)
    np.testing.assert_array_equal(coeffs[:, -2], np.ones(3))
    np.testing.assert_array_equal(coeffs[:, -1], np.zeros(3))
    # identity coeffs applied = clip(x)
    out = apply_poly(src, coeffs)
    np.testing.assert_allclose(out, np.clip(src, 0, 1), atol=1e-5)


def test_ot_poly_learns_nonlinear_map(rng):
    src = rng.random((80, 90, 3)).astype(np.float32)
    ref = np.clip(src ** 2 * 0.8 + 0.1, 0, 1).astype(np.float32)  # curved
    mask = np.ones((80, 90), dtype=bool)
    coeffs = fit_ot_poly(src, ref, mask, deg=4,
                         cfg=OTConfig(n_samples=1500))
    out = apply_poly(src, coeffs, mask)
    err = np.abs(out - ref).mean()
    assert err < 0.03


def test_apply_poly_masked_passthrough(rng):
    src, _, mask = make_pair(rng)
    coeffs = np.array([[2.0, 0.0], [2.0, 0.0], [2.0, 0.0]])
    out = apply_poly(src, coeffs, mask)
    np.testing.assert_allclose(out[~mask], np.clip(src[~mask], 0, 1),
                               atol=1e-6)
    np.testing.assert_allclose(out[mask], np.clip(2 * src[mask], 0, 1),
                               atol=1e-5)


# ----------------------------------------------------------- ridge SR -----

def test_flatten_pixels_filters(rng):
    X = rng.random((4, 10, 12)).astype(np.float32)
    Y = rng.random((6, 10, 12)).astype(np.float32)
    X[0, 0, 0] = np.nan
    Y[2, 3, 4] = -9999.0
    Xf, Yf = flatten_pixels(X, Y, y_nodata=-9999.0)
    assert Xf.shape[1] == 4 and Yf.shape[1] == 6
    assert Xf.shape[0] == 10 * 12 - 2
    assert np.isfinite(Xf).all() and np.isfinite(Yf).all()


def test_ridge_sr_matches_sklearn_pipeline(rng):
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import PolynomialFeatures, StandardScaler
    from sklearn.linear_model import Ridge

    n, bx, by = 3000, 5, 8
    X = rng.random((n, bx)).astype(np.float32)
    W = rng.normal(size=(bx, by)).astype(np.float32) * 0.4
    Y_lin = X @ W + 0.1 * rng.normal(size=(n, by)).astype(np.float32)
    Y = 1.0 / (1.0 + np.exp(-Y_lin))  # targets in (0, 1)

    model = RidgeSpectralSR(bx, by, RidgeSRConfig(degree=3, alpha=1.0))
    model.fit(X, Y)
    got = model.predict(X)

    eps = 1e-4
    Yl = np.log(np.clip(Y, eps, 1 - eps) / (1 - np.clip(Y, eps, 1 - eps)))
    sk = Pipeline([
        ("scaler", StandardScaler()),
        ("poly", PolynomialFeatures(degree=3, include_bias=False)),
        ("ridge", Ridge(alpha=1.0)),
    ]).fit(X, Yl)
    want = 1.0 / (1.0 + np.exp(-np.clip(sk.predict(X), -50, 50)))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-3)

    r2, rmse = model.evaluate(X, Y)
    assert r2.shape == (by,)
    assert np.all(r2 > 0.5)


def test_ridge_sr_predict_cube_nodata(rng):
    bx, by = 4, 6
    X = rng.random((5000, bx)).astype(np.float32)
    Y = np.clip(0.2 + 0.5 * X[:, :1] + 0.1 * rng.random((5000, by)),
                0.01, 0.99).astype(np.float32)
    model = RidgeSpectralSR(bx, by, RidgeSRConfig(degree=2)).fit(X, Y)
    cube = rng.random((bx, 20, 25)).astype(np.float32)
    cube[:, 3, 4] = 0.0  # nodata pixel
    pred = model.predict_cube(cube, nodata=0.0, batch_pixels=128)
    assert pred.shape == (by, 20, 25)
    assert np.all(np.isnan(pred[:, 3, 4]))
    valid = ~np.isnan(pred[0])
    assert valid.sum() == 20 * 25 - 1
    assert np.nanmin(pred) >= 0.0 and np.nanmax(pred) <= 1.0


def test_fuse_pair_phases_scales_nodata(rng):
    """Phase 2's nodata compare must happen in the SAME units as the
    scaled S2 data: with nodata=65535 and s2_scale=1e-4 the raw sentinel
    never matches scaled values, so nodata pixels silently entered the
    60 m average (the fused engine already scaled it)."""
    from hyperres.core.crs import CRS
    from hyperres.core.grid import Grid
    from hyperres.pipeline import fuse_pair
    from hyperres.testing.scenes import emit_wavelength_grid

    wl, good = emit_wavelength_grid(48)
    utm = CRS.utm(33, True)
    emit_grid = Grid(utm, 399960.0, 5800020.0, 60.0, 60.0, 24, 24)
    s2_grid = Grid(utm, 399960.0, 5800020.0, 10.0, 10.0, 144, 144)
    base = np.linspace(0.15, 0.75, 24 * 24,
                       dtype=np.float32).reshape(24, 24)
    cube = (base[..., None]
            * (0.5 + 0.5 * rng.random(48).astype(np.float32)))
    s2 = np.stack([np.clip(base * c, 0, 1) * 10000.0
                   for c in (0.9, 1.0, 1.1)]).astype(np.float32)
    s2_10 = np.repeat(np.repeat(s2, 6, axis=1), 6, axis=2)
    # a nodata swath in the S2 stack (raw sentinel units)
    s2_10[:, :36, :] = 65535.0

    res = fuse_pair(cube, wl, emit_grid, s2_10, s2_grid, good_mask=good,
                    s2_scale=1e-4, s2_nodata=65535.0, engine="phases",
                    fusion_method="linear")
    # the 60 m cells under the nodata swath must be excluded: matched
    # output there keeps the identity-stretch value, and no fitted
    # value may be contaminated by the 6.5535 sentinel-scaled data
    assert np.isfinite(res.coeffs).all()
    a = res.coeffs[:, 0]
    # a sane linear gain (sentinel leakage drags it towards ~10x off)
    assert np.all(np.abs(a) < 3.0), res.coeffs
