import numpy as np
import jax.numpy as jnp
import pytest

from hyperres.io.granule import apply_glt
from hyperres.kernels import glt as kglt
from hyperres.kernels import srf as ksrf
from hyperres.kernels import stats as kstats
from hyperres.spectral.srf_tables import builtin_srf
from hyperres.testing.scenes import emit_wavelength_grid


# ------------------------------------------------------------------ GLT ----

def make_glt(rng, ortho=(37, 45), raw=(30, 40), oob=False):
    glt = np.zeros(ortho + (2,), dtype=np.int32)
    valid = rng.random(ortho) > 0.3
    glt[..., 0] = np.where(valid, rng.integers(1, raw[1] + 1, ortho), 0)
    glt[..., 1] = np.where(valid, rng.integers(1, raw[0] + 1, ortho), 0)
    if oob:
        # inject some out-of-bounds 1-based entries
        glt[2, 3] = (raw[1] + 5, 1)
        glt[4, 7] = (1, raw[0] + 9)
    return glt


def test_glt_gather_matches_reference_oracle(rng):
    raw = rng.normal(size=(30, 40, 12)).astype(np.float32)
    glt = make_glt(rng)
    oracle = apply_glt(raw, glt)
    got = np.asarray(kglt.orthorectify(raw, glt))
    np.testing.assert_array_equal(got, oracle)


def test_glt_gather_drops_out_of_bounds(rng):
    raw = rng.normal(size=(30, 40, 4)).astype(np.float32)
    glt = make_glt(rng, oob=True)
    got = np.asarray(kglt.orthorectify(raw, glt))
    # oob cells must be fill, not garbage
    assert np.all(got[2, 3] == -9999.0)
    assert np.all(got[4, 7] == -9999.0)
    # in-bounds cells still match the oracle computed on clipped glt
    flat, valid = kglt.prepare_glt(glt, (30, 40))
    oracle = apply_glt(raw, np.where(valid[..., None], glt, 0))
    np.testing.assert_array_equal(got, oracle)


def test_glt_gather_2d_input(rng):
    raw = rng.normal(size=(20, 25)).astype(np.float32)
    glt = make_glt(rng, ortho=(22, 28), raw=(20, 25))
    oracle = apply_glt(raw, glt)[..., 0]
    got = np.asarray(kglt.orthorectify(raw[..., None], glt))[..., 0]
    np.testing.assert_array_equal(got, oracle)


# ------------------------------------------------------------------ SRF ----

def numpy_srf_integral(R, emit_w, srf_dict, good_mask=None):
    """Oracle: the reference's formula verbatim (synth.py:9-45)."""
    out = {}
    emit_w = emit_w.astype(float)
    for band, (lam, rsp) in srf_dict.items():
        rsp_on = np.interp(emit_w, lam, rsp, left=0.0, right=0.0)
        if good_mask is not None:
            rsp_on = rsp_on * good_mask.astype(float)
        if np.all(rsp_on == 0):
            out[band] = None
            continue
        num = np.trapezoid(R * rsp_on[None, None, :], x=emit_w, axis=-1)
        den = np.trapezoid(rsp_on, x=emit_w)
        out[band] = num / (den + 1e-32)
    return out


def test_srf_matmul_matches_trapz_oracle(rng):
    wl, good = emit_wavelength_grid(285)
    srf = builtin_srf("S2A")
    R = rng.random((17, 19, 285)).astype(np.float32) * 0.8
    oracle = numpy_srf_integral(R, wl, srf, good)
    got = ksrf.pseudo_s2_srf_integral(R, wl, srf, good_mask=good)
    assert set(got) == set(oracle)
    for b in oracle:
        if oracle[b] is None:
            assert got[b] is None
        else:
            np.testing.assert_allclose(got[b], oracle[b], rtol=0, atol=2e-6)


def test_srf_band_out_of_range_returns_none(rng):
    # EMIT axis cut below 2000 nm => B12 (2202 nm) has no support
    wl = np.linspace(400, 1900, 120)
    srf = builtin_srf("S2A")
    R = rng.random((5, 6, 120)).astype(np.float32)
    got = ksrf.pseudo_s2_srf_integral(R, wl, srf)
    assert got["B12"] is None
    assert got["B4"] is not None


def test_box_integral_matches_oracle(rng):
    wl, good = emit_wavelength_grid(200)
    R = rng.random((9, 11, 200)).astype(np.float32)
    W, names, valid = ksrf.build_box_weight_matrix(wl, good_mask=good)
    got = np.asarray(ksrf.srf_synthesize(jnp.asarray(R), jnp.asarray(W)))
    from hyperres.spectral.srf_tables import S2_BOX_TABLE
    for s, name in enumerate(names):
        centre, bw = S2_BOX_TABLE[name]
        m = (wl >= centre - bw / 2) & (wl <= centre + bw / 2) & good
        idx = np.where(m)[0]
        if len(idx) < 2:
            assert not valid[s]
            continue
        w = wl[idx]
        num = np.trapezoid(R[..., idx], x=w, axis=-1)
        oracle = num / (w[-1] - w[0])
        np.testing.assert_allclose(got[..., s], oracle, rtol=0, atol=2e-6)


def test_srf_synthesize_nodata_mask(rng):
    wl, _ = emit_wavelength_grid(64)
    srf = builtin_srf("S2A", bands=["B2", "B3", "B4"])
    W, _, _ = ksrf.build_srf_weight_matrix(wl, srf)
    R = rng.random((8, 9, 64)).astype(np.float32)
    valid = rng.random((8, 9)) > 0.5
    out = np.asarray(ksrf.srf_synthesize(
        jnp.asarray(R), jnp.asarray(W), jnp.asarray(valid)))
    assert np.all(out[~valid] == -9999.0)
    assert np.all(out[valid] != -9999.0)


def test_pseudo_s2_rgb_stack(rng):
    d = {"B2": rng.random((4, 5)), "B3": rng.random((4, 5)),
         "B4": rng.random((4, 5))}
    rgb = ksrf.pseudo_s2_rgb(d)
    assert rgb.shape == (4, 5, 3)
    np.testing.assert_array_equal(rgb[..., 0], d["B4"])
    with pytest.raises(ValueError):
        ksrf.pseudo_s2_rgb({"B2": None, "B3": d["B3"], "B4": d["B4"]})


# ---------------------------------------------------------------- stats ----

def test_masked_percentile_matches_numpy(rng):
    x = rng.normal(size=(50, 60)).astype(np.float32)
    mask = rng.random((50, 60)) > 0.4
    got = np.asarray(kstats.masked_percentile(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray([2.0, 50.0, 98.0])))
    want = np.percentile(x[mask], [2, 50, 98])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_shared_percentile_stretch_matches_reference(rng):
    """Oracle: color.py:25-34 formula (method='sort' is the exact
    np.percentile-interpolation path)."""
    img = rng.normal(size=(30, 40, 3)).astype(np.float32)
    mask = rng.random((30, 40)) > 0.3
    got = np.asarray(kstats.shared_percentile_stretch(
        jnp.asarray(img), jnp.asarray(mask), method="sort"))
    for c in range(3):
        lo, hi = np.percentile(img[..., c][mask], [2, 98])
        want = np.clip((img[..., c] - lo) / (hi - lo + 1e-12), 0, 1)
        np.testing.assert_allclose(got[..., c], want, rtol=0, atol=1e-5)


def test_shared_percentile_stretch_bracket_default(rng):
    """The default (bracket) stretch agrees with the exact sort path to
    within the order-statistic spacing at the percentile points — the
    estimator's documented bias bound."""
    img = rng.normal(size=(400, 500, 3)).astype(np.float32)
    mask = rng.random((400, 500)) > 0.3
    exact = np.asarray(kstats.shared_percentile_stretch(
        jnp.asarray(img), jnp.asarray(mask), method="sort"))
    fast = np.asarray(kstats.shared_percentile_stretch(
        jnp.asarray(img), jnp.asarray(mask)))
    for c in range(3):
        v = np.sort(img[..., c][mask])
        n = v.size
        gap = max(np.diff(v[int(0.02 * n) - 3: int(0.02 * n) + 3]).max(),
                  np.diff(v[int(0.98 * n) - 3: int(0.98 * n) + 3]).max())
        # a gap-sized shift of lo/hi moves the normalized image by
        # ~gap / (hi - lo); allow 3 gaps of slack
        lo, hi = np.percentile(img[..., c][mask], [2, 98])
        np.testing.assert_allclose(fast[..., c], exact[..., c], rtol=0,
                                   atol=3.0 * gap / (hi - lo))


def test_bracket_percentile_accuracy(rng):
    """bracket_percentile lands within ~1 order-statistic gap of
    np.percentile (its bias bound) on 200k samples, incl. heavily
    tied u16-quantized data where it must converge onto the tied
    value exactly."""
    x = rng.normal(size=(200_000,)).astype(np.float32)
    mask = rng.random((200_000,)) > 0.2
    qs = np.asarray([2.0, 50.0, 98.0])
    got = np.asarray(kstats.bracket_percentile(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(qs)))
    v = np.sort(x[mask])
    want = np.percentile(x[mask], qs)
    for q, g, w in zip(qs, got, want):
        i = int(q / 100 * (v.size - 1))
        gap = np.diff(v[max(i - 3, 0): i + 3]).max()
        assert abs(g - w) <= 2.0 * gap + 1e-6, (q, g, w, gap)
    # tied/quantized data: percentiles ARE grid values
    xq = np.round(x * 50.0) / 50.0
    gotq = np.asarray(kstats.bracket_percentile(
        jnp.asarray(xq.astype(np.float32)), jnp.asarray(mask),
        jnp.asarray(qs)))
    wantq = np.percentile(xq[mask], qs)
    np.testing.assert_allclose(gotq, wantq, rtol=0, atol=1e-4)
    # empty mask -> NaN (matching masked_percentile)
    empty = np.asarray(kstats.bracket_percentile(
        jnp.asarray(x), jnp.zeros_like(mask), jnp.asarray(qs)))
    assert np.isnan(empty).all()


def test_strided_band_minmax(rng):
    cube = rng.random((140, 150, 5)).astype(np.float32)
    cube[::7, ::3, :] = -9999.0
    lo, hi = kstats.strided_band_minmax(jnp.asarray(cube), -9999.0, stride=4)
    sample = cube[::4, ::4, :].reshape(-1, 5)
    for b in range(5):
        v = sample[:, b][sample[:, b] != -9999.0]
        np.testing.assert_allclose(float(lo[b]), np.percentile(v, 1), rtol=1e-4)
        np.testing.assert_allclose(float(hi[b]), np.percentile(v, 99), rtol=1e-4)


def test_histogram_percentile_accuracy(rng):
    x = rng.normal(size=(100_000,)).astype(np.float32)
    mask = np.ones_like(x, dtype=bool)
    got = np.asarray(kstats.histogram_percentile(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray([2.0, 50.0, 98.0])))
    want = np.percentile(x, [2, 50, 98])
    span = x.max() - x.min()
    assert np.all(np.abs(got - want) < span / 2048 * 2)


def test_quantize_dequantize_roundtrip(rng):
    x = rng.random((20, 30)).astype(np.float32)
    valid = rng.random((20, 30)) > 0.2
    q = np.asarray(kstats.quantize_u16(
        jnp.asarray(x), 0.0, 1.0, jnp.asarray(valid), nodata_u16=0))
    assert q.dtype == np.uint16
    assert np.all(q[~valid] == 0)
    scale = 1.0 / 65535.0
    back = np.asarray(kstats.dequantize_u16(
        jnp.asarray(q), scale, 0.0, 0))
    np.testing.assert_allclose(back[valid], x[valid], atol=1.0 / 65535.0)
    assert np.all(np.isnan(back[~valid]))


def test_quantize_reflectance_matches_reference(rng):
    """Oracle: tiles_helpers/utils.py:362-373."""
    emit = rng.random((6, 10, 12)).astype(np.float32) * 1.2
    valid = rng.random((6, 10, 12)) > 0.1
    got = np.asarray(kstats.quantize_reflectance_u16(
        jnp.asarray(emit), jnp.asarray(valid)))
    scaled = np.rint(emit * 10000.0).astype(np.int32)
    scaled = np.clip(scaled, 0, 65534)
    want = np.full(emit.shape, 65535, dtype=np.uint16)
    want[valid] = scaled[valid].astype(np.uint16)
    np.testing.assert_array_equal(got, want)


def test_cube_psnr_sam_matches_host_oracle(rng):
    """Device metrics vs pipeline.psnr/sam over the scipy-eroded
    interior (the validate_fullscale.py contract)."""
    from scipy.ndimage import binary_erosion

    from hyperres.pipeline import psnr, sam

    h, w, b = 40, 37, 9
    truth = rng.random((h, w, b)).astype(np.float32) * 0.9 + 0.01
    cube = truth + rng.normal(scale=0.01, size=(h, w, b)).astype(
        np.float32)
    invalid = rng.random((h, w)) > 0.7
    cube[invalid] = -9999.0
    vf, p, s = kstats.cube_psnr_sam(
        jnp.asarray(cube), jnp.asarray(truth), fill=-9999.0, erode=2)
    vmask = cube[..., 0] != -9999.0
    interior = binary_erosion(vmask, iterations=2)
    assert abs(float(vf) - vmask.mean()) < 1e-6
    assert abs(float(p) - psnr(cube[interior], truth[interior])) < 0.01
    assert abs(float(s) - sam(cube[interior], truth[interior])) < 1e-5
