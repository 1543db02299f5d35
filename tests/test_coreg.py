import numpy as np
import jax.numpy as jnp
import pytest

from hyperres.core.config import CoregConfig
from hyperres.core.crs import CRS
from hyperres.core.grid import Grid
from hyperres.coreg import coregister_local, deshift, coregister_s2_to_emit
from hyperres.kernels.phasecorr import estimate_shift, phase_correlate_batch


def smooth_image(rng, h, w, scale=12):
    """Band-limited random texture (correlatable)."""
    f = rng.normal(size=(h // scale + 2, w // scale + 2))
    import cv2
    return cv2.resize(f, (w, h), interpolation=cv2.INTER_CUBIC).astype(
        np.float32)


def shift_image(img, dy, dx):
    """tgt(r, c) = img(r - dy, c - dx) via cv2 subpixel warp."""
    import cv2
    h, w = img.shape
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_CUBIC,
                          borderMode=cv2.BORDER_REFLECT)


@pytest.mark.parametrize("dy,dx", [(3.0, -5.0), (0.0, 0.0), (-7.25, 2.5)])
def test_phase_correlation_recovers_known_shift(rng, dy, dx):
    img = smooth_image(rng, 256, 256)
    tgt = shift_image(img, dy, dx)
    got_dy, got_dx, rel = estimate_shift(img, tgt)
    assert abs(got_dy - dy) < 0.25
    assert abs(got_dx - dx) < 0.25
    assert rel > 50.0


def test_phase_correlation_batched(rng):
    shifts = [(2.0, 3.0), (-4.0, 1.0), (8.0, -6.0)]
    imgs = [smooth_image(rng, 128, 128) for _ in shifts]
    refs = np.stack(imgs)
    tgts = np.stack([shift_image(im, dy, dx)
                     for im, (dy, dx) in zip(imgs, shifts)])
    dy, dx, rel = phase_correlate_batch(jnp.asarray(refs), jnp.asarray(tgts))
    for i, (sy, sx) in enumerate(shifts):
        assert abs(float(dy[i]) - sy) < 0.3
        assert abs(float(dx[i]) - sx) < 0.3


def test_uncorrelated_windows_low_reliability(rng):
    a = smooth_image(rng, 128, 128)
    b = smooth_image(np.random.default_rng(99), 128, 128)
    _, _, rel = estimate_shift(a, b)
    a2 = shift_image(a, 2, 2)
    _, _, rel_good = estimate_shift(a, a2)
    assert rel_good > rel + 10.0


def test_coregister_local_and_deshift_recover_alignment(rng):
    img = smooth_image(rng, 600, 640, scale=16)
    dy, dx = 4.5, -3.25
    tgt = shift_image(img, dy, dx)
    cfg = CoregConfig(window_size=(256, 256), grid_res=150, max_points=20,
                      min_reliability=40)
    res = coregister_local(img, tgt, config=cfg)
    assert res.success
    assert abs(res.mean_shift_px[0] - dy) < 0.3
    assert abs(res.mean_shift_px[1] - dx) < 0.3
    fixed = deshift(tgt[None], res)[0]
    # interior alignment error tiny after deshift
    inner = (slice(40, -40), slice(40, -40))
    err_before = np.abs(tgt[inner] - img[inner]).mean()
    err_after = np.abs(fixed[inner] - img[inner]).mean()
    assert err_after < 0.15 * err_before


def test_coregister_tie_point_filtering(rng):
    img = smooth_image(rng, 500, 500, scale=16)
    tgt = shift_image(img, 2.0, 2.0)
    # corrupt one region so its tie point becomes an outlier/unreliable
    tgt[:160, :160] = rng.normal(size=(160, 160))
    cfg = CoregConfig(window_size=(128, 128), grid_res=120, max_points=30,
                      min_reliability=45, tie_point_filter_level=3)
    res = coregister_local(img, tgt, config=cfg)
    assert res.success
    rejected = [t for t in res.tie_points if not t.used]
    assert len(rejected) >= 1
    assert abs(res.mean_shift_px[0] - 2.0) < 0.4


def test_granule_coreg_end_to_end(tmp_path, rng):
    """Full driver: EMIT ref tif + shifted S2 tif -> coregistered S2."""
    from hyperres.io.tiff import write_geotiff, TiffReader
    from hyperres.io.hdf5 import HDF5Writer

    utm = CRS.utm(33, True)
    h = w = 480
    base = smooth_image(rng, h, w, scale=10)
    base = (base - base.min()) / (np.ptp(base) + 1e-6)

    s2_grid = Grid(utm, 500000.0, 5800000.0, 10.0, 10.0, w, h)
    dy, dx = 3.0, -2.0
    s2_band = shift_image(base, dy, dx)
    s2_stack = np.stack([s2_band, s2_band * 0.9])
    write_geotiff(tmp_path / "s2.tif", (s2_stack * 10000).astype(np.uint16),
                  s2_grid, nodata=0,
                  descriptions=["B08_nir", "B04_red"])

    # EMIT "ref" at 60 m on the same area: downsample base
    emit_grid = Grid(utm, 500000.0, 5800000.0, 60.0, 60.0, w // 6, h // 6)
    emit_band = base.reshape(h // 6, 6, w // 6, 6).mean(axis=(1, 3))
    # 3 bands mirroring the 3 wavelengths; band 3 (842 nm) is the match
    emit_cube = np.stack([emit_band * 0.7, emit_band * 0.85, emit_band])
    write_geotiff(tmp_path / "emit.tif",
                  (emit_cube * 10000).astype(np.uint16), emit_grid,
                  nodata=65535)

    # minimal EMIT granule nc for the wavelength lookup
    wgr = HDF5Writer(tmp_path / "emit.nc")
    wgr.create_dataset("/reflectance",
                       np.zeros((4, 4, 3), dtype=np.float32))
    wgr.create_group("/sensor_band_parameters")
    wgr.create_dataset("/sensor_band_parameters/wavelengths",
                       np.array([490.0, 665.0, 842.0], dtype=np.float32),
                       attrs={"units": "nanometers"})
    wgr.create_group("/location")
    wgr.create_dataset("/location/glt_x", np.ones((4, 4)))
    wgr.create_dataset("/location/glt_y", np.ones((4, 4)))
    wgr.set_attrs("/", geotransform=np.array(
        [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]))
    wgr.save()

    out = coregister_s2_to_emit(
        emit_ref_tif=tmp_path / "emit.tif",
        s2_tgt_tif=tmp_path / "s2.tif",
        emit_nc_path=tmp_path / "emit.nc",
        out_s2_tif=tmp_path / "s2_coreg.tif",
        config=CoregConfig(window_size=(256, 256), grid_res=120,
                           max_points=16, min_reliability=30),
        nodata_emit=65535, nodata_s2=0)
    assert out["final"]["success"], out
    assert out["final"]["s2_code"] == "B08"
    assert out["final"]["emit_match_wl_nm"] == 842.0
    # recovered shift ~ (dy, dx)
    mdy, mdx = out["final"]["mean_shift_px"]
    assert abs(mdy - dy) < 0.6 and abs(mdx - dx) < 0.6

    with TiffReader(tmp_path / "s2_coreg.tif") as t:
        fixed = t.read().astype(np.float32) / 10000.0
    inner = (slice(40, -40), slice(40, -40))
    err_before = np.abs(s2_band[inner] - base[inner]).mean()
    err_after = np.abs(fixed[0][inner] - base[inner]).mean()
    assert err_after < 0.3 * err_before


def test_local_residual_deshift_beats_affine(rng):
    """A quadratic (non-affine) shift field: the IDW residual deshift
    must align better than the affine-only model."""
    img = smooth_image(rng, 560, 560, scale=14)
    h, w = img.shape
    rr, cc = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    # smooth quadratic shift field, a few pixels amplitude
    dy_true = 2.0 + 3.0 * ((cc / w) - 0.5) ** 2
    dx_true = -1.0 - 2.5 * ((rr / h) - 0.5) ** 2
    import cv2
    tgt = cv2.remap(img, (cc - dx_true).astype(np.float32),
                    (rr - dy_true).astype(np.float32),
                    interpolation=cv2.INTER_CUBIC,
                    borderMode=cv2.BORDER_REFLECT)

    cfg = CoregConfig(window_size=(128, 128), grid_res=80, max_points=49,
                      min_reliability=40)
    res = coregister_local(img, tgt, config=cfg)
    assert res.success
    assert res.info["n_used"] >= 9

    fixed_affine = deshift(tgt[None], res)[0]
    from hyperres.coreg import shift_field
    fixed_local = deshift(tgt[None], res, local_residuals=True)[0]
    inner = (slice(70, -70), slice(70, -70))
    err_affine = np.abs(fixed_affine[inner] - img[inner]).mean()
    err_local = np.abs(fixed_local[inner] - img[inner]).mean()
    err_before = np.abs(tgt[inner] - img[inner]).mean()
    assert err_local < err_before
    assert err_local < err_affine * 0.9  # local field clearly better

    dy, dx = shift_field(res, img.shape, local_residuals=True)
    # recovered field approximates the truth at interior points
    m = (slice(100, -100), slice(100, -100))
    assert np.abs(dy[m] - dy_true[m]).mean() < 0.5
    assert np.abs(dx[m] - dx_true[m]).mean() < 0.5


def test_ransac_affine_filter_rejects_gross_outliers(rng):
    """Level-3 RANSAC: tie points on a clean affine shift field plus
    gross outliers — the consensus keeps the field, rejects the rest."""
    from hyperres.coreg.local import TiePoint, ransac_affine_filter

    A_true = np.array([[0.001, 0.0, 2.0], [0.0, -0.002, -3.0]])
    tps = []
    for i in range(20):
        r, c = int(rng.integers(0, 2000)), int(rng.integers(0, 2000))
        dy, dx = A_true @ np.array([r, c, 1.0])
        dy += rng.normal(scale=0.2)
        dx += rng.normal(scale=0.2)
        tps.append(TiePoint(col=c, row=r, dy=float(dy), dx=float(dx),
                            reliability=80.0))
    outlier_idx = {3, 9, 15}
    for i in outlier_idx:
        tps[i].dy += 25.0
        tps[i].dx -= 18.0
    ransac_affine_filter(tps, thresh_px=3.0)
    rejected = {i for i, t in enumerate(tps) if not t.used}
    assert rejected == outlier_idx, rejected


def test_ransac_filter_noop_small_n(rng):
    from hyperres.coreg.local import TiePoint, ransac_affine_filter
    tps = [TiePoint(col=i, row=i, dy=1.0, dx=1.0, reliability=80.0)
           for i in range(5)]
    ransac_affine_filter(tps)
    assert all(t.used for t in tps)


def test_tps_shift_field_recovers_nonaffine(rng):
    """TPS residual mode: a smooth non-affine displacement sampled at tie
    points is reconstructed far better than the affine model alone, and
    interpolates the tie points exactly (no smoothing)."""
    from hyperres.coreg.local import CoregResult, TiePoint, shift_field

    h, w = 120, 140

    def truth(r, c):
        dy = 2.0 + 1.5 * np.sin(r / 35.0) * np.cos(c / 45.0)
        dx = -3.0 + 1.2 * np.cos(r / 40.0)
        return dy, dx

    tps = []
    for r in range(10, h, 25):
        for c in range(10, w, 25):
            dy, dx = truth(float(r), float(c))
            tps.append(TiePoint(col=c, row=r, dy=float(dy), dx=float(dx),
                                reliability=80.0))
    G = np.stack([[t.row, t.col, 1.0] for t in tps])
    D = np.stack([[t.dy, t.dx] for t in tps])
    A, *_ = np.linalg.lstsq(G, D, rcond=None)
    res = CoregResult(True, None, tie_points=tps, affine=A.T)

    rr, cc = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    ty, tx = truth(rr, cc)

    dy_a, dx_a = shift_field(res, (h, w), local_residuals=False)
    dy_t, dx_t = shift_field(res, (h, w), local_residuals=True,
                             mode="tps")
    err_aff = np.hypot(dy_a - ty, dx_a - tx)
    err_tps = np.hypot(dy_t - ty, dx_t - tx)
    # interior only (TPS extrapolates at borders)
    sl = (slice(10, h - 10), slice(10, w - 10))
    assert err_tps[sl].mean() < 0.25 * err_aff[sl].mean()
    # exact interpolation at the tie points
    for t in tps[:8]:
        assert abs(dy_t[t.row, t.col] - t.dy) < 1e-3
        assert abs(dx_t[t.row, t.col] - t.dx) < 1e-3


def test_pipeline_coregistration_cross_resolution(tmp_path, rng):
    """run_pair_pipeline(coregister=True) with the REAL cross-resolution
    geometry (arosics_coreg.py:92-163 semantics): the reference is the
    60 m EMIT ortho product cubic-upsampled onto the 10 m grid with the
    matching 1/6 cross-power low-pass, and the S2 stack is synthetically
    shifted. The S2 stack is derived from the EMIT product itself (SRF
    synthesis -> 10 m upsample -> subpixel shift) so the test measures
    the coregistration machinery, not the synthetic scene's nearest-GLT
    sampling jitter (+-30 m, which an independent world sampling would
    inject into the reference only). The world carries a shared
    broadband albedo texture — the cross-band-correlated fine structure
    real phase correlation locks onto. Recovered mean shift must be
    within 0.1 px at the calibrated default min_reliability=60."""
    from hyperres.core.config import CoregConfig, TilingConfig
    from hyperres.io import envi
    from hyperres.io.tiff import TiffReader, write_geotiff
    from hyperres.kernels.srf import build_srf_weight_matrix
    from hyperres.kernels.warp import resample_to_grid
    from hyperres.ortho.pipeline import orthorectify_granule
    from hyperres.pipeline import run_pair_pipeline
    from hyperres.spectral import builtin_srf
    from hyperres.testing.scenes import (S2_CODE_TO_SHORT, make_scene)

    # swath strictly contains the S2 tile: no swath-boundary features
    # that would exist in the reference but not the target
    scene = make_scene(tmp_path / "cscene", raw_shape=(100, 100),
                       n_bands=48, s2_size=480, world_albedo_amp=0.35)

    # EMIT ortho product on the S2-anchored 60 m grid
    ores = orthorectify_granule(scene.emit_nc_path, tmp_path / "ortho",
                                scene.s2_tif_path)
    r = envi.EnviReader(ores.data_envi_bin.with_suffix(".hdr"))
    cube = np.nan_to_num(r.read().astype(np.float32))
    emit_grid = r.grid

    # derive the S2 stack from the product: SRF synthesis at 60 m,
    # upsample to 10 m, subpixel-shift, quantize u16
    with TiffReader(scene.s2_tif_path) as t:
        s2_grid = t.grid
        descs = t.descriptions
    codes = [str(d).split("_")[0] for d in descs]
    srf = builtin_srf("S2A")
    W, _, _ = build_srf_weight_matrix(
        ores.wavelengths,
        {S2_CODE_TO_SHORT[c]: srf[S2_CODE_TO_SHORT[c]] for c in codes})
    pseudo = np.einsum("hwb,bk->khw", cube, np.asarray(W))
    dy, dx = 2.4, -1.7
    bands = []
    for k in range(pseudo.shape[0]):
        b = resample_to_grid(pseudo[k], emit_grid, s2_grid,
                             method="bilinear", nodata=None, fill=0.0)
        bands.append(shift_image(np.asarray(b, np.float32), dy, dx))
    stack = np.clip(np.stack(bands) * 10000.0, 0, 65534).astype(np.uint16)
    s2_shifted = tmp_path / "s2_shifted.tif"
    write_geotiff(s2_shifted, stack, s2_grid, nodata=65535,
                  descriptions=descs, tiled=True)

    res = run_pair_pipeline(
        scene.emit_nc_path, s2_shifted, tmp_path / "crun",
        coregister=True,
        coreg_config=CoregConfig(window_size=(256, 256), grid_res=120,
                                 max_points=16),
        tiling_config=TilingConfig(emit_tile_size=16, max_black_frac=0.2),
        max_tiles=1, train_sr=False)
    coreg = res.info["coreg"]
    assert coreg["final"]["success"], coreg
    mdy, mdx = coreg["final"]["mean_shift_px"]
    assert abs(mdy - dy) < 0.1 and abs(mdx - dx) < 0.1, (mdy, mdx)
    assert coreg["final"]["n_tie_points_used"] >= 3
