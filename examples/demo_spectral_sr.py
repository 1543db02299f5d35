"""Spectral super-resolution training demo — the library form of the
reference's legacy_notebooks/Spectral_matching.ipynb (cells 2-9, 14-27):
pair multispectral inputs with hyperspectral targets, train the
logit-space standardise -> poly(3) -> ridge model, report per-band
R²/RMSE, and round-trip the fitted parameters.

    python examples/demo_spectral_sr.py [OUT_DIR]

Everything is synthetic with analytic ground truth, so the printed
metrics are a real accuracy check, not a smoke test: the multispectral
inputs are SRF band integrals of the same spectra the model must
reconstruct.
"""

import sys
from pathlib import Path

# allow running straight from a source checkout: python examples/<name>.py
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "demo_sr_out")
    out.mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp

    from hyperres.core.config import RidgeSRConfig
    from hyperres.fusion.ridge_sr import (RidgeSpectralSR, load_params,
                                          save_params)
    from hyperres.kernels.lstsq import r2_rmse_per_band
    from hyperres.kernels.srf import build_box_weight_matrix
    from hyperres.testing.scenes import (emit_wavelength_grid,
                                         endmember_spectra,
                                         truth_reflectance)

    n_bands = 200  # box windows need the band pitch finer than their width
    wl, fwhm = emit_wavelength_grid(n_bands)
    spectra = endmember_spectra(wl)

    # Hyperspectral targets at random world points + their 4-band
    # multispectral view (box SRF integrals — what Sentinel-2 measures).
    rng = np.random.default_rng(0)
    pts = rng.uniform(200.0, 5800.0, size=(20_000, 2)).astype(np.float64)
    emit = truth_reflectance(pts[:, 0], pts[:, 1], spectra, noise=0.002)
    bands = {"B2": (490.0, 65.0), "B3": (560.0, 35.0),
             "B4": (665.0, 30.0), "B8": (842.0, 115.0)}  # (centre, width) nm
    Wm, names, valid = build_box_weight_matrix(wl, bands)
    assert valid.all(), dict(zip(names, valid))
    s2 = np.asarray(jnp.asarray(emit) @ jnp.asarray(Wm)).astype(np.float32)

    cfg = RidgeSRConfig()
    model = RidgeSpectralSR(s2.shape[1], n_bands, cfg)
    print(f"training ridge SR ({s2.shape[1]} -> {n_bands} bands, "
          f"degree {cfg.degree}, alpha {cfg.alpha}) on 16,000 px ...")
    model.fit(s2[:16_000], emit[:16_000])

    pred = model.predict(s2[16_000:])
    r2, rmse = r2_rmse_per_band(jnp.asarray(emit[16_000:]),
                                jnp.asarray(pred))
    r2, rmse = np.asarray(r2), np.asarray(rmse)
    print(f"held-out per-band R²: median {np.median(r2):.4f} "
          f"min {r2.min():.4f}")
    print(f"held-out per-band RMSE: median {np.median(rmse):.5f}")

    # Full-cube inference, batched like Spectral_matching cell 8.
    cube = s2[:256 * 64].reshape(256, 64, -1).transpose(2, 0, 1)
    sr_cube = model.predict_cube(cube, batch_pixels=8192)
    print(f"predicted cube: {cube.shape} -> {sr_cube.shape}")

    # Round-trip the parameters the way batch jobs do.
    save_params(out / "sr_params.npz", model)
    model2 = load_params(out / "sr_params.npz")
    np.testing.assert_allclose(model2.predict(s2[:8]),
                               model.predict(s2[:8]), atol=1e-6)
    print(f"params saved + reloaded OK -> {out / 'sr_params.npz'}")


if __name__ == "__main__":
    main()
