"""Calibrate the phase-correlation reliability score.

Sweeps synthetic tie-point windows over texture scale x noise level x
subpixel shift (plus the cross-resolution case: reference upsampled 6x
with the matching 1/6 low-pass), records the raw correlation-surface
SNR ((peak - mean) / std) against the true shift-recovery error, and
reports the SNR acceptance threshold: the smallest snr* such that
windows with snr >= snr* recover the shift to < 0.5 px with >= 99%
probability on the ensemble.

The kernel's 0-100 reliability mapping is then anchored so that the
AROSICS-semantics default threshold (min_reliability=60,
s2_emit/arosics_coreg.py:102 — "points below this are untrustworthy")
lands exactly on snr*: reliability = 100 * (1 - exp(-snr / tau)) with
tau = snr* / ln(100 / (100 - 60)).

Usage: python scripts/calibrate_coreg_reliability.py [n_per_cell]
"""

import sys

import numpy as np


def smooth_texture(rng, n, corr_len):
    """Band-limited random texture with correlation length ~corr_len px."""
    white = rng.standard_normal((n, n)).astype(np.float32)
    f = np.fft.rfft2(white)
    fy = np.fft.fftfreq(n)[:, None]
    fx = np.fft.rfftfreq(n)[None, :]
    rad = np.sqrt(fy * fy + fx * fx)
    f *= np.exp(-((rad * corr_len) ** 2))
    img = np.fft.irfft2(f, s=(n, n))
    img -= img.mean()
    s = img.std()
    return img / (s if s > 0 else 1.0)


def subpixel_shift(img, dy, dx):
    f = np.fft.rfft2(img)
    n, m = img.shape
    fy = np.fft.fftfreq(n)[:, None]
    fx = np.fft.rfftfreq(m)[None, :]
    return np.fft.irfft2(f * np.exp(-2j * np.pi * (fy * dy + fx * dx)),
                         s=(n, m)).astype(np.float32)


def block_mean(img, f):
    h, w = img.shape
    return img[:h - h % f, :w - w % f].reshape(
        h // f, f, w // f, f).mean(axis=(1, 3))


def main():
    import jax.numpy as jnp

    from hyperres.kernels.phasecorr import phase_correlate_batch

    n_per = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    win = 256
    rows = []

    # same-resolution ensemble
    for corr_len in (2.0, 6.0, 20.0, 60.0):
        for noise in (0.05, 0.3, 1.0, 3.0, 10.0, 30.0):
            refs, tgts, true = [], [], []
            for _ in range(n_per):
                img = smooth_texture(rng, win, corr_len)
                dy = rng.uniform(-8, 8)
                dx = rng.uniform(-8, 8)
                tgt = subpixel_shift(img, dy, dx)
                refs.append(img + noise * rng.standard_normal((win, win)))
                tgts.append(tgt + noise * rng.standard_normal((win, win)))
                true.append((dy, dx))
            got_dy, got_dx, rel = phase_correlate_batch(
                jnp.asarray(np.stack(refs), jnp.float32),
                jnp.asarray(np.stack(tgts), jnp.float32))
            for i, (dy, dx) in enumerate(true):
                err = np.hypot(float(got_dy[i]) - dy, float(got_dx[i]) - dx)
                rows.append(("same", corr_len, noise, float(rel[i]), err))

    # cross-resolution ensemble: ref = 6x block mean upsampled back,
    # low-pass 1/6 (the EMIT-60m-vs-S2-10m geometry)
    for corr_len in (6.0, 20.0, 60.0):
        for noise in (0.05, 0.3, 1.0, 3.0):
            refs, tgts, true = [], [], []
            for _ in range(n_per):
                img = smooth_texture(rng, win, corr_len)
                coarse = block_mean(img, 6)
                up = np.repeat(np.repeat(coarse, 6, 0), 6, 1)[:win, :win]
                pad_h, pad_w = win - up.shape[0], win - up.shape[1]
                up = np.pad(up, ((0, pad_h), (0, pad_w)), mode="edge")
                dy = rng.uniform(-8, 8)
                dx = rng.uniform(-8, 8)
                tgt = subpixel_shift(img, dy, dx)
                refs.append(up + noise * rng.standard_normal((win, win)))
                tgts.append(tgt + noise * rng.standard_normal((win, win)))
                true.append((dy, dx))
            got_dy, got_dx, rel = phase_correlate_batch(
                jnp.asarray(np.stack(refs), jnp.float32),
                jnp.asarray(np.stack(tgts), jnp.float32),
                lowpass_frac=1.0 / 6.0)
            for i, (dy, dx) in enumerate(true):
                err = np.hypot(float(got_dy[i]) - dy, float(got_dx[i]) - dx)
                rows.append(("xres", corr_len, noise, float(rel[i]), err))

    rel_all = np.array([r[3] for r in rows])
    err_all = np.array([r[4] for r in rows])
    # invert the current mapping back to raw snr for threshold search
    # (reliability = 100 * (1 - exp(-snr / TAU)))
    from hyperres.kernels.phasecorr import RELIABILITY_TAU
    snr_all = -RELIABILITY_TAU * np.log1p(-np.clip(rel_all, 0, 99.999)
                                          / 100.0)

    print(f"{len(rows)} windows; err<0.5px overall: "
          f"{(err_all < 0.5).mean():.3f}")
    grid = np.unique(np.round(np.sort(snr_all), 1))
    snr_star = None
    for t in grid:
        sel = snr_all >= t
        if sel.sum() < 30:
            break
        if (err_all[sel] < 0.5).mean() >= 0.99:
            snr_star = t
            print(f"snr* = {t:.2f}: accepts {sel.mean():.2%}, "
                  f"err<0.5px rate {(err_all[sel] < 0.5).mean():.4f}")
            break
    for t in (2, 4, 6, 8, 10, 15, 20, 30, 50):
        sel = snr_all >= t
        if sel.sum():
            print(f"  snr>={t:>3}: n={sel.sum():4d} "
                  f"ok={(err_all[sel] < 0.5).mean():.4f} "
                  f"median_err={np.median(err_all[sel]):.4f}")
    if snr_star is not None:
        tau = snr_star / np.log(100.0 / 40.0)
        print(f"==> tau = snr*/ln(2.5) = {tau:.3f} "
              f"(reliability 60 <=> snr {snr_star:.2f})")


if __name__ == "__main__":
    main()
