"""End-to-end demo on a synthetic paired scene — the library form of the
reference's Pairs_EMIT_S2_demo notebook.

    python examples/demo_pairs.py [OUT_DIR]

Fabricates an EMIT granule + S2 stack over a shared analytic world, runs
the full pair pipeline (ortho -> coreg -> OT+poly fusion -> tiling ->
spectral-SR), writes quicklooks, and prints the key quality numbers.
"""

import sys
from pathlib import Path

# allow running straight from a source checkout: python examples/<name>.py
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "demo_out")
    out.mkdir(parents=True, exist_ok=True)

    from hyperres.core.config import TilingConfig
    from hyperres.pipeline import psnr, run_pair_pipeline, sam
    from hyperres.testing.scenes import make_scene, truth_reflectance
    from hyperres.io import envi
    from hyperres.viz import show_emit_rgb_from_envi, show_side_by_side

    print("fabricating scene ...")
    scene = make_scene(out / "scene", raw_shape=(120, 132), n_bands=64,
                       s2_size=720)

    print("running pair pipeline ...")
    res = run_pair_pipeline(
        scene.emit_nc_path, scene.s2_tif_path, out / "run",
        tiling_config=TilingConfig(emit_tile_size=20, max_black_frac=0.05),
        max_tiles=8)

    # quicklooks
    show_emit_rgb_from_envi(res.ortho_info["outputs"]["data_envi_hdr"],
                            save_path=out / "emit_utm_quicklook.png")
    fused = res.fusion.fused_10m
    show_side_by_side(np.nan_to_num(res.fusion.matched_60m),
                      np.nan_to_num(fused[::6, ::6]),
                      "OT+poly matched @60 m", "fused @10 m (decimated)",
                      save_path=out / "fusion_side_by_side.png")

    # quality vs the analytic world
    r = envi.EnviReader(res.ortho_info["outputs"]["data_envi_hdr"])
    cube = r.read()
    xs, ys = r.grid.pixel_center_coords()
    X, Y = np.meshgrid(xs, ys)
    truth = truth_reflectance(X, Y, scene.spectra, seed=0)
    valid = cube[..., 0] != -9999.0
    print(f"ortho PSNR vs world: {psnr(cube[valid], truth[valid]):.2f} dB")
    print(f"ortho SAM vs world:  {sam(cube[valid], truth[valid]):.4f} rad")
    if res.sr_metrics:
        print(f"spectral-SR mean R2: {res.sr_metrics['r2_mean']:.4f}")
    print(f"tiles: {len(res.tiles)}; report: {res.report_path}")
    print(res.report_path.read_text())


if __name__ == "__main__":
    main()
