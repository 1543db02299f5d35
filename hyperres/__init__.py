"""hyperres — TPU-native EMIT x Sentinel-2 hyperspectral super-resolution.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``martasumyk/hyperspectral_super-resolution``: GLT orthorectification,
SRF band synthesis, OT/polynomial fusion, ridge spectral super-resolution,
FFT phase-correlation coregistration, paired tiling, catalog search and
run artifacts — with the compute path on TPU and a self-contained host
runtime (own CRS math and GeoTIFF/ENVI/HDF5 codecs).
"""

__version__ = "0.1.0"

from . import core

__all__ = ["core", "__version__"]
