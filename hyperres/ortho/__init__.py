from .pipeline import OrthoResult, orthorectify_granule, raster_meta, OBS_BAND_NAMES
from . import products

__all__ = ["OrthoResult", "orthorectify_granule", "raster_meta",
           "OBS_BAND_NAMES", "products"]
