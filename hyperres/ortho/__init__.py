from .pipeline import (OrthoResult, convert_granules, orthorectify_granule,
                       raster_meta, OBS_BAND_NAMES)
from . import products

__all__ = ["OrthoResult", "convert_granules", "orthorectify_granule",
           "raster_meta",
           "OBS_BAND_NAMES", "products"]
