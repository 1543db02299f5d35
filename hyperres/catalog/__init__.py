from .geometry import (
    LonLatPolygon, emit_geom_wgs84_from_umm, overlap_emit_fraction,
    point_buffer_bbox,
)
from .clients import (
    CmrClient, StacClient, CatalogUnavailableError, best_asset_key,
    choose_nearest, choose_best_emit_per_date, granule_datetime,
    search_emit_granules,
)
from .cloud import count_cloud_pixels, scl_metrics, open_remote_scl
from .pairing import (
    find_best_s2_for_emit_item, local_solar_time_hours, circ_hours_diff,
    discover_pairs,
)

__all__ = [
    "LonLatPolygon", "emit_geom_wgs84_from_umm", "overlap_emit_fraction",
    "point_buffer_bbox",
    "CmrClient", "StacClient", "CatalogUnavailableError", "best_asset_key",
    "choose_nearest", "choose_best_emit_per_date", "granule_datetime",
    "search_emit_granules",
    "count_cloud_pixels", "scl_metrics", "open_remote_scl",
    "find_best_s2_for_emit_item", "local_solar_time_hours",
    "circ_hours_diff", "discover_pairs",
]
