import datetime as dt
import json

import numpy as np
import pytest

from hyperres.catalog import (
    CmrClient, LonLatPolygon, StacClient, best_asset_key, choose_nearest,
    choose_best_emit_per_date, circ_hours_diff, count_cloud_pixels,
    emit_geom_wgs84_from_umm, find_best_s2_for_emit_item,
    local_solar_time_hours, overlap_emit_fraction, point_buffer_bbox,
    scl_metrics,
)
from hyperres.core.config import PairSearchConfig
from hyperres.core.crs import CRS
from hyperres.core.grid import Grid


# -------------------------------------------------------------- geometry ---

def test_polygon_area_square_degree():
    p = LonLatPolygon.from_bounds(0.0, 0.0, 1.0, 1.0)
    assert abs(p.area_m2() / 1e6 - 12308.5) < 5.0


def test_polygon_intersection_fraction():
    emit = LonLatPolygon.from_bounds(0.0, 0.0, 1.0, 1.0)
    s2 = LonLatPolygon.from_bounds(0.5, 0.0, 1.5, 1.0)
    frac, inter = overlap_emit_fraction(emit, s2)
    assert inter is not None
    assert abs(frac - 0.5) < 0.01
    # disjoint
    s3 = LonLatPolygon.from_bounds(5.0, 5.0, 6.0, 6.0)
    frac0, inter0 = overlap_emit_fraction(emit, s3)
    assert frac0 == 0.0 and inter0 is None


def test_polygon_intersection_rotated_quad():
    emit = LonLatPolygon(((0.2, 0.0), (1.0, 0.4), (0.8, 1.2), (0.0, 0.8)))
    s2 = LonLatPolygon.from_bounds(0.0, 0.0, 1.0, 1.0)
    frac, inter = overlap_emit_fraction(emit, s2)
    assert 0.5 < frac <= 1.0


def test_umm_polygon_parse():
    umm = {"SpatialExtent": {"HorizontalSpatialDomain": {"Geometry": {
        "GPolygons": [{"Boundary": {"Points": [
            {"Longitude": 13.0, "Latitude": 52.0},
            {"Longitude": 14.0, "Latitude": 52.0},
            {"Longitude": 14.0, "Latitude": 53.0},
            {"Longitude": 13.0, "Latitude": 53.0},
            {"Longitude": 13.0, "Latitude": 52.0},
        ]}}]}}}}
    g = emit_geom_wgs84_from_umm(umm)
    assert g is not None
    assert g.bounds() == (13.0, 52.0, 14.0, 53.0)
    cx, cy = g.centroid()
    assert abs(cx - 13.5) < 1e-9 and abs(cy - 52.5) < 1e-9


def test_point_buffer_bbox_size():
    l, b, r, t = point_buffer_bbox(13.4, 52.5, 10000.0)
    # ~20 km box: ~0.18 deg lon at 52.5N, ~0.18 deg lat
    assert 0.25 < (r - l) < 0.35
    assert 0.16 < (t - b) < 0.20


def test_local_solar_time():
    d = dt.datetime(2023, 8, 19, 11, 0, 0, tzinfo=dt.timezone.utc)
    assert abs(local_solar_time_hours(d, 15.0) - 12.0) < 1e-9
    assert circ_hours_diff(23.5, 0.5) == 1.0


# ----------------------------------------------------------------- cloud ---

def test_scl_metrics_and_count(tmp_path):
    from hyperres.io.tiff import write_geotiff
    utm = CRS.utm(33, True)
    grid = Grid(utm, 399960.0, 5800020.0, 20.0, 20.0, 100, 100)
    scl = np.full((100, 100), 4, dtype=np.uint8)   # vegetation
    scl[:20] = 9                                    # high-prob cloud
    scl[90:] = 0                                    # nodata
    p = tmp_path / "scl.tif"
    write_geotiff(p, scl[None], grid)
    clouds, valid = count_cloud_pixels(p)
    assert valid == 9000
    assert clouds == 2000
    m = scl_metrics(p)
    assert m["cloud_frac_valid"] == pytest.approx(2000 / 9000)
    assert m["class_counts"][9] == 2000
    assert m["class_counts_named"]["CLOUD_HIGH_PROB"] == 2000

    # ROI restricted to the cloudy top strip
    l, b, r, t = grid.bounds
    lon1, lat1 = utm.to_geographic(l, t)
    lon2, lat2 = utm.to_geographic(r, t - 400.0)
    roi = LonLatPolygon.from_bounds(float(lon1), float(lat2),
                                    float(lon2), float(lat1))
    clouds_roi, valid_roi = count_cloud_pixels(p, roi)
    assert clouds_roi == valid_roi > 0


# --------------------------------------------------------------- clients ---

def make_umm_item(begin, cloud=10.0, granule="G1", lon0=13.0):
    return {
        "meta": {"native-id": granule, "concept-id": f"C-{granule}"},
        "umm": {
            "GranuleUR": granule,
            "CloudCover": cloud,
            "TemporalExtent": {"RangeDateTime": {
                "BeginningDateTime": begin,
                "EndingDateTime": begin}},
            "SpatialExtent": {"HorizontalSpatialDomain": {"Geometry": {
                "GPolygons": [{"Boundary": {"Points": [
                    {"Longitude": lon0, "Latitude": 52.0},
                    {"Longitude": lon0 + 0.8, "Latitude": 52.0},
                    {"Longitude": lon0 + 0.8, "Latitude": 52.7},
                    {"Longitude": lon0, "Latitude": 52.7},
                ]}}]}}},
            "RelatedUrls": [
                {"Type": "GET DATA",
                 "URL": f"https://x/EMIT_L2A_RFL_001_{granule}.nc"},
                {"Type": "GET DATA",
                 "URL": f"https://x/EMIT_L2A_MASK_001_{granule}.nc"},
                {"Type": "VIEW RELATED INFORMATION",
                 "URL": "https://x/doc.pdf"},
            ],
        },
    }


def test_cmr_search_pagination_and_urls():
    pages = {
        1: {"items": [make_umm_item("2023-08-19T11:01:26Z", granule=f"g{i}")
                      for i in range(3)]},
        2: {"items": []},
    }

    def fetch(url, params=None, **kw):
        return pages[params["page_num"]]

    c = CmrClient(fetch_json=fetch)
    items = c.search(bbox=[13, 52, 14, 53], page_size=3)
    assert len(items) == 3
    urls = CmrClient.data_urls(items[0])
    assert len(urls) == 2
    assert all(u.endswith(".nc") for u in urls)


def test_choose_helpers():
    items = [
        make_umm_item("2023-08-19T11:01:26Z", cloud=30.0, granule="a"),
        make_umm_item("2023-08-19T12:01:26Z", cloud=10.0, granule="b"),
        make_umm_item("2023-08-20T11:01:26Z", cloud=5.0, granule="c"),
    ]
    best = choose_best_emit_per_date(items)
    assert set(best) == {"2023-08-19", "2023-08-20"}
    assert best["2023-08-19"]["umm"]["GranuleUR"] == "b"
    target = dt.datetime(2023, 8, 19, 11, 30, tzinfo=dt.timezone.utc)
    assert choose_nearest(items, target)["umm"]["GranuleUR"] == "a"


def make_stac_item(item_id, datetime_str, bbox, cloud=5.0, assets=None):
    l, b, r, t = bbox
    return {
        "id": item_id,
        "properties": {"datetime": datetime_str, "eo:cloud_cover": cloud},
        "bbox": list(bbox),
        "geometry": {"type": "Polygon", "coordinates": [[
            [l, b], [r, b], [r, t], [l, t], [l, b]]]},
        "assets": assets or {"scl": {"href": "https://x/SCL.tif"}},
    }


def test_best_asset_key():
    assert best_asset_key({"scl": {}, "scl-jp2": {}}, "scl") == "scl"
    assert best_asset_key({"SCL": {}}, "scl") == "SCL"
    assert best_asset_key({"visual": {}}, "scl") is None


def test_find_best_s2_pairing(tmp_path):
    """Full pairing logic against an offline STAC + local SCL rasters."""
    emit_item = make_umm_item("2023-08-19T10:30:00Z", lon0=13.0)

    items = [
        # same day, overlapping, will be cloudier
        make_stac_item("cloudy", "2023-08-19T10:26:00Z",
                       (12.9, 51.9, 14.1, 53.0)),
        # next day, overlapping, clear
        make_stac_item("clear", "2023-08-20T10:26:00Z",
                       (12.9, 51.9, 14.1, 53.0)),
        # wrong time of day -> filtered
        make_stac_item("night", "2023-08-19T22:00:00Z",
                       (12.9, 51.9, 14.1, 53.0)),
        # tiny overlap -> filtered
        make_stac_item("faraway", "2023-08-19T10:26:00Z",
                       (15.0, 51.9, 16.0, 53.0)),
    ]

    def fetch(url, params=None, method="GET", body=None, **kw):
        assert method == "POST"
        return {"features": items, "links": []}

    stac = StacClient("https://stac.test", fetch_json=fetch)

    grid = Grid(CRS.geographic(), 12.9, 53.0, 0.012, 0.011, 100, 100)
    scl_clear = np.full((100, 100), 4, dtype=np.uint8)
    scl_cloudy = np.full((100, 100), 4, dtype=np.uint8)
    scl_cloudy[:, :60] = 9

    def scl_fetcher(item, key):
        return (scl_cloudy if item["id"] == "cloudy" else scl_clear), grid

    best, cloud_frac, dbg = find_best_s2_for_emit_item(
        emit_item, stac=stac,
        config=PairSearchConfig(top_k_scl=3),
        scl_fetcher=scl_fetcher)
    assert best["id"] == "clear"
    assert cloud_frac < 0.05
    assert dbg["picked"]["emit_overlap_frac"] > 0.9
    assert dbg["n_items"] == 4


def test_find_best_s2_no_candidates():
    emit_item = make_umm_item("2023-08-19T10:30:00Z")

    def fetch(url, **kw):
        return {"features": [], "links": []}

    best, cf, dbg = find_best_s2_for_emit_item(
        emit_item, stac=StacClient("https://x", fetch_json=fetch))
    assert best is None
    assert dbg["reason"] == "no_s2_items"


# ------------------------------------------------------------- artifacts ---

def test_runpaths_layout(tmp_path):
    from hyperres.artifacts import RunPaths
    rp = RunPaths.build(
        emit_nc="EMIT_L2A_RFL_001_20230819T110126_2323107_023.nc",
        local_root=tmp_path / "run", drive_base=tmp_path / "drive")
    assert rp.run_id == "001_20230819T110126_2323107_023"
    for d in (rp.local_emit, rp.local_s2, rp.local_emit_utm, rp.local_plots,
              rp.local_tiles, rp.local_meta, rp.local_tile_meta,
              rp.drive_tile_meta):
        assert d.is_dir()
    assert rp.local_report_md.name == "report.md"
    assert rp.drive_root.name == rp.run_id


def test_report_writer(tmp_path):
    from hyperres.artifacts import ReportWriter
    r = ReportWriter(tmp_path / "report.md").start(title="Test run")
    r.section("Pair", ["a: 1", None, "b: 2"])
    r.raw("\nextra\n")
    text = (tmp_path / "report.md").read_text()
    assert text.startswith("# Test run")
    assert "## Pair\n- a: 1\n- b: 2" in text
    assert "extra" in text


def test_emit_and_s2_metadata_writers(tmp_path):
    from hyperres.artifacts import (ReportWriter, write_emit_metadata,
                                    write_s2_metadata)
    emit_item = make_umm_item("2023-08-19T11:01:26Z")
    rep = ReportWriter(tmp_path / "report.md").start()
    summary = write_emit_metadata(emit_item, tmp_path / "meta", report=rep)
    assert summary["granule_ur"] == "G1"
    assert summary["time"]["begin"] == "2023-08-19T11:01:26Z"
    assert (tmp_path / "meta" / "emit_summary.json").exists()
    assert (tmp_path / "meta" / "emit_umm_raw.json").exists()

    s2 = make_stac_item("S2A_item", "2023-08-19T10:26:00Z",
                        (12.9, 51.9, 14.1, 53.0))
    s2["properties"]["platform"] = "sentinel-2a"
    summary2 = write_s2_metadata(s2, tmp_path / "meta", report=rep)
    assert summary2["id"] == "S2A_item"
    assert summary2["spatial"]["centroid_wgs84"]["lon"] == pytest.approx(13.5)
    report = (tmp_path / "report.md").read_text()
    assert "EMIT (from CMR UMM)" in report
    assert "Sentinel-2 (from STAC)" in report


def test_tile_metadata_and_manifest(tmp_path):
    from hyperres.artifacts import (TileRecord, write_manifest_csv,
                                    write_tile_metadata)
    rec = TileRecord(idx=3, emit_tif="e.tif", s2_tif="s.tif",
                     emit_black_frac=0.0, s2_black_frac=0.01,
                     emit_geo={"crs": "EPSG:32633",
                               "bounds_crs": [0, 0, 1, 1]})
    path, row = write_tile_metadata(
        rec, {"idx": 3}, tmp_path / "tiles_meta",
        emit_granule="G1", s2_id="S2A_item", params={"scale": 6})
    doc = json.loads(path.read_text())
    assert doc["tile_id"] == 3
    assert doc["pair"]["emit_granule"] == "G1"
    assert doc["params"]["scale"] == 6
    assert row["emit_crs"] == "EPSG:32633"

    m = write_manifest_csv(tmp_path / "manifest.csv", [rec])
    import pandas as pd
    df = pd.read_csv(m)
    assert df.iloc[0]["idx"] == 3
    assert df.iloc[0]["emit_tif"] == "e.tif"


def test_copy_any(tmp_path):
    from hyperres.artifacts import copy_any
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("A")
    (src / "sub").mkdir()
    (src / "sub" / "b.txt").write_text("B")
    dst = tmp_path / "dst"
    copy_any(src, dst)
    assert (dst / "a.txt").read_text() == "A"
    assert (dst / "sub" / "b.txt").read_text() == "B"
    # no-overwrite semantics
    (src / "a.txt").write_text("A2")
    copy_any(src, dst, overwrite=False, use_rsync=False)
    assert (dst / "a.txt").read_text() == "A"


def test_tif_geo_summary(tmp_path):
    from hyperres.artifacts import tif_geo_summary
    from hyperres.io.tiff import write_geotiff
    g = Grid(CRS.utm(33, True), 399960.0, 5800020.0, 60.0, 60.0, 10, 10)
    write_geotiff(tmp_path / "x.tif",
                  np.zeros((2, 10, 10), dtype=np.float32), g, nodata=-1)
    s = tif_geo_summary(tmp_path / "x.tif")
    assert s["width"] == 10 and s["count"] == 2
    assert s["crs"] == "EPSG:32633"
    assert s["nodata"] == -1
    assert 13.0 < s["centroid_wgs84"]["lon"] < 14.0


def test_search_emit_granules_buffer():
    from hyperres.catalog import search_emit_granules
    captured = {}

    def fetch(url, params=None, **kw):
        captured.update(params)
        return {"items": []}

    c = CmrClient(fetch_json=fetch)
    search_emit_granules(c, 13.4, 52.5, 10000.0,
                         temporal=("2023-08-01T00:00:00Z",
                                   "2023-08-31T00:00:00Z"),
                         cloud_cover=(0, 50))
    bbox = [float(v) for v in captured["bounding_box"].split(",")]
    assert bbox[0] < 13.4 < bbox[2]
    assert bbox[1] < 52.5 < bbox[3]
    assert 0.25 < bbox[2] - bbox[0] < 0.35
    assert captured["cloud_cover"] == "0,50"
    assert "2023-08-01" in captured["temporal"]


def test_write_archive_map(tmp_path):
    from hyperres.artifacts import ReportWriter, write_archive_map
    rep = ReportWriter(tmp_path / "r.md").start()
    p = write_archive_map(tmp_path / "archive_map.json",
                          {"emit": "/drive/emit", "s2": "/drive/s2"},
                          report=rep)
    doc = json.loads(p.read_text())
    assert doc["emit"] == "/drive/emit"
    assert "Archive map" in (tmp_path / "r.md").read_text()


def test_discover_pairs_loop(tmp_path):
    """The demo cells 20-24 loop: per-date best EMIT, best S2 match, keep
    within the cloud threshold."""
    from hyperres.catalog import CmrClient, StacClient, discover_pairs
    from hyperres.core.config import PairSearchConfig

    emit_items = [
        make_umm_item("2023-08-19T10:30:00Z", cloud=20.0, granule="a"),
        make_umm_item("2023-08-19T11:30:00Z", cloud=5.0, granule="b"),
        make_umm_item("2023-08-21T10:30:00Z", cloud=15.0, granule="c"),
    ]

    def cmr_fetch(url, params=None, **kw):
        return {"items": emit_items if params["page_num"] == 1 else []}

    # clear scene on 08-16: inside the +-3d window of the 08-19 granule
    # but OUTSIDE the window of the 08-21 granule, which only sees the
    # fully cloudy scene
    s2_items = [
        make_stac_item("s2_clear", "2023-08-16T10:26:00Z",
                       (12.9, 51.9, 14.1, 53.0)),
        make_stac_item("s2_cloudy", "2023-08-21T10:26:00Z",
                       (12.9, 51.9, 14.1, 53.0)),
    ]

    def stac_fetch(url, method="GET", body=None, **kw):
        # emulate server-side datetime filtering
        lo, hi = body["datetime"].split("/")
        keep = [it for it in s2_items
                if lo[:10] <= it["properties"]["datetime"][:10] <= hi[:10]]
        return {"features": keep, "links": []}

    grid = Grid(CRS.geographic(), 12.9, 53.0, 0.012, 0.011, 100, 100)
    clear = np.full((100, 100), 4, dtype=np.uint8)
    cloudy = np.full((100, 100), 9, dtype=np.uint8)

    def scl_fetcher(item, key):
        return (cloudy if item["id"] == "s2_cloudy" else clear), grid

    pairs = discover_pairs(
        cmr=CmrClient(fetch_json=cmr_fetch),
        stac=StacClient("https://x", fetch_json=stac_fetch),
        bbox=[12.9, 51.9, 14.1, 53.0],
        temporal=("2023-08-18T00:00:00Z", "2023-08-22T00:00:00Z"),
        config=PairSearchConfig(max_s2_cloud_frac=0.5),
        scl_fetcher=scl_fetcher)
    assert len(pairs) == 2  # two dates
    d19 = next(p for p in pairs if p["date"] == "2023-08-19")
    assert d19["kept"] is True
    assert d19["emit_item"]["umm"]["GranuleUR"] == "b"  # least cloudy
    assert d19["s2_item"]["id"] == "s2_clear"
    d21 = next(p for p in pairs if p["date"] == "2023-08-21")
    assert d21["kept"] is False  # fully cloudy SCL
