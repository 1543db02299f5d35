import math
import numpy as np
import pytest

from hyperres.core.crs import (
    CRS, tm_forward, tm_inverse, aeqd_forward, aeqd_inverse,
    cea6933_forward, equal_area_sqm, transform, utm_zone_from_lonlat,
)


# Test points spread across zones/hemispheres: lon, lat, zone, north
UTM_CASES = [
    (2.2945, 48.8584, 31, True),
    (-73.9857, 40.7484, 18, True),
    (151.2153, -33.8568, 56, False),
    (13.377704, 52.516275, 33, True),
]


def _snyder_tm(lon, lat, lon0, k0=0.9996, fe=500000.0, fn=0.0):
    """Independent oracle: the classic USGS/Snyder TM series (Snyder 1987,
    eqs. 8-9..8-13) — a different derivation (powers of e^2) from the
    Krueger n-series used by the implementation."""
    from hyperres.core.constants import WGS84_A, WGS84_E2
    e2 = WGS84_E2
    ep2 = e2 / (1 - e2)
    a = WGS84_A
    phi = math.radians(lat)
    A = math.radians(lon - lon0) * math.cos(phi)
    N = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    T = math.tan(phi) ** 2
    C = ep2 * math.cos(phi) ** 2
    M = _meridian_arc_snyder(lat)
    x = k0 * N * (A + (1 - T + C) * A ** 3 / 6
                  + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A ** 5 / 120) + fe
    y = k0 * (M + N * math.tan(phi) * (
        A * A / 2 + (5 - T + 9 * C + 4 * C * C) * A ** 4 / 24
        + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A ** 6 / 720)) + fn
    return x, y


@pytest.mark.parametrize("lon,lat,zone,north", UTM_CASES)
def test_tm_forward_matches_snyder_oracle(lon, lat, zone, north):
    crs = CRS.utm(zone, north)
    x, y = crs.from_geographic(lon, lat)
    lon0 = zone * 6 - 183
    fn = 0.0 if north else 10000000.0
    e, n = _snyder_tm(lon, lat, lon0, fn=fn)
    assert abs(float(x) - e) < 2e-3
    assert abs(float(y) - n) < 2e-3


def test_tm_forward_matches_snyder_oracle_grid(rng):
    lons = rng.uniform(12.5, 17.5, size=200)
    lats = rng.uniform(-70.0, 70.0, size=200)
    x, y = tm_forward(lons, lats, lon0_deg=15.0, false_e=500000.0)
    for i in range(200):
        e, n = _snyder_tm(lons[i], lats[i], 15.0)
        assert abs(float(x[i]) - e) < 5e-3
        assert abs(float(y[i]) - n) < 5e-3


def _meridian_arc_snyder(lat_deg: float) -> float:
    """Meridian arc length from the equator (Snyder 1987, eq. 3-21) — an
    independent series (in e^2, not the Krueger n-series) used as oracle."""
    from hyperres.core.constants import WGS84_A, WGS84_E2
    e2 = WGS84_E2
    e4 = e2 * e2
    e6 = e4 * e2
    phi = math.radians(lat_deg)
    return WGS84_A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
        - (35 * e6 / 3072) * math.sin(6 * phi)
    )


@pytest.mark.parametrize("lat", [0.0, 15.0, 30.0, 45.0, 60.0, 75.0, 84.0])
def test_tm_central_meridian_exact(lat):
    """On the central meridian easting is exactly 500 km and northing is
    k0 x meridian arc — checked against an independent arc series (mm)."""
    crs = CRS.utm(33, True)  # lon0 = 15 deg
    x, y = crs.from_geographic(15.0, lat)
    assert abs(float(x) - 500000.0) < 1e-6
    assert abs(float(y) - 0.9996 * _meridian_arc_snyder(lat)) < 2e-3


@pytest.mark.parametrize("lon,lat,zone,north", UTM_CASES)
def test_tm_roundtrip(lon, lat, zone, north):
    crs = CRS.utm(zone, north)
    x, y = crs.from_geographic(lon, lat)
    lon2, lat2 = crs.to_geographic(x, y)
    assert abs(float(lon2) - lon) < 1e-9
    assert abs(float(lat2) - lat) < 1e-9


def test_tm_vectorized_roundtrip(rng):
    lons = rng.uniform(6.0, 12.0, size=1000)
    lats = rng.uniform(-80.0, 80.0, size=1000)
    x, y = tm_forward(lons, lats, lon0_deg=9.0)
    lon2, lat2 = tm_inverse(x, y, lon0_deg=9.0)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)


def test_tm_jax_matches_numpy():
    """The same series code must run under jax.numpy. Projection math is
    f64-only by design (f32 loses ~100 m to cancellation); device kernels
    consume f32 *pixel-index* fields instead, where f32 is ample."""
    import jax
    import jax.numpy as jnp
    lons = np.linspace(6.5, 11.5, 64)
    lats = np.linspace(30.0, 60.0, 64)
    xn, yn = tm_forward(lons, lats, lon0_deg=9.0)
    old = jax.config.jax_enable_x64
    try:
        jax.config.update("jax_enable_x64", True)
        xj, yj = tm_forward(jnp.asarray(lons, dtype=jnp.float64),
                            jnp.asarray(lats, dtype=jnp.float64),
                            lon0_deg=9.0, xp=jnp)
        np.testing.assert_allclose(np.asarray(xj), xn, rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(yj), yn, rtol=0, atol=1e-6)
    finally:
        jax.config.update("jax_enable_x64", old)


def test_epsg_codes():
    assert CRS.utm(32, True).epsg == 32632
    assert CRS.utm(19, False).epsg == 32719
    assert CRS.geographic().epsg == 4326
    assert CRS.from_epsg(32633) == CRS.utm(33, True)
    assert CRS.from_epsg(4326).is_geographic
    with pytest.raises(ValueError):
        CRS.from_epsg(3857)


def test_utm_zone_selection():
    assert utm_zone_from_lonlat(13.4, 52.5) == (33, True)
    assert utm_zone_from_lonlat(-73.98, 40.75) == (18, True)
    assert utm_zone_from_lonlat(151.2, -33.85) == (56, False)


def test_aeqd_roundtrip():
    lon0, lat0 = 13.4, 52.5
    lons = np.array([13.4, 14.0, 12.8, 13.4])
    lats = np.array([52.5, 52.9, 52.1, 53.5])
    x, y = aeqd_forward(lons, lats, lon0, lat0)
    lon2, lat2 = aeqd_inverse(x, y, lon0, lat0)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)
    # centre maps to origin
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6


def test_aeqd_distance_is_geodesic_like():
    # 1 degree of latitude ~ 111.2 km on the sphere
    x, y = aeqd_forward(0.0, 1.0, 0.0, 0.0)
    assert abs(float(y) - 111195.0) < 100.0
    assert abs(float(x)) < 1e-6


def test_cea6933_known_scale():
    # EPSG:6933 x at lon=1 deg: a * k0 * radians(1) ~ 96486.3 m
    x, y = cea6933_forward(1.0, 0.0)
    assert abs(float(x) - 96486.0) < 10.0
    assert abs(float(y)) < 1e-6


def test_equal_area_square_degree():
    # 1x1 degree cell at the equator ~ 12364 km^2 on WGS84
    lons = [0.0, 1.0, 1.0, 0.0]
    lats = [0.0, 0.0, 1.0, 1.0]
    area = equal_area_sqm(lons, lats)
    assert abs(area / 1e6 - 12308.5) < 5.0


def test_transform_hub():
    utm = CRS.utm(33, True)
    x, y = transform(CRS.geographic(), utm, 13.377704, 52.516275)
    e, n = _snyder_tm(13.377704, 52.516275, 15.0)
    assert abs(float(x) - e) < 2e-3
    lon, lat = transform(utm, CRS.geographic(), x, y)
    assert abs(float(lon) - 13.377704) < 1e-8


def test_wkt_contains_epsg():
    assert '"32632"' in CRS.utm(32, True).to_wkt()
    assert '"4326"' in CRS.geographic().to_wkt()
