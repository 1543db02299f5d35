"""Recorded-response fixtures served over a REAL local HTTP socket so the
live catalog code paths — ``_default_fetch_json`` (GET params + POST
bodies + pagination), ``_default_download`` (streaming + Earthdata
bearer token), and ``HttpRangeSource._default_fetch`` (ranged GETs) —
actually execute in CI instead of being dead code behind injectable
fetchers. Reference behaviors exercised: EMIT_utils.py:75-116 (CMR
search + token download), s2_utils.py:137-144 + 268-278 (STAC search +
streaming download), cloud_utils.py:33-53 (remote windowed reads)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np
import pytest

from hyperres.catalog.clients import (CatalogUnavailableError, CmrClient,
                                      StacClient, _default_download,
                                      _default_fetch_json)


def _cmr_item(name, day, cloud):
    return {
        "meta": {"native-id": name},
        "umm": {
            "CloudCover": cloud,
            "TemporalExtent": {"RangeDateTime": {
                "BeginningDateTime": f"2023-08-{day:02d}T11:01:26Z"}},
            "RelatedUrls": [
                {"Type": "GET DATA",
                 "URL": f"/files/EMIT_L2A_RFL_{name}.nc"},
                {"Type": "GET DATA",
                 "URL": f"/files/EMIT_L2A_MASK_{name}.nc"},
            ],
        },
    }


class _Handler(BaseHTTPRequestHandler):
    server_version = "FixtureHTTP/1.0"
    payload = b"granule-bytes-" + bytes(range(256)) * 40

    def log_message(self, *a):  # keep pytest output clean
        pass

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        u = urlparse(self.path)
        q = parse_qs(u.query)
        if u.path == "/search/granules.umm_json":
            # canned CMR page: echoes back what the client encoded so the
            # test can assert the request formatting end-to-end
            self.server.seen.append(("cmr", dict(q)))
            page = int(q.get("page_num", ["1"])[0])
            items = ([_cmr_item("A1", 19, 12.0), _cmr_item("A2", 19, 5.0)]
                     if page == 1 else [])
            self._json({"items": items})
        elif u.path.startswith("/files/"):
            self.server.seen.append(
                ("download", self.headers.get("Authorization")))
            self.send_response(200)
            self.send_header("Content-Length", str(len(self.payload)))
            self.end_headers()
            self.wfile.write(self.payload)
        elif u.path == "/noranged.bin":
            # server that IGNORES the Range header (200 + full body)
            blob = self.server.ranged_blob
            self.send_response(200)
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)
        elif u.path == "/ranged.bin":
            rng = self.headers.get("Range", "")
            start, end = rng.split("=")[1].split("-")
            start, end = int(start), int(end)
            self.server.seen.append(("range", (start, end)))
            blob = self.server.ranged_blob
            chunk = blob[start:end + 1]
            self.send_response(206)
            self.send_header("Content-Range",
                             f"bytes {start}-{start + len(chunk) - 1}"
                             f"/{len(blob)}")
            self.send_header("Content-Length", str(len(chunk)))
            self.end_headers()
            self.wfile.write(chunk)
        elif u.path == "/missing":
            self._json({"error": "not found"}, code=404)
        else:
            self._json({}, code=404)

    def do_POST(self):
        u = urlparse(self.path)
        n = int(self.headers.get("Content-Length", "0"))
        body = json.loads(self.rfile.read(n) or b"{}")
        if u.path == "/stac/search":
            self.server.seen.append(("stac", body))
            # stac-fastapi style pagination: the next link carries ONLY
            # a token body with merge=true — the client must merge it
            # into the original request, keeping the search filters
            if "token" not in body:
                self._json({
                    "features": [{"id": "S2A_1", "assets": {}}],
                    "links": [{"rel": "next",
                               "href": f"http://{self.headers['Host']}"
                                       "/stac/search",
                               "merge": True,
                               "body": {"token": "next:page2"}}],
                })
            elif body.get("collections"):  # filters survived the merge
                self._json({"features": [{"id": "S2B_2", "assets": {}}],
                            "links": []})
            else:  # filters dropped -> infinite junk page (the bug)
                self._json({"features": [{"id": "JUNK", "assets": {}}],
                            "links": []})
        else:
            self._json({}, code=404)


@pytest.fixture()
def live_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.seen = []
    srv.ranged_blob = bytes(np.random.default_rng(7).integers(
        0, 256, size=1 << 20, dtype=np.uint8))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield base, srv
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_default_fetch_json_cmr_search(live_server, monkeypatch):
    """CmrClient.search through the real requests layer: GET params
    (bbox/temporal/cloud formatting) reach the wire, pagination stops on
    a short page."""
    base, srv = live_server
    import hyperres.catalog.clients as cc
    monkeypatch.setattr(cc, "CMR_GRANULE_SEARCH",
                        f"{base}/search/granules.umm_json")
    client = CmrClient()  # default (live) fetch_json + download
    items = client.search(bbox=(10.0, 45.0, 11.0, 46.0),
                          temporal=("2023-08-01", "2023-08-31"),
                          cloud_cover=(0.0, 50.0), page_size=2)
    assert [i["meta"]["native-id"] for i in items] == ["A1", "A2"]
    kind, q = srv.seen[0]
    assert kind == "cmr"
    assert q["bounding_box"] == ["10.00000000,45.00000000,"
                                 "11.00000000,46.00000000"]
    assert q["temporal"] == ["2023-08-01,2023-08-31"]
    assert q["cloud_cover"] == ["0.0,50.0"]


def test_default_download_with_earthdata_token(live_server, tmp_path,
                                               monkeypatch):
    """download_granule_files streams over HTTP and attaches the
    Earthdata bearer token from the environment (EMIT_utils.py:31-32
    login equivalent)."""
    base, srv = live_server
    monkeypatch.setenv("EARTHDATA_TOKEN", "tok-123")
    import hyperres.catalog.clients as cc
    monkeypatch.setattr(cc, "CMR_GRANULE_SEARCH",
                        f"{base}/search/granules.umm_json")
    client = CmrClient()
    item = _cmr_item("A1", 19, 12.0)
    for u in item["umm"]["RelatedUrls"]:
        u["URL"] = base + u["URL"]
    paths = client.download_granule_files(item, tmp_path)
    assert [p.name for p in paths] == ["EMIT_L2A_RFL_A1.nc",
                                       "EMIT_L2A_MASK_A1.nc"]
    assert paths[0].read_bytes() == _Handler.payload
    auths = [a for k, a in srv.seen if k == "download"]
    assert auths == ["Bearer tok-123"] * 2
    # cached on re-request: no extra hits
    n = len(srv.seen)
    client.download_granule_files(item, tmp_path)
    assert len(srv.seen) == n


def test_default_fetch_json_stac_pagination(live_server):
    """StacClient.search POSTs the body and follows 'next' links through
    the real requests layer."""
    base, srv = live_server
    client = StacClient(f"{base}/stac")
    items = client.search(collections=["sentinel-2-l2a"],
                          bbox=(10, 45, 11, 46),
                          datetime_range="2023-08-01/2023-08-31")
    assert [i["id"] for i in items] == ["S2A_1", "S2B_2"]
    bodies = [b for k, b in srv.seen if k == "stac"]
    assert bodies[0]["collections"] == ["sentinel-2-l2a"]
    assert bodies[0]["bbox"] == [10.0, 45.0, 11.0, 46.0]
    assert bodies[0]["datetime"] == "2023-08-01/2023-08-31"
    # merge=true token link: filters AND token both present on page 2
    assert bodies[1]["token"] == "next:page2"
    assert bodies[1]["collections"] == ["sentinel-2-l2a"]


def test_default_fetch_json_error_wrapped(live_server):
    base, _ = live_server
    with pytest.raises(CatalogUnavailableError):
        _default_fetch_json(f"{base}/missing")


def test_http_range_source_default_fetch(live_server):
    """HttpRangeSource with its DEFAULT (requests) fetcher against a
    real ranged-GET server: windowed reads return the exact bytes and
    block caching bounds the request count (cloud_utils.py:33-53
    /vsicurl equivalent)."""
    base, srv = live_server
    from hyperres.io.tiff import HttpRangeSource
    src = HttpRangeSource(f"{base}/ranged.bin", block_size=1 << 16)
    blob = srv.ranged_blob
    assert src.pread(0, 16) == blob[:16]
    assert src.pread(100_000, 40) == blob[100_000:100_040]
    # crosses a block boundary
    assert src.pread((1 << 16) - 8, 32) == blob[(1 << 16) - 8:(1 << 16) + 24]
    # block caching: 3 windows touched blocks 0 and 1 => exactly 2 hits
    ranges = [r for k, r in srv.seen if k == "range"]
    assert ranges == [(0, (1 << 16) - 1), (1 << 16, (1 << 17) - 1)]
    # repeated read hits the cache, not the wire
    assert src.pread(4, 8) == blob[4:12]
    assert len([r for k, r in srv.seen if k == "range"]) == 2


def test_download_failure_wrapped(live_server, tmp_path):
    base, _ = live_server
    with pytest.raises(CatalogUnavailableError):
        _default_download(f"{base}/missing", tmp_path / "x.bin")


def test_http_range_source_server_ignores_range(live_server):
    """A server that answers 200 with the full body instead of 206 must
    not poison the block cache with wrongly-offset bytes."""
    base, srv = live_server
    from hyperres.io.tiff import HttpRangeSource
    src = HttpRangeSource(f"{base}/noranged.bin", block_size=1 << 16)
    blob = srv.ranged_blob
    assert src.pread(100_000, 32) == blob[100_000:100_032]
    assert src.pread(0, 8) == blob[:8]
