"""Live-HTTP ingestion round trips (VERDICT r05 §missing item 3).

The source operators keep the network fetch OUT of the query plan by
design (driver-side work; ingest.py module docstring) — but until now
their parse/extract stages were only ever exercised on payloads the
queries synthesized themselves. These tests stand up a REAL local
HTTP server (the q_sink_http_form precedent, tests/test_streaming.py),
fetch the payloads over the wire exactly as a driver-side collector
would, and push the fetched bytes through the SAME engine functions
the registered queries use (parse_measurement_payloads /
scrape_pressure) — closing the loop from socket to typed columns.
"""

from __future__ import annotations

import json
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from threading import Thread

from metoffice_spark.operators.ingest import (
    parse_measurement_payloads,
    scrape_pressure,
)

_MEASUREMENT_DOC = {
    "devices": [
        {
            "deviceid": "st1-th",
            "measurement": {"ts": 1700000000, "t1": 21.5, "h": 63.0},
        },
        {
            "deviceid": "st1-wind",
            "measurement": {"ts": 1700000000, "ws": 4.2, "wg": 7.9, "wd": 11},
        },
        {
            "deviceid": "st1-rain",
            "measurement": {"ts": 1699999700, "r": 12.4},
        },
    ]
}

_BARO_PAGE = (
    "<html><body><table><tr><td>Barometer</td>"
    "<td>Pressure p=1013.2 hPa</td></tr></table></body></html>"
)
_BARO_PAGE_3DIGIT = "<p>Pressure p=998.7 hPa (falling)</p>"


class _Handler(BaseHTTPRequestHandler):
    routes = {
        "/measurements": ("application/json", json.dumps(_MEASUREMENT_DOC)),
        "/baro": ("text/html", _BARO_PAGE),
        "/baro3": ("text/html", _BARO_PAGE_3DIGIT),
    }

    def do_GET(self):  # noqa: N802 - http.server API
        route = self.routes.get(self.path)
        if route is None:
            self.send_error(404)
            return
        ctype, body = route
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # quiet
        pass


def _serve():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    Thread(target=server.serve_forever, daemon=True).start()
    return server, f"http://127.0.0.1:{server.server_port}"


def _fetch(url: str) -> str:
    with urllib.request.urlopen(url, timeout=10) as resp:
        assert resp.status == 200
        return resp.read().decode()


def test_rest_json_fetched_over_http_parses_to_typed_columns(spark):
    server, base = _serve()
    try:
        body = _fetch(f"{base}/measurements")
    finally:
        server.shutdown()
    payloads = spark.createDataFrame([("r1", body)], "req_id string, payload string")
    row = parse_measurement_payloads(payloads, "payload", keep=["req_id"]).first()
    assert row.req_id == "r1"
    assert row.deviceid_th == "st1-th"
    assert row.t1 == 21.5 and row.h == 63.0
    assert row.ws == 4.2 and row.wg == 7.9 and row.wd == 11
    assert row.r == 12.4 and row.rain_ts_epoch == 1699999700


def test_html_scrape_fetched_over_http_extracts_pressure(spark):
    server, base = _serve()
    try:
        page4 = _fetch(f"{base}/baro")
        page3 = _fetch(f"{base}/baro3")
    finally:
        server.shutdown()
    pages = spark.createDataFrame(
        [("p4", page4), ("p3", page3)], "page_id string, page string"
    )
    rows = {
        r.page_id: r
        for r in scrape_pressure(pages, "page", keep=["page_id"]).collect()
    }
    # 4-digit pressure: the wide 6-char slice parses directly
    assert rows["p4"].pressure_scraped == 1013.2
    assert rows["p4"].slice_wide == "1013.2"
    # 3-digit pressure: the wide slice picks up the '=' and fails to
    # parse; the narrow 5-char retry recovers it (MWC:181-183)
    assert rows["p3"].slice_wide == "=998.7"
    assert rows["p3"].pressure_scraped == 998.7


def test_http_parse_matches_registered_query_output_shape(spark, sf_smoke):
    """The live-HTTP path and q_src_json_rest/q_src_text_scrape share
    ONE implementation: their output schemas must stay identical, so
    a refactor cannot silently fork the wire path from the oracle-
    gated path."""
    from metoffice_spark.operators.ingest import q_src_json_rest, q_src_text_scrape

    payloads = spark.createDataFrame([("x", "{}")], "req_id string, payload string")
    via_http = parse_measurement_payloads(payloads, "payload", keep=["req_id"])
    assert [f for f in via_http.schema.fieldNames() if f != "req_id"] == [
        f for f in q_src_json_rest(spark, sf_smoke).schema.fieldNames()
        if f != "obs_id"
    ]

    pages = spark.createDataFrame([("x", "no anchor")], "page_id string, page string")
    via_scrape = scrape_pressure(pages, "page", keep=["page_id"])
    assert [f for f in via_scrape.schema.fieldNames() if f != "page_id"] == [
        f for f in q_src_text_scrape(spark, sf_smoke).schema.fieldNames()
        if f != "obs_id"
    ]
