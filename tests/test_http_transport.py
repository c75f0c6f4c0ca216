"""Transport-level integration tests (r4 verdict #6).

The E1-E3 urllib transport factories were previously never executed —
every pipeline test injects fake transports. Here a real ``http.server``
runs on 127.0.0.1 and the REAL factories drive it through ``http_enrich``
(mapInPandas on local workers), pinning: POST body handling (E1), redirect
following + final-URL return (E2), JSON geocode parsing incl. the
empty-hit '' case (E3), and the 500 -> retry -> sentinel path for each.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from wopen_spark.operators.http_enrich import (
    EnrichConfig,
    fbid_transport_factory,
    geocode_transport_factory,
    http_enrich,
    redirect_transport_factory,
)

_FBIDS = {"https://facebook.com/assoparis": "12345", "https://facebook.com/chorale": "67890"}
_GEO = {"1 rue de Rivoli, Paris": ("48.8556", "2.3622")}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # silence test output
        pass

    def _send(self, code: int, body: bytes = b"", headers: dict | None = None):
        self.send_response(code)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):  # E1 fbid resolver
        length = int(self.headers.get("Content-Length", 0))
        form = parse_qs(self.rfile.read(length).decode())
        url = (form.get("url") or [""])[0]
        if url == "https://facebook.com/boom":
            self._send(500, b"internal error")
        elif url in _FBIDS:
            self._send(200, _FBIDS[url].encode())
        else:
            self._send(404, b"unknown")

    def do_GET(self):
        parsed = urlparse(self.path)
        if parsed.path.startswith("/fb/"):  # E2 redirect chain
            slug = parsed.path[len("/fb/") :]
            if slug == "500":
                self._send(500)
            elif parsed.path.endswith("/final"):
                self._send(200, b"profile page")
            else:
                self._send(302, headers={"Location": f"/fb/{slug}/final"})
        elif parsed.path == "/search":  # E3 geocode
            q = (parse_qs(parsed.query).get("q") or [""])[0]
            if q == "error street":
                self._send(500)
            else:
                hit = _GEO.get(q)
                body = (
                    [{"lat": hit[0], "lon": hit[1]}] if hit else []
                )
                self._send(200, json.dumps(body).encode(),
                           {"Content-Type": "application/json"})
        else:
            self._send(404)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


_FAST = EnrichConfig(concurrency=4, retries=1, backoff_s=0.01)


def test_fbid_transport_post_and_sentinel(spark, server):
    df = spark.createDataFrame(
        [
            ("https://facebook.com/assoparis",),
            ("https://facebook.com/chorale",),
            ("https://facebook.com/boom",),  # 500 -> retry -> sentinel
        ],
        ["fb_url"],
    )
    out = http_enrich(
        df,
        "fb_url",
        lambda: fbid_transport_factory(base_url=f"{server}/"),
        out_col="fb_id",
        config=EnrichConfig(concurrency=4, retries=1, backoff_s=0.01, sentinel="0"),
    )
    got = {r.fb_url: r.fb_id for r in out.collect()}
    assert got == {
        "https://facebook.com/assoparis": "12345",
        "https://facebook.com/chorale": "67890",
        "https://facebook.com/boom": "0",
    }


def test_redirect_transport_follows_to_final_url(spark, server):
    df = spark.createDataFrame([("12345",), ("500",)], ["fb_id"])
    out = http_enrich(
        df,
        "fb_id",
        lambda: redirect_transport_factory(base_url=f"{server}/fb"),
        out_col="final_url",
        config=_FAST,
    )
    got = {r.fb_id: r.final_url for r in out.collect()}
    assert got["12345"] == f"{server}/fb/12345/final"  # redirect followed
    assert got["500"] == ""  # server error -> '' sentinel


def test_geocode_transport_parses_json_and_empty_hits(spark, server):
    df = spark.createDataFrame(
        [("1 rue de Rivoli, Paris",), ("nowhere special",), ("error street",)],
        ["address"],
    )
    out = http_enrich(
        df,
        "address",
        lambda: geocode_transport_factory(base_url=f"{server}/search"),
        out_col="coords",
        config=_FAST,
    )
    got = {r.address: r.coords for r in out.collect()}
    assert got == {
        "1 rue de Rivoli, Paris": "48.8556,2.3622",
        "nowhere special": "",  # no hits -> '' (reference semantics)
        "error street": "",  # 500 -> retry -> '' sentinel
    }
