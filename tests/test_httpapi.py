"""HTTP API layer e2e: a live ThreadingHTTPServer over a real serving
table, exercising the reference's handler flow field-for-field
(handler.go:24-73, router.go, enableCORS, isRateLimited,
LinkOut/ApiError JSON tags)."""

from __future__ import annotations

import datetime
import json
import threading
import urllib.error
import urllib.request

import pytest

from globallinks_spark.httpapi import (
    RateLimiter,
    is_valid_domain,
    make_server,
    parse_api_request,
)
from globallinks_spark.operators.linkdb import (
    LinkQuery,
    get_domain_links,
    to_json_response,
)


class TestRateLimiter:
    def test_limit_and_window_reset(self):
        t = [0.0]
        rl = RateLimiter(limit=3, window_sec=900, clock=lambda: t[0])
        assert [rl.is_limited("a") for _ in range(3)] == [False] * 3
        assert rl.is_limited("a") is True          # 4th in window
        assert rl.is_limited("b") is False         # other clients unaffected
        t[0] = 901.0                               # window elapsed → reset
        assert rl.is_limited("a") is False

    def test_fifty_per_fifteen_minutes_defaults(self):
        t = [0.0]
        rl = RateLimiter(clock=lambda: t[0])       # reference defaults
        assert [rl.is_limited("ip")
                for _ in range(50)] == [False] * 50
        assert rl.is_limited("ip") is True
        assert rl.window_sec == 15 * 60 and rl.limit == 50


class TestEdgeValidation:
    def test_domain_regex_matches_reference_cases(self):
        # wat.go:125 regex semantics
        assert is_valid_domain("example.com")
        assert is_valid_domain("sub.EXAMPLE.co.uk")
        assert not is_valid_domain("nodots")
        assert not is_valid_domain("-bad.com")
        assert not is_valid_domain("exa mple.com")

    def test_url_to_host_normalization(self):
        q = parse_api_request(
            json.dumps({"domain": "https://www.example.com/path"}).encode()
        )
        assert q.domain == "www.example.com"       # handler.go:46-53

    def test_missing_domain_raises(self):
        with pytest.raises(KeyError):
            parse_api_request(b"{}")

    def test_filters_parse(self):
        q = parse_api_request(json.dumps({
            "domain": "d.com",
            "filters": [{"name": "Anchor", "val": "click", "kind": "any"}],
            "sort": "linkUrl", "order": "desc", "limit": 5, "page": 2,
        }).encode())
        assert q.filters == [("Anchor", "click", "any")]
        assert (q.sort, q.order, q.limit, q.page) == ("linkUrl", "desc", 5, 2)


@pytest.fixture(scope="module")
def served(spark):
    """Server over a 2-domain serving table; query_fn is the production
    get_domain_links + to_json_response composition."""
    from globallinks_spark.schemas import COMPACT_SCHEMA

    rows = [
        ("target-one.org", "", "/article", "", "2", f"page{i}.example.org",
         "/", "", "2", f"anchor {i}", i % 2, 0,
         datetime.date(2023, 1, 1 + i), datetime.date(2023, 2, 1 + i),
         f"10.0.0.{i}", 1)
        for i in range(5)
    ] + [
        ("other.net", "", "/x", "", "2", "src.example.org", "/", "", "2",
         "t", 0, 0, datetime.date(2023, 1, 1), datetime.date(2023, 1, 2),
         "10.9.9.9", 3),
    ]
    serving = spark.createDataFrame(rows, COMPACT_SCHEMA)

    def query_fn(q: LinkQuery):
        return to_json_response(get_domain_links(serving, q))

    srv = make_server(query_fn, host="127.0.0.1", port=0,
                      limiter=RateLimiter(limit=1000))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(base, payload):
    req = urllib.request.Request(
        base + "/api/links", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read()), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read()), dict(e.headers)


class TestEndToEnd:
    def test_health(self, served):
        with urllib.request.urlopen(served + "/api/health") as r:
            assert r.status == 200
            assert r.read() == b"I am alive!"      # healthcheck.go:18

    def test_links_response_matches_linkout_fields(self, served):
        status, docs, headers = _post(served, {"domain": "target-one.org"})
        assert status == 200
        assert headers["Access-Control-Allow-Origin"] == "*"
        assert len(docs) == 5
        # LinkOut JSON tags, field-for-field (models.go:28-38)
        assert set(docs[0]) == {
            "link_url", "page_url", "link_text", "no_follow", "no_index",
            "date_from", "date_to", "ip", "qty",
        }
        assert docs[0]["link_url"] == "https://target-one.org/article"
        assert docs[0]["date_from"] == "2023-01-01"
        assert docs[0]["ip"] == ["10.0.0.0"]
        assert docs[0]["qty"] == 1

    def test_filters_and_pagination(self, served):
        status, docs, _ = _post(served, {
            "domain": "target-one.org",
            "filters": [{"name": "No Follow", "val": "1", "kind": "exact"}],
        })
        assert status == 200
        assert len(docs) == 2 and all(d["no_follow"] == 1 for d in docs)
        status, docs, _ = _post(
            served, {"domain": "target-one.org", "limit": 2, "page": 3}
        )
        assert status == 200 and len(docs) == 1    # 5 rows → page 3 of 2

    def test_url_domain_normalized(self, served):
        status, docs, _ = _post(served, {"domain": "http://other.net/deep"})
        assert status == 200 and len(docs) == 1 and docs[0]["qty"] == 3

    def test_error_paths(self, served):
        status, doc, _ = _post(served, {})
        assert (status, doc["errorCode"]) == (400, "ErrorNoDomain")
        status, doc, _ = _post(served, {"domain": "not a domain"})
        assert (status, doc["errorCode"]) == (400, "ErrorInvalidDomain")
        req = urllib.request.Request(
            served + "/api/links", data=b"{not json", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        assert json.loads(ei.value.read())["errorCode"] == "ErrorParsing"

    def test_options_cors_preflight(self, served):
        req = urllib.request.Request(served + "/api/links", method="OPTIONS")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert r.headers["Access-Control-Allow-Origin"] == "*"

    def test_rate_limited_request_gets_429(self, spark):
        srv = make_server(
            lambda q: [], host="127.0.0.1", port=0,
            limiter=RateLimiter(limit=1),
        )
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            status, _, _ = _post(base, {"domain": "example.com"})
            assert status == 200
            status, doc, _ = _post(base, {"domain": "example.com"})
            assert (status, doc["errorCode"]) == (429, "ErrorTooManyRequests")
        finally:
            srv.shutdown()


class TestTLS:
    """The reference's production mode serves TLS
    (linkdb.go:51 ListenAndServeTLS) — the server must accept
    certfile/keyfile and answer over https."""

    @pytest.fixture(scope="class")
    def cert_pair(self, tmp_path_factory):
        import subprocess

        d = tmp_path_factory.mktemp("tls")
        cert, key = str(d / "cert.pem"), str(d / "key.pem")
        subprocess.run(
            ["openssl", "req", "-x509", "-newkey", "rsa:2048",
             "-keyout", key, "-out", cert, "-days", "2", "-nodes",
             "-subj", "/CN=localhost",
             "-addext", "subjectAltName=IP:127.0.0.1"],
            check=True, capture_output=True,
        )
        return cert, key

    @pytest.fixture(scope="class")
    def tls_served(self, cert_pair):
        cert, key = cert_pair
        srv = make_server(
            lambda q: ['{"ok": 1}'], host="127.0.0.1", port=0,
            limiter=RateLimiter(limit=1000),
            certfile=cert, keyfile=key,
        )
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        yield f"https://127.0.0.1:{srv.server_address[1]}", cert
        srv.shutdown()

    def test_health_over_https(self, tls_served):
        import ssl

        base, cert = tls_served
        ctx = ssl.create_default_context(cafile=cert)
        with urllib.request.urlopen(
            base + "/api/health", context=ctx
        ) as r:
            assert r.status == 200
            assert r.read() == b"I am alive!"

    def test_links_over_https(self, tls_served):
        import ssl

        base, cert = tls_served
        ctx = ssl.create_default_context(cafile=cert)
        req = urllib.request.Request(
            base + "/api/links",
            data=json.dumps({"domain": "example.com"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, context=ctx) as r:
            assert r.status == 200
            assert json.loads(r.read()) == [{"ok": 1}]

    def test_plain_http_to_tls_port_fails(self, tls_served):
        """A cleartext client against the TLS socket must NOT silently
        succeed — the reference's production listener is TLS-only."""
        base, _ = tls_served
        plain = base.replace("https://", "http://")
        with pytest.raises(Exception):
            urllib.request.urlopen(plain + "/api/health", timeout=5)


class TestMalformedFilters:
    def test_non_dict_filter_entries_return_400(self, served):
        """A filters list of strings must surface as the reference's 400
        ErrorParsing, not an uncaught AttributeError dropping the
        connection (round-2 review finding)."""
        for bad in (["nofollow"], "nofollow", {"name": "x"}, [1, 2]):
            status, doc, _ = _post(
                served, {"domain": "example.com", "filters": bad}
            )
            assert (status, doc["errorCode"]) == (400, "ErrorParsing"), bad
