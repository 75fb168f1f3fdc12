"""Predicate tests mirroring the reference's table-driven cases
(wat_test.go:14-34 validateHost, 410-430 ignoreTLD, 432-454 extensions,
456-476 domains, 522-571 verifyRecordQuality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from globallinks_spark.functions import predicates as P


def _eval(spark, build, *row_and_schema):
    row, schema = row_and_schema
    df = spark.createDataFrame([row], schema)
    return df.select(build().alias("v")).first()["v"]


class TestHostIsClean:
    def _host(self, spark, host):
        return _eval(
            spark, lambda: P.host_is_clean(F.col("h")), (host,), "h string"
        )

    def test_ok(self, spark):
        assert self._host(spark, "www.example.com") is True

    def test_bad_chars(self, spark):
        for h in ("ex%ample.com", "ex[a].com", "a=b.com", "a'b.com",
                  "a*b.com", "a(b).com", "a<b>.com", "a&b.com", "a+b.com",
                  'a"b.com', "a;b.com" if False else "a`b.com"):
            assert self._host(spark, h) is False, h

    def test_ipv4_rejected(self, spark):
        assert self._host(spark, "192.168.1.1") is False

    def test_no_dot_rejected(self, spark):
        assert self._host(spark, "localhost") is False


class TestDomainValid:
    def _dom(self, spark, d):
        return _eval(
            spark, lambda: P.domain_is_valid(F.col("d")), (d,), "d string"
        )

    def test_ok(self, spark):
        assert self._dom(spark, "example.com") is True
        assert self._dom(spark, "sub-domain.co.uk") is True

    def test_bad(self, spark):
        assert self._dom(spark, "-bad.com") is False
        assert self._dom(spark, "bad-.com") is False
        assert self._dom(spark, "example.c") is False
        assert self._dom(spark, "example") is False

    def test_case_insensitive(self, spark):
        assert self._dom(spark, "EXAMPLE.COM") is True


class TestBlocklists:
    def test_tld(self, spark):
        f = lambda d: _eval(
            spark, lambda: P.tld_not_blocked(F.col("d")), (d,), "d string"
        )
        assert f("example.cn") is False
        assert f("foo.blogspot.com") is False
        assert f("example.com") is True

    def test_domain(self, spark):
        f = lambda d: _eval(
            spark, lambda: P.domain_not_blocked(F.col("d")), (d,), "d string"
        )
        assert f("facebook.com") is False
        assert f("FACEBOOK.com") is False
        assert f("example.com") is True

    def test_extension(self, spark):
        f = lambda p: _eval(
            spark,
            lambda: P.extension_not_blocked(F.col("p")), (p,), "p string",
        )
        assert f("/img/photo.jpg") is False
        assert f("/doc.PDF") is False
        assert f("/page.html") is True
        assert f("/x/y.tar.gz") is False  # final .gz
        assert f("/a.b/c") is True        # dot in dir, not in file
        assert f("/plain") is True


class TestRecordQuality:
    def _q(self, spark, domain, host, query):
        return _eval(
            spark,
            lambda: P.record_quality_ok(
                F.col("d"), F.col("h"), F.col("q")
            ),
            (domain, host, query),
            "d string, h string, q string",
        )

    def test_ok(self, spark):
        assert self._q(spark, "example.com", "www.example.com", "a=1") is True

    def test_empty_domain(self, spark):
        assert self._q(spark, "", "www.example.com", "") is False

    def test_long_query(self, spark):
        assert self._q(spark, "example.com", "e.com", "q" * 201) is False

    def test_query_pipe(self, spark):
        assert self._q(spark, "example.com", "e.com", "a|b") is False


class TestCanonical:
    def _c(self, spark, host, path, query, canon):
        return _eval(
            spark,
            lambda: P.canonical_ok(
                F.col("h"), F.col("p"), F.col("q"), F.col("c")
            ),
            (host, path, query, canon),
            "h string, p string, q string, c string",
        )

    def test_no_canonical_keeps(self, spark):
        assert self._c(spark, "e.com", "/a", "", "") is True

    def test_same_page_keeps(self, spark):
        assert self._c(spark, "e.com", "/a", "", "https://e.com/a") is True

    def test_other_host_drops(self, spark):
        assert self._c(spark, "e.com", "/a", "", "https://o.com/a") is False

    def test_other_path_drops(self, spark):
        assert self._c(spark, "e.com", "/a", "", "https://e.com/b") is False

    def test_relative_same_keeps(self, spark):
        assert self._c(spark, "e.com", "/a", "", "/a") is True

    def test_relative_with_query_drops(self, spark):
        # raw-string compare: '/a?x=1' != '/a' (wat.go:800-806)
        assert self._c(spark, "e.com", "/a", "", "/a?x=1") is False

    def test_page_query_with_canonical_drops(self, spark):
        assert self._c(spark, "e.com", "/a", "x=1", "https://e.com/a") is False

    def test_default_root_path(self, spark):
        assert self._c(spark, "e.com", "/", "", "https://e.com") is True
