"""Extraction pipeline — WAT pages → filtered external-link rows.

Re-expresses the reference's per-file parse loop
(/root/reference/pkg/commoncrawl/wat.go:249-556) as one declarative plan:

    read_wat_pages → page URL kernel (P1-P6) → page gates (F1,F7,F13,F14)
    → explode(links) (J1 avoided: page columns carried through the explode)
    → link gates (F3-F6,F7,F11,F12) → per-file dedup (A1/A2)
    → 14-column link frame (+ optional 10-column page frame with A3 counters)

The reference needs an explicit link→page hash join (J1, wat.go:897-917)
because pages and links travel in separate hash maps; the explode keeps
them in one row, so the join disappears entirely — the cheapest join is
the one the plan never does.

Filters run **before** the explode where they depend only on the page
(noindex, canonical, page URL quality) so dropped pages never pay the
explode fan-out; Catalyst additionally pushes the cheap string gates into
the scan stage (SURVEY §4 X3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from globallinks_spark.functions import predicates as P
from globallinks_spark.functions import urltools as U


def _robots_flag(metas: Column, token: str) -> Column:
    """P5 — 1 when any meta name=='robots' has content containing token
    (getNoFollowNoIndex, wat.go:448-477); 0 when metas is null/empty."""
    hit = F.exists(
        metas,
        lambda m: (m.getField("name") == "robots")
        & m.getField("content").contains(token),
    )
    return F.when(hit, F.lit(1)).otherwise(F.lit(0))


def _canonicals(head_links: Column) -> Column:
    """rel=canonical hrefs from Head.Link (wat.go:775-780)."""
    return F.transform(
        F.filter(
            F.coalesce(head_links, F.array()),
            lambda l: (l.getField("rel") == "canonical")
            & (l.getField("url") != ""),
        ),
        lambda l: l.getField("url"),
    )


def pages_with_url_record(wat_pages: DataFrame) -> DataFrame:
    """Page-level kernel: URL parts, eTLD+1, flags, dates; keeps every page
    that passes F1 (header) + F7 (record quality) — content gates come
    next so callers can also compute counters on gated-out pages."""
    df = (
        wat_pages
        # F1 — the reference only accepts header lines starting
        # 'WARC-Target-URI: http' (wat.go:302)
        .filter(
            F.col("target_uri").startswith("http")
            & ~F.col("target_uri").contains("\n")
        )
        .withColumn("page_scheme", U.scheme_code(U.url_scheme(F.col("target_uri"))))
        .withColumn("page_host", U.url_host(F.col("target_uri")))
        .withColumn("page_path", U.url_path(F.col("target_uri")))
        .withColumn("page_raw_query", U.url_raw_query(F.col("target_uri")))
        .filter(P.path_ok(F.col("page_path")))
        .withColumn("page_domain", U.etld_plus_one(F.col("page_host")))
        .filter(
            P.record_quality_ok(
                F.col("page_domain"), F.col("page_host"), F.col("page_raw_query")
            )
        )
        .withColumn("no_index", _robots_flag(F.col("metas"), "noindex"))
        .withColumn("page_no_follow", _robots_flag(F.col("metas"), "nofollow"))
        .withColumn("date_imported", F.to_date(F.col("warc_date")))
        .withColumn("ip", F.coalesce(F.col("warc_ip"), F.lit("")))
    )
    return df


def content_quality_gate(pages: DataFrame) -> DataFrame:
    """F13 (noindex) + F14 (canonical mismatch) — verifyContentQuality,
    wat.go:736-755. All canonical entries must point at this page."""
    canon_ok = F.forall(
        _canonicals(F.col("head_links")),
        lambda c: P.canonical_ok(
            F.col("page_host"), F.col("page_path"),
            F.col("page_raw_query"), c,
        ),
    )
    return pages.filter(P.page_indexable(F.col("no_index")) & canon_ok)


def explode_links(pages: DataFrame) -> DataFrame:
    """Explode the nested link array; classify each href exactly as the
    reference's parseLinks loop does (wat.go:482-556). Emits every anchor
    with a ``link_class`` column ∈ {internal, external, emitted, skipped}
    so A3 counters and the link output share one pass."""
    df = pages.select(
        "*", F.explode(F.col("links")).alias("l")
    ).filter(P.is_anchor(F.col("l.path")))  # F3 — <a href> only

    df = (
        df.withColumn("href", F.col("l.url"))
        .withColumn("link_text", F.coalesce(F.col("l.text"), F.lit("")))
        .withColumn(
            "no_follow",
            F.greatest(
                F.col("page_no_follow"),
                F.when(
                    F.coalesce(F.col("l.rel"), F.lit("")).startswith("nofollow"),
                    F.lit(1),
                ).otherwise(F.lit(0)),
            ),
        )
        .withColumn("is_absolute", P.is_absolute(F.col("href")))
        .withColumn("link_scheme", U.scheme_code(U.url_scheme(F.col("href"))))
        .withColumn("link_host", U.url_host(F.col("href")))
        .withColumn("link_path", U.url_path(F.col("href")))
        .withColumn("link_raw_query", U.url_raw_query(F.col("href")))
        .withColumn(
            "link_domain",
            F.when(F.col("is_absolute"), U.etld_plus_one(F.col("link_host"))),
        )
    )

    parse_ok = (
        ~F.col("href").contains("\n")
        & P.path_ok(F.col("link_path"))
        & F.col("link_host").isNotNull()
    )
    quality_ok = P.record_quality_ok(
        F.col("link_domain"), F.col("link_host"), F.col("link_raw_query")
    )
    classify = (
        # F4 — relative href: internal, not emitted (wat.go:509-512)
        F.when(~F.col("is_absolute"), F.lit("internal"))
        # unparseable href: skipped silently (buildURLRecord false, wat.go:521-524)
        .when(~parse_ok, F.lit("skipped"))
        # F5 — same host: internal (wat.go:527-530)
        .when(F.col("link_host") == F.col("page_host"), F.lit("internal"))
        # F6 — same registrable domain: counted external, not emitted
        .when(F.col("link_domain") == F.col("page_domain"), F.lit("external"))
        # F7 — record quality: counted external, not emitted (wat.go:548-551)
        .when(~quality_ok, F.lit("external"))
        # F12 — media/doc extension: skipped, no counter (wat.go:543-546)
        .when(~P.extension_not_blocked(F.col("link_path")), F.lit("skipped"))
        # F11 — blocklisted domain: counted external, not emitted
        .when(~P.domain_not_blocked(F.col("link_domain")), F.lit("external"))
        .otherwise(F.lit("emitted"))
    )
    return df.withColumn("link_class", classify)


def link_rows(classified: DataFrame) -> DataFrame:
    """The 14-column link frame (LINK_SCHEMA order), deduped on the
    reference's per-file key — link host+path+query × page host+path+query
    (A2, farmhash key at wat.go:365). dropDuplicates compiles to a
    partial-then-final aggregate around one shuffle, which is exactly the
    reference's per-file map + global sort -u staging (SURVEY §4 X1)."""
    return (
        classified.filter(F.col("link_class") == "emitted")
        .withColumn(
            "link_sub_domain", U.subdomain(F.col("link_host"), F.col("link_domain"))
        )
        .withColumn("link_text", U.scrub_delimiter(F.col("link_text")))
        .select(
            "link_domain", "link_sub_domain", "link_path", "link_raw_query",
            "link_scheme", "page_host", "page_path", "page_raw_query",
            "page_scheme", "link_text", "no_follow", "no_index",
            "date_imported", "ip",
        )
        .dropDuplicates([
            "link_domain", "link_sub_domain", "link_path", "link_raw_query",
            "page_host", "page_path", "page_raw_query",
        ])
    )


def page_rows(classified: DataFrame) -> DataFrame:
    """The 10-column page frame with A3 internal/external counters
    (increments at wat.go:510,528,534,539,549,553), deduped on the page key
    (A1, wat.go:341-342)."""
    counters = classified.groupBy(
        "page_host", "page_path", "page_raw_query", "page_scheme",
        "title", "ip", "date_imported", "no_index",
    ).agg(
        F.sum(F.when(F.col("link_class") == "internal", 1).otherwise(0))
        .cast("int").alias("internal_links"),
        F.sum(F.when(F.col("link_class").isin("external", "emitted"), 1).otherwise(0))
        .cast("int").alias("external_links"),
    )
    return counters.select(
        F.col("page_host").alias("host"),
        F.col("page_path").alias("path"),
        F.col("page_raw_query").alias("raw_query"),
        F.col("page_scheme").alias("scheme"),
        U.scrub_delimiter(F.coalesce(F.col("title"), F.lit(""))).alias("title"),
        "ip",
        F.col("date_imported").alias("imported"),
        "internal_links", "external_links", "no_index",
    ).dropDuplicates(["host", "path", "raw_query"])


def extract_links(wat_pages: DataFrame) -> DataFrame:
    """End-to-end: WAT page frame → 14-column external link rows."""
    return link_rows(
        explode_links(content_quality_gate(pages_with_url_record(wat_pages)))
    )


def extract_pages(wat_pages: DataFrame) -> DataFrame:
    """End-to-end: WAT page frame → 10-column page rows with counters."""
    return page_rows(
        explode_links(content_quality_gate(pages_with_url_record(wat_pages)))
    )
