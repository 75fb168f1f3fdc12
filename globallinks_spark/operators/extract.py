"""Extraction pipeline — WAT pages → filtered external-link rows.

Re-expresses the reference's per-file parse loop
(/root/reference/pkg/commoncrawl/wat.go:249-556) as one declarative plan:

    read_wat_pages → page kernel+gates (P1-P6, F1,F7,F13,F14)
    → explode(links) (J1 avoided: page columns carried through the explode)
    → link kernel+classification (F3-F6,F7,F11,F12) → per-file dedup (A1/A2)
    → 14-column link frame (+ optional 10-column page frame with A3 counters)

The reference needs an explicit link→page hash join (J1, wat.go:897-917)
because pages and links travel in separate hash maps; the explode keeps
them in one row, so the join disappears entirely.

Plan-shape discipline (load-bearing for throughput): each stage is ONE
Project followed by ONE Filter on a boolean computed in that Project.
Catalyst's filter pushdown inlines a predicate's full definition through
every intermediate Project it crosses — a chain of withColumn+filter
steps multiplies the URL/eTLD kernel hundreds of times into the plan
(measured: 494 copies of the tokenizer in the naive formulation, 2.7×
slower end-to-end). With the single-Project shape, each operator
evaluates every unique subexpression once (whole-stage codegen
subexpression elimination), so the kernel costs ~2 evaluations per row
(Project + pushed Filter) regardless of how many predicates consume it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from globallinks_spark.functions import predicates as P
from globallinks_spark.functions import urltools as U


from globallinks_spark.functions.binding import bind_once as _bind


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
    """Page kernel: URL parts, eTLD+1, robots flags, dates, then the
    F1+F7 gates. Shape: cheap raw gate (pushes into the scan) → binding
    Project (parse/eTLD evaluated once each) → gates on attributes."""
    uri = F.col("target_uri")
    # F1 raw-string part — before the binding Project so it reaches the scan
    gated = wat_pages.filter(uri.startswith("http") & ~uri.contains("\n"))

    host = U.url_host(uri)
    # Explicit column list, not "*": a broadcast join follows, and join
    # output rows are materialized (UnsafeRow copy) — carrying the raw
    # metas/head_links arrays and envelope scalars through it costs more
    # than the join itself. metas collapses to the two robots flags and
    # head_links to the (rare, short) canonicals array right here; only
    # the links array must survive to the explode.
    bound = gated.select(
        F.col("title"),
        F.col("links"),
        _canonicals(F.col("head_links")).alias("canonicals"),
        U.scheme_code(U.url_scheme(uri)).alias("page_scheme"),
        _bind(host).alias("page_host"),
        _bind(U.url_path(uri)).alias("page_path"),
        _bind(U.url_raw_query(uri)).alias("page_raw_query"),
        _robots_flag(F.col("metas"), "noindex").alias("no_index"),
        _robots_flag(F.col("metas"), "nofollow").alias("page_no_follow"),
        F.to_date(F.col("warc_date")).alias("date_imported"),
        F.coalesce(F.col("warc_ip"), F.lit("")).alias("ip"),
    )
    # eTLD+1 over the bound host attribute via the broadcast suffix-table
    # join (full PSL; map-side, no shuffle — see with_registrable_domain);
    # bound so the F7 gate below references an attribute, not the tree
    bound = U.with_registrable_domain(
        bound, "page_host", "page_domain", bind=True
    )
    return bound.filter(
        P.path_ok(F.col("page_path"))
        & P.record_quality_ok(                           # F7
            F.col("page_domain"), F.col("page_host"), F.col("page_raw_query")
        )
    )


def content_quality_gate(pages: DataFrame) -> DataFrame:
    """F13 (noindex) + F14 (canonical mismatch) — verifyContentQuality,
    wat.go:736-755. All canonical entries must point at this page. The
    predicate only references already-computed columns, so pushdown
    duplicates nothing heavy."""
    canon_ok = F.forall(
        F.col("canonicals"),
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
    so A3 counters and the link output share one pass.

    One Project computes the link kernel AND the classification; the
    anchor gate (F3) runs on the raw exploded struct before any kernel
    work."""
    # Explicit column list again: the link-side broadcast join below
    # materializes every exploded row, so only the slim page scalars may
    # ride along (the links array is consumed here; canonicals was only
    # for the page gate).
    exploded = pages.select(
        "page_host", "page_path", "page_raw_query", "page_scheme",
        "page_domain", "no_index", "page_no_follow", "date_imported",
        "ip", "title",
        F.explode(F.col("links")).alias("l"),
    ).filter(P.is_anchor(F.col("l.path")))  # F3 — <a href> only

    href = F.col("l.url")
    is_absolute = P.is_absolute(href)
    link_host = U.url_host(href)

    # binding Project: each URL parse evaluated once per link row
    bound_parts = exploded.select(
        "*",
        F.coalesce(F.col("l.text"), F.lit("")).alias("link_text"),
        F.greatest(
            F.col("page_no_follow"),
            F.when(
                F.coalesce(F.col("l.rel"), F.lit("")).startswith("nofollow"),
                F.lit(1),
            ).otherwise(F.lit(0)),
        ).alias("no_follow"),
        is_absolute.alias("_is_absolute"),
        (~href.contains("\n")).alias("_href_clean"),
        U.scheme_code(U.url_scheme(href)).alias("link_scheme"),
        # relative hrefs classify as 'internal' before any kernel column
        # is consulted (CaseWhen short-circuits), so parsing them would be
        # pure waste — on real crawls ~half of all anchors are relative
        _bind(F.when(is_absolute, link_host)).alias("link_host"),
        _bind(F.when(is_absolute, U.url_path(href))).alias("link_path"),
        _bind(F.when(is_absolute, U.url_raw_query(href)))
        .alias("link_raw_query"),
    )
    # eTLD+1 over the bound host attribute via the broadcast suffix-table
    # join (full PSL; map-side, no shuffle), bound behind the barrier so
    # the dozens of downstream references (classification, dedup keys,
    # subdomain) see an attribute instead of re-inlining the tree. A null
    # host (relative href) misses both joins and null-guards through.
    bound = U.with_registrable_domain(
        bound_parts, "link_host", "link_domain", bind=True
    )

    # classification references only attributes — a small tree that stays
    # in codegen even after the downstream filter inlines it once
    parse_ok = (
        F.col("_href_clean")
        & P.path_ok(F.col("link_path"))
        & F.col("link_host").isNotNull()
    )
    quality_ok = P.record_quality_ok(
        F.col("link_domain"), F.col("link_host"), F.col("link_raw_query")
    )
    classify = (
        # F4 — relative href: internal, not emitted (wat.go:509-512)
        F.when(~F.col("_is_absolute"), F.lit("internal"))
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
    return bound.select("*", classify.alias("link_class")).drop(
        "_is_absolute", "_href_clean"
    )


A2_DEDUP_KEY = (
    "link_domain", "link_sub_domain", "link_path", "link_raw_query",
    "page_host", "page_path", "page_raw_query",
)


def link_rows(
    classified: DataFrame, dedup_partitions: int | None = None,
) -> DataFrame:
    """The 14-column link frame (LINK_SCHEMA order), deduped on the
    reference's per-file key — link host+path+query × page host+path+query
    (A2, farmhash key at wat.go:365). dropDuplicates compiles to a
    partial-then-final aggregate around one shuffle, which is exactly the
    reference's per-file map + global sort -u staging (SURVEY §4 X1).

    ``dedup_partitions`` — the big-map-task spill knob (r10 verdict #5):
    when gzip inputs are few and huge (8 × 1.25M-page files at the 10M
    probe rung; any skewed archive slice in production), the MAP-side
    partial aggregate builds a per-task hash of ~every emitted link —
    link keys are mostly unique, so the partial agg dedups almost
    nothing while its state spills (~14 GB/side measured at the 10M
    rung, EXTRACT_SCALING_10M.json). Setting ``dedup_partitions``
    repartitions by the dedup key FIRST: the dedup aggregation then
    runs entirely post-exchange (the agg's required distribution is
    already satisfied, so no second shuffle), scan tasks carry zero agg
    state, and per-reduce-task state shrinks with N. Size it so
    rows/N × ~250 B stays well under executor memory per slot. The
    default (None) keeps the partial-then-final plan — right whenever
    input splits are already cluster-sized (~125k pages/file archive
    layout), where per-task state is small and map-side collapse is
    free.

    The filter and subdomain derivation reference only named columns —
    nothing heavy re-inlines."""
    out = (
        classified.filter(F.col("link_class") == "emitted")
        .select(
            "link_domain",
            U.subdomain(F.col("link_host"), F.col("link_domain"))
            .alias("link_sub_domain"),
            "link_path", "link_raw_query", "link_scheme",
            "page_host", "page_path", "page_raw_query", "page_scheme",
            U.scrub_delimiter(F.col("link_text")).alias("link_text"),
            "no_follow", "no_index", "date_imported", "ip",
        )
    )
    if dedup_partitions:
        out = out.repartition(dedup_partitions, *A2_DEDUP_KEY)
    return out.dropDuplicates(list(A2_DEDUP_KEY))


def page_rows(classified: DataFrame) -> DataFrame:
    """The 10-column page frame with A3 internal/external counters
    (increments at wat.go:510,528,534,539,549,553), deduped on the page key
    (A1, wat.go:341-342).

    A page row is emitted only when the page produced at least one
    EMITTED link: the reference appends to ``content.Links`` solely in
    parseLinks' final fall-through (wat.go:548-556) and writes the page
    record only under ``len(content.Links) > 0`` (wat.go:327) — a page
    whose anchors are all internal/blocked/skipped gets counters
    tallied but never written."""
    counters = classified.groupBy(
        "page_host", "page_path", "page_raw_query", "page_scheme",
        "title", "ip", "date_imported", "no_index",
    ).agg(
        F.sum(F.when(F.col("link_class") == "internal", 1).otherwise(0))
        .cast("int").alias("internal_links"),
        F.sum(F.when(F.col("link_class").isin("external", "emitted"), 1).otherwise(0))
        .cast("int").alias("external_links"),
        F.max(F.when(F.col("link_class") == "emitted", 1).otherwise(0))
        .alias("_has_emitted"),
    ).filter(F.col("_has_emitted") == 1)
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


# ----- auto-sizing for the dedup_partitions knob (r11 verdict #3) -----
# The spill knob was proven in r10/r11 (reduce-agg spill -> 0 at the
# 10M-page rung) but manual — a production run_import over fat gzip
# inputs would still hit the measured ~14 GB/side spill unless the
# operator remembered it. These constants derive it from input stats:
#
# AUTO_DEDUP_PAGES_PER_TASK — pages per gzip map task above which the
#   map-side partial aggregate's state is worth eliminating. Measured
#   anchors: 1.25M-page tasks spill ~1.9 GB/task of agg state (10M rung,
#   EXTRACT_SCALING_10M.json); 125k-page tasks (the ~90k-file archive
#   layout) carry ~190 MB and never spill. 300k pages/task (~450 MB
#   state at ~12 links/page x ~250 B/key) stays under local-mode's
#   ~300 MB-per-slot execution memory only with map-side collapse —
#   above it, pre-exchanging is strictly better.
# AUTO_DEDUP_TARGET_ROWS_PER_TASK — emitted links per post-exchange
#   reduce task: 2M rows x ~250 B ≈ 500 MB of per-task agg state, well
#   inside a cluster executor's multi-GB-per-core budget and safely
#   spill-free at local-mode's grant too (state is spread over N tasks).
# EST_LINKS_PER_PAGE — sizing estimate: the synthetic corpus measures 8
#   EMITTED links/page (links_out/n_pages, bench_extract) out of 12 raw
#   anchors; 12 is used as the upper bound — oversizing N by 1.5x costs
#   a few empty tasks, undersizing risks the spill the knob exists to
#   prevent.
AUTO_DEDUP_PAGES_PER_TASK = 300_000
AUTO_DEDUP_TARGET_ROWS_PER_TASK = 2_000_000
EST_LINKS_PER_PAGE = 12


def auto_dedup_partitions(
    spark, wat_paths: str | list[str],
    pages_per_task_threshold: int = AUTO_DEDUP_PAGES_PER_TASK,
) -> int | None:
    """Derive ``dedup_partitions`` from the input's ACTUAL shape
    (r11 verdict #3): one decompress-only counting pre-pass — lines
    starting with '{' per gzip file, no JSON parsing — yields the exact
    per-map-task page count (gzip is unsplittable, one task per file).
    Returns None (keep the partial-then-final plan) when every file is
    under ``pages_per_task_threshold`` pages; otherwise the exchange
    width ceil(total_pages x EST_LINKS_PER_PAGE /
    AUTO_DEDUP_TARGET_ROWS_PER_TASK), floored at the session's default
    parallelism so the reduce side never has fewer tasks than cores.

    Why count instead of estimating from file bytes: gz bytes/page
    varies ~80x between corpora (synthetic bench pages compress to
    ~93 B; production WAT pages run ~8 KB), so any bytes-based
    estimate is wrong by orders of magnitude for one of them. The
    count pass is a single gzip decode at ~5-10% of the full extract's
    cost (no JSON parse, no shuffle, no output), paid only once per
    segment — and only its VERDICT is data-dependent; a wrong
    links-per-page guess changes task COUNT, not correctness."""
    import math

    counts = (
        spark.read.option("ignoreCorruptFiles", "true").text(wat_paths)
        .where(F.col("value").startswith("{"))
        .groupBy(F.input_file_name().alias("f"))
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("total"))
        .first()
    )
    if not counts or not counts.mx or counts.mx <= pages_per_task_threshold:
        return None
    n = math.ceil(
        counts.total * EST_LINKS_PER_PAGE / AUTO_DEDUP_TARGET_ROWS_PER_TASK
    )
    return max(n, spark.sparkContext.defaultParallelism)


def extract_links(
    wat_pages: DataFrame, dedup_partitions: int | None = None,
) -> DataFrame:
    """End-to-end: WAT page frame → 14-column external link rows.
    ``dedup_partitions`` — see :func:`link_rows` (big-map-task spill
    knob; default None keeps the partial-then-final dedup plan)."""
    return link_rows(
        explode_links(content_quality_gate(pages_with_url_record(wat_pages))),
        dedup_partitions=dedup_partitions,
    )


def extract_pages(wat_pages: DataFrame) -> DataFrame:
    """End-to-end: WAT page frame → 10-column page rows with counters."""
    return page_rows(
        explode_links(content_quality_gate(pages_with_url_record(wat_pages)))
    )
