"""Explicit schemas for every persisted record shape of the engine.

The reference's schemas are implicit in Go structs + fmt.Sprintf serializers
(SURVEY §1.1); here every shape is an explicit StructType so Catalyst can
prune columns and push predicates into scans.

Shapes (column order = reference pipe-field order, names from FIXTURES.md):

- ``LINK_SCHEMA``     — 14-field extracted link row
  (/root/reference/pkg/commoncrawl/wat.go:73-86, writer wat.go:902-917)
- ``COMPACT_SCHEMA``  — 16-field compacted link row
  (/root/reference/cmd/importer/main.go:42-59, writer main.go:627-644)
- ``PAGE_SCHEMA``     — 10-field page row (wat.go:59-70, writer wat.go:859-870)
- ``WAT_ENVELOPE_SCHEMA`` — the ~10 JSON paths actually read from a WAT
  record (wat.go:397-445); passing an explicit schema to ``from_json`` is
  the columnar-pruning equivalent of the reference's gjson path extraction
  (SURVEY §4 X4/X8).

Typing upgrades vs the reference (which is all-strings): flags are INT,
dates are DATE, qty is INT. The pipe-text reader converts losslessly.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType(), True)


def _i(name: str) -> T.StructField:
    return T.StructField(name, T.IntegerType(), True)


# ---------------------------------------------------------------------------
# Link row (14 fields) — the canonical fact table of the extraction stage.
LINK_COLUMNS: tuple[str, ...] = (
    "link_domain", "link_sub_domain", "link_path", "link_raw_query",
    "link_scheme", "page_host", "page_path", "page_raw_query", "page_scheme",
    "link_text", "no_follow", "no_index", "date_imported", "ip",
)

LINK_SCHEMA = T.StructType([
    _s("link_domain"), _s("link_sub_domain"), _s("link_path"),
    _s("link_raw_query"), _s("link_scheme"),
    _s("page_host"), _s("page_path"), _s("page_raw_query"), _s("page_scheme"),
    _s("link_text"), _i("no_follow"), _i("no_index"),
    T.StructField("date_imported", T.DateType(), True), _s("ip"),
])

# ---------------------------------------------------------------------------
# Compacted link row (16 fields) — serving-table grain. Group key of
# compaction: (link_domain, link_sub_domain, link_path, link_raw_query,
# page_host) (/root/reference/cmd/importer/main.go:573).
COMPACT_COLUMNS: tuple[str, ...] = (
    "link_domain", "link_sub_domain", "link_path", "link_raw_query",
    "link_scheme", "page_host", "page_path", "page_raw_query", "page_scheme",
    "link_text", "no_follow", "no_index", "date_from", "date_to", "ip", "qty",
)

COMPACT_SCHEMA = T.StructType([
    _s("link_domain"), _s("link_sub_domain"), _s("link_path"),
    _s("link_raw_query"), _s("link_scheme"),
    _s("page_host"), _s("page_path"), _s("page_raw_query"), _s("page_scheme"),
    _s("link_text"), _i("no_follow"), _i("no_index"),
    T.StructField("date_from", T.DateType(), True),
    T.StructField("date_to", T.DateType(), True),
    _s("ip"), _i("qty"),
])

# ---------------------------------------------------------------------------
# Page row (10 fields) — optional page-level output.
PAGE_COLUMNS: tuple[str, ...] = (
    "host", "path", "raw_query", "scheme", "title", "ip", "imported",
    "internal_links", "external_links", "no_index",
)

PAGE_SCHEMA = T.StructType([
    _s("host"), _s("path"), _s("raw_query"), _s("scheme"), _s("title"),
    _s("ip"), T.StructField("imported", T.DateType(), True),
    _i("internal_links"), _i("external_links"), _i("no_index"),
])

# ---------------------------------------------------------------------------
# WAT envelope — only the paths the pipeline reads. The link structs inside
# HTML-Metadata.Links carry: path ("A@/href" for anchors), url (href),
# text (anchor text), rel ("nofollow ...").
_WAT_LINK = T.StructType([
    _s("path"), _s("url"), _s("text"), _s("rel"), _s("title"), _s("type"),
])

_WAT_META = T.StructType([_s("name"), _s("content"), _s("property")])

_WAT_HEAD_LINK = T.StructType([_s("path"), _s("url"), _s("rel"), _s("type")])

WAT_ENVELOPE_SCHEMA = T.StructType([
    T.StructField("Envelope", T.StructType([
        T.StructField("WARC-Header-Metadata", T.StructType([
            _s("WARC-Target-URI"),
            _s("WARC-IP-Address"),
            _s("WARC-Date"),
            _s("WARC-Type"),
        ]), True),
        T.StructField("Payload-Metadata", T.StructType([
            T.StructField("HTTP-Response-Metadata", T.StructType([
                T.StructField("HTML-Metadata", T.StructType([
                    T.StructField("Links", T.ArrayType(_WAT_LINK), True),
                    T.StructField("Head", T.StructType([
                        _s("Title"),
                        T.StructField("Metas", T.ArrayType(_WAT_META), True),
                        T.StructField("Link", T.ArrayType(_WAT_HEAD_LINK),
                                      True),
                    ]), True),
                ]), True),
            ]), True),
        ]), True),
    ]), True),
])

# Flattened intermediate shape produced by sources.wat.read_wat_pages — one
# row per crawled page, links still nested (exploded by operators.extract).
WAT_PAGE_COLUMNS: tuple[str, ...] = (
    "target_uri", "warc_date", "warc_ip", "title", "metas", "head_links",
    "links",
)

WAT_PAGE_SCHEMA = T.StructType([
    _s("target_uri"), _s("warc_date"), _s("warc_ip"), _s("title"),
    T.StructField("metas", T.ArrayType(_WAT_META), True),
    T.StructField("head_links", T.ArrayType(_WAT_HEAD_LINK), True),
    T.StructField("links", T.ArrayType(_WAT_LINK), True),
])
