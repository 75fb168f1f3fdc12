"""URL & domain kernel — P1-P11 of the operator inventory (SURVEY §2.2).

Everything is a Column expression except ``etld_plus_one`` — the
public-suffix computation (reference: golang.org/x/net/publicsuffix via
/root/reference/pkg/commoncrawl/wat.go:660-672). That is the engine's one
mandatory pandas UDF; it memoizes per Python worker (the Spark analogue of
the reference's domainCache, wat.go:139-143) and evaluates the standard PSL
algorithm over a bundled suffix-rule snapshot (drop a full
``public_suffix_list.dat`` next to this file to widen coverage — the
algorithm is list-agnostic).

Semantics cited into the reference:
- URL parse + host normalize + default path: buildURLRecord wat.go:623-678
- scheme encode http→"1" https→"2" else "0":  setScheme  wat.go:821-829
- subdomain = host minus "."+domain:          genSubdomain wat.go:953-962
- tracking-query blank-out:                   ignoreQuery  wat.go:726-733
- URL reconstruction for API output:          pkg/linkdb/controller.go:201-265
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from globallinks_spark.config import IGNORED_QUERY_PREFIXES

# ---------------------------------------------------------------------------
# Public-suffix rules. The PSL algorithm (publicsuffix.org/list/):
#   1. take the longest matching rule (labels compared right-to-left;
#      "*" matches exactly one label; "!" exception rules win outright)
#   2. if no rule matches, the implicit rule is "*" (the bare TLD)
#   3. registrable domain (eTLD+1) = public suffix + one preceding label.
# Bundled snapshot: the implicit "*" rule already covers every single-label
# TLD; we list common multi-level ICANN suffixes plus a few private-section
# entries the reference's filters depend on (blogspot.com).
_PSL_RULES: frozenset[str] = frozenset({
    # UK / JP / AU / NZ / ZA / IN / KR / BR / MX / AR / TR / PL / CN / TW ...
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "gr.jp",
    "lg.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "gov.in",
    "ac.in", "edu.in", "res.in",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "gen.tr", "web.tr",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "waw.pl",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "co.id", "web.id", "or.id", "ac.id", "sch.id", "go.id", "net.id",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "info.ke",
    # wildcard / exception examples from the PSL spec
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.mm",
    # private-section entries the pipeline's filters reference
    "blogspot.com", "github.io", "gitlab.io", "wordpress.com", "appspot.com",
    "herokuapp.com", "netlify.app", "vercel.app", "web.app", "pages.dev",
    "s3.amazonaws.com", "cloudfront.net", "azurewebsites.net",
})

# Per-worker memo cache (reference domainCache, wat.go:139-143).
_etld1_cache: dict[str, str | None] = {}


def _psl_suffix_len(labels: list[str]) -> int:
    """Number of labels in the public suffix of ``labels`` per PSL rules."""
    best = 1  # implicit "*" rule
    n = len(labels)
    for k in range(1, min(n, 5) + 1):
        cand = ".".join(labels[n - k:])
        if "!" + cand in _PSL_RULES:
            return k - 1  # exception rule: suffix is one label shorter
        if cand in _PSL_RULES:
            best = max(best, k)
        if k >= 2:
            wild = "*." + ".".join(labels[n - k + 1:])
            if wild in _PSL_RULES:
                best = max(best, k)
    return best


def _etld1_one(host: str) -> str | None:
    if not host:
        return None
    cached = _etld1_cache.get(host)
    if cached is not None or host in _etld1_cache:
        return cached
    labels = host.strip(".").split(".")
    out: str | None
    if len(labels) < 2:
        out = None  # bare TLD or dotless host: no registrable domain
    else:
        k = _psl_suffix_len(labels)
        if k >= len(labels):
            out = None  # the host IS a public suffix
        else:
            out = ".".join(labels[len(labels) - k - 1:])
    _etld1_cache[host] = out
    return out


@F.pandas_udf(T.StringType())
def etld_plus_one_udf(host: pd.Series) -> pd.Series:
    """Registrable domain (eTLD+1) of an already-lowercased host; null when
    the host has none (unparseable / bare public suffix) — the reference
    drops those rows (wat.go:662-666 error path).

    This is the full-PSL path (swap in a complete suffix-list snapshot and
    the Python algorithm handles every rule). The extraction hot path uses
    ``etld_plus_one`` below — a pure JVM expression over the same bundled
    rules — because a per-link Python round trip dominated extraction cost
    (measured 13× below the reference's pages/min baseline with the UDF,
    see bench_extract.py)."""
    return host.map(_etld1_one, na_action="ignore")


# Rule set factored for the JVM expression: exceptions, exact multi-label
# suffixes by label count, and wildcard tails (a "*.bd" rule makes any
# 2-label suffix ending in "bd" public).
_PSL_EXCEPTIONS: tuple[str, ...] = tuple(
    r[1:] for r in _PSL_RULES if r.startswith("!")
)
_PSL_WILD_TAILS: tuple[str, ...] = tuple(
    r[2:] for r in _PSL_RULES if r.startswith("*.")
)
_PSL_EXACT_BY_LEN: dict[int, tuple[str, ...]] = {}
for _r in _PSL_RULES:
    if not _r.startswith(("!", "*.")):
        _PSL_EXACT_BY_LEN.setdefault(_r.count(".") + 1, ())
        _PSL_EXACT_BY_LEN[_r.count(".") + 1] += (_r,)


def etld_plus_one(host: Column) -> Column:
    """P3 as a pure Column expression — same semantics as
    ``etld_plus_one_udf`` over the bundled rules, evaluated inside
    whole-stage codegen (no Python worker, no Arrow transfer).

    PSL evaluation compiles to a when-chain: exception rules first, then
    exact suffixes longest-first, then wildcard-derived suffixes, then
    the implicit "*" rule; eTLD+1 = suffix + one preceding label.
    """
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def suffix(k: int) -> Column:
        return F.concat_ws(".", F.slice(labels, n - F.lit(k - 1), k))

    max_exact = max(_PSL_EXACT_BY_LEN, default=1)
    slen: Column = F.lit(1)  # implicit "*": bare TLD
    # build bottom-up so higher-priority rules sit earlier in the chain
    chain = []
    for exc in _PSL_EXCEPTIONS:
        k = exc.count(".") + 1
        chain.append(((n >= k) & (suffix(k) == exc), k - 1))
    for k in sorted(_PSL_EXACT_BY_LEN, reverse=True):
        chain.append(
            ((n >= k) & suffix(k).isin(*_PSL_EXACT_BY_LEN[k]), k)
        )
        # a wildcard whose tail has k labels covers suffixes of k+1
        tails_k = [t for t in _PSL_WILD_TAILS if t.count(".") + 1 == k]
        if tails_k:
            chain.append(((n >= k + 1) & suffix(k).isin(*tails_k), k + 1))
    tails_other = [
        t for t in _PSL_WILD_TAILS
        if t.count(".") + 1 not in _PSL_EXACT_BY_LEN
    ]
    for k in sorted({t.count(".") + 1 for t in tails_other}, reverse=True):
        ts = [t for t in tails_other if t.count(".") + 1 == k]
        chain.append(((n >= k + 1) & suffix(k).isin(*ts), k + 1))

    expr: Column | None = None
    for cond, k in chain:
        expr = F.when(cond, F.lit(k)) if expr is None else expr.when(cond, F.lit(k))
    slen = expr.otherwise(F.lit(1)) if expr is not None else slen

    out = F.concat_ws(".", F.slice(labels, n - slen, slen + F.lit(1)))
    return F.when(
        host.isNull() | (host == "") | ~host.contains(".") | (n <= slen),
        F.lit(None).cast("string"),
    ).otherwise(out)


# ---------------------------------------------------------------------------
# Column expression builders (P1-P11). All pure ``F.*`` — codegen'd JVM-side.

def url_scheme(url: Column) -> Column:
    """Raw scheme token of a URL ('' for scheme-relative // links)."""
    return F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)


def scheme_code(scheme: Column) -> Column:
    """P2 — http→'1', https→'2', else '0' (wat.go:821-829)."""
    return (
        F.when(F.lower(scheme) == "https", F.lit("2"))
        .when(F.lower(scheme) == "http", F.lit("1"))
        .otherwise(F.lit("0"))
    )


def decode_scheme(code: Column) -> Column:
    """Inverse of ``scheme_code`` for API URL reconstruction. NOTE the
    reference decoder maps '0'→https (controller.go:239-244, a lossy
    round-trip); we keep that quirk for output parity."""
    return F.when(code == "1", F.lit("http")).otherwise(F.lit("https"))


def _parseable(url: Column) -> Column:
    """URL rewritten so Spark's parse_url accepts scheme-relative links:
    '//host/x' (accepted by the reference, wat.go:509) gets a temporary
    http: prefix — the scheme code is computed from the raw string first."""
    return F.when(url.startswith("//"), F.concat(F.lit("http:"), url)) \
            .otherwise(url)


def url_host(url: Column) -> Column:
    """P1 — lowercased, trimmed host (buildURLRecord, wat.go:644-645)."""
    return F.lower(F.trim(F.parse_url(_parseable(url), F.lit("HOST"))))


def url_path(url: Column) -> Column:
    """P1 — path with '' defaulted to '/' (wat.go:646-648)."""
    p = F.parse_url(_parseable(url), F.lit("PATH"))
    return F.when((p.isNull()) | (p == ""), F.lit("/")).otherwise(p)


def url_raw_query(url: Column, blank_ignored: bool = True) -> Column:
    """P1 + P8 — raw query, '' when absent; tracking prefixes blanked
    (ignoreQuery wat.go:726-733; prefix list config.go:199-203)."""
    q = F.coalesce(F.parse_url(_parseable(url), F.lit("QUERY")), F.lit(""))
    if blank_ignored:
        pat = "^(" + "|".join(IGNORED_QUERY_PREFIXES) + ")"
        q = F.when(q.rlike(pat), F.lit("")).otherwise(q)
    return q


def url_fragment(url: Column) -> Column:
    return F.coalesce(F.parse_url(_parseable(url), F.lit("REF")), F.lit(""))


def subdomain(host: Column, domain: Column) -> Column:
    """P4 — host minus '.'+domain; '' when host == domain
    (genSubdomain, wat.go:953-962)."""
    trimmed = F.substring(
        host, F.lit(1), F.length(host) - F.length(domain) - F.lit(1)
    )
    return F.when(host == domain, F.lit("")).otherwise(
        F.when(host.endswith(F.concat(F.lit("."), domain)), trimmed)
        .otherwise(host)
    )


def scrub_delimiter(text: Column) -> Column:
    """P7 — '|' → ' ' in free text (Title wat.go:334, LinkText wat.go:355).
    Only needed for pipe-text interchange; harmless on parquet."""
    return F.regexp_replace(text, r"\|", " ")


def reconstruct_url(
    scheme_col: Column, sub: Column, domain: Column,
    path: Column, query: Column,
) -> Column:
    """P10 — scheme://[sub.]domain[path][?query] for API output
    (controller.go:201-211, 246-265)."""
    host = F.when(sub == "", domain).otherwise(F.concat_ws(".", sub, domain))
    q = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query))
    return F.concat(decode_scheme(scheme_col), F.lit("://"), host, path, q)


def wat_file_number(path: Column) -> Column:
    """P11 — the NNNNN in '...-NNNNN.warc.wat.gz'
    (ExtractWatFileNumber, wat.go:832-846)."""
    return F.regexp_extract(path, r"-(\d+)\.warc\.wat\.gz$", 1)
