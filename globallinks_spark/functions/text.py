"""Text-analysis expression builders for the training-data pipeline:
tokenization, shingling, language-ID heuristics, quality metrics,
fingerprints. All pure ``F.*`` column algebra (JVM-side); the DuckDB
renderings live next to each builder so query oracles stay in lockstep.

Conventions shared with the oracles:
- words = regex-split on whitespace of lowercased text, empties removed
- shingles = space-joined k-grams of consecutive words, 1-indexed windows
- every ratio rounded at the output edge, never mid-computation
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from globallinks_spark.functions.hashing import h30

# Marker stopwords per language for the stopword language-ID heuristic,
# drawn from the public ISO/NLTK-style stopword lists (top function
# words per language). ~24 markers × 10 languages. Lists deliberately
# OVERLAP where languages share function words ("de" is a top word in
# es/pt/fr/nl; "la" in es/fr/it) — each language scores its own list,
# so shared words raise several scores and the *distinctive* markers
# decide. Data, not engine semantics.
#
# FIDELITY BOUND (this is a heuristic, not a fastText replacement): it
# separates languages with distinct function-word inventories given a
# few sentences of running text — tests pin 10/10 on real snippets —
# but it has no calibrated confidence, mislabels very short or
# code/table-like text toward "en" (the all-zero tie-break), and can
# confuse closely-related pairs (es/pt, de/nl) on single-sentence
# inputs. Production pipelines should treat `predicted` as a cheap
# first-pass routing signal or swap in a real classifier via the same
# column contract.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "was", "that", "for",
           "with", "as", "on", "are", "be", "this", "by", "at", "from",
           "it", "an", "or", "which", "but", "not"),
    "de": ("der", "die", "das", "und", "ist", "mit", "von", "den",
           "nicht", "sie", "ich", "des", "auf", "für", "dem", "ein",
           "eine", "als", "auch", "es", "werden", "aus", "zu", "im"),
    "fr": ("le", "la", "les", "et", "est", "avec", "des", "une", "dans",
           "que", "qui", "pour", "pas", "sur", "plus", "par", "il",
           "au", "ce", "un", "ne", "se", "sont", "mais"),
    "es": ("el", "los", "las", "es", "con", "para", "una", "del", "se",
           "por", "su", "al", "lo", "como", "más", "pero", "sus", "de",
           "ya", "este", "porque", "muy", "sin", "sobre"),
    "pt": ("o", "os", "as", "um", "uma", "com", "não", "por", "para",
           "se", "dos", "das", "como", "mas", "foi", "ao", "ele",
           "em", "seu", "sua", "ou", "quando", "muito", "é", "na"),
    "it": ("il", "di", "che", "non", "per", "una", "sono", "con",
           "del", "da", "le", "si", "nel", "alla", "più", "come",
           "anche", "ma", "lo", "se", "della", "è", "e", "dei"),
    "nl": ("de", "het", "een", "van", "en", "in", "is", "dat", "op",
           "te", "zijn", "met", "voor", "niet", "aan", "er", "om",
           "ook", "als", "maar", "bij", "uit", "dan", "naar"),
    "pl": ("i", "w", "się", "na", "nie", "z", "do", "to", "że",
           "jest", "jak", "po", "co", "tak", "za", "od", "ale",
           "przez", "był", "być", "tylko", "przy", "czy", "może"),
    "ru": ("и", "в", "не", "на", "с", "что", "как", "это", "по",
           "но", "они", "к", "у", "же", "вы", "за", "бы", "от",
           "мы", "так", "было", "для", "или", "его"),
    "zh": ("的", "是", "和", "在", "了", "有", "我", "不", "这", "他",
           "们", "中", "为", "上", "个", "以", "要", "就", "也", "都",
           "时", "会", "对", "说"),
}

# Languages written without word spaces: whitespace tokenization makes
# word-equality markers unmatchable (a zh sentence is ONE "word"), so
# these score by counting marker CHARACTERS in the raw text instead.
CHAR_LANGS: frozenset[str] = frozenset({"zh"})

EN_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "with", "as", "for", "on", "was", "are", "be", "this", "by",
)

# A BPE-ish tokenizer regex: word pieces, numbers, single punctuation.
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_REGEX = r"[^\w\s]"


def words(text: Column) -> Column:
    """array<string> of lowercased whitespace tokens, empties removed."""
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda w: w != ""
    )


def words_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '\\s+'), "
        f"w -> w <> '')"
    )


def _gram_indexes(words_col: Column, k: int) -> Column:
    """``[1 … size-k+1]``, EMPTY for docs shorter than ``k`` words.

    Spark's ``sequence(1, 0)`` is the DESCENDING list ``[1, 0]`` (not
    empty, unlike DuckDB's ``range``), so a naive sequence feeds index 0
    into ``element_at`` and throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    under ANSI mode for any short document. The guard is branch-free on
    purpose: wrapping the whole transform in ``when(size >= k, …)`` puts
    it on codegen's conditional path, where subexpression elimination is
    disabled — every gram then re-derives its inputs (measured 2.5× on
    the ngram-Jaccard bench). ``greatest`` keeps the sequence ascending;
    ``filter`` drops the clamp artifact, and ``transform`` never
    evaluates a lambda over an empty array.
    """
    n_grams = F.size(words_col) - (k - 1)
    seq = F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1)))
    return F.filter(seq, lambda i: i <= n_grams)


def shingles(words_col: Column, k: int = 3) -> Column:
    """array<string> of space-joined k-grams (distinct). Short docs yield
    an empty array, matching the oracle's ``range`` semantics.

    Built by zipping the word array with its own k−1 shifted slices —
    NOT by ``transform(indexes, i -> element_at(words, i+off))``. The
    index form embeds ``words_col`` in the lambda body, and higher-order
    functions evaluate interpreted (no codegen subexpression
    elimination), so when the caller passes a derived expression like
    ``split(lower(text))`` it re-tokenizes the WHOLE document once per
    element_at — 3·n_grams splits per row (measured 11.1 s to shingle
    5,000 sf0.1 docs; 0.4 s in this form). The zip form references
    ``words_col`` k+1 times per ROW, independent of gram count.

    ``zip_with`` pads the shorter array with nulls and ``concat``
    propagates them, so the k−1 tail entries of the zipped array are
    null exactly where a full k-gram doesn't exist — the filter drops
    them (and only them; in-range grams are never null).
    """
    g = words_col
    for off in range(1, k):
        g = F.zip_with(
            g,
            F.slice(
                words_col, off + 1,
                F.greatest(F.size(words_col) - off, F.lit(0)),
            ),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.array_distinct(F.filter(g, lambda x: x.isNotNull()))


def shingles_sql(words_expr: str, k: int = 3) -> str:
    parts = " || ' ' || ".join(f"w[i+{off}]" for off in range(k))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({words_expr}) - {k - 1}, 0) + 1), "
        f"i -> {parts}))"
    ).replace("w[", f"{words_expr}[")


def shingle_hashes(text: Column, k: int = 3) -> Column:
    """array<bigint> of H30 hashes of the text's k-gram shingles."""
    return F.transform(shingles(words(text), k), lambda s: h30(s))


def shingles_seq(words_col: Column, k: int = 3) -> Column:
    """Positional (non-distinct) k-gram sequence — winnowing needs the
    document-order hash stream, not the set. Branch-free short-doc guard
    as in :func:`shingles`."""
    idx = _gram_indexes(words_col, k)
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(words_col, i + off) for off in range(k)]
    )
    return F.transform(idx, gram)


def shingles_seq_sql(words_expr: str, k: int = 3) -> str:
    parts = " || ' ' || ".join(f"w[i+{off}]" for off in range(k))
    return (
        f"list_transform("
        f"range(1, greatest(len({words_expr}) - {k - 1}, 0) + 1), "
        f"i -> {parts})"
    ).replace("w[", f"{words_expr}[")


def lang_score(
    words_col: Column, lang: str, text: Column | None = None
) -> Column:
    """Count of marker-stopword occurrences for ``lang``. Space-written
    languages count marker WORDS in the token array; ``CHAR_LANGS``
    count marker CHARACTERS in the raw text (one regexp char-class
    strip, identical in both engines)."""
    markers = LANG_MARKERS[lang]
    if lang in CHAR_LANGS:
        if text is None:
            raise ValueError(f"lang {lang!r} scores on raw text — pass text=")
        cls = "[" + "".join(markers) + "]"
        return (
            F.length(text) - F.length(F.regexp_replace(text, cls, ""))
        )
    return F.size(F.filter(words_col, lambda w: w.isin(*markers)))


def lang_token_string(text: Column) -> Column:
    """The document's lowercased token stream rendered as ONE
    space-delimited string with a leading and trailing space:
    ``' tok1 tok2 ... tokN '``. This is exactly :func:`words`'s
    tokenization written back out — both run Java's ASCII ``\\s``
    class, and collapsing every whitespace RUN to a single space puts
    a literal ``' '`` at precisely the token boundaries (runs at the
    ends leave extra spaces, which sit outside every token and match
    nothing). Tokens contain no whitespace by construction, so "token
    equals marker" ≡ "marker bounded by spaces in this string"."""
    return F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(text), r"\s+", " "),
        F.lit(" "),
    )


def lang_score_tokens(ts_col: Column, lang: str) -> Column:
    """Marker-word occurrence count for a space-written ``lang`` over a
    :func:`lang_token_string` — ONE compiled-regex pass
    (``regexp_count`` with zero-width lookarounds, so consecutive
    marker tokens both match) per language. Replaces the r11
    ``lang_scores_folded`` transform/filter/array_contains fold, whose
    lambdas Catalyst evaluates INTERPRETED per array element (the same
    higher-order-function cost the r10 multitable-LSH fan kernel
    removed): measured ×1.10–1.21 interleaved at sf0.1, rows
    identical. Markers are whole lowercase tokens with no whitespace
    or regex metacharacters (asserted below); longest-first
    alternation avoids prefix-alternative backtracking ("an" before
    "and" would match, fail the lookahead, and retry)."""
    markers = LANG_MARKERS[lang]
    assert not any(
        _RE_META.search(m) for m in markers
    ), f"lang {lang!r} markers need regex escaping"
    pat = (
        "(?<= )(?:"
        + "|".join(sorted(markers, key=len, reverse=True))
        + ")(?= )"
    )
    return F.regexp_count(ts_col, F.lit(pat))


_RE_META = re.compile(r"[\\^$.|?*+()\[\]{}\s]")


def lang_score_sql(words_expr: str, lang: str, text_expr: str = "text") -> str:
    markers = LANG_MARKERS[lang]
    if lang in CHAR_LANGS:
        cls = "[" + "".join(markers) + "]"
        return (
            f"(length({text_expr}) - "
            f"length(regexp_replace({text_expr}, '{cls}', '', 'g')))"
        )
    lits = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({words_expr}, w -> w IN ({lits})))"


def predict_lang(scores: dict[str, Column]) -> Column:
    """Argmax with deterministic first-wins tie-break in LANG_MARKERS
    order — the CASE chain renders identically in the oracle."""
    langs = list(LANG_MARKERS)
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = F.lit(True)
        for other in langs:
            if other == lang:
                continue
            if langs.index(other) < langs.index(lang):
                cond = cond & (scores[lang] > scores[other])
            else:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def predict_lang_sql(score_expr: dict[str, str]) -> str:
    langs = list(LANG_MARKERS)
    whens = []
    for i, lang in enumerate(langs[:-1]):
        conds = []
        for j, other in enumerate(langs):
            if other == lang:
                continue
            op = ">" if j < i else ">="
            conds.append(f"{score_expr[lang]} {op} {score_expr[other]}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"CASE {' '.join(whens)} ELSE '{langs[-1]}' END"


def stopword_ratio(words_col: Column) -> Column:
    """EN stopword fraction (quality signal)."""
    n = F.size(words_col)
    hits = F.size(F.filter(words_col, lambda w: w.isin(*EN_STOPWORDS)))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio_sql(words_expr: str) -> str:
    lits = ", ".join(f"'{m}'" for m in EN_STOPWORDS)
    return (
        f"CASE WHEN len({words_expr}) > 0 THEN "
        f"CAST(len(list_filter({words_expr}, w -> w IN ({lits}))) AS DOUBLE)"
        f" / len({words_expr}) ELSE 0.0 END"
    )


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio_sql(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) > 0 THEN "
        f"CAST(length(regexp_replace({expr}, '[\\w\\s]', '', 'g')) AS DOUBLE)"
        f" / length({expr}) ELSE 0.0 END"
    )


def bpe_token_count(text: Column) -> Column:
    # Array-free exact count (r13, guide §4 per-task work):
    # size(regexp_extract_all(...)) materializes one String per token
    # just to take the array's length. Collapsing every alpha/digit run
    # to a single placeholder char and stripping whitespace leaves
    # exactly one char per token of BPE_TOKEN_REGEX ('x' is safe as the
    # placeholder: original 'x' chars are consumed by the [A-Za-z]+
    # collapse, and any remaining char is a 1-char [^A-Za-z0-9\s]
    # token either way). Verified 0 mismatches over every document at
    # sf0.01/0.1 plus unicode/NBSP/empty/null edge strings; the oracle
    # keeps the literal len(regexp_extract_all(...)) form.
    return F.length(
        F.regexp_replace(
            F.regexp_replace(text, r"[A-Za-z]+|[0-9]+", "x"), r"\s", ""
        )
    )


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_TOKEN_REGEX}'))"


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1 — public
# paper). Thresholds below follow the paper; each rule is exposed as a
# flag so pipelines can tune rather than re-derive.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_DISTINCT_STOPWORDS = 2


def mean_word_len(words_col: Column) -> Column:
    n = F.size(words_col)
    total = F.aggregate(
        words_col, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def mean_word_len_sql(words_expr: str) -> str:
    return (
        f"CASE WHEN len({words_expr}) > 0 THEN "
        f"CAST(list_sum(list_transform({words_expr}, w -> length(w))) "
        f"AS DOUBLE) / len({words_expr}) ELSE 0.0 END"
    )


def symbol_word_ratio(text: Column, words_col: Column) -> Column:
    """(# of '#' chars + '...' runs) per word — Gopher's symbol screen."""
    n = F.size(words_col)
    hashes = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    dots = F.size(F.regexp_extract_all(text, F.lit(r"\.\.\."), 0))
    return F.when(
        n > 0, (hashes + dots).cast("double") / n
    ).otherwise(F.lit(0.0))


def symbol_word_ratio_sql(text_expr: str, words_expr: str) -> str:
    hashes = (
        f"(length({text_expr}) - "
        f"length(replace({text_expr}, '#', '')))"
    )
    dots = f"len(regexp_extract_all({text_expr}, '\\.\\.\\.'))"
    return (
        f"CASE WHEN len({words_expr}) > 0 THEN "
        f"CAST({hashes} + {dots} AS DOUBLE) / len({words_expr}) "
        f"ELSE 0.0 END"
    )


def distinct_stopword_count(words_col: Column) -> Column:
    return F.size(
        F.array_intersect(
            F.array_distinct(words_col),
            F.array(*[F.lit(s) for s in EN_STOPWORDS]),
        )
    )


def distinct_stopword_count_sql(words_expr: str) -> str:
    lits = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return (
        f"len(list_intersect(list_distinct({words_expr}), [{lits}]))"
    )


# ---------------------------------------------------------------------------
# PII patterns — deliberately simple, identical Java-regex / RE2
# semantics (no lookaround, no backrefs). Scrub order is fixed:
# email → phone → ip (an email never contains a scrubbed phone, so the
# order only matters for determinism).

EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_REGEX = r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_REGEX = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

_PII_STEPS = (
    (EMAIL_REGEX, "<EMAIL>"),
    (PHONE_REGEX, "<PHONE>"),
    (IPV4_REGEX, "<IP>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_REGEX), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_REGEX), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(IPV4_REGEX), 0)),
    }


def pii_scrub(text: Column) -> Column:
    out = text
    for pat, repl in _PII_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts_sql(expr: str) -> dict[str, str]:
    return {
        "n_emails": f"len(regexp_extract_all({expr}, '{EMAIL_REGEX}'))",
        "n_phones": f"len(regexp_extract_all({expr}, '{PHONE_REGEX}'))",
        "n_ips": f"len(regexp_extract_all({expr}, '{IPV4_REGEX}'))",
    }


def pii_scrub_sql(expr: str) -> str:
    out = expr
    for pat, repl in _PII_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out
