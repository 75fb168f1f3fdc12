"""Unit tests for the Gopher-quality / repetition / PII operators —
edge cases the fixture corpus can't exercise (empty docs, boundary
thresholds, crafted PII strings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globallinks_spark.functions import text as TX


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestGopherRules:
    def test_flags_on_crafted_docs(self, spark):
        good = "the quick brown fox jumps over a lazy dog and " * 10
        rows = [
            (0, good),                     # passes everything
            (1, "tiny doc"),               # too few words
            (2, "#### " * 60),             # symbol ratio + no stopwords
            (3, ""),                       # empty
        ]
        df = _docs(spark, rows)
        w = TX.words(F.col("text"))
        out = {
            r["doc_id"]: r
            for r in df.select(
                "doc_id",
                F.size(w).alias("n_words"),
                TX.symbol_word_ratio(F.col("text"), w).alias("sym"),
                TX.distinct_stopword_count(w).alias("nstop"),
                TX.mean_word_len(w).alias("mwl"),
            ).collect()
        }
        assert out[0]["n_words"] == 100
        assert out[0]["nstop"] >= TX.GOPHER_MIN_DISTINCT_STOPWORDS
        assert out[1]["n_words"] < TX.GOPHER_MIN_WORDS
        assert out[2]["sym"] > TX.GOPHER_MAX_SYMBOL_RATIO
        assert out[2]["nstop"] == 0
        assert out[3]["n_words"] == 0 and out[3]["mwl"] == 0.0

    def test_mean_word_len(self, spark):
        df = _docs(spark, [(0, "ab abcd")])  # (2+4)/2 = 3.0
        got = df.select(
            TX.mean_word_len(TX.words(F.col("text"))).alias("m")
        ).first()["m"]
        assert got == pytest.approx(3.0)


class TestPiiScrub:
    def test_patterns_and_redaction(self, spark):
        text = (
            "mail bob.smith+x@sub.example.co.uk or 12-345-678-9012 "
            "from 192.168.0.1 and 10.0.0.254"
        )
        df = _docs(spark, [(0, text)])
        counts = TX.pii_counts(F.col("text"))
        row = df.select(
            counts["n_emails"].alias("e"),
            counts["n_phones"].alias("p"),
            counts["n_ips"].alias("i"),
            TX.pii_scrub(F.col("text")).alias("s"),
        ).first()
        assert (row["e"], row["p"], row["i"]) == (1, 1, 2)
        assert row["s"] == (
            "mail <EMAIL> or <PHONE> from <IP> and <IP>"
        )

    def test_scrub_order_email_before_ip(self, spark):
        # the email's dotted domain must not be half-eaten by the IP rule
        df = _docs(spark, [(0, "a@1.2.3.4x.com")])
        got = df.select(TX.pii_scrub(F.col("text")).alias("s")).first()["s"]
        assert got == "<EMAIL>"

    def test_no_pii_untouched(self, spark):
        df = _docs(spark, [(0, "plain text with no secrets")])
        got = df.select(TX.pii_scrub(F.col("text")).alias("s")).first()["s"]
        assert got == "plain text with no secrets"


class TestRepetitionProfile:
    def test_dominated_doc_scores_high(self, spark):
        # go through REGISTRY (queries imports queries_ext lazily; a direct
        # queries_ext import from a test can hit the half-initialized module)
        from globallinks_spark.queries import FULL_REGISTRY

        q_repetition_profile = FULL_REGISTRY["repetition_profile"].fn

        # build a fixture-shaped frame and monkey-load via temp parquet
        import os
        import tempfile

        d = tempfile.mkdtemp()
        df = spark.createDataFrame(
            [
                (0, "spam spam spam spam spam ham", "en", "t", 1),
                (1, "all words here are fully distinct tokens", "en", "t", 1),
                (2, "", "en", "t", 1),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {
            r["doc_id"]: r for r in q_repetition_profile(spark, d).collect()
        }
        assert out[0]["top_word_ratio"] == pytest.approx(5 / 6, abs=1e-4)
        assert out[1]["top_word_ratio"] == pytest.approx(1 / 7, abs=1e-4)
        assert out[2]["top_word_ratio"] == 0.0  # empty doc → coalesced 0


class TestLangId:
    """Fidelity pin for the marker heuristic on REAL text in all 10
    supported languages (the synthetic corpus's lang labels are
    uncorrelated with its token-soup text, so corpus accuracy measures
    nothing). One running-text snippet per language must classify
    correctly — including zh, whose markers count characters because
    whitespace tokenization cannot split unspaced scripts."""

    SNIPPETS = {
        "en": "the report was published in the spring and most of the "
              "results are consistent with what we expected to find",
        "de": "der bericht wurde im frühjahr veröffentlicht und die "
              "meisten ergebnisse sind mit den erwartungen vereinbar",
        "fr": "le rapport a été publié au printemps et la plupart des "
              "résultats sont conformes à ce que nous attendions",
        "es": "el informe se publicó en la primavera y la mayoría de "
              "los resultados son consistentes con lo que esperábamos",
        "pt": "o relatório foi publicado na primavera e a maioria dos "
              "resultados é consistente com o que esperávamos encontrar",
        "it": "il rapporto è stato pubblicato in primavera e la maggior "
              "parte dei risultati è coerente con quanto ci aspettavamo",
        "nl": "het rapport werd in het voorjaar gepubliceerd en de "
              "meeste resultaten zijn in lijn met wat we verwachtten",
        "pl": "raport został opublikowany wiosną i większość wyników "
              "jest zgodna z tym czego się spodziewaliśmy",
        "ru": "отчет был опубликован весной и большинство результатов "
              "согласуется с тем что мы ожидали увидеть",
        "zh": "这份报告是在春天发表的其中大部分的结果和我们的预期是一致的",
    }

    def test_each_language_identified(self, spark):
        from pyspark.sql import functions as F

        from globallinks_spark.functions import text as TX

        df = spark.createDataFrame(
            [(lang, snippet) for lang, snippet in self.SNIPPETS.items()],
            "lang string, text string",
        )
        w = TX.words(F.col("text"))
        base = df.select("lang", "text", w.alias("w"))
        scores = {
            lang: TX.lang_score(F.col("w"), lang, text=F.col("text"))
            for lang in TX.LANG_MARKERS
        }
        rows = base.select(
            "lang", TX.predict_lang(scores).alias("predicted")
        ).collect()
        wrong = [(r.lang, r.predicted) for r in rows if r.lang != r.predicted]
        assert not wrong, f"misidentified: {wrong}"

    def test_char_lang_requires_text(self):
        from pyspark.sql import functions as F

        from globallinks_spark.functions import text as TX

        with pytest.raises(ValueError, match="raw text"):
            TX.lang_score(F.lit(None), "zh")


class TestShinglesZipForm:
    """The zip-with-shifted-slices shingle builder (round 4; the index/
    element_at form re-tokenized the document per gram under interpreted
    HOF evaluation) must agree with a plain-Python brute force on
    arbitrary text — including multi-whitespace runs, docs shorter than
    k, duplicate grams, and unicode."""

    def test_matches_python_brute_force(self, spark):
        import pyspark.sql.functions as F

        from globallinks_spark.functions import text as TX

        cases = [
            "", " ", "one", "one two", "one two three",
            "a b c d e", "a  b\tc\nd",     # whitespace runs
            "x y x y x y",                   # duplicate grams
            "Ä ö Ü ß é 漢 字 かな",           # unicode tokens
            "a " * 50,                       # one gram repeated
            "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
        ]

        def brute(text, k=3):
            ws = [w for w in text.lower().split() if w]
            grams = [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]
            out, seen = [], set()
            for g in grams:            # distinct, first-occurrence order
                if g not in seen:
                    seen.add(g)
                    out.append(g)
            return out

        df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                                   "i long, text string")
        got = {
            r["i"]: r["s"]
            for r in df.select(
                "i", TX.shingles(TX.words(F.col("text"))).alias("s")
            ).collect()
        }
        for i, c in enumerate(cases):
            assert got[i] == brute(c), f"case {i!r}: {c!r}"
