"""Webtext wave E: C4-style global sentence dedup with rebuild,
template-link discovery, per-url snapshot churn, extraction-yield audit,
SURT-keyed index scan, recrawl-frontier priority.

Cross-engine hash parity is held by tools/check_oracles.py (green at
sf0.001/0.01/0.1); these tests pin the SEMANTICS a training-data pipeline
relies on, independently of the DuckDB mirror.
"""

from pyspark.sql import functions as F

from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
    q_anchor_link_stats,
    q_extraction_yield_by_host,
    q_recrawl_priority,
    q_sentence_dedup_global,
    q_surt_prefix_scan,
    q_url_churn_stats,
)

FOOTER_SENT = "© 2023 Example Health Network"


class TestSentenceDedupGlobal:
    def test_global_first_occurrence_keeps_each_sentence_once(
        self, spark, sf001_dir
    ):
        """The footer copyright <p> is on every html page; after global
        dedup it must survive in exactly ONE document's kept_text."""
        rows = q_sentence_dedup_global(spark, sf001_dir).collect()
        carriers = [r for r in rows if FOOTER_SENT in r["kept_text"]]
        assert len(carriers) == 1
        # and the keeper is the lexicographically-first url containing it
        # (first-occurrence order is (url, pos))
        all_urls = sorted(r["url"] for r in rows)
        assert carriers[0]["url"] == all_urls[0]

    def test_kept_counts_reconcile_with_distinct_sentences(
        self, spark, sf001_dir
    ):
        """sum(n_kept) == number of DISTINCT sentences in the corpus —
        every sentence kept exactly once, none lost, none duplicated."""
        df = q_sentence_dedup_global(spark, sf001_dir)
        total_kept = df.agg(F.sum("n_kept")).collect()[0][0]
        from medical_vector_database_ocr_ner_spark.plans.queries import (
            _pages_for_sf,
        )

        pages = _pages_for_sf(spark, sf001_dir).where(
            F.expr("startswith(html, X'3C')")
        )
        n_distinct = (
            pages.select(
                F.explode(
                    F.expr(
                        "regexp_extract_all(cast(html as string),"
                        " '<p>([^<]*)</p>', 1)"
                    )
                ).alias("sent")
            )
            .distinct()
            .count()
        )
        assert total_kept == n_distinct
        bad = df.where(
            (F.col("dup_frac") < 0) | (F.col("dup_frac") > 1)
        ).count()
        assert bad == 0

    def test_rebuild_preserves_document_order(self, spark, sf001_dir):
        """For the url that keeps the footer line (the first url), the
        kept_text must be its original <p> sequence minus the dropped
        duplicates, in source order."""
        df = q_sentence_dedup_global(spark, sf001_dir)
        first_url = df.agg(F.min("url")).collect()[0][0]
        kept = df.where(F.col("url") == first_url).collect()[0]["kept_text"]
        from medical_vector_database_ocr_ner_spark.plans.queries import (
            _pages_for_sf,
        )

        pages = _pages_for_sf(spark, sf001_dir)
        html = (
            pages.where(F.col("url") == first_url)
            .select(F.col("html").cast("string").alias("s"))
            .collect()[0]["s"]
        )
        import re

        orig = re.findall(r"<p>([^<]*)</p>", html)
        # first url in (url, pos) order keeps ALL its sentences (any
        # duplicate inside the doc keeps its first in-doc position)
        seen, expect = set(), []
        for s in orig:
            if s not in seen:
                seen.add(s)
                expect.append(s)
        assert kept == " ".join(expect)


class TestAnchorLinkStats:
    def test_template_links_flagged_boilerplate(self, spark, sf001_dir):
        """Nav/footer/sidebar hrefs ride every html page of a host →
        link_frac 1.0 and is_boilerplate true on the hot host."""
        rows = q_anchor_link_stats(spark, sf001_dir).collect()
        host0 = {r["href"]: r for r in rows if r["host"] == "host0.example"}
        for href in ["/departments", "/terms", "/a"]:
            assert href in host0
            assert host0[href]["is_boilerplate"]
            assert host0[href]["link_frac"] == 1.0

    def test_counts_reconcile(self, spark, sf001_dir):
        """Each template href occurs once per page, so n_links equals the
        host page count for every one of the 12 template hrefs."""
        rows = q_anchor_link_stats(spark, sf001_dir).collect()
        for r in rows:
            assert r["n_links"] == r["n_pages_host"]


class TestUrlChurnStats:
    def test_synthesized_churn_tiers(self, spark, sf001_dir):
        """%6 urls: 3 snaps, 2 versions, churn 0.5, span 2h; %3-not-%6:
        2 snaps, 1 version, churn 0; others: single capture."""
        rows = q_url_churn_stats(spark, sf001_dir).collect()
        import re

        for r in rows:
            m = re.search(r"([0-9]+)$", r["url"])
            n = int(m.group(1))
            if n % 6 == 0:
                assert (
                    r["n_snaps"],
                    r["n_versions"],
                    r["span_s"],
                    r["churn_rate"],
                ) == (3, 2, 7200, 0.5)
            elif n % 3 == 0:
                assert (
                    r["n_snaps"],
                    r["n_versions"],
                    r["span_s"],
                    r["churn_rate"],
                ) == (2, 1, 3600, 0.0)
            else:
                assert (r["n_snaps"], r["span_s"], r["churn_rate"]) == (
                    1,
                    0,
                    0.0,
                )


class TestExtractionYieldByHost:
    def test_yield_bounds_and_page_totals(self, spark, sf001_dir):
        df = q_extraction_yield_by_host(spark, sf001_dir)
        rows = df.collect()
        assert rows
        for r in rows:
            assert 0.0 < r["yield_frac"] < 1.0
            assert r["text_chars"] < r["html_chars"]
            assert r["low_yield"] == (r["yield_frac"] < 0.35)
        from medical_vector_database_ocr_ner_spark.plans.queries import (
            _pages_for_sf,
        )

        n_htmlish = (
            _pages_for_sf(spark, sf001_dir)
            .where(F.expr("startswith(html, X'3C')"))
            .count()
        )
        assert sum(r["n_pages"] for r in rows) == n_htmlish


class TestSurtPrefixScan:
    def test_prefix_is_terminator_exact(self, spark, sf001_dir):
        """'example,host1)' must match host1 only — host10…host19 share
        the string prefix but not the ')'-terminated SURT prefix."""
        rows = q_surt_prefix_scan(spark, sf001_dir).collect()
        assert rows
        assert all(r["surt_key"].startswith("example,host1)") for r in rows)
        assert all("//host1.example/" in r["url"] for r in rows)
        from medical_vector_database_ocr_ner_spark.plans.queries import (
            _pages_for_sf,
        )

        expected = (
            _pages_for_sf(spark, sf001_dir)
            .where(F.col("url").startswith("https://host1.example/"))
            .count()
        )
        assert len(rows) == expected


class TestRecrawlPriority:
    def test_topk_total_order_and_score_formula(self, spark, sf001_dir):
        rows = q_recrawl_priority(spark, sf001_dir).collect()
        assert len(rows) == 100
        pris = [r["priority"] for r in rows]
        assert pris == sorted(pris, reverse=True)
        for r in rows:
            assert r["priority"] == (r["churn_rate"] + 0.1) * r["n_pages_host"]
        # the head of the frontier is the hot host's churning urls
        assert rows[0]["host"] == "host0.example"
        assert rows[0]["churn_rate"] == 0.5
