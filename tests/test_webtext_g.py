"""Webtext wave G: robots compliance as a broadcast-rules join."""

from pyspark.sql import functions as F

from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
    q_robots_compliance,
)


class TestRobotsCompliance:
    def test_blocked_counts_match_rule_semantics(self, spark, sf001_dir):
        """Recompute the expected blocked count per host directly from the
        url list and the synthesized rule thirds; the query must agree."""
        from medical_vector_database_ocr_ner_spark.plans.queries import (
            _pages_for_sf,
        )

        urls = [
            r["url"] for r in _pages_for_sf(spark, sf001_dir).collect()
        ]
        import hashlib

        def h60(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        expected: dict[str, list[int]] = {}
        for u in urls:
            host = u.split("//")[1].split("/")[0]
            path = "/" + u.split("//")[1].split("/", 1)[1]
            third = h60(host) % 3
            disallow = ["/cgi-bin/"]
            if third == 0:
                disallow.append("/bin/")
            elif third == 1:
                disallow.append("/doc/")
            blocked = any(path.startswith(p) for p in disallow)
            tot, blk = expected.get(host, [0, 0])
            expected[host] = [tot + 1, blk + int(blocked)]

        rows = q_robots_compliance(spark, sf001_dir).collect()
        got = {r["host"]: [r["n_urls"], r["n_blocked"]] for r in rows}
        assert got == expected
        for r in rows:
            assert r["blocked_frac"] == r["n_blocked"] / r["n_urls"]

    def test_rules_side_broadcasts(self, spark, sf001_dir):
        """The rules join must be a BroadcastHashJoin — the crawl side
        never shuffles for the compliance check."""
        plan = q_robots_compliance(spark, sf001_dir)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestImageOcrNative:
    def test_native_decode_matches_udf_extraction(self, spark, documents_df, pages_df):
        """The native substring-decode of the image container must equal
        the OCR UDF branch's extracted_text byte-for-byte per url — the
        two-tier proof that image payloads are engine-neutral data."""
        native = {
            r["url"]: r["t"]
            for r in pages_df.where(
                F.expr("startswith(html, X'89504E470D0A1A0A')")
            )
            .select(
                "url",
                F.expr("substring(html, 17, 2147483647)")
                .cast("string")
                .alias("t"),
            )
            .collect()
        }
        assert native, "v3 fixture must contain image rows"
        udf_side = {
            r["url"]: r["extracted_text"]
            for r in documents_df.where(F.col("kind") == "image").collect()
        }
        assert set(native) == set(udf_side)
        for url, t in native.items():
            assert udf_side[url] == t, url

    def test_host_stats_reconcile(self, spark, sf001_dir):
        from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
            q_image_ocr_native,
        )

        rows = q_image_ocr_native(spark, sf001_dir).collect()
        assert rows
        for r in rows:
            assert r["n_images"] >= 1
            # words are space-separated: chars >= words + (words - 1)
            assert r["chars_total"] >= 2 * r["words_total"] - r["n_images"]
