"""Webtext wave L (round 4): GROUPING SETS panel and merkle-style
partition checksums — recomputed in plain Python."""

import hashlib
from collections import Counter, defaultdict

from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
    _PCHK_BUCKETS,
    q_grouping_sets_panel,
    q_partition_checksums,
)


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestGroupingSetsPanel:
    def test_matches_python_recount(self, spark, sf001_dir):
        docs = (
            spark.read.parquet(f"{sf001_dir}/documents.parquet")
            .select("lang", "source", "n_chars")
            .collect()
        )
        expected = defaultdict(lambda: [0, 0])
        for d in docs:
            for key in (
                (d["lang"], "ALL"),
                ("ALL", d["source"]),
                (d["lang"], d["source"]),
                ("ALL", "ALL"),
            ):
                expected[key][0] += 1
                expected[key][1] += d["n_chars"]
        rows = q_grouping_sets_panel(spark, sf001_dir).collect()
        got = {
            (r["lang_g"], r["source_g"]): [r["n_docs"], r["sum_chars"]]
            for r in rows
        }
        assert got == dict(expected)

    def test_grand_total_consistency(self, spark, sf001_dir):
        rows = q_grouping_sets_panel(spark, sf001_dir).collect()
        total = next(
            r for r in rows if (r["lang_g"], r["source_g"]) == ("ALL", "ALL")
        )
        lang_sum = sum(
            r["n_docs"] for r in rows
            if r["source_g"] == "ALL" and r["lang_g"] != "ALL"
        )
        src_sum = sum(
            r["n_docs"] for r in rows
            if r["lang_g"] == "ALL" and r["source_g"] != "ALL"
        )
        assert lang_sum == src_sum == total["n_docs"]


class TestPartitionChecksums:
    @staticmethod
    def _recount(rows):
        n = Counter()
        x = defaultdict(int)
        for r in rows:
            ck_src = (
                r["url"] + "#"
                + hashlib.md5(r["html"].hex().upper().encode()).hexdigest()
            )
            b = _h60_py(r["url"]) % _PCHK_BUCKETS
            n[b] += 1
            x[b] ^= _h60_py(ck_src)
        return {b: (n[b], x[b]) for b in n}

    def test_matches_python_recount(self, spark, sf001_dir):
        from medical_vector_database_ocr_ner_spark.plans.queries import (
            _pages_for_sf,
        )

        rows = (
            _pages_for_sf(spark, sf001_dir).select("url", "html").collect()
        )
        expected = self._recount(rows)
        got = {
            r["bucket"]: (r["n_rows"], r["checksum"])
            for r in q_partition_checksums(spark, sf001_dir).collect()
        }
        assert got == expected

    def test_single_row_divergence_flips_exactly_one_bucket(
        self, spark, sf001_dir
    ):
        # the anti-entropy property: mutate ONE row's payload → exactly
        # one bucket checksum changes, and n_rows everywhere is unchanged
        from medical_vector_database_ocr_ner_spark.plans.queries import (
            _pages_for_sf,
        )

        rows = [
            {"url": r["url"], "html": r["html"]}
            for r in _pages_for_sf(spark, sf001_dir)
            .select("url", "html")
            .collect()
        ]
        base = self._recount(rows)
        rows[0] = {"url": rows[0]["url"], "html": rows[0]["html"] + b"X"}
        mutated = self._recount(rows)
        diff = [b for b in base if base[b] != mutated[b]]
        assert len(diff) == 1
        assert base[diff[0]][0] == mutated[diff[0]][0]  # same n_rows


class TestWaveLPlanShapes:
    """Pin the physical-plan properties PLANS.md claims for wave L."""

    @staticmethod
    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_grouping_sets_one_expand_one_exchange(self, spark, sf001_dir):
        plan = self._plan(q_grouping_sets_panel(spark, sf001_dir))
        assert "Expand" in plan  # all four groupings in one pass
        assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]

    def test_checksums_one_exchange_mapside_xor(self, spark, sf001_dir):
        plan = self._plan(q_partition_checksums(spark, sf001_dir))
        assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
        assert "partial_bit_xor" in plan  # merges map-side
