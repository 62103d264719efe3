"""Webtext wave H (round 4): portable count-min sketch heavy hitters and
Gopher-style intra-document repetition."""

from collections import Counter

from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
    q_cms_heavy_hitters,
    q_intra_doc_repetition,
)


class TestCmsHeavyHitters:
    def test_never_underestimates_and_exact_counts(self, spark, sf001_dir):
        rows = q_cms_heavy_hitters(spark, sf001_dir).collect()
        assert len(rows) == 20
        # CMS guarantee: est >= true count on every probe
        for r in rows:
            assert r["never_under"], r
            assert r["cms_est"] >= r["n_exact"], r
        # the probed counts are the true top-20 under (count DESC, tok)
        texts = [
            r[0]
            for r in spark.read.parquet(f"{sf001_dir}/documents.parquet")
            .select("text")
            .collect()
        ]
        counts = Counter(t for text in texts for t in text.split(" "))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        got = {r["tok"]: r["n_exact"] for r in rows}
        assert got == dict(top)

    def test_sketch_is_bounded(self, spark, sf001_dir):
        """The sketch aggregate must never exceed d*w rows — the property
        that makes it broadcastable at any corpus size."""
        from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
            _CMS_D, _CMS_W,
        )
        from medical_vector_database_ocr_ner_spark.plans.queries import _t
        from medical_vector_database_ocr_ner_spark.plans.queries_ext import _h60

        import pyspark.sql.functions as F

        docs = _t(spark, sf001_dir, "documents")
        toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
        n = (
            toks.select(
                *[
                    F.pmod(
                        _h60(F.concat(F.col("tok"), F.lit(f"#cm{j}"))),
                        F.lit(_CMS_W),
                    ).alias(f"p{j}")
                    for j in range(_CMS_D)
                ]
            )
            .agg(*[F.countDistinct(f"p{j}").alias(f"d{j}") for j in range(_CMS_D)])
            .collect()[0]
        )
        assert all(n[f"d{j}"] <= _CMS_W for j in range(_CMS_D))


class TestIntraDocRepetition:
    def test_matches_python_recount(self, spark, sf001_dir):
        rows = {
            r["lang"]: r for r in q_intra_doc_repetition(spark, sf001_dir).collect()
        }
        docs = (
            spark.read.parquet(f"{sf001_dir}/documents.parquet")
            .select("lang", "text")
            .collect()
        )
        expected: dict[str, dict[str, int]] = {}
        for lang, text in docs:
            toks = text.split(" ")
            if len(toks) < 3:
                continue
            sh = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            e = expected.setdefault(
                lang, {"n_docs": 0, "n_flagged": 0, "sh": 0, "dup": 0}
            )
            dup = len(sh) - len(set(sh))
            e["n_docs"] += 1
            e["n_flagged"] += int(10 * dup > 3 * len(sh))
            e["sh"] += len(sh)
            e["dup"] += dup
        assert set(rows) == set(expected)
        for lang, e in expected.items():
            r = rows[lang]
            assert (r["n_docs"], r["n_flagged"], r["shingles_total"],
                    r["dups_total"]) == (
                e["n_docs"], e["n_flagged"], e["sh"], e["dup"]
            ), lang

    def test_repetitive_doc_flagged(self, spark):
        """A spam-like doc whose 3-gram stream repeats must flag; a normal
        doc must not."""
        df = spark.createDataFrame(
            [
                ("en", "buy now " * 30),  # one 3-gram loop
                ("en", "a perfectly ordinary sentence with unique words only"),
            ],
            "lang string, text string",
        )
        df.createOrReplaceTempView("_tmp_rep")
        import pyspark.sql.functions as F

        toks = F.split("text", " ")
        withsh = df.where(F.size(toks) >= 3).select(
            "lang",
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 2),"
                " i -> concat_ws(' ', element_at(split(text, ' '), i),"
                " element_at(split(text, ' '), i + 1),"
                " element_at(split(text, ' '), i + 2)))"
            ).alias("sh"),
        )
        per_doc = withsh.select(
            (
                F.lit(10) * (F.size("sh") - F.size(F.array_distinct("sh")))
                > F.lit(3) * F.size("sh")
            ).alias("flagged")
        ).collect()
        assert [r["flagged"] for r in per_doc] == [True, False]
