"""Skew-defeat evidence: the fixture's host distribution is deliberately
skewed (~60% of urls on 3 hosts); the salted url-hash repartition must
still produce balanced partitions for the Python stage."""

from pyspark.sql import functions as F


def test_host_skew_exists(pages_df):
    hosts = (
        pages_df.select(F.regexp_extract("url", r"https://([^.]+)\.", 1).alias("h"))
        .groupBy("h").count().collect()
    )
    counts = sorted((r["count"] for r in hosts), reverse=True)
    assert counts[0] > 3 * (sum(counts) / len(counts))  # top host dominates


def test_url_hash_partitions_balanced(spark, pages_df):
    n_parts = 8
    sizes = (
        pages_df.repartition(n_parts, F.col("url"))
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    counts = [r["count"] for r in sizes]
    assert len(counts) == n_parts
    mean = sum(counts) / len(counts)
    assert max(counts) < 1.6 * mean  # no partition dominated by hot hosts
    assert min(counts) > 0.4 * mean


def test_precomputed_salt_column_is_lumpy(spark, pages_df):
    """Control for the design choice: partitioning on pmod(xxhash64(url), N)
    re-hashes the N salt VALUES, whose collisions leave partitions empty —
    which is why extract_documents partitions on the url itself."""
    from medical_vector_database_ocr_ner_spark.functions.columns import url_salt_col

    n_parts = 8
    sizes = (
        pages_df.repartition(n_parts, url_salt_col(F.col("url"), n_parts))
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    assert len(sizes) < n_parts  # some partitions get no salt value at all


def test_host_partitioning_would_be_skewed(spark, pages_df):
    """Control: partitioning by host (the naive key) concentrates rows —
    the thing the salt exists to prevent."""
    host = F.regexp_extract("url", r"https://([^.]+)\.", 1)
    sizes = (
        pages_df.repartition(8, host)
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    counts = sorted((r["count"] for r in sizes), reverse=True)
    mean = sum(counts) / 8  # count empty partitions in the mean
    assert counts[0] > 1.6 * mean  # visibly skewed


class TestDedupHotKeyCaps:
    """VERDICT r1 item 4: the two dedup joins must stay linear under a
    quadratic hot key (stop-shingle / degenerate LSH bucket)."""

    def test_ngram_df_cap_kills_stop_shingle(self, spark):
        from medical_vector_database_ocr_ner_spark.operators.dedup import (
            ngram_jaccard_pairs,
        )

        # 40 docs: all share ONE hot 3-gram ("the common shingle"); each
        # also has a unique tail. Two docs (100, 101) additionally share a
        # rare 3-gram pair and must still match exactly after the cap.
        rows = [
            (i, f"the common shingle unique{i} tail{i} end{i}")
            for i in range(40)
        ]
        rows += [
            (100, "the common shingle alpha beta gamma delta"),
            (101, "the common shingle alpha beta gamma epsilon"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")

        uncapped = ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.0, df_max=None
        )
        capped = ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.0, df_max=5
        )
        n_unc, n_cap = uncapped.count(), capped.count()
        # hot shingle (df=42) uncapped → every doc pair is a candidate
        assert n_unc >= 42 * 41 / 2
        # capped: only the rare-shingle pair survives — linear, not n²
        assert n_cap < 42
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
        assert (100, 101) in got
        # exact jaccard over the non-stop shingles: after dropping the
        # df=42 hot shingle, docs 100/101 keep 4 shingles each and share
        # 3 of them → 3/(4+4-3) = 0.6
        assert abs(got[(100, 101)] - 0.6) < 1e-9

    def test_embedding_bucket_cap_star_pairs(self, spark):
        from medical_vector_database_ocr_ner_spark.operators.dedup import (
            embedding_cosine_dups,
        )

        # 100 identical unit vectors — one degenerate LSH bucket.
        rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(100)]
        emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

        full = embedding_cosine_dups(
            emb, threshold=0.9, n_bits=4, max_bucket=None
        )
        star = embedding_cosine_dups(
            emb, threshold=0.9, n_bits=4, max_bucket=10
        )
        assert full.count() == 100 * 99 / 2  # quadratic without the cap
        pairs = star.collect()
        assert len(pairs) == 99  # linear: every member vs the representative
        assert all(r["id_a"] == 0 for r in pairs)  # rep = min id
        # the star still covers every member → clustering recovers the group
        assert {r["id_b"] for r in pairs} == set(range(1, 100))
        assert all(abs(r["cosine"] - 1.0) < 1e-6 for r in pairs)

    def test_embedding_small_buckets_unchanged_by_cap(self, spark):
        from medical_vector_database_ocr_ner_spark.operators.dedup import (
            embedding_cosine_dups,
        )

        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0, 0.0]),
            (3, [-1.0, 0.0, 0.0, 0.0]),
        ]
        emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
        a = {(r["id_a"], r["id_b"]) for r in embedding_cosine_dups(
            emb, threshold=0.9, n_bits=4, max_bucket=None).collect()}
        b = {(r["id_a"], r["id_b"]) for r in embedding_cosine_dups(
            emb, threshold=0.9, n_bits=4, max_bucket=10).collect()}
        assert a == b == {(1, 2)}


class TestCapObservability:
    """ADVICE r2: the recall-trading caps must not be silent."""

    def test_ngram_cap_observation_reports_drops(self, spark):
        from pyspark.sql import Observation

        from medical_vector_database_ocr_ner_spark.operators.dedup import (
            cap_observation_metrics,
            ngram_jaccard_pairs,
        )

        # Non-empty final result on purpose: AQE empty-relation
        # propagation prunes the observe node when the query result is
        # empty (documented on cap_observation_metrics) — docs 100/101
        # share rare shingles so at least one pair survives the cap.
        rows = [
            (i, f"the common shingle unique{i} tail{i} end{i}")
            for i in range(40)
        ]
        rows += [
            (100, "the common shingle alpha beta gamma delta"),
            (101, "the common shingle alpha beta gamma epsilon"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        obs = Observation("ngram_cap")
        pairs = ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.0, df_max=5, observation=obs
        )
        assert pairs.count() >= 1  # action fires the observation
        got = cap_observation_metrics(obs)
        assert got["dropped_shingles"] == 1  # only the df=42 hot shingle
        assert got["max_df"] == 42

    def test_ngram_cap_observation_zero_when_cap_idle(self, spark):
        from pyspark.sql import Observation

        from medical_vector_database_ocr_ner_spark.operators.dedup import (
            cap_observation_metrics,
            ngram_jaccard_pairs,
        )

        # two docs share a shingle → non-empty result (see above: an
        # empty result may drop the AQE-pruned observe node entirely)
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma theta")],
            "doc_id int, text string",
        )
        obs = Observation("ngram_cap_idle")
        out = ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.0, df_max=5, observation=obs
        )
        assert out.count() >= 1
        assert cap_observation_metrics(obs)["dropped_shingles"] == 0

    def test_bucket_overflow_stats(self, spark):
        from medical_vector_database_ocr_ner_spark.operators.dedup import (
            bucket_overflow_stats,
        )

        # 100 identical vectors (one degenerate bucket) + 3 spread singletons
        rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(100)]
        rows += [(200, [-1.0, 0.0, 0.0, 0.0]), (201, [0.0, -1.0, 0.0, 0.0])]
        emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
        s = bucket_overflow_stats(emb, n_bits=4, max_bucket=10)
        assert s["n_overflow_buckets"] == 1
        assert s["overflow_members"] == 100
        assert s["max_bucket_size"] == 100
        assert s["n_buckets"] >= 2
        quiet = bucket_overflow_stats(emb, n_bits=4, max_bucket=1000)
        assert quiet["n_overflow_buckets"] == 0
        assert quiet["overflow_members"] == 0
