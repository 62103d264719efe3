"""Streaming crawl-frontier builder (streaming/frontier.py): the
continuous form of q_outlink_frontier, with watermark-bounded state and
sink-side idempotence."""

import os
import shutil

from pyspark.sql import functions as F


class TestStreamingFrontier:
    def test_stream_matches_batch_query(self, spark, tmp_path, pages_parquet):
        """Draining the fixture through the stream must yield exactly the
        batch q_outlink_frontier result (per-host url sets), with the
        crawled anti-join applied — streaming and batch share one
        admission policy."""
        from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
            q_outlink_frontier,
        )
        from medical_vector_database_ocr_ner_spark.streaming.frontier import (
            run_frontier_stream,
        )

        frontier_dir = str(tmp_path / "frontier")
        ckpt = str(tmp_path / "ckpt")
        q = run_frontier_stream(
            spark, pages_parquet, frontier_dir, ckpt,
            crawled_dir=pages_parquet,
        )
        q.awaitTermination(300)

        got = (
            spark.read.parquet(frontier_dir)
            .groupBy("host")
            .agg(F.count("*").alias("n"), F.min("out_url").alias("first_url"))
            .collect()
        )
        batch = {
            r["host"]: (r["n_frontier"], r["first_url"])
            for r in q_outlink_frontier(spark, "/root/testdata/sf0.001").collect()
        }
        assert {r["host"]: (r["n"], r["first_url"]) for r in got} == batch
        # no duplicates in the sink
        sink = spark.read.parquet(frontier_dir)
        assert sink.count() == sink.select("out_url").distinct().count()

    def test_reingest_appends_nothing(self, spark, tmp_path, pages_parquet):
        """Re-dropping the same pages under new filenames re-triggers the
        checkpointed source, but the sink anti-join must admit zero new
        frontier urls — the idempotence tier that replaces unbounded
        seen-url streaming state."""
        from medical_vector_database_ocr_ner_spark.streaming.frontier import (
            run_frontier_stream,
        )

        src = str(tmp_path / "pages")
        os.makedirs(src)
        for f in os.listdir(pages_parquet):
            shutil.copy(os.path.join(pages_parquet, f),
                        os.path.join(src, "a-" + f))
        frontier_dir = str(tmp_path / "frontier")
        ckpt = str(tmp_path / "ckpt")

        q = run_frontier_stream(spark, src, frontier_dir, ckpt)
        q.awaitTermination(300)
        n1 = spark.read.parquet(frontier_dir).count()
        assert n1 > 0

        for f in os.listdir(pages_parquet):
            shutil.copy(os.path.join(pages_parquet, f),
                        os.path.join(src, "b-" + f))
        q2 = run_frontier_stream(spark, src, frontier_dir, ckpt)
        q2.awaitTermination(300)
        sink = spark.read.parquet(frontier_dir)
        assert sink.count() == n1
        assert sink.select("out_url").distinct().count() == n1

    def test_gate_rejects_inadmissible_candidates(self, spark):
        """A page whose outlinks include gated urls (query strings, banned
        extensions, deep paths) must contribute only 'pass' urls to the
        candidate stream — checked on the batch form of the same
        expression chain."""
        from medical_vector_database_ocr_ner_spark.streaming.frontier import (
            outlink_candidates,
        )

        html = (
            '<html><body>'
            '<a href="/ok">fine</a>'
            '<a href="/search?q=x">query</a>'
            '<a href="/static/logo.jpg">img</a>'
            '<a href="/a/b/c/d/e/f">deep</a>'
            '<a href="http://other.example/abs">absolute</a>'
            "</body></html>"
        ).encode()
        df = spark.createDataFrame(
            [("https://h1.example/page/1", html)], "url string, html binary"
        ).withColumn("warc_ts", F.lit("2023-06-01 00:00:00").cast("timestamp"))
        got = sorted(
            r["out_url"] for r in outlink_candidates(df).collect()
        )
        assert got == ["https://h1.example/ok"]
