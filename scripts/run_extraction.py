"""spark-submit entry point for the extraction pipeline (the analog of
reference scripts/batch_process.py:220-261, distributed).

Cluster usage (10^12-document scale):

    zip -r mvdon_spark.zip medical_vector_database_ocr_ner_spark
    spark-submit --py-files mvdon_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        scripts/run_extraction.py \
        --input  <pages table path/glob> \
        --output <warehouse dir> \
        --buckets 4096 --run-id crawl-2023-26

Local smoke:

    python scripts/run_extraction.py --synthetic 2000 --output /tmp/mvdon_out

The job is resumable: re-running with the same --output skips every bucket
already committed in the lineage manifest (plans/lineage.py). Per-bucket
extraction metrics land in <output>/manifest; a summary report prints at
the end (the batch_process.py print_summary analog)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages parquet path (url, warc_ts, html, text, lang)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64,
                    help="lineage buckets (≈ output partitions); use ≥4096 on a cluster")
    ap.add_argument("--run-id", default="r0")
    ap.add_argument("--max-pages", type=int, default=0,
                    help="limit input rows (batch_process.py --max-files analog)")
    ap.add_argument("--with-embeddings", action="store_true",
                    help="also build the content-hash-keyed embeddings sink")
    args = ap.parse_args()

    from medical_vector_database_ocr_ner_spark.plans.lineage import (
        read_documents, run_with_lineage,
    )
    from medical_vector_database_ocr_ner_spark.plans.pipeline import (
        build_embeddings, corpus_stats, entity_type_histogram,
    )
    from medical_vector_database_ocr_ner_spark.session import get_spark
    from medical_vector_database_ocr_ner_spark.sources.pages import pages_path

    spark = get_spark(app_name=f"extract-{args.run_id}")

    if args.synthetic:
        pages = spark.read.parquet(pages_path(args.synthetic))
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic is required")
    if args.max_pages:
        pages = pages.limit(args.max_pages)

    res = run_with_lineage(
        spark, pages, args.output, n_buckets=args.buckets, run_id=args.run_id
    )
    print(f"lineage: processed={res['processed_buckets']} "
          f"skipped={res['skipped_buckets']} buckets")

    docs = read_documents(spark, args.output)
    if args.with_embeddings:
        emb_dir = os.path.join(args.output, "embeddings")
        build_embeddings(docs).write.mode("overwrite").parquet(emb_dir)
        print(f"embeddings -> {emb_dir}")

    # summary report (batch_process.py:190-217 analog)
    corpus_stats(docs).show(truncate=False)
    entity_type_histogram(docs).show(truncate=False)


if __name__ == "__main__":
    main()
