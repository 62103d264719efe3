"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on /root/testdata/sf0.001 — hydrated
  top-k similarity search (SURVEY.md §3.2 plan: broadcast query vector,
  JVM-side dot product, TakeOrderedAndProject, documents join).
- ``queries()``/``oracle_sql()``: full operator registry from
  medical_vector_database_ocr_ner_spark.plans.queries — every
  SQL-expressible operator carries a DuckDB oracle; UDF-backed pipeline
  queries (pages_extraction, pdf_page_explode, semantic_search) are
  golden-tested in tests/ instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from medical_vector_database_ocr_ner_spark.plans.queries import q_knn_hydrated

    return q_knn_hydrated(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from medical_vector_database_ocr_ner_spark.plans.queries import driver_ordered

    return {name: spec.fn for name, spec in driver_ordered().items()}


def oracle_sql() -> dict[str, str]:
    from medical_vector_database_ocr_ner_spark.plans.queries import driver_ordered

    return {
        name: spec.oracle
        for name, spec in driver_ordered().items()
        if spec.oracle is not None
    }
