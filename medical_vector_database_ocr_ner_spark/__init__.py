"""medical_vector_database_ocr_ner_spark — a from-scratch PySpark-native
document-extraction engine with the data-processing capabilities of the
reference repo ``Shuvam-M-Astro/Medical-Vector-Database-OCR-NER``.

Architecture (see SURVEY.md):

- ``core``       pure-Python, dependency-light, fully deterministic extraction
                 core (text cleaning, span extractors, gazetteer NER, HTML
                 main-content extraction, hash embeddings, validators). This is
                 the single source of truth for byte-parity goldens.
- ``functions``  pure Spark column-expression library (filters, predicates,
                 scalar functions) — JVM-side, whole-stage-codegen friendly.
- ``operators``  Arrow-batched pandas-UDF operators wrapping ``core`` plus
                 distributed algorithms (dedup, similarity search, text stats).
- ``sources``    readers/writers: synthetic pages generator, testdata tables,
                 binaryFile ingestion.
- ``plans``      end-to-end DataFrame DAGs (extraction pipeline, search,
                 stats) + per-partition lineage manifest for resumability.
- ``streaming``  Structured Streaming variants (rate-limit windows,
                 incremental ingest).
"""

__version__ = "0.1.0"
