"""X2 page expansion as a REAL Python UDTF (Spark 4 `@udtf`) — the
1-row→N-rows table function the reference's per-document OCR loop implies
(reference ocr_service.py:75-122: one PDF in, one row per page out).

The production extraction path deliberately does NOT use this: a Python
UDTF evaluates row-at-a-time in the Python worker (generator protocol,
pickled rows), while `operators/extraction.pdf_pages_udf` crosses the
JVM↔Python boundary in Arrow batches and lets the JVM `explode()` do the
fan-out — at 10^12 documents the Arrow path is the only defensible one.
This module exists for API-surface parity (SURVEY.md §2.9: the UDF/UDTF
surface) and is proven byte-identical to the Arrow path by
tests/test_operators_ext.py::TestPdfPagesUdtf, so a reference user who
reaches for the table-function idiom gets the same rows the pipeline
produces.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="page_no: int, page_text: string, confidence: double")
class PdfPagesUDTF:
    """LATERAL-joinable page expansion: `SELECT p.url, t.* FROM pages p,
    LATERAL pdf_pages(p.html) t`. Non-PDF payloads yield no rows (the
    same contract as core.ocr_pdf_pages)."""

    def eval(self, payload):  # noqa: ANN001 — Spark passes raw column values
        from ..core import ocr_pdf_pages

        for page_no, (page_text, confidence) in enumerate(
            ocr_pdf_pages(bytes(payload) if payload is not None else b"")
        ):
            yield page_no, page_text, float(confidence)


def register(spark, name: str = "pdf_pages") -> None:
    """Register the UDTF for SQL LATERAL use."""
    spark.udtf.register(name, PdfPagesUDTF)
