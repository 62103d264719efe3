"""Deterministic PDF/OCR branch.

The reference OCRs images and 300-dpi PDF page renders with tesseract
(app/services/ocr_service.py:42-122) and averages positive per-word
confidences (ocr_service.py:180-191). Tesseract and image/PDF codecs are not
available in this environment, so the engine ships a DETERMINISTIC stand-in
with the same dataflow shape:

- a synthetic "PDF" container (``%PDF`` magic + page texts separated by a
  page marker) produced by the fixtures generator;
- ``ocr_pdf_pages``: page expansion (1 doc → N pages, the reference's
  convert_from_path analog) + per-page (text, confidence) where each word's
  confidence is a stable hash of the word in [-1, 99] — mirroring
  pytesseract's ``image_to_data`` conf column including its -1 non-word
  boxes — and the page confidence is mean(conf for conf > 0)/100, 0.0 when
  no positive confidences (exact reference math, ocr_service.py:188-191).

A real tesseract backend can be swapped in behind the same function
signatures; the Spark plumbing (binary column → pandas UDF → page explode)
is identical either way.
"""

from __future__ import annotations

import hashlib

PDF_MAGIC = b"%PDF-1.7\n%synthetic\n"
PAGE_MARKER = b"\n%%PAGE%%\n"


def fake_pdf_bytes(pages: list[str]) -> bytes:
    """Assemble the synthetic PDF container used by the fixtures generator."""
    body = PAGE_MARKER.join(p.encode("utf-8") for p in pages)
    return PDF_MAGIC + body + b"\n%%EOF"


def word_confidence(word: str) -> int:
    """Stable per-word confidence in [-1, 99] (tesseract conf analog)."""
    digest = hashlib.blake2b(word.encode("utf-8"), digest_size=4).digest()
    return int.from_bytes(digest, "big") % 101 - 1


def mean_confidence(confidences: list[int]) -> float:
    """mean(conf for conf > 0)/100, else 0.0 — exact reference math
    (ocr_service.py:188-191)."""
    positive = [c for c in confidences if c > 0]
    return (sum(positive) / len(positive)) / 100.0 if positive else 0.0


def ocr_page(page_text: str) -> tuple[str, float]:
    """Per-page OCR stand-in: text passes through; confidence from words."""
    words = page_text.split()
    return page_text, mean_confidence([word_confidence(w) for w in words])


def ocr_pdf_pages(data: bytes) -> list[tuple[str, float]]:
    """1 PDF payload → N (page_text, confidence) rows (UDTF-shaped page
    expansion, reference ocr_service.py:75-122). Non-PDF payloads → []."""
    if not data.startswith(b"%PDF"):
        return []
    body = data
    if body.startswith(PDF_MAGIC):
        body = body[len(PDF_MAGIC):]
    if body.endswith(b"\n%%EOF"):
        body = body[: -len(b"\n%%EOF")]
    pages = body.split(PAGE_MARKER)
    return [ocr_page(p.decode("utf-8", errors="replace")) for p in pages]
