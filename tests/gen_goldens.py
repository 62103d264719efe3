"""Golden generator: runs the PURE-PYTHON core over the fixture pages table
and writes tests/golden/documents.jsonl. The Spark path is asserted
byte-identical against these (tests/test_spark_parity.py).

Regenerate with:  python tests/gen_goldens.py
(Only needed when core semantics intentionally change; goldens are
committed.)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medical_vector_database_ocr_ner_spark import core  # noqa: E402
from medical_vector_database_ocr_ner_spark.sources.pages import _row  # noqa: E402
from medical_vector_database_ocr_ner_spark.functions.columns import (  # noqa: E402
    MAX_PAYLOAD_BYTES,
)

N_FIXTURE_PAGES = 200
FIXTURE_SEED = 42
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "documents.jsonl")


def golden_row(url: str, html: bytes, lang: str) -> dict:
    """Reference-semantics pipeline, mirroring operators.extraction exactly."""
    if (
        len(html) > MAX_PAYLOAD_BYTES
        or core.is_malicious_url(url)
        or core.is_executable_payload(html)
    ):
        if len(html) > MAX_PAYLOAD_BYTES:
            err = "payload exceeds size cap"
        elif core.is_malicious_url(url):
            err = "malicious url pattern"
        else:
            err = "executable content signature"
        return {
            "url": url, "lang": lang, "kind": "rejected", "status": "failed",
            "error_message": err, "extracted_text": None, "ocr_confidence": None,
            "entities": [], "entity_count": 0, "content_hash": None, "doc_text": None,
        }

    kind = core.sniff_payload_kind(html)
    if kind == "html":
        text = core.extract_main_content(html)
        conf = core.mean_confidence([core.word_confidence(w) for w in text.split()])
    elif kind == "pdf":
        pages = core.ocr_pdf_pages(html)
        text = "\n".join(p[0] for p in pages)
        confs = [p[1] for p in pages]
        conf = sum(confs) / len(confs) if confs else 0.0
    elif kind == "image":
        pages = core.ocr_image(html)
        text = "\n".join(p[0] for p in pages)
        confs = [p[1] for p in pages]
        conf = sum(confs) / len(confs) if confs else 0.0
    else:
        return {
            "url": url, "lang": lang, "kind": kind, "status": "failed",
            "error_message": f"unsupported payload kind: {kind}",
            "extracted_text": None, "ocr_confidence": None, "entities": [],
            "entity_count": 0, "content_hash": None, "doc_text": None,
        }
    if not text:
        return {
            "url": url, "lang": lang, "kind": kind, "status": "failed",
            "error_message": "no content extracted", "extracted_text": None,
            "ocr_confidence": None, "entities": [], "entity_count": 0,
            "content_hash": None, "doc_text": None,
        }
    entities = core.extract_entities(text)
    doc_text = core.create_document_text(text, entities, {"lang": lang})
    return {
        "url": url,
        "lang": lang,
        "kind": kind,
        "status": "completed",
        "error_message": None,
        "extracted_text": text,
        "ocr_confidence": conf,
        "entities": entities,
        "entity_count": len(entities),
        "content_hash": hashlib.sha256(text.encode("utf-8")).hexdigest(),
        "doc_text": doc_text,
    }


def main() -> None:
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as fh:
        for i in range(N_FIXTURE_PAGES):
            url, _ts, html, _text, lang = _row(i, FIXTURE_SEED)
            fh.write(json.dumps(golden_row(url, html, lang), sort_keys=True) + "\n")
    print(f"wrote {N_FIXTURE_PAGES} golden rows -> {GOLDEN_PATH}")


if __name__ == "__main__":
    main()
