"""Pure-Python deterministic extraction core.

No Spark imports here. Every function is deterministic and side-effect
free so that golden outputs generated from this module are stable, and the
Spark operators (which wrap these functions in Arrow-batched pandas UDFs)
can be asserted byte-identical against them.
"""

from .textops import (
    clean_text,
    normalize_text,
    extract_keywords,
    tokenize_keywords,
    STOP_WORDS,
    strip_control_chars,
    has_control_chars,
)
from .extractors import (
    extract_medical_terms,
    extract_numbers,
    extract_dates,
    extract_emails,
    extract_phone_numbers,
)
from .ner import (
    ENTITY_TYPES,
    LABEL_MAP,
    MEDICAL_ENTITY_TYPES,
    extract_entities,
    raw_entity_candidates,
    map_label,
    entity_statistics,
    filter_by_confidence,
    medical_entities,
    validate_entity,
)
from .html_extract import extract_main_content, html_blocks
from .embedding import (
    EMBEDDING_DIM,
    embed_text,
    create_document_text,
    cosine_similarity,
)
from .validation import (
    EXECUTABLE_SIGNATURES,
    MAGIC_SIGNATURES,
    sniff_payload_kind,
    is_executable_payload,
    is_malicious_url,
    has_common_ocr_errors,
    is_gibberish,
    special_char_ratio,
    digit_ratio,
    sanitize_string,
)
from .ocr import (
    fake_pdf_bytes,
    fake_png_bytes,
    ocr_image,
    ocr_payload_pages,
    ocr_pdf_pages,
    word_confidence,
    mean_confidence,
)
