"""Text cleaning / normalization / keyword primitives.

Semantics match the reference pipeline (parity targets cited per function
into /root/reference). Operation ORDER inside clean_text matters for byte
parity: whitespace-collapse, then punctuation→space, then NFKC, then strip
(reference app/utils/text_utils.py:12-37).
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter

# reference app/utils/text_utils.py:104-114 (40-word stop set; dict literal
# silently dedupes the repeated 'his'/'her' keys the same way a set does)
STOP_WORDS = frozenset(
    {
        "the", "a", "an", "and", "or", "but", "in", "on", "at", "to", "for",
        "of", "with", "by", "is", "are", "was", "were", "be", "been", "being",
        "have", "has", "had", "do", "does", "did", "will", "would", "could",
        "should", "may", "might", "can", "this", "that", "these", "those",
        "i", "you", "he", "she", "it", "we", "they", "me", "him", "her",
        "us", "them", "my", "your", "his", "its", "our", "their",
        "mine", "yours", "hers", "ours", "theirs",
    }
)

_WS_RE = re.compile(r"\s+")
# keep word chars, whitespace, and - . , ; : ! ? ( ) [ ] { }
_PUNCT_RE = re.compile(r"[^\w\s\-\.\,\;\:\!\?\(\)\[\]\{\}]")
_NONWORD_RE = re.compile(r"[^\w\s]")
_DIGITS_ONLY_RE = re.compile(r"^\d+$")
# strip set per reference app/models/document.py:177-188
_CONTROL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")


def clean_text(text: str) -> str:
    """Whitespace-collapse → punct→space → NFKC → strip.

    Parity: reference app/utils/text_utils.py:12-37 (order-exact).
    """
    if not text:
        return ""
    text = _WS_RE.sub(" ", text)
    text = _PUNCT_RE.sub(" ", text)
    text = unicodedata.normalize("NFKC", text)
    return text.strip()


def normalize_text(text: str) -> str:
    """lowercase → non-word→space → ws-collapse → strip.

    Parity: reference app/utils/text_utils.py:40-62.
    """
    if not text:
        return ""
    text = text.lower()
    text = _NONWORD_RE.sub(" ", text)
    text = _WS_RE.sub(" ", text)
    return text.strip()


def tokenize_keywords(text: str, min_length: int = 3) -> list[str]:
    """clean → split on whitespace → lowercase → drop short/stop/digit words.

    Parity: reference app/utils/text_utils.py:77-95 (keeps duplicates, in
    document order — frequency counting happens downstream).
    """
    if not text:
        return []
    words = clean_text(text).split()
    out = []
    for word in words:
        word = word.lower().strip()
        if (
            len(word) >= min_length
            and word not in STOP_WORDS
            and not _DIGITS_ONLY_RE.match(word)
        ):
            out.append(word)
    return out


def extract_keywords(text: str, min_length: int = 3, max_keywords: int = 50) -> list[str]:
    """Top-k most frequent keywords (ties in first-seen order, as
    ``Counter.most_common`` preserves insertion order for equal counts).

    Parity: reference app/utils/text_utils.py:65-101.
    """
    keywords = tokenize_keywords(text, min_length=min_length)
    counts = Counter(keywords)
    return [w for w, _ in counts.most_common(max_keywords)]


def strip_control_chars(text: str) -> str:
    """Remove C0 control chars (except \\t \\n \\r) and DEL.

    Parity: reference app/models/document.py:177-188 (extracted_text is
    *stripped*, whereas entity text is *rejected* — see has_control_chars).
    """
    if not text:
        return text
    return _CONTROL_RE.sub("", text)


def has_control_chars(text: str) -> bool:
    """Reject-style control-char check (reference app/models/document.py:42-53)."""
    return bool(text) and _CONTROL_RE.search(text) is not None
