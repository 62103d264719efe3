"""Unit tests for the pure-Python deterministic extraction core.

Test inputs mirror the reference's own fixtures (tests/test_ner.py:24-29
clinical paragraph, tests/test_vector.py:46-52 invoice sentence,
tests/test_validation.py gibberish corpus).
"""

import numpy as np
import pytest

from medical_vector_database_ocr_ner_spark import core

CLINICAL = (
    "Patient John Smith was diagnosed with diabetes mellitus on January 15, 2023. "
    "Dr. Sarah Johnson prescribed Metformin 500mg twice daily. "
    "The patient was admitted to City General Hospital for treatment. "
    "Blood pressure was 140/90 mmHg and heart rate was 72 bpm."
)
INVOICE = "Patient John Smith was prescribed Aspirin 100mg for pain relief."


class TestTextOps:
    def test_clean_text_order(self):
        # ws-collapse happens BEFORE punct→space, so '@' leaves a double space
        assert core.clean_text("a  b\t@c\n") == "a b  c"

    def test_clean_text_keeps_medical_punct(self):
        assert core.clean_text("dose: 5.5mg, (oral)!") == "dose: 5.5mg, (oral)!"

    def test_clean_text_empty(self):
        assert core.clean_text("") == ""
        assert core.clean_text(None) == ""

    def test_normalize_text(self):
        assert core.normalize_text("Hello, World!  Bye") == "hello world bye"

    def test_tokenize_keywords_filters(self):
        toks = core.tokenize_keywords("The patient had 123 severe pain the pain")
        assert toks == ["patient", "severe", "pain", "pain"]

    def test_extract_keywords_topk_order(self):
        kws = core.extract_keywords("pain pain fever pain fever cough")
        assert kws == ["pain", "fever", "cough"]

    def test_control_chars(self):
        assert core.strip_control_chars("a\x00b\tc") == "ab\tc"
        assert core.has_control_chars("a\x07")
        assert not core.has_control_chars("a\tb\nc")


class TestExtractors:
    def test_numbers_dosage(self):
        nums = core.extract_numbers(INVOICE)
        dosages = [n for n in nums if n["type"] == "dosage"]
        assert dosages[0]["value"] == "100" and dosages[0]["unit"] == "mg"
        s, e = dosages[0]["start"], dosages[0]["end"]
        assert INVOICE[s:e] == dosages[0]["full_match"] == "100mg"

    def test_dates_month_name(self):
        dates = core.extract_dates(CLINICAL)
        month = [d for d in dates if d["format"] == "Month DD, YYYY"]
        assert month and month[0]["date"] == "January 15, 2023"
        s, e = month[0]["start"], month[0]["end"]
        assert CLINICAL[s:e] == month[0]["date"]

    def test_emails(self):
        assert core.extract_emails("mail a.b+c@x-y.org now") == ["a.b+c@x-y.org"]

    def test_phones_duplicates_kept(self):
        text = "call 123-456-7890 or (123) 456-7890 or 1234567890"
        phones = core.extract_phone_numbers(text)
        assert "123-456-7890" in phones and "1234567890" in phones
        # parity quirk: the reference's paren pattern starts with \b\( which
        # cannot match after a space (no word boundary there), so the
        # parenthesized form is NOT extracted — reproduce exactly
        assert len(phones) == 2

    def test_phone_duplicate_across_families(self):
        # dotted form also matched nowhere else; dup retention shows when the
        # same literal matches two families
        phones = core.extract_phone_numbers("fax 123.456.7890 ok")
        assert phones == ["123.456.7890"]

    def test_medical_terms_sorted_distinct(self):
        terms = core.extract_medical_terms("Aspirin aspirin heart patient 5mg")
        assert terms == sorted(set(terms))
        assert "heart" in terms and "patient" in terms and "5mg" in terms


class TestNER:
    def test_invoice_entities(self):
        ents = core.extract_entities(INVOICE)
        by_text = {e["text"]: e for e in ents}
        assert by_text["John Smith"]["entity_type"] == "PERSON"
        assert INVOICE[by_text["John Smith"]["start"]:by_text["John Smith"]["end"]] == "John Smith"
        assert by_text["Aspirin"]["entity_type"] == "MEDICATION"
        assert by_text["pain"]["entity_type"] == "DIAGNOSIS"

    def test_clinical_entities(self):
        ents = core.extract_entities(CLINICAL)
        types = {(e["text"], e["entity_type"]) for e in ents}
        assert ("diabetes mellitus", "DIAGNOSIS") in types
        assert ("Metformin", "MEDICATION") in types
        assert ("January 15, 2023", "DATE") in types
        assert ("Sarah Johnson", "PERSON") in types
        assert ("City General Hospital", "ORGANIZATION") in types

    def test_sorted_by_start_and_spans_valid(self):
        ents = core.extract_entities(CLINICAL)
        starts = [e["start"] for e in ents]
        assert starts == sorted(starts)
        assert all(core.validate_entity(e) for e in ents)
        for e in ents:
            assert CLINICAL[e["start"]:e["end"]] == e["text"]

    def test_dedup_first_wins(self):
        ents = core.extract_entities(CLINICAL)
        keys = [(e["text"], e["start"], e["end"]) for e in ents]
        assert len(keys) == len(set(keys))

    def test_label_map(self):
        assert core.map_label("medication") == "MEDICATION"
        assert core.map_label("GPE") == "LOCATION"
        assert core.map_label("CHEMICAL") == "MEDICATION"
        assert core.map_label("CARDINAL") is None

    def test_unmapped_dropped(self):
        # bare cardinal "72" is emitted as CARDINAL by the general extractor
        cands = core.raw_entity_candidates("value 72 here")
        assert any(c["label"] == "CARDINAL" for c in cands)
        ents = core.extract_entities("value 72 here")
        assert not any(e["text"] == "72" for e in ents)

    def test_confidence_filter_and_medical_subset(self):
        ents = core.extract_entities(CLINICAL)
        kept = core.filter_by_confidence(ents, 0.85)
        assert all(e["confidence"] >= 0.85 for e in kept)
        med = core.medical_entities(ents)
        assert med and all(e["entity_type"] in core.MEDICAL_ENTITY_TYPES for e in med)

    def test_entity_statistics(self):
        stats = core.entity_statistics(core.extract_entities(INVOICE))
        assert stats["PERSON"] == 1 and stats["MEDICATION"] >= 1

    def test_deterministic(self):
        assert core.extract_entities(CLINICAL) == core.extract_entities(CLINICAL)


HTML_PAGE = b"""<!doctype html><html><head><title>t</title>
<script>var x = "SCRIPT NOISE that is quite long indeed";</script></head>
<body><nav><a href="/">Home</a> <a href="/a">Products</a> <a href="/b">About us page</a></nav>
<div id="main"><p>Patient John Smith was prescribed Aspirin 100mg for pain relief.</p>
<p>This is a second content paragraph that clearly has enough characters to count.</p></div>
<footer><a href="/c">Contact</a> <a href="/d">Privacy policy terms</a></footer>
</body></html>"""


class TestHtmlExtract:
    def test_main_content(self):
        text = core.extract_main_content(HTML_PAGE)
        assert "Aspirin 100mg" in text
        assert "SCRIPT NOISE" not in text
        assert "Products" not in text  # nav boilerplate
        assert "Privacy" not in text  # footer boilerplate

    def test_blocks_features(self):
        blocks = core.html_blocks(HTML_PAGE)
        nav = [b for b in blocks if b.in_boilerplate]
        content = [b for b in blocks if b.is_content]
        assert nav and content
        assert all(b.depth > 0 and b.tag_path for b in blocks)
        assert len(content) == 2

    def test_link_density_rejects_linkfarm(self):
        linkfarm = b"<body><div>" + b" ".join(
            b'<a href="/%d">link text %d</a>' % (i, i) for i in range(20)
        ) + b"</div></body>"
        assert core.extract_main_content(linkfarm) == ""

    def test_deterministic(self):
        assert core.extract_main_content(HTML_PAGE) == core.extract_main_content(HTML_PAGE)


class TestEmbedding:
    def test_shape_norm_determinism(self):
        v = core.embed_text("aspirin for pain")
        assert v.shape == (core.EMBEDDING_DIM,)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
        assert np.array_equal(v, core.embed_text("aspirin for pain"))

    def test_empty_is_zero(self):
        assert float(np.linalg.norm(core.embed_text(""))) == 0.0

    def test_similar_texts_closer(self):
        a = core.embed_text("aspirin pain relief medication")
        b = core.embed_text("aspirin pain relief drug")
        c = core.embed_text("quarterly revenue growth forecast")
        assert core.cosine_similarity(a, b) > core.cosine_similarity(a, c)

    def test_create_document_text_exact(self):
        ents = [
            {"text": "Aspirin", "entity_type": "MEDICATION"},
            {"text": "pain", "entity_type": "DIAGNOSIS"},
        ]
        out = core.create_document_text("Some text.", ents, {"source": "test", "dept": "x"})
        assert out == "Some text. Aspirin (MEDICATION) pain (DIAGNOSIS) source: test dept: x"

    def test_create_document_text_empty_parts(self):
        assert core.create_document_text(None, [], {}) == ""
        assert core.create_document_text("t", None, None) == "t"


class TestValidation:
    def test_executable_sniff(self):
        assert core.is_executable_payload(b"MZ\x90\x00rest")
        assert core.is_executable_payload(b"\x7fELFxxxx")
        assert not core.is_executable_payload(b"<html></html>")

    def test_sniff_kinds(self):
        assert core.sniff_payload_kind(b"%PDF-1.7 x") == "pdf"
        assert core.sniff_payload_kind(b"<!doctype html><p>x") == "html"
        assert core.sniff_payload_kind(b"\x89PNGxxxx") == "image"
        assert core.sniff_payload_kind(b"MZ\x90") == "executable"
        assert core.sniff_payload_kind(b"") == "empty"

    def test_ocr_errors(self):
        # reference tests/test_validation.py:251-265 corpus
        assert core.has_common_ocr_errors("account 0000 balance")
        assert core.has_common_ocr_errors("IIIl1 mixed")
        assert not core.has_common_ocr_errors("normal text 12")

    def test_gibberish(self):
        assert core.is_gibberish("@@@@ #### $$$$")  # special chars
        assert core.is_gibberish("123456789012 a")  # digits
        assert core.is_gibberish(" ".join(["word"] * 20))  # repetition
        assert not core.is_gibberish("a perfectly normal sentence with many different words here")

    def test_sanitize(self):
        assert core.sanitize_string("a\x00b" + "c" * 2000, 10) == "abcccccccc"


class TestOcr:
    def test_pdf_roundtrip_pages(self):
        data = core.fake_pdf_bytes(["page one text", "page two text"])
        pages = core.ocr_pdf_pages(data)
        assert [p[0] for p in pages] == ["page one text", "page two text"]
        assert all(0.0 <= p[1] <= 1.0 for p in pages)

    def test_confidence_math(self):
        # exact reference math: mean of positive confs / 100, else 0.0
        assert core.mean_confidence([50, 100, -1, 0]) == 0.75
        assert core.mean_confidence([-1, 0]) == 0.0
        assert core.mean_confidence([]) == 0.0

    def test_word_confidence_range_and_determinism(self):
        for w in ["alpha", "beta", "x"]:
            c = core.word_confidence(w)
            assert -1 <= c <= 99
            assert c == core.word_confidence(w)

    def test_non_pdf_rejected(self):
        assert core.ocr_pdf_pages(b"<html>") == []

    def test_image_roundtrip_single_page(self):
        # X1: the reference's flagship input — a scanned page image OCRs
        # to (text, positive-mean confidence), exactly one page
        data = core.fake_png_bytes("scanned page words here")
        pages = core.ocr_image(data)
        assert len(pages) == 1
        text, conf = pages[0]
        assert text == "scanned page words here"
        assert conf == core.mean_confidence(
            [core.word_confidence(w) for w in text.split()]
        )

    def test_image_without_embedded_text_is_empty(self):
        # real image bytes (no fixture marker) → empty text, conf 0.0 —
        # quarantined upstream as 'no content extracted'
        assert core.ocr_image(b"\xff\xd8\xff real jpeg bytes") == [("", 0.0)]

    def test_non_image_rejected(self):
        assert core.ocr_image(b"%PDF-1.7") == []
        assert core.ocr_image(b"<html>") == []

    def test_payload_router(self):
        pdf = core.fake_pdf_bytes(["p1", "p2"])
        img = core.fake_png_bytes("scan")
        assert core.ocr_payload_pages(pdf) == core.ocr_pdf_pages(pdf)
        assert core.ocr_payload_pages(img) == core.ocr_image(img)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestSanitizeResponseData:
    """reference middleware.py:304-328 — recursive sensitive-key redaction."""

    def test_flat_and_case_insensitive(self):
        from medical_vector_database_ocr_ner_spark.core.validation import (
            sanitize_response_data,
        )

        out = sanitize_response_data({
            "password": "hunter2", "API_Key": "abc", "monkey": "sees",
            "clean": "data", "Debug_log": ["x"],
        })
        assert out == {
            "password": "[REDACTED]", "API_Key": "[REDACTED]",
            "monkey": "[REDACTED]",   # 'key' substring matches, like ref
            "clean": "data", "Debug_log": "[REDACTED]",
        }

    def test_nested_dicts_and_lists(self):
        from medical_vector_database_ocr_ner_spark.core.validation import (
            sanitize_response_data,
        )

        out = sanitize_response_data({
            "meta": {"token": "t", "ok": 1},
            "items": [{"secret_sauce": 9}, {"fine": 2}, 7],
        })
        assert out == {
            "meta": {"token": "[REDACTED]", "ok": 1},
            "items": [{"secret_sauce": "[REDACTED]"}, {"fine": 2}, 7],
        }

    def test_non_dict_passthrough(self):
        from medical_vector_database_ocr_ner_spark.core.validation import (
            sanitize_response_data,
        )

        assert sanitize_response_data([1, 2]) == [1, 2]
        assert sanitize_response_data("x") == "x"


class TestSearchInputGuards:
    """reference validation.py:161-190 + 422-444 mirrors."""

    def test_valid_query_sanitized(self):
        from medical_vector_database_ocr_ner_spark.core.validation import (
            validate_search_query,
        )

        assert validate_search_query("  aspirin dosage\x00  ") == "aspirin dosage"

    def test_empty_rejected(self):
        import pytest as _pytest

        from medical_vector_database_ocr_ner_spark.core.validation import (
            validate_search_query,
        )

        for q in ("", "   ", None):
            with _pytest.raises(ValueError, match="cannot be empty"):
                validate_search_query(q)

    def test_too_long_rejected_not_truncated(self):
        import pytest as _pytest

        from medical_vector_database_ocr_ner_spark.core.validation import (
            validate_search_query,
        )

        with _pytest.raises(ValueError, match=r"String too long: 501"):
            validate_search_query("q" * 501)
        assert validate_search_query("q" * 500) == "q" * 500

    def test_dangerous_patterns_rejected(self):
        import pytest as _pytest

        from medical_vector_database_ocr_ner_spark.core.validation import (
            validate_search_query,
        )

        for q in ("<script>alert(1)", "JAVASCRIPT:x", "data:text/html",
                  "x onload=evil()"):
            with _pytest.raises(ValueError, match="dangerous content"):
                validate_search_query(q)

    def test_parameter_validation_collects_errors(self):
        from medical_vector_database_ocr_ner_spark.core.validation import (
            validate_search_parameters,
        )

        assert validate_search_parameters("q", 10) == (True, [])
        ok, errs = validate_search_parameters("", 0)
        assert not ok and len(errs) == 2
        ok, errs = validate_search_parameters("q", 101)
        assert not ok and errs == [
            "Number of results too high: 101 (max: 100)"
        ]


class TestMetadataValidation:
    """reference validation.py:193-251 + document.py:166-175 mirrors."""

    def test_valid_metadata_sanitized(self):
        from medical_vector_database_ocr_ner_spark.core.validation import (
            validate_metadata,
        )

        out = validate_metadata({
            "lang": " en\x00 ", "n": 3, "f": 1.5, "ok": True,
            "tags": [" a\x01 ", 2], "nested": {"k": "v"},
        })
        assert out == {"lang": "en", "n": 3, "f": 1.5, "ok": True,
                       "tags": ["a", 2], "nested": {"k": "v"}}
        assert validate_metadata(None) is None

    def test_rejections(self):
        import pytest as _pytest

        from medical_vector_database_ocr_ner_spark.core.validation import (
            validate_metadata,
        )

        with _pytest.raises(ValueError, match="must be a dictionary"):
            validate_metadata([1])
        with _pytest.raises(ValueError, match="keys must be strings"):
            validate_metadata({1: "x"})
        with _pytest.raises(ValueError, match="key too long"):
            validate_metadata({"k" * 101: "x"})
        with _pytest.raises(ValueError, match="String too long: 1001"):
            validate_metadata({"k": "x" * 1001})
        with _pytest.raises(ValueError, match="List too long"):
            validate_metadata({"k": list(range(101))})
        with _pytest.raises(ValueError, match="Unsupported list item"):
            validate_metadata({"k": [{"no": "dicts"}]})
        with _pytest.raises(ValueError, match="String too long: 501"):
            validate_metadata({"k": ["x" * 501]})
        with _pytest.raises(ValueError, match="Unsupported metadata value"):
            validate_metadata({"k": object()})

    def test_doc_id(self):
        import pytest as _pytest

        from medical_vector_database_ocr_ner_spark.core.validation import (
            validate_doc_id,
        )

        assert validate_doc_id("Doc_42-a") == "Doc_42-a"
        with _pytest.raises(ValueError, match="cannot be empty"):
            validate_doc_id("  ")
        with _pytest.raises(ValueError, match="invalid characters"):
            validate_doc_id("doc/42")


def test_suspicious_user_agent():
    from medical_vector_database_ocr_ner_spark.core.validation import (
        is_suspicious_user_agent,
    )

    assert is_suspicious_user_agent("Mozilla <script>x</script>")
    assert is_suspicious_user_agent("JAVASCRIPT:void(0)")
    assert not is_suspicious_user_agent("Mozilla/5.0 (X11; Linux)")
    assert not is_suspicious_user_agent(None)


def test_sanitize_response_data_list_in_list_blind_spot():
    """Documents the reference's exact behavior (middleware.py:323-324):
    dicts nested through TWO list levels are not walked — the mirror must
    reproduce it, and json_guard is the strict alternative."""
    from medical_vector_database_ocr_ner_spark.core.validation import (
        sanitize_response_data,
    )

    out = sanitize_response_data({"items": [[{"password": "p"}]]})
    assert out == {"items": [[{"password": "p"}]]}  # faithfully unredacted


def test_validate_user_agent_length_gate_precedes_patterns():
    """reference middleware.py:179-193: length gate (>500) fires before the
    pattern scan; clean short UAs pass through unchanged."""
    import pytest as _pytest

    from medical_vector_database_ocr_ner_spark.core.validation import (
        validate_user_agent,
    )

    assert validate_user_agent("Mozilla/5.0 (X11; Linux)") == "Mozilla/5.0 (X11; Linux)"
    assert validate_user_agent(None) == ""
    with _pytest.raises(ValueError, match="too long"):
        validate_user_agent("A" * 501)
    # 501 chars INCLUDING a suspicious pattern: length error wins (order)
    with _pytest.raises(ValueError, match="too long"):
        validate_user_agent("<script>" + "A" * 500)
    with _pytest.raises(ValueError, match="Suspicious"):
        validate_user_agent("Mozilla <script>x</script>")
    assert validate_user_agent("A" * 500) == "A" * 500  # boundary: 500 ok


def test_validate_forwarded_header():
    """reference middleware.py:163-176: dotted-numeric check applies only
    to x-forwarded-for / x-real-ip."""
    import pytest as _pytest

    from medical_vector_database_ocr_ner_spark.core.validation import (
        validate_forwarded_header,
    )

    assert validate_forwarded_header("x-forwarded-for", "10.0.0.1") == "10.0.0.1"
    assert validate_forwarded_header("X-Real-IP", "192.168.1.9") == "192.168.1.9"
    with _pytest.raises(ValueError, match="Invalid x-forwarded-for"):
        validate_forwarded_header("x-forwarded-for", "evil.example")
    with _pytest.raises(ValueError, match="Invalid x-real-ip"):
        validate_forwarded_header("x-real-ip", "")
    # other suspicious headers pass through unchecked, as in the reference
    assert validate_forwarded_header("x-forwarded-host", "evil.example") == "evil.example"
