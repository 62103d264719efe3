"""Deterministic synthetic `pages` table (FIXTURES.md §1, BASELINE.json
input_hint): Common-Crawl-style rows
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Generated with plain pyarrow (no Spark, no wall clock, no global RNG state):
every row is a pure function of (seed, row index), so any scale factor is
reproducible and goldens are stable. Host distribution is deliberately
SKEWED (a few hosts own most urls) to exercise the salted url-hash
repartitioning the 10^12-row design requires.

Payload mix per FIXTURES.md: HTML pages with boilerplate nav/header/footer
wrapping one main-content block (~87.5%), synthetic multi-page PDFs (~5%),
scanned-page images (~2.5%, the reference's flagship OCR input — v3),
executable payloads MZ/ELF (~2%, must be rejected), gibberish/OCR-error
pages (~3%, exercise quality validators).
"""

from __future__ import annotations

import hashlib
import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from ..core.ocr import fake_pdf_bytes, fake_png_bytes

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# seed texts per FIXTURES.md §1 (mirroring the reference's own fixtures)
CLINICAL_TEXT = (
    "Patient John Smith was diagnosed with diabetes mellitus on January 15, 2023. "
    "Dr. Sarah Johnson prescribed Metformin 500mg twice daily. "
    "The patient was admitted to City General Hospital for treatment. "
    "Blood pressure was 140/90 mmHg and heart rate was 72 bpm."
)
INVOICE_TEXT = "Patient John Smith was prescribed Aspirin 100mg for pain relief."

_FIRST = ["John", "Sarah", "Emily", "Michael", "Anna", "David", "Laura", "James"]
_LAST = ["Smith", "Johnson", "Brown", "Wilson", "Taylor", "Clark", "Lewis", "Walker"]
_MEDS = ["Metformin", "Aspirin", "Ibuprofen", "Lisinopril", "Amoxicillin",
         "Omeprazole", "Warfarin", "Prednisone", "Atorvastatin", "Insulin"]
_CONDS = ["diabetes", "hypertension", "asthma", "pneumonia", "arthritis",
          "bronchitis", "hepatitis", "migraine", "anemia", "influenza"]
_PARTS = ["heart", "lung", "liver", "kidney", "chest", "spine", "stomach", "blood"]
_FILLER = (
    "the clinical team reviewed the chart and updated the care plan during rounds "
    "follow up visits were scheduled and the family was informed about recovery "
    "progress while routine observations continued through the week"
).split()

_NAV = (
    '<nav><a href="/">Home</a> <a href="/departments">Departments</a> '
    '<a href="/doctors">Find a doctor</a> <a href="/appointments">Appointments</a> '
    '<a href="/contact">Contact us</a></nav>'
)
_FOOTER = (
    '<footer><a href="/terms">Terms of service</a> <a href="/privacy">Privacy</a> '
    '<a href="/careers">Careers</a> <a href="/sitemap">Sitemap</a>'
    "<p>© 2023 Example Health Network</p></footer>"
)
_SIDEBAR = (
    '<aside><h3>Related</h3><ul><li><a href="/a">Cardiology news</a></li>'
    '<li><a href="/b">Lab results portal</a></li>'
    '<li><a href="/c">Insurance FAQ</a></li></ul></aside>'
)

_EPOCH = datetime(2023, 6, 1, tzinfo=timezone.utc)
N_HOSTS = 50


def _host_for(i: int, rng: random.Random) -> str:
    # skew: ~60% of pages live on 3 hot hosts, rest uniform over the tail
    r = rng.random()
    if r < 0.35:
        return "host0"
    if r < 0.50:
        return "host1"
    if r < 0.60:
        return "host2"
    return f"host{3 + rng.randrange(N_HOSTS - 3)}"


def _sentences(i: int, rng: random.Random) -> list[str]:
    sents = []
    n = 2 + rng.randrange(4)
    for _ in range(n):
        kind = rng.randrange(6)
        first, last = rng.choice(_FIRST), rng.choice(_LAST)
        med, cond = rng.choice(_MEDS), rng.choice(_CONDS)
        if kind == 0:
            sents.append(
                f"Patient {first} {last} was diagnosed with {cond} on "
                f"{rng.randrange(1,13):02d}/{rng.randrange(1,29):02d}/{2020 + rng.randrange(5)}."
            )
        elif kind == 1:
            sents.append(
                f"Dr. {first} {last} prescribed {med} {rng.choice([50,100,250,500])}mg "
                f"for {rng.randrange(2,14)} days."
            )
        elif kind == 2:
            sents.append(
                f"The invoice total was {rng.randrange(20, 900)} dollars, "
                f"payable to Example {rng.choice(['Hospital','Clinic'])} by card."
            )
        elif kind == 3:
            sents.append(
                f"Contact the {rng.choice(_PARTS)} unit at "
                f"{rng.randrange(200,999)}-{rng.randrange(200,999)}-{rng.randrange(1000,9999)} "
                f"or email team{rng.randrange(100)}@example.org for details."
            )
        elif kind == 4:
            sents.append(
                f"A {rng.choice(['surgery','biopsy','mri','ct scan','dialysis'])} was "
                f"performed on the {rng.choice(_PARTS)} without complications."
            )
        else:
            words = [rng.choice(_FILLER) for _ in range(12 + rng.randrange(18))]
            sents.append(" ".join(words) + ".")
    return sents


def _html_page(i: int, rng: random.Random, main_sents: list[str]) -> bytes:
    paras = "".join(f"<p>{s}</p>" for s in main_sents)
    title = f"Record {i} — Example Health"
    doc = (
        "<!doctype html><html><head>"
        f"<title>{title}</title>"
        '<script>window.analytics={queue:[]};function track(e){window.analytics.queue.push(e)}</script>'
        "<style>.nav{display:flex}.main{margin:0 auto}</style>"
        "</head><body>"
        f"{_NAV}<header><h1>{title}</h1></header>{_SIDEBAR}"
        f'<main><article>{paras}</article></main>'
        f"{_FOOTER}</body></html>"
    )
    return doc.encode("utf-8")


def _row(i: int, seed: int) -> tuple[str, datetime, bytes, str | None, str]:
    # per-row RNG derived from (seed, i): reproducible under any partitioning
    digest = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest()
    rng = random.Random(int.from_bytes(digest, "big"))
    host = _host_for(i, rng)
    ts = _EPOCH + timedelta(seconds=i * 7 % (86400 * 30))
    lang = "en" if rng.random() < 0.9 else rng.choice(["de", "fr"])
    r = rng.random()
    url = f"https://{host}.example/page/{i}"

    if i == 0:  # pinned fixtures so goldens always contain the seed texts
        html = _html_page(i, rng, [CLINICAL_TEXT])
        return url, ts, html, None, "en"
    if i == 1:
        html = _html_page(i, rng, [INVOICE_TEXT + " " + " ".join(_sentences(i, rng))])
        return url, ts, html, None, "en"

    if r < 0.05:  # synthetic PDF branch
        pages = [" ".join(_sentences(i * 31 + p, rng)) for p in range(1 + rng.randrange(3))]
        return f"https://{host}.example/doc/{i}.pdf", ts, fake_pdf_bytes(pages), None, lang
    if r < 0.07:  # executable payloads — must be quarantined
        sig = rng.choice([b"MZ\x90\x00\x03", b"\x7fELF\x02\x01"])
        return f"https://{host}.example/bin/{i}", ts, sig + bytes(rng.randrange(256) for _ in range(64)), None, lang
    if r < 0.10:  # gibberish / OCR-error page — exercises quality validators
        junk = rng.choice(
            [
                "0000 " * 40,
                " ".join(str(rng.randrange(10**6)) for _ in range(40)),
                ("spam " * 30).strip(),
            ]
        )
        return url, ts, _html_page(i, rng, [junk]), None, lang
    if r < 0.125:  # scanned-page image branch (reference's flagship input:
        # .png/.jpg uploads OCR'd directly, ocr_service.py:193-208)
        scan = " ".join(_sentences(i * 17 + 5, rng))
        return f"https://{host}.example/img/{i}.png", ts, fake_png_bytes(scan), None, lang
    html = _html_page(i, rng, _sentences(i, rng))
    pre_text = " ".join(_sentences(i, rng))[:200] if rng.random() < 0.2 else None
    return url, ts, html, pre_text, lang


def generate_pages_parquet(
    out_path: str,
    n_pages: int,
    seed: int = 42,
    row_group_size: int = 2048,
    n_files: int | None = None,
) -> str:
    """Write the synthetic pages table as a DIRECTORY of parquet part files
    (a single file caps scan parallelism at its row-group count — at 100 TB
    the input is always many files/splits, so the fixture matches).
    Idempotent; returns out_path."""
    if n_files is None:
        n_files = max(8, min(64, n_pages // 1000))
    tmp = out_path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    per = (n_pages + n_files - 1) // n_files
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n_pages)
        if lo >= hi:
            break
        cols: dict[str, list] = {
            k: [] for k in ("url", "warc_ts", "html", "text", "lang")
        }
        for i in range(lo, hi):
            url, ts, html, text, lang = _row(i, seed)
            cols["url"].append(url)
            cols["warc_ts"].append(ts)
            cols["html"].append(html)
            cols["text"].append(text)
            cols["lang"].append(lang)
        table = pa.Table.from_pydict(cols, schema=PAGES_SCHEMA)
        pq.write_table(
            table, os.path.join(tmp, f"part-{f:05d}.parquet"),
            row_group_size=row_group_size,
        )
    os.rename(tmp, out_path)
    return out_path


def pages_path(n_pages: int, seed: int = 42, base_dir: str = "/tmp/spark_graft_pages") -> str:
    """Cached location for a generated pages table; generates on first use."""
    path = os.path.join(base_dir, f"pages_n{n_pages}_s{seed}_v3.parquet")
    if not os.path.exists(path):
        generate_pages_parquet(path, n_pages, seed)
    return path


def read_pages(spark, path: str):
    return spark.read.parquet(path)
