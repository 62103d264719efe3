"""Webtext wave P (round 4): exact trimmed mean from the count table,
Morton/Z-order layout keys — recomputed in plain Python."""

import hashlib
import re
from collections import Counter, defaultdict
from datetime import datetime

from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
    _MORTON_BITS,
    _TRIM_PCT,
    q_morton_layout_keys,
    q_trimmed_mean_length,
)


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestTrimmedMeanLength:
    def test_matches_sorted_trim(self, spark, sf001_dir):
        docs = (
            spark.read.parquet(f"{sf001_dir}/documents.parquet")
            .select("lang", "n_chars")
            .collect()
        )
        by_lang = defaultdict(list)
        for d in docs:
            by_lang[d["lang"]].append(d["n_chars"])
        rows = q_trimmed_mean_length(spark, sf001_dir).collect()
        assert len(rows) == len(by_lang)
        for r in rows:
            vals = sorted(by_lang[r["lang"]])
            n = len(vals)
            k = n * _TRIM_PCT // 100
            kept = vals[k:n - k]
            assert r["n_docs"] == n and r["k_trim"] == k
            assert r["kept_n"] == len(kept)
            assert r["trimmed_mean_x100"] == sum(kept) * 100 // len(kept)

    def test_outlier_immunity_property(self):
        # the statistic's raison d'etre, on synthetic data: one absurd
        # outlier moves the plain mean but not the trimmed mean
        vals = [100] * 95 + [110] * 4 + [10_000_000]
        n = len(vals)
        k = n * _TRIM_PCT // 100
        vals.sort()
        kept = vals[k:n - k]
        trimmed = sum(kept) * 100 // len(kept)
        plain = sum(vals) * 100 // n
        assert trimmed < 11_000  # ~100.4
        assert plain > 10_000_000  # dragged by the outlier


class TestMortonLayoutKeys:
    @staticmethod
    def _interleave(a, b):
        out = 0
        for i in range(_MORTON_BITS):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    def test_matches_python_recount(self, spark, sf001_dir):
        from medical_vector_database_ocr_ner_spark.plans.queries import (
            _pages_for_sf,
        )

        rows = (
            _pages_for_sf(spark, sf001_dir)
            .select("url", "warc_ts")
            .collect()
        )
        epoch = datetime(2023, 6, 1)
        blocks = Counter()
        for r in rows:
            host = re.match(r"^https?://([^/]+)", r["url"]).group(1)
            hx = _h60_py(host) % (1 << _MORTON_BITS)
            tx = int((r["warc_ts"] - epoch).total_seconds() // 60) % (
                1 << _MORTON_BITS
            )
            blocks[self._interleave(hx, tx) // 1048576] += 1
        got = {
            r["block"]: r["n_rows"]
            for r in q_morton_layout_keys(spark, sf001_dir).collect()
        }
        assert got == dict(blocks)

    def test_zorder_locality_property(self):
        # the layout's point: keys close in EITHER dimension land in
        # nearby key blocks — verify the standard bound that a morton
        # key confines each dimension's bits to alternating positions,
        # i.e. de-interleaving recovers both coordinates exactly
        for a, b in [(0, 0), (1, 0), (0, 1), (12345, 54321),
                     (65535, 65535)]:
            m = self._interleave(a, b)
            ra = sum(((m >> (2 * i)) & 1) << i for i in range(_MORTON_BITS))
            rb = sum(
                ((m >> (2 * i + 1)) & 1) << i for i in range(_MORTON_BITS)
            )
            assert (ra, rb) == (a, b)
