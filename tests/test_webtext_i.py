"""Webtext wave I (round 4): TF-IDF distinctive terms, unigram-LM doc
scoring, bucketed interval-overlap range join, deterministic weighted
sampling, and integer HITS — each recomputed in plain Python."""

import hashlib
from collections import Counter, defaultdict

from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
    _HITS_SCALE,
    _IVL_US,
    q_hits_hosts,
    q_interval_overlap_join,
    q_tfidf_distinctive_terms,
    q_unigram_lm_doc_score,
    q_weighted_sample,
)


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark, sf001_dir):
    return (
        spark.read.parquet(f"{sf001_dir}/documents.parquet")
        .select("doc_id", "lang", "text", "n_chars")
        .collect()
    )


class TestTfidfDistinctiveTerms:
    def test_matches_python_recount(self, spark, sf001_dir):
        docs = _docs(spark, sf001_dir)
        tf: Counter = Counter()
        df_docs: defaultdict = defaultdict(set)
        for d in docs:
            for tok in d["text"].split(" "):
                tf[(d["lang"], tok)] += 1
                df_docs[tok].add(d["doc_id"])
        n_docs = len(docs)
        scored = [
            (lang, tok, c, len(df_docs[tok]),
             c * n_docs // len(df_docs[tok]))
            for (lang, tok), c in tf.items()
        ]
        expected = {}
        for lang in {d["lang"] for d in docs}:
            top = sorted(
                (r for r in scored if r[0] == lang),
                key=lambda r: (-r[4], r[1]),
            )[:5]
            for rn, r in enumerate(top, 1):
                expected[(lang, rn)] = r
        rows = q_tfidf_distinctive_terms(spark, sf001_dir).collect()
        assert len(rows) == len(expected)
        for r in rows:
            lang, tok, tf_v, df_v, score = expected[(r["lang"], r["rn"])]
            assert (r["tok"], r["tf"], r["df"], r["score"]) == (
                tok, tf_v, df_v, score
            ), (r["lang"], r["rn"])


class TestUnigramLmDocScore:
    def test_matches_python_recount(self, spark, sf001_dir):
        docs = _docs(spark, sf001_dir)
        freq: Counter = Counter()
        for d in docs:
            freq.update(d["text"].split(" "))
        total = sum(freq.values())
        expected = {}
        for d in docs:
            toks = d["text"].split(" ")
            bits = sum(total.bit_length() - freq[t].bit_length() for t in toks)
            expected[d["doc_id"]] = (
                len(toks), bits, bits * 10 // len(toks)
            )
        rows = q_unigram_lm_doc_score(spark, sf001_dir).collect()
        assert len(rows) == len(docs)
        for r in rows:
            n_toks, bits, bx10 = expected[r["doc_id"]]
            assert (r["n_toks"], r["lm_bits"], r["bits_x10_per_tok"]) == (
                n_toks, bits, bx10
            ), r["doc_id"]
            assert r["rare_heavy"] == (bx10 >= 60)

    def test_rare_tokens_cost_more_bits(self, spark, sf001_dir):
        """A token seen once must cost more bits than the modal token —
        the monotonicity that makes the score a perplexity proxy."""
        docs = _docs(spark, sf001_dir)
        freq: Counter = Counter()
        for d in docs:
            freq.update(d["text"].split(" "))
        total = sum(freq.values())
        rare = min(freq.values())
        common = max(freq.values())
        assert (total.bit_length() - rare.bit_length()) > (
            total.bit_length() - common.bit_length()
        )


class TestIntervalOverlapJoin:
    def test_matches_python_bruteforce(self, spark, sf001_dir):
        ev = (
            spark.read.parquet(f"{sf001_dir}/events.parquet")
            .select("event_id", "user_id", "event_type", "ts")
            .collect()
        )
        from datetime import datetime, timedelta

        def epoch_us(ts):
            return (ts - datetime(1970, 1, 1)) // timedelta(microseconds=1)
        by_user = defaultdict(list)
        for e in ev:
            by_user[e["user_id"]].append(epoch_us(e["ts"]))
        hourly = defaultdict(list)
        for e in ev:
            if e["event_type"] != "error":
                continue
            t0 = epoch_us(e["ts"])
            n = sum(1 for u in by_user[e["user_id"]] if t0 <= u < t0 + _IVL_US)
            hour = e["ts"].replace(minute=0, second=0, microsecond=0)
            hourly[hour].append(n)
        rows = q_interval_overlap_join(spark, sf001_dir).collect()
        got = {r["err_hour"]: r for r in rows}
        assert set(got) == set(hourly)
        for hour, counts in hourly.items():
            r = got[hour]
            assert (r["n_errors"], r["overlaps_total"], r["max_overlap"]) == (
                len(counts), sum(counts), max(counts)
            ), hour

    def test_every_error_counts_itself(self, spark, sf001_dir):
        """The half-open window [ts, ts+10min) contains the error itself,
        so every per-error overlap count is >= 1 and hourly error counts
        sum to the true error count."""
        rows = q_interval_overlap_join(spark, sf001_dir).collect()
        n_errors = (
            spark.read.parquet(f"{sf001_dir}/events.parquet")
            .where("event_type = 'error'")
            .count()
        )
        assert sum(r["n_errors"] for r in rows) == n_errors
        assert all(r["overlaps_total"] >= r["n_errors"] for r in rows)


class TestWeightedSample:
    def test_matches_python_selection(self, spark, sf001_dir):
        docs = _docs(spark, sf001_dir)
        keyed = [
            (
                d["lang"],
                d["doc_id"],
                max(d["n_chars"], 1),
                _h60_py(f"ws#{d['doc_id']}") // max(d["n_chars"], 1),
            )
            for d in docs
        ]
        expected = {}
        for lang in {d["lang"] for d in docs}:
            picks = sorted(
                (k for k in keyed if k[0] == lang),
                key=lambda k: (k[3], k[1]),
            )[:20]
            for rn, k in enumerate(picks, 1):
                expected[(lang, rn)] = k
        rows = q_weighted_sample(spark, sf001_dir).collect()
        assert len(rows) == len(expected)
        for r in rows:
            lang, doc_id, w, pk = expected[(r["lang"], r["rn"])]
            assert (r["doc_id"], r["w"], r["pk"]) == (doc_id, w, pk)

    def test_two_stage_rank_cannot_drop_winners(self, spark, sf001_dir):
        """Exactly 20 per language (fixture has >=20 docs per lang), and
        the selected keys per lang are the global minima — i.e. the
        salt16 pre-rank stage never evicted a winner."""
        rows = q_weighted_sample(spark, sf001_dir).collect()
        per_lang = defaultdict(list)
        for r in rows:
            per_lang[r["lang"]].append(r["pk"])
        docs = _docs(spark, sf001_dir)
        all_keys = defaultdict(list)
        for d in docs:
            all_keys[d["lang"]].append(
                _h60_py(f"ws#{d['doc_id']}") // max(d["n_chars"], 1)
            )
        for lang, picked in per_lang.items():
            assert len(picked) == 20
            assert sorted(picked) == sorted(all_keys[lang])[:20]


class TestHitsHosts:
    def test_matches_python_recount(self, spark, sf001_dir):
        import re

        # synthesize edges exactly as the query does, from the sf0.001
        # pages fixture
        from medical_vector_database_ocr_ner_spark.plans.queries import (
            _pages_for_sf,
        )

        pages = _pages_for_sf(spark, sf001_dir).select("url").collect()
        edges: Counter = Counter()
        for (url,) in pages:
            m_src = re.search(r"https?://([^/]+)/", url)
            m_i = re.search(r"([0-9]+)(\.pdf)?$", url)
            if not m_src or not m_i:
                continue
            src = m_src.group(1)
            i = int(m_i.group(1))
            for dst_i in ((i * 7 + 1) % 50, i % 10):
                dst = f"host{dst_i}.example"
                if src != dst:
                    edges[(src, dst)] += 1
        nodes = sorted({s for s, _ in edges} | {d for _, d in edges})

        def rescale(vec):
            tot = sum(vec.values())
            div = max(tot // _HITS_SCALE, 1)
            return {h: v // div for h, v in vec.items()}

        hub = {h: _HITS_SCALE for h in nodes}
        auth = {}
        for _ in range(2):
            raw_a: Counter = Counter()
            for (s, d), w in edges.items():
                if s in hub:
                    raw_a[d] += w * hub[s]
            auth = rescale(raw_a)
            raw_h: Counter = Counter()
            for (s, d), w in edges.items():
                if d in auth:
                    raw_h[s] += w * auth[d]
            hub = rescale(raw_h)
        full = [
            (h, auth.get(h, 0), hub.get(h, 0)) for h in nodes
        ]
        expected = sorted(full, key=lambda r: (-r[1], r[0]))[:10]
        rows = q_hits_hosts(spark, sf001_dir).collect()
        got = [(r["host"], r["authority"], r["hubness"]) for r in rows]
        assert got == expected

    def test_authority_separates_targets_from_pointers(self, spark, sf001_dir):
        """The synthetic graph's link targets are always host{0..49}
        .example — authority mass must land there, and every returned
        authority is positive."""
        rows = q_hits_hosts(spark, sf001_dir).collect()
        assert len(rows) == 10
        assert all(r["authority"] > 0 for r in rows)
        assert all(r["host"].startswith("host") for r in rows)
