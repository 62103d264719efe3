"""Webtext wave J (round 4): simhash LSH band pairs, log2-histogram
quantile sketch, DSIR importance weights, rendezvous-hash shard
assignment, PMI collocations, and largest-remainder crawl budgets —
each recomputed in plain Python."""

import hashlib
import re
from collections import Counter, defaultdict

from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
    _CBA_BUDGET,
    _DSIR_B,
    _DSIR_S,
    _RV_SHARDS,
    _SBP_BANDS,
    _SBP_HAM,
    _SBP_MAXDOC,
    q_crawl_budget_allocation,
    q_dsir_importance_weights,
    q_length_quantile_sketch,
    q_pmi_bigrams,
    q_rendezvous_shard_assign,
    q_simhash_band_pairs,
)


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark, sf001_dir):
    return (
        spark.read.parquet(f"{sf001_dir}/documents.parquet")
        .select("doc_id", "lang", "text", "n_chars")
        .collect()
    )


def _urls(spark, sf001_dir):
    from medical_vector_database_ocr_ner_spark.plans.queries import (
        _pages_for_sf,
    )

    return [r["url"] for r in
            _pages_for_sf(spark, sf001_dir).select("url").collect()]


def _simhash_py(text: str) -> int:
    counts = Counter(text.split(" "))
    sig = 0
    for bit in range(16):
        p = 1 << bit
        s = sum(
            c * (((_h60_py(tok) // p) % 2) * 2 - 1)
            for tok, c in counts.items()
        )
        if s >= 0:
            sig += p
    return sig


class TestSimhashBandPairs:
    def test_matches_python_recount(self, spark, sf001_dir):
        docs = [d for d in _docs(spark, sf001_dir)
                if d["doc_id"] < _SBP_MAXDOC]
        sig = {d["doc_id"]: _simhash_py(d["text"]) for d in docs}
        buckets: defaultdict = defaultdict(set)
        for doc_id, s in sig.items():
            for band in range(_SBP_BANDS):
                buckets[(band, (s >> (band * 4)) % 16)].add(doc_id)
        expected = {}
        for members in buckets.values():
            ms = sorted(members)
            for i, a in enumerate(ms):
                for b in ms[i + 1:]:
                    ham = bin(sig[a] ^ sig[b]).count("1")
                    if ham <= _SBP_HAM:
                        expected[(a, b)] = ham
        rows = q_simhash_band_pairs(spark, sf001_dir).collect()
        got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
        assert len(rows) == len(got), "duplicate pairs emitted"
        assert got == expected
        # the fixture's deliberate dup clusters must surface here
        assert any(h == 0 for h in expected.values())

    def test_candidates_only_from_shared_bands(self, spark, sf001_dir):
        # any reported pair must agree on at least one 4-bit band
        docs = [d for d in _docs(spark, sf001_dir)
                if d["doc_id"] < _SBP_MAXDOC]
        sig = {d["doc_id"]: _simhash_py(d["text"]) for d in docs}
        for r in q_simhash_band_pairs(spark, sf001_dir).collect():
            sa, sb = sig[r["doc_a"]], sig[r["doc_b"]]
            assert any(
                (sa >> (b * 4)) % 16 == (sb >> (b * 4)) % 16
                for b in range(_SBP_BANDS)
            )


class TestLengthQuantileSketch:
    def test_matches_python_recount(self, spark, sf001_dir):
        docs = _docs(spark, sf001_dir)
        by_lang: defaultdict = defaultdict(list)
        for d in docs:
            by_lang[d["lang"]].append(max(d["n_chars"], 1).bit_length())
        expected = {}
        for lang, bks in by_lang.items():
            bks.sort()
            total = len(bks)
            lows = {}
            for q in (50, 90, 99):
                cum = 0
                hist = Counter(bks)
                for b in sorted(hist):
                    cum += hist[b]
                    if cum * 100 >= total * q:
                        lows[q] = 1 << (b - 1)
                        break
            expected[lang] = (total, lows[50], lows[90], lows[99])
        rows = q_length_quantile_sketch(spark, sf001_dir).collect()
        assert len(rows) == len(expected)
        for r in rows:
            assert (
                r["n_docs"], r["p50_lo"], r["p90_lo"], r["p99_lo"]
            ) == expected[r["lang"]], r["lang"]

    def test_quantiles_monotone_and_bound_true_percentile(
        self, spark, sf001_dir
    ):
        docs = _docs(spark, sf001_dir)
        by_lang: defaultdict = defaultdict(list)
        for d in docs:
            by_lang[d["lang"]].append(max(d["n_chars"], 1))
        for r in q_length_quantile_sketch(spark, sf001_dir).collect():
            assert r["p50_lo"] <= r["p90_lo"] <= r["p99_lo"]
            vals = sorted(by_lang[r["lang"]])
            true_p50 = vals[(len(vals) * 50 + 99) // 100 - 1]
            # log-histogram guarantee: lower bound <= true percentile
            # < 2x lower bound
            assert r["p50_lo"] <= true_p50 < 2 * r["p50_lo"]


class TestDsirImportanceWeights:
    def test_matches_python_recount(self, spark, sf001_dir):
        docs = _docs(spark, sf001_dir)
        src: Counter = Counter()
        tgt: Counter = Counter()
        doc_buckets = {}
        for d in docs:
            toks = d["text"].split(" ")
            bs = [
                _h60_py(f"{toks[i]} {toks[i + 1]}") % _DSIR_B
                for i in range(len(toks) - 1)
            ]
            doc_buckets[d["doc_id"]] = (d["lang"], bs)
            src.update(bs)
            if d["lang"] == "en":
                tgt.update(bs)
        w = {b: (tgt[b] + 1) * _DSIR_S // (src[b] + 1) for b in src}
        scored = []
        for doc_id, (lang, bs) in doc_buckets.items():
            if lang == "en" or not bs:
                continue
            scored.append(
                (doc_id, lang, len(bs), sum(w[b] for b in bs) // len(bs))
            )
        scored.sort(key=lambda r: (-r[3], r[0]))
        expected = scored[:20]
        rows = q_dsir_importance_weights(spark, sf001_dir).collect()
        got = [
            (r["doc_id"], r["lang"], r["n_grams"], r["score"]) for r in rows
        ]
        assert got == expected

    def test_no_target_docs_in_output(self, spark, sf001_dir):
        for r in q_dsir_importance_weights(spark, sf001_dir).collect():
            assert r["lang"] != "en"


class TestRendezvousShardAssign:
    def _assign(self, url: str, shards: int = _RV_SHARDS) -> int:
        hs = [_h60_py(f"{url}#s{s}") for s in range(shards)]
        return hs.index(max(hs))

    def test_matches_python_recount(self, spark, sf001_dir):
        urls = _urls(spark, sf001_dir)
        per_shard: defaultdict = defaultdict(lambda: [0, set()])
        for url in urls:
            host = re.match(r"^https?://([^/]+)", url).group(1)
            st = per_shard[self._assign(url)]
            st[0] += 1
            st[1].add(host)
        rows = q_rendezvous_shard_assign(spark, sf001_dir).collect()
        got = {r["shard"]: (r["n_urls"], r["n_hosts"]) for r in rows}
        assert got == {
            s: (n, len(hosts)) for s, (n, hosts) in per_shard.items()
        }
        assert sum(n for n, _ in got.values()) == len(urls)

    def test_minimal_relocation_on_shard_removal(self, spark, sf001_dir):
        # the HRW property the query's docstring claims: dropping shard 7
        # relocates ONLY the urls that lived on shard 7
        urls = _urls(spark, sf001_dir)
        for url in urls:
            s8 = self._assign(url, 8)
            s7 = self._assign(url, 7)
            if s8 != 7:
                assert s7 == s8, url


class TestPmiBigrams:
    def test_matches_python_recount(self, spark, sf001_dir):
        docs = _docs(spark, sf001_dir)
        uni: Counter = Counter()
        big: Counter = Counter()
        for d in docs:
            toks = d["text"].split(" ")
            for t in toks:
                uni[(d["lang"], t)] += 1
            for i in range(len(toks) - 1):
                big[(d["lang"], toks[i], toks[i + 1])] += 1
        tot: Counter = Counter()
        for (lang, _), c in uni.items():
            tot[lang] += c
        scored = [
            (lang, t1, t2, c,
             c * tot[lang] // (uni[(lang, t1)] * uni[(lang, t2)]))
            for (lang, t1, t2), c in big.items()
            if c >= 3
        ]
        expected = {}
        for lang in tot:
            top = sorted(
                (r for r in scored if r[0] == lang),
                key=lambda r: (-r[4], -r[3], r[1], r[2]),
            )[:5]
            for rn, r in enumerate(top, 1):
                expected[(lang, rn)] = r[1:]
        rows = q_pmi_bigrams(spark, sf001_dir).collect()
        assert len(rows) == len(expected)
        for r in rows:
            t1, t2, c_xy, score = expected[(r["lang"], r["rn"])]
            assert (r["t1"], r["t2"], r["c_xy"], r["score"]) == (
                t1, t2, c_xy, score
            ), (r["lang"], r["rn"])


class TestCrawlBudgetAllocation:
    def test_matches_python_recount_and_sums_to_budget(
        self, spark, sf001_dir
    ):
        urls = _urls(spark, sf001_dir)
        pending: Counter = Counter(
            re.match(r"^https?://([^/]+)", u).group(1) for u in urls
        )
        total = sum(pending.values())
        based = {
            h: (c, c * _CBA_BUDGET // total, (c * _CBA_BUDGET) % total)
            for h, c in pending.items()
        }
        leftover = _CBA_BUDGET - sum(b for _, b, _ in based.values())
        order = sorted(based, key=lambda h: (-based[h][2], h))
        extras = set(order[:leftover])
        expected = {
            h: (c, b + (1 if h in extras else 0))
            for h, (c, b, _) in based.items()
        }
        rows = q_crawl_budget_allocation(spark, sf001_dir).collect()
        got = {r["host"]: (r["pending"], r["alloc"]) for r in rows}
        assert got == expected
        assert sum(a for _, a in got.values()) == _CBA_BUDGET


class TestWaveJPlanShapes:
    """Pin the physical-plan properties PLANS.md claims for wave J."""

    @staticmethod
    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_rendezvous_no_join_no_explode_reads_url_only(
        self, spark, sf001_dir
    ):
        plan = self._plan(q_rendezvous_shard_assign(spark, sf001_dir))
        assert "Join" not in plan and "Generate" not in plan
        assert "ReadSchema: struct<url:string>" in plan

    def test_dsir_topk_is_take_ordered_with_broadcast_weights(
        self, spark, sf001_dir
    ):
        plan = self._plan(q_dsir_importance_weights(spark, sf001_dir))
        assert "TakeOrderedAndProject" in plan  # never a global sort
        assert "BroadcastHashJoin" in plan      # 8192-row weight table
        assert "CartesianProduct" not in plan

    def test_simhash_bands_no_allpairs(self, spark, sf001_dir):
        plan = self._plan(q_simhash_band_pairs(spark, sf001_dir))
        assert "CartesianProduct" not in plan
        # the candidate pair join is keyed on (band, bval) — a hash or
        # merge join, never a nested loop over all signature pairs. (The
        # plan DOES contain one BroadcastNestedLoopJoin: q_simhash16's
        # bounded 16-row bits crossJoin — a deliberate constant-size
        # broadcast, not a pair join.)
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
        # the band fan-out is a Generate (native explode), not a join
        assert "Generate explode" in plan
