"""Webtext wave K (round 4): SCD2 url history, source-level minhash
mirror detection, BFS crawl-depth labeling — recomputed in plain
Python."""

import hashlib
import re
from collections import defaultdict
from datetime import timedelta

from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
    _BFS_ITERS,
    _BFS_SEEDS,
    _MH_BANDS,
    _MH_SEEDS,
    q_crawl_depth_bfs,
    q_scd2_url_history,
    q_source_mirror_detect,
)


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _pages(spark, sf001_dir, cols):
    from medical_vector_database_ocr_ner_spark.plans.queries import (
        _pages_for_sf,
    )

    return _pages_for_sf(spark, sf001_dir).select(*cols).collect()


class TestScd2UrlHistory:
    def _expected(self, rows):
        snaps = defaultdict(list)
        for r in rows:
            ck = hashlib.md5(
                r["html"].hex().upper().encode()
            ).hexdigest()
            snaps[r["url"]].append((r["warc_ts"], ck))
            m = re.search(r"([0-9]+)$", r["url"])
            if m and int(m.group(1)) % 3 == 0:
                changed = f"changed#{r['url']}"
                snaps[r["url"]].append(
                    (r["warc_ts"] + timedelta(hours=1), changed)
                )
                snaps[r["url"]].append(
                    (r["warc_ts"] + timedelta(hours=2), changed)
                )
        expected = {}
        for url, caps in snaps.items():
            caps.sort()
            kept = [
                (ts, ck)
                for i, (ts, ck) in enumerate(caps)
                if i == 0 or ck != caps[i - 1][1]
            ]
            for v, (ts, _) in enumerate(kept, 1):
                valid_to = kept[v][0] if v < len(kept) else None
                expected[(url, v)] = (ts, valid_to, valid_to is None)
        return expected

    def test_matches_python_recount(self, spark, sf001_dir):
        rows = _pages(spark, sf001_dir, ["url", "warc_ts", "html"])
        expected = self._expected(rows)
        got = q_scd2_url_history(spark, sf001_dir).collect()
        assert len(got) == len(expected)
        for r in got:
            vf, vt, cur = expected[(r["url"], r["version"])]
            assert (r["valid_from"], r["valid_to"], r["is_current"]) == (
                vf, vt, cur
            ), (r["url"], r["version"])

    def test_unchanged_recrawl_extends_no_version(self, spark, sf001_dir):
        # every-3rd urls got 3 captures but the +2h one repeats the +1h
        # content: exactly 2 versions, the second one current
        by_url = defaultdict(list)
        for r in q_scd2_url_history(spark, sf001_dir).collect():
            by_url[r["url"]].append(r)
        for url, vers in by_url.items():
            m = re.search(r"([0-9]+)$", url)
            multi = bool(m) and int(m.group(1)) % 3 == 0
            assert len(vers) == (2 if multi else 1), url
            cur = [v for v in vers if v["is_current"]]
            assert len(cur) == 1
            if multi:
                v1 = next(v for v in vers if v["version"] == 1)
                assert v1["valid_to"] == cur[0]["valid_from"]


class TestSourceMirrorDetect:
    def test_matches_python_recount(self, spark, sf001_dir):
        docs = (
            spark.read.parquet(f"{sf001_dir}/documents.parquet")
            .select("source", "text")
            .collect()
        )
        toks = defaultdict(set)
        for d in docs:
            ws = d["text"].split(" ")
            toks[d["source"]].update(
                f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)
            )
        sigs = {
            src: [
                min(_h60_py(f"mh{s}#{t}") for t in ts)
                for s in range(_MH_SEEDS)
            ]
            for src, ts in toks.items()
        }
        buckets = defaultdict(set)
        for src, sig in sigs.items():
            for b in range(_MH_BANDS):
                buckets[(b, sig[2 * b], sig[2 * b + 1])].add(src)
        expected = {}
        band_hits = defaultdict(set)
        for (b, *_), members in buckets.items():
            ms = sorted(members)
            for i, x in enumerate(ms):
                for y in ms[i + 1:]:
                    band_hits[(x, y)].add(b)
        for (x, y), bs in band_hits.items():
            n_sigs = sum(
                1 for s in range(_MH_SEEDS) if sigs[x][s] == sigs[y][s]
            )
            expected[(x, y)] = (len(bs), n_sigs)
        rows = q_source_mirror_detect(spark, sf001_dir).collect()
        got = {
            (r["src_a"], r["src_b"]): (r["n_bands"], r["n_sigs"])
            for r in rows
        }
        assert len(rows) == len(got), "duplicate pairs emitted"
        assert got == expected

    def test_band_match_implies_two_seed_matches(self, spark, sf001_dir):
        rows = q_source_mirror_detect(spark, sf001_dir).collect()
        for r in rows:
            assert r["n_sigs"] >= 2 * r["n_bands"] >= 2
        # bigram shingles must discriminate: not every source pair is a
        # candidate, and candidates are not all full-signature matches
        # (unigram features collide on all 190 pairs — the regression
        # this test pins)
        n_sources = 20
        assert 0 < len(rows) < n_sources * (n_sources - 1) // 2
        assert any(r["n_sigs"] < 8 for r in rows)


class TestCrawlDepthBfs:
    def test_matches_python_recount(self, spark, sf001_dir):
        urls = [r["url"] for r in _pages(spark, sf001_dir, ["url"])]
        edges = set()
        for url in urls:
            m_src = re.search(r"https?://([^/]+)/", url)
            m_i = re.search(r"([0-9]+)(\.pdf)?$", url)
            if not m_src or not m_i:
                continue
            src = m_src.group(1)
            i = int(m_i.group(1))
            for dst_i in ((i * 7 + 1) % 50, i % 10):
                dst = f"host{dst_i}.example"
                if src != dst:
                    edges.add((src, dst))
        nodes = {s for s, _ in edges} | {d for _, d in edges}
        dist = {h: 0 for h in _BFS_SEEDS if h in nodes}
        for _ in range(_BFS_ITERS):
            nxt = dict(dist)
            for s, d in edges:
                if s in dist and dist[s] + 1 < nxt.get(d, 1 << 60):
                    nxt[d] = dist[s] + 1
            dist = nxt
        rows = q_crawl_depth_bfs(spark, sf001_dir).collect()
        got = {r["host"]: r["dist"] for r in rows}
        assert got == dist
        for h in _BFS_SEEDS:
            if h in got:
                assert got[h] == 0
        assert all(0 <= d <= _BFS_ITERS for d in got.values())


class TestWaveKPlanShapes:
    """Pin the physical-plan properties PLANS.md claims for wave K."""

    @staticmethod
    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_scd2_two_windows_share_one_exchange(self, spark, sf001_dir):
        plan = self._plan(q_scd2_url_history(spark, sf001_dir))
        assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
        assert plan.count("Window") == 2

    def test_mirror_detect_no_allpairs(self, spark, sf001_dir):
        plan = self._plan(q_source_mirror_detect(spark, sf001_dir))
        assert "CartesianProduct" not in plan
        assert "NestedLoop" not in plan
