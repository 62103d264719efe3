"""Webtext wave O (round 4): content-defined chunking dedup,
registrable-domain (eTLD+1) extraction, triangle counting — recomputed
in plain Python."""

import hashlib
import re
from collections import defaultdict
from itertools import combinations

from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
    _CDC_MOD,
    _PSL_SUFFIXES,
    q_cdc_chunk_dedup,
    q_etld1_registrable,
    q_host_triangle_count,
)


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cdc_chunks(text: str) -> list[str]:
    chunks, cur = [], []
    for tok in text.split(" "):
        cur.append(tok)
        if _h60_py(tok) % _CDC_MOD == 0:
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def _urls(spark, sf001_dir):
    from medical_vector_database_ocr_ner_spark.plans.queries import (
        _pages_for_sf,
    )

    return [r["url"] for r in
            _pages_for_sf(spark, sf001_dir).select("url").collect()]


class TestCdcChunkDedup:
    def test_matches_python_recount(self, spark, sf001_dir):
        docs = (
            spark.read.parquet(f"{sf001_dir}/documents.parquet")
            .select("lang", "text")
            .collect()
        )
        stats = defaultdict(lambda: [0, set(), 0])  # n, distinct, toks
        for d in docs:
            for c in _cdc_chunks(d["text"]):
                st = stats[d["lang"]]
                st[0] += 1
                st[1].add(hashlib.md5(c.encode()).hexdigest())
                st[2] += len(c.split(" "))
        rows = q_cdc_chunk_dedup(spark, sf001_dir).collect()
        assert len(rows) == len(stats)
        for r in rows:
            n, dis, toks = stats[r["lang"]]
            assert (
                r["n_chunks"], r["n_distinct"], r["dup_pct_x100"],
                r["avg_len_x10"],
            ) == (n, len(dis), (n - len(dis)) * 10000 // n,
                  toks * 10 // n), r["lang"]

    def test_shift_resistance_vs_fixed_chunks(self):
        # THE property CDC exists for: prepend one token and most CDC
        # chunks survive, while fixed 8-gram chunks all shift
        text = " ".join(f"tok{i % 37}word{i % 11}" for i in range(200))
        shifted = "inserted " + text
        cdc_a, cdc_b = set(_cdc_chunks(text)), set(_cdc_chunks(shifted))
        fixed = lambda t: {  # noqa: E731
            " ".join(t.split(" ")[i:i + 8])
            for i in range(0, len(t.split(" ")), 8)
        }
        fix_a, fix_b = fixed(text), fixed(shifted)
        cdc_kept = len(cdc_a & cdc_b) / len(cdc_a)
        fix_kept = len(fix_a & fix_b) / len(fix_a)
        assert cdc_kept > 0.8, cdc_kept
        assert fix_kept < 0.2, fix_kept


class TestEtld1Registrable:
    def _host(self, url):
        h = re.match(r"^https?://([^/]+)", url).group(1)
        m = re.search(r"([0-9]+)(\.pdf)?$", url)
        i = int(m.group(1)) if m else None
        if i is not None and i % 5 == 0:
            h = re.sub(r"\.example$", ".org.example", h)
        if i is not None and i % 3 == 0:
            h = "cdn." + h
        return h

    def _reg(self, host):
        suffixes = {s for s, _ in _PSL_SUFFIXES}
        ls = host.split(".")
        c2 = ".".join(ls[-2:]) if len(ls) >= 2 else None
        c1 = ls[-1]
        if c2 in suffixes:
            return ".".join(ls[-3:]) if len(ls) >= 3 else host
        if c1 in suffixes and len(ls) >= 2:
            return c2
        return host

    def test_matches_python_recount(self, spark, sf001_dir):
        urls = _urls(spark, sf001_dir)
        agg = defaultdict(lambda: [0, set()])
        for u in urls:
            h = self._host(u)
            st = agg[self._reg(h)]
            st[0] += 1
            st[1].add(h)
        rows = q_etld1_registrable(spark, sf001_dir).collect()
        got = {r["reg_domain"]: (r["n_urls"], r["n_hosts"]) for r in rows}
        assert got == {d: (n, len(hs)) for d, (n, hs) in agg.items()}

    def test_subdomain_groups_under_registrable(self, spark, sf001_dir):
        # cdn.hostN.example and hostN.example must land on the SAME
        # registrable domain; hostN.org.example groups under the
        # multi-label suffix as hostN.org.example itself
        rows = q_etld1_registrable(spark, sf001_dir).collect()
        domains = {r["reg_domain"] for r in rows}
        assert not any(d.startswith("cdn.") for d in domains)
        multi = [r for r in rows if r["reg_domain"].endswith(".org.example")]
        assert multi, "multi-label suffix case must exist"
        for r in multi:
            assert len(r["reg_domain"].split(".")) == 3


class TestHostTriangleCount:
    def test_matches_bruteforce(self, spark, sf001_dir):
        urls = _urls(spark, sf001_dir)
        edges = set()
        for url in urls:
            m_src = re.search(r"https?://([^/]+)/", url)
            m_i = re.search(r"([0-9]+)(\.pdf)?$", url)
            if not m_src or not m_i:
                continue
            s = m_src.group(1)
            i = int(m_i.group(1))
            for di in ((i * 7 + 1) % 50, i % 10):
                d = f"host{di}.example"
                if s != d:
                    edges.add((min(s, d), max(s, d)))
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        n_tri = sum(
            1
            for v in adj
            for x, y in combinations(sorted(adj[v]), 2)
            if v < x and (min(x, y), max(x, y)) in edges
        )
        rows = q_host_triangle_count(spark, sf001_dir).collect()
        assert len(rows) == 1
        assert rows[0]["n_triangles"] == n_tri
        assert n_tri > 0
