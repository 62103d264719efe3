"""Webtext wave U (round 4, capstone): the curation funnel —
recomputed in plain Python."""

import hashlib
from collections import defaultdict

from medical_vector_database_ocr_ner_spark.plans.queries import STOPS
from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
    q_curation_funnel,
)


def _expected(docs):
    stops = set(STOPS)
    staged = []
    for d in docs:
        toks = d["text"].split(" ")
        n_stops = sum(1 for t in toks if t in stops)
        pass_len = 50 <= d["n_chars"] <= 100_000
        pass_q = pass_len and n_stops * 100 >= len(toks) * 2
        ck = hashlib.md5(d["text"].lower().encode()).hexdigest()
        staged.append((d["doc_id"], d["lang"], ck, pass_len, pass_q))
    keepers = {}
    for doc_id, _, ck, _, pass_q in staged:
        if pass_q and (ck not in keepers or doc_id < keepers[ck]):
            keepers[ck] = doc_id
    funnel = defaultdict(lambda: [0, 0, 0, 0])
    for doc_id, lang, ck, pass_len, pass_q in staged:
        st = funnel[lang]
        st[0] += 1
        st[1] += pass_len
        st[2] += pass_q
        st[3] += pass_q and keepers.get(ck) == doc_id
    return funnel


class TestCurationFunnel:
    def test_matches_python_recount(self, spark, sf001_dir):
        docs = (
            spark.read.parquet(f"{sf001_dir}/documents.parquet")
            .select("doc_id", "lang", "text", "n_chars")
            .collect()
        )
        expected = _expected(docs)
        rows = q_curation_funnel(spark, sf001_dir).collect()
        got = {
            r["lang"]: [r["n_total"], r["n_after_length"],
                        r["n_after_quality"], r["n_after_dedup"]]
            for r in rows
        }
        assert got == dict(expected)

    def test_funnel_is_monotone_and_gates_bite(self, spark, sf001_dir):
        docs = (
            spark.read.parquet(f"{sf001_dir}/documents.parquet")
            .select("doc_id", "lang", "text", "n_chars")
            .collect()
        )
        rows = q_curation_funnel(spark, sf001_dir).collect()
        total = [0, 0, 0, 0]
        for r in rows:
            seq = (r["n_total"], r["n_after_length"],
                   r["n_after_quality"], r["n_after_dedup"])
            # cumulative gates: monotonically non-increasing
            assert seq[0] >= seq[1] >= seq[2] >= seq[3], r["lang"]
            for i, v in enumerate(seq):
                total[i] += v
        # the earlier gates must remove something on this fixture
        assert total[0] > total[2]
        assert total[3] > 0
        # dedup bite is DATA-DRIVEN: it must remove exactly the number
        # of non-keeper exact-dup copies among quality survivors (at
        # sf0.001 that is 0 — only NEAR-dups exist here; the exact-dup
        # clusters live at larger sfs, where the oracle gate covers it)
        expected = _expected(docs)
        assert total[2] - total[3] == sum(
            s[2] - s[3] for s in expected.values()
        )
