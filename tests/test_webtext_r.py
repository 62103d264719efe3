"""Webtext wave R (round 4): unpivot/melt and explode_outer null
preservation — recomputed in plain Python."""

from collections import defaultdict

from medical_vector_database_ocr_ner_spark.plans.queries_ext import (
    q_outer_explode_audit,
    q_unpivot_doc_stats,
)


def _docs(spark, sf001_dir):
    return (
        spark.read.parquet(f"{sf001_dir}/documents.parquet")
        .select("doc_id", "lang", "source", "text", "n_chars")
        .collect()
    )


class TestUnpivotDocStats:
    def test_matches_python_recount(self, spark, sf001_dir):
        docs = _docs(spark, sf001_dir)
        wide = defaultdict(lambda: [0, 0, 0, set()])
        for d in docs:
            st = wide[d["lang"]]
            st[0] += 1
            st[1] += d["n_chars"]
            st[2] = max(st[2], d["n_chars"])
            st[3].add(d["source"])
        expected = {}
        for lang, (n, s, mx, srcs) in wide.items():
            expected[(lang, "n_docs")] = n
            expected[(lang, "sum_chars")] = s
            expected[(lang, "max_chars")] = mx
            expected[(lang, "n_sources")] = len(srcs)
        rows = q_unpivot_doc_stats(spark, sf001_dir).collect()
        got = {(r["lang"], r["metric"]): r["value"] for r in rows}
        assert got == expected
        # melt shape: exactly |langs| x 4 rows, long format
        assert len(rows) == len(wide) * 4

    def test_unpivot_plan_is_expand_not_union(self, spark, sf001_dir):
        # the operator's point: one Expand over the wide relation, not
        # N unioned re-scans
        plan = (
            q_unpivot_doc_stats(spark, sf001_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Expand" in plan
        assert "Union" not in plan
        assert plan.count("Scan parquet") == 1


class TestOuterExplodeAudit:
    def test_conservation_and_empty_doc_visibility(self, spark, sf001_dir):
        docs = _docs(spark, sf001_dir)
        expected = defaultdict(lambda: [set(), 0, 0])
        for d in docs:
            st = expected[d["lang"]]
            st[0].add(d["doc_id"])
            if d["doc_id"] % 7 == 0:
                st[1] += 1  # emptied doc -> NULL token row
            else:
                st[2] += len(d["text"].split(" "))
        rows = q_outer_explode_audit(spark, sf001_dir).collect()
        got = {
            r["lang"]: (r["n_docs"], r["n_empty_docs"], r["n_tokens"])
            for r in rows
        }
        assert got == {
            lang: (len(ids), ne, nt)
            for lang, (ids, ne, nt) in expected.items()
        }
        # conservation: every source doc appears despite empty arrays —
        # the property a plain explode violates
        assert sum(n for n, _, _ in got.values()) == len(docs)
        assert sum(ne for _, ne, _ in got.values()) > 0
