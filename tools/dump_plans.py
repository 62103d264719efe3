"""Regenerate PLANS.md: formatted physical plans of the load-bearing
queries, so the plan shapes argued in SCALE.md are inspectable artifacts
rather than claims.

Usage: python tools/dump_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"

# (query name, what to look for in the plan)
SELECTED = [
    ("pages_extraction",
     "ONE FileScan; native reject predicates in the Project BELOW the "
     "salted Exchange BELOW MapInPandas — cheap codegen work runs before "
     "bytes move or reach Python."),
    ("semantic_search",
     "Exactly one MapInPandas (single extraction pass), one ArrowEvalPython "
     "(embed after dropDuplicates), TakeOrderedAndProject top-k."),
    ("knn_hydrated",
     "JVM-side dot product, TakeOrderedAndProject, broadcast hydration "
     "join."),
    ("asof_last_error",
     "Union-sentinel as-of: a single Exchange hashpartitioning(user_id) "
     "feeding a running window — no inequality join, no nested loop."),
    ("revenue_by_nation",
     "Every dimension joined via BroadcastHashJoin; the only exchanges are "
     "the fact-side join (at scale) and the final aggregation."),
    ("pricing_summary",
     "Partial+final HashAggregate with the shipdate filter pushed into the "
     "parquet scan (PushedFilters)."),
    ("dup_clusters",
     "Star-contraction edges via two window passes (no pair self-join); "
     "iterative CC joins operate on localCheckpoint'd tiny frames."),
    ("ann_batch_topk",
     "BroadcastNestedLoopJoin of the tiny query batch against the "
     "embeddings scan (a deliberate broadcast cross join), then TWO window "
     "ranks: the first keyed (query_id, _pid) — per-input-partition "
     "pre-top-k, so no reducer ever holds a query's full corpus scores — "
     "the second the final per-query rank over n_partitions × k rows."),
    ("ivf_topk",
     "IVF centroid assignment as a BroadcastNestedLoopJoin against a "
     "1-row centroid relation (codebook as broadcast DATA — plan size "
     "stays O(1) at any n_centroids × dim), argmax via transform + "
     "array_max; probe filter on centroid_id prunes the candidate set "
     "(parquet partition pruning once materialize() lays the index out "
     "by centroid)."),
    ("event_funnel",
     "Three stage aggregations all exchanged on user_id with partial "
     "aggregation map-side; event_type filters pushed into each scan "
     "(PushedFilters) — no windows, no per-user state lists."),
    ("hll_portable",
     "Deterministic HLL: explode → distinct → two HashAggregates "
     "(register max, then integer register-sum) — the sketch merges "
     "map-side, the shuffle carries ≤256 rows per group at any corpus "
     "size; zero Python anywhere."),
    ("props_redacted",
     "Flat-JSON redaction as pure expressions: from_json map + "
     "explode + native EXISTS over the sensitive-substring array — "
     "a generate/project-only plan, no shuffle at all."),
    ("page_triage_native",
     "The HTML triage tier: one FileScan of the raw pages, the byte-prefix "
     "kind filter and every feature (replace-arithmetic substring counts, "
     "tag-strip length) inside a single WholeStageCodegen project — zero "
     "Exchange, zero Python; at 10^12 rows this tier is scan-bound."),
    ("token_shard_packing",
     "Bucketed prefix sum: ONE Exchange hashpartitioning(bucket) feeding "
     "a bounded window (cumsum within each of 32 hash buckets — never a "
     "single-partition global window), then the shard aggregation reuses "
     "the same partitioning. Bucket count scales with the cluster."),
    ("boilerplate_line_strip",
     "Cross-doc frequent-line removal: the (line, doc) explode shuffles "
     "once for the distinct-doc frequency; the frequent-line set (tiny by "
     "definition) returns via BroadcastHashJoin; per-doc reassembly is "
     "one keyed aggregation with position-ordered array_sort — no "
     "all-pairs join anywhere."),
    ("domain_blocklist_filter",
     "Blocklist gate as BroadcastHashJoin LeftAnti — the fact table never "
     "shuffles for the filter; the per-host count is the only Exchange."),
    ("quality_linear_score",
     "Model inference with ZERO added topology: the whole fasttext-style "
     "scorer (60-bit md5 feature hash % 4096 → integer weight → `aggregate` "
     "fold over split(text)) lives inside one WholeStageCodegen Project "
     "directly over the FileScan; the only Exchange in the query is the "
     "10-row (lang, keep) summary agg. ReadSchema is struct<text,lang> — "
     "nothing else leaves the scan. At 10^12 docs, scoring is free: the "
     "corpus pass costs the same with or without the model."),
    ("domain_cap_sample",
     "Two-stage salted rank (the ann_batch_topk shape applied to "
     "per-domain caps): stage-1 Window partitions on (host, salt-of-url) — "
     "a hot host's rows split over 16 bounded partitions — stage-2 Window "
     "ranks only the ≤16·K survivors per host. The per-host totals agg is "
     "map-side combinable (partial HashAggregate before its Exchange) and "
     "joins back by broadcast. Both FileScans read url only."),
    ("bloom_url_seen",
     "The bit set (≤16384 rows regardless of corpus size) is built with "
     "one distinct agg and BROADCAST to the probe side: the frontier "
     "membership check is a map-side left join on the probe scan — no "
     "shuffle of probe traffic, ever. The per-url hit count is one keyed "
     "agg; the final summaries are 1-row aggregates."),
    ("pagerank_hosts",
     "Page-scale data is touched exactly ONCE (the link→edge "
     "aggregation); all three rank iterations operate on the persisted "
     "host graph — InMemoryTableScans of edges/nodes, never the pages "
     "scan. Join strategy is deliberately left to AQE: at fixture scale "
     "(50 hosts) every outw/rank/contrib join converts to runtime "
     "broadcast; at the real web's ~10^8 hosts the identical plan "
     "degrades to shuffled joins co-partitioned on the host key — the "
     "fixture's scale is not baked into the plan. Integer-scaled rank "
     "mass keeps all three iterations hash-exact against the DuckDB "
     "mirror."),
    ("sentence_dedup_global",
     "Global sentence dedup: map-side-combinable stats agg, then the "
     "hot/cold split join-back — the everywhere-footer key returns via "
     "BroadcastHashJoin (map-side, no reducer ever holds its occurrence "
     "set) while the bounded cold tail takes the SortMergeJoin. AQE "
     "cannot skew-split the naive agg-fed join (measured), hence the "
     "explicit split; per-url rebuild is a keyed agg with array_sort."),
    ("anchor_link_stats",
     "Template-link discovery: two-stage salted HashAggregate on the "
     "(host, href) hot keys (partial on (host, href, url-hash salt)); the "
     "per-host page-count side joins back via BroadcastHashJoin."),
    ("surt_prefix_scan",
     "SURT index scan: RangePartitioning + per-partition sort on surt_key "
     "(the layout that gives parquet min/max pruning once written), the "
     "prefix predicate evaluated in the scan project — a lookup touches "
     "only the key-range slice at any corpus size."),
    ("recrawl_priority",
     "Frontier priority: the churn agg is the only fact Exchange; the "
     "host-authority side is a BroadcastHashJoin; final ranking is "
     "TakeOrderedAndProject (per-partition top-100 + 100-row merge), "
     "never a global sort."),
    ("dom_blocks_native",
     "Native Boilerpipe: sentinel-split, per-segment text/link densities, "
     "and the keep rule all inside one WholeStageCodegen span over the "
     "FileScan; the ONLY Exchange is the per-url reassembly agg. No "
     "Python, no joins — block classification at scan speed."),
    ("span3_dedup_stats",
     "C4 span-3 dedup: spans built by transform/slice over the collected "
     "sentence array (codegen, no extra explode-join); first occurrence "
     "via the same hot/cold split as sentence dedup — broadcast hot "
     "spans, skew-free cold SortMergeJoin."),
    ("outlink_frontier",
     "Exact frontier: explode→distinct shuffles once on out_url (uniform "
     "hash even under host skew), then the LeftAnti join against the "
     "crawled scan reuses the same url partitioning; per-host rollup is "
     "a tiny agg."),
    ("crawl_diff",
     "Snapshot merge: ONE full-outer SortMergeJoin co-partitioned on url "
     "— both 10^12-row crawls shuffle exactly once on the join key; "
     "status classification is a codegen CASE in the join project; the "
     "(host, status) rollup is the only other Exchange."),
    ("intra_doc_repetition",
     "Entire per-doc shingle+distinct computation in ONE codegen span over "
     "the scan (transform/array_distinct — no explode, no join); the only "
     "Exchange is the tiny per-language summary agg."),
    ("cms_heavy_hitters",
     "Sketch build is a map-side-combinable groupBy whose output is ≤ d×w "
     "rows at any corpus size, then BroadcastExchange of the sketch onto "
     "the 20-row probe side; the exact top-20 (verification harness) is "
     "the only full token shuffle."),
    ("image_ocr_native",
     "Magic-byte startswith filter at the scan, substring decode + word "
     "stats in codegen, one tiny per-host agg — the image corpus never "
     "reaches Python."),
    ("robots_compliance",
     "Rules-driven gate: the per-host Disallow table reaches the crawl "
     "via BroadcastHashJoin; the prefix check is a native exists over "
     "the rule array inside the join project — the crawl side never "
     "shuffles for the audit, only the per-host rollup exchanges."),
    ("interval_overlap_join",
     "Range join WITHOUT BroadcastNestedLoopJoin: both sides bucketed to "
     "the window width, equi-join on (user_id, bucket) — the error side "
     "explodes 2×, the event side never duplicates, the exact range "
     "predicate is a post-join Filter."),
    ("tfidf_distinctive_terms",
     "Two map-side-combinable HashAggregates over the exploded tokens "
     "(TF and DF partial-agg before their Exchanges); everything after "
     "is vocabulary-sized — the per-language window ranks the agg "
     "output, never the corpus."),
    ("unigram_lm_doc_score",
     "One token-keyed agg builds the vocabulary-sized frequency/cost "
     "table; its join back onto the token stream broadcasts at fixture "
     "scale (AQE decides — at web scale it degrades to a shuffled hash "
     "join co-partitioned on tok); one doc-keyed agg sums costs."),
    ("weighted_sample",
     "Two-stage rank: Window over (lang, salt16) cuts each language "
     "into 16 shards before the per-language Window sees ≤16×20 "
     "survivors — no 5-hot-key sort of the corpus."),
    ("hits_hosts",
     "Page-scale data touched exactly once (edge aggregation, persisted); "
     "every HITS half-iteration joins and aggregates only the O(hosts) "
     "graph; rescale totals are one-row broadcast crossJoins."),
    ("simhash_band_pairs",
     "Banded LSH over simhash: signature agg, ×4 band Generate (bounded, "
     "of the SIGNATURE relation not the corpus), bucket self-join on "
     "(band, bval) — candidates never meet outside buckets — then the "
     "exact Hamming check as a codegen bit_count(xor) filter."),
    ("length_quantile_sketch",
     "Histogram build is one map-side-combinable HashAggregate (≤64 "
     "buckets/lang at any corpus size); the cumulative window and "
     "quantile read-out run on the HISTOGRAM relation — the corpus is "
     "touched exactly once, and the sketch rows merge like HLL/CMS."),
    ("dsir_importance_weights",
     "The 8192-row weight table builds with ONE conditional agg "
     "(src+tgt counts in the same HashAggregate) and returns as a "
     "BroadcastExchange onto the bigram stream; per-doc scoring is a "
     "keyed partial agg; the global top-20 is TakeOrderedAndProject — "
     "no corpus-wide window, no single-reducer sort."),
    ("rendezvous_shard_assign",
     "ReadSchema is struct<url> only; the 8 HRW hashes, greatest(), and "
     "first-match CASE all sit in WholeStageCodegen Projects over the "
     "scan — no explode, no join; the two Exchanges carry (shard, host) "
     "partial-distinct groups then 8 final groups — group-level rows, "
     "never url-level."),
    ("pmi_bigrams",
     "Bigrams via native transform() over the token array (no "
     "posexplode self-join); unigram/bigram counts are partial-agg'd "
     "map-side before their Exchanges; every downstream join is "
     "vocabulary-sized (AQE broadcasts at fixture scale, degrades to "
     "co-partitioned hash joins at web scale); the per-lang window "
     "ranks the collocation table, not the corpus."),
    ("crawl_budget_allocation",
     "Corpus touched once (host rollup Exchange); base/remainder are "
     "codegen over the host relation with the 1-row total broadcast; "
     "the extras rank is two-stage — Window over (salt16) shards then a "
     "global Window over ≤16·leftover survivors (leftover < B, a "
     "constant) — never a single-reducer pass over all hosts."),
    ("scd2_url_history",
     "Both windows partition on url — millions of tiny partitions, one "
     "Exchange on url serves BOTH (lag-filter and version/lead "
     "assignment reuse the same partitioning); the consecutive-dup "
     "collapse Filter runs between them, so interval assignment only "
     "touches survivors."),
    ("source_mirror_detect",
     "The 8-seed signature is ONE map-side-combinable HashAggregate "
     "(8 min() columns over the shingle stream — min of a union is the "
     "min of mins, so partials merge anywhere); banding explodes the "
     "GROUP-level signature relation ×4; candidate pairs meet only in "
     "the (band, bkey) bucket join."),
    ("crawl_depth_bfs",
     "Pages scanned exactly once (edge aggregation, localCheckpointed); "
     "each of the 3 BFS relaxations is one join + one min-agg over the "
     "O(hosts) graph — InMemoryTableScans, plan and lineage independent "
     "of the iteration count."),
    ("grouping_sets_panel",
     "All four groupings through ONE Expand feeding a partial+final "
     "HashAggregate — one corpus scan, one Exchange, where four GROUP "
     "BYs would pay 4× each."),
    ("partition_checksums",
     "partial_bit_xor per input partition, one Exchange carrying ≤64 "
     "bucket rows at any corpus size — the whole-table fingerprint "
     "merges map-side like a sketch."),
    ("pit_snapshot_lookup",
     "The PIT read adds NOTHING on top of the history build: a Filter "
     "above the SCD2 windows — disjoint half-open intervals make the "
     "≤1-row-per-url guarantee free, no extra window, no join."),
    ("epoch_shuffle_assign",
     "The 512-row (shard, salt) offset table is a broadcast; the rank "
     "Window partitions on (shard, salt) so every reducer orders "
     "1/512th of the corpus — a reproducible global permutation with "
     "no global sort anywhere."),
    ("session_window_stats",
     "The built-in session window: one Exchange on user_id, the "
     "data-driven merge inside the engine's window operator (state "
     "RocksDB-able on a stream); integer-exact value sums keep the "
     "plan hash-comparable across engines."),
    ("cdc_chunk_dedup",
     "Content-defined chunking: posexplode → per-doc cumsum Window "
     "(per-doc partitions, tiny at any scale) → sort_array/collect_list "
     "chunk rebuild → md5 → one distinct-agg per language; summary "
     "output is languages-sized."),
    ("etld1_registrable",
     "Longest-match public-suffix: TWO BroadcastHashJoins (last-1 and "
     "last-2 label candidates) against the constant-size suffix table; "
     "label slicing is per-row codegen — no explode of the label list, "
     "the corpus shuffles only for the registrable-domain rollup."),
    ("host_triangle_count",
     "Degree-ordered orientation before the wedge join: fan-out per "
     "vertex bounded by oriented out-degree O(√m); wedges close via a "
     "LeftSemi against the oriented edge set — three joins, all over "
     "the O(hosts) relation, pages touched once."),
    ("trimmed_mean_length",
     "Counts per (lang, n_chars) — bounded by DISTINCT lengths — then "
     "cumsum + interval arithmetic on that table; no per-language sort "
     "of documents exists anywhere in the plan."),
    ("morton_layout_keys",
     "The 32-term bit-interleave is ONE codegen Project over the scan "
     "(no UDF, no join); the only Exchange carries key-block counts. "
     "Write path: repartitionByRange(morton_key) — the SURT layout with "
     "the 2-d key swapped in."),
    ("ivf_recall_at_k",
     "Both searches end in TakeOrderedAndProject k-row relations; the "
     "eval join and count are free on top — recall measurement adds no "
     "corpus-scale topology to the searches it grades."),
    ("lang_id_confusion",
     "One doc-keyed conditional agg over the exploded token stream "
     "(partial map-side), then a classes²-row rollup — the confusion "
     "matrix costs one corpus pass regardless of class count."),
    ("unpivot_doc_stats",
     "Wide→long through ONE Expand over the aggregated wide relation — "
     "a single scan where the hand-written UNION ALL form re-scans per "
     "metric (Expand-not-Union pinned in tests)."),
    ("pages_gen_probe",
     "The scan is a BatchScanExec over the Python DataSource's 8 range "
     "partitions (parallel generation, no single-threaded driver "
     "collect); one partial+final HashAggregate pair above it."),
    ("ivf_nprobe_sweep",
     "Four sweep points share ONE cached assignment table; each point's "
     "scan carries the centroid-partition filter (nprobe/8 of the "
     "index), and every eval join is a k-row relation."),
    ("simhash_hot_bucket_split",
     "Two map-side-combinable HashAggregates above the signature agg — "
     "the candidate sets are COUNTED via sum C(occ,2), never "
     "materialized, so the mitigation report is linear in the corpus "
     "with no join topology at all."),
    ("error_context_outer",
     "Outer interval join plans as a hash EQUI-join on user_id with the time interval as a range predicate — no nested loop (BroadcastHashJoin LeftOuter at this fixture size; a shuffle join on user_id at scale, where AQE sizes the build side); on streams the same condition bounds the join state."),
    ("minhash_lsh_recall",
     "Truth via inverted-index self-join on the token key (never "
     "all-pairs); each banding config is one self-join on its banding "
     "key; the eval joins are candidate-set-sized."),
    ("host_mix_shift",
     "Two host-keyed HashAggregates, a full-outer host join, and a "
     "BroadcastNestedLoopJoin against the 1-row totals relation — NO "
     "unpartitioned window, so a web-scale host list never lands on "
     "one task."),
    ("curation_funnel",
     "Stage flags in one codegen pass + one token-keyed agg; the dedup "
     "keeper is a content-hash min-agg over quality survivors joined "
     "back by (ck, doc_id); the funnel rollup is languages-sized. The "
     "whole 'where did my corpus go?' report costs two corpus passes "
     "(doc scan + token agg) at any scale."),
]

HEADER = """# PLANS — physical-plan evidence for the headline queries

Regenerate with `python tools/dump_plans.py` (sf0.001 inputs; plan SHAPE
is scale-invariant, AQE adjusts only the numbers). Each section states
what the plan must show — the same properties are asserted in
tests/test_spark_parity.py and tests/test_operators_ext.py, so drift
fails CI before it reaches this file.
"""


def main() -> None:
    from medical_vector_database_ocr_ner_spark.plans.queries import QUERIES
    from medical_vector_database_ocr_ner_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)

    parts = [HEADER]
    for name, expectation in SELECTED:
        df = QUERIES[name].fn(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        # keep the operator tree + codegen spans; drop the verbose
        # per-node detail dump to keep the artifact reviewable
        tree = plan.split("\n\n")[0]
        parts.append(
            f"\n## {name}\n\n{expectation}\n\n```\n{tree}\n```\n"
        )

    with open("PLANS.md", "w") as f:
        f.write("".join(parts))
    print(f"PLANS.md written: {len(SELECTED)} plans")


if __name__ == "__main__":
    main()
