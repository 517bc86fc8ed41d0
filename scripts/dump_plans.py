"""Regenerate PLANS.md: formatted physical plans of the headline queries,
annotated with the properties each plan is audited for (pushed filters,
pruned scans, join strategies, partial aggregation, no static fact-side
hints). Run after changing any headline query:

    python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# (query, what-to-check annotation)
AUDITED = [
    (
        "q1_pricing_summary",
        "scan reads only the 6 referenced columns (ReadSchema pruning); "
        "partial HashAggregate before the exchange (map-side combine).",
    ),
    (
        "q6_revenue_forecast",
        "shipdate/discount/quantity filters pushed to the parquet scan "
        "(PushedFilters) — a scan-dominant query reads only 4 columns.",
    ),
    (
        "q3_top_revenue_orders",
        "NO static broadcast hint on customer/orders (both fact-scale, "
        "~1/5-selective filter keeps customer SF-proportional) — AQE picks "
        "broadcast at test SF, sort-merge at 100 TB; mktsegment/orderdate "
        "filters pushed.",
    ),
    (
        "q5_nation_revenue",
        "broadcast hints ONLY on bounded dims (nation 25 rows, region 5); "
        "supplier/orders/customer joins left to AQE.",
    ),
    (
        "q17_small_quantity_revenue",
        "correlated scalar subquery DECORRELATED: per-part avg is a grouped "
        "aggregate joined back (no per-row rescan); brand filter pushed.",
    ),
    (
        "q18_large_orders",
        "IN-subquery as LEFT SEMI join of the grouped HAVING key set; "
        "the tiny qualifying set broadcasts under AQE.",
    ),
    (
        "events_asof_last_order",
        "as-of join = union + single window sort per key (one exchange on "
        "user_id); no per-key driver state, no nested-loop join.",
    ),
    (
        "dedup_minhash_pairs",
        "signature stage is explode + partial-aggregated grouped min()s "
        "(whole-stage codegen, shuffle carries ids × k longs only); banded "
        "self-join is an equi-join on (band, bucket) — never O(n²); the "
        "hot-bucket cap's count-join shuffles on the SAME (band, bucket) "
        "keys, so the capped side feeds the self-join without a new "
        "exchange (r5).",
    ),
    (
        "events_hourly_gapfilled",
        "left-outer scaffold join is a BroadcastHashJoin with BuildRight — "
        "the broadcast is on the aggregate (non-preserved) side, the only "
        "side a left join can hash-build (r5 ADVICE fix); fact table "
        "scanned once, grouped map-side before the join.",
    ),
    (
        "similarity_srp_topk",
        "bucketed equi-join on (table, bucket) — no cartesian; per-table "
        "sign chains computed ONCE as named columns (probe structs reference "
        "them instead of duplicating the fold 9×); per-query top-k window "
        "after candidate dedup.",
    ),
    (
        "embedding_dup_pairs_lsh",
        "multi-table SRP blocking: equi-join on (table, bucket), cross-table "
        "candidate dedup BEFORE the cosine verify — no cartesian, no "
        "single-table quadratic bucket cliff.",
    ),
    (
        "similarity_ivf_fixed",
        "fixed-centroid IVF: corpus assigned by argmin distance expression "
        "(no trained model), probes explode to nprobe cluster ids, candidate "
        "join is an equi-join on cluster.",
    ),
    (
        "weighted_median_price",
        "NO single-partition global window: range repartition on (v, w), "
        "per-partition weight sums → broadcast offsets, running weight is a "
        "window partitioned by range-partition id (parallel local sorts).",
    ),
    (
        "multimodal_decode",
        "ArrowEvalPython/mapInPandas seam directly over the pruned scan — "
        "no forced exchange before the Python worker; byte features are "
        "vectorized numpy inside the worker.",
    ),
    (
        "q7_nation_trade",
        "fact-fact joins left to AQE; both nation sides explicit broadcasts; "
        "DECIMAL revenue sum partial-aggregates before the 600-group "
        "exchange.",
    ),
    (
        "q10_returned_revenue",
        "returnflag filter pushed to the lineitem scan; top-20 cut ranked on "
        "the exact DECIMAL sum (TakeOrderedAndProject over the aggregate, "
        "never a global sort of the fact table).",
    ),
    (
        "q22_idle_customers",
        "scalar average is a 1-row aggregate broadcast-nested-loop joined "
        "(no driver collect); no-orders test is LEFT ANTI on custkey — one "
        "shuffle, no NOT-IN rescan.",
    ),
    (
        "user_activity_features",
        "all three window features (RANGE 24h frame, lag) share ONE exchange "
        "on user_id — a single sort serves count, sum, and lag.",
    ),
    (
        "strip_boilerplate",
        "distinct-per-doc explode before the count (plain count(*), map-side "
        "partials, no count-distinct double shuffle); boilerplate set joins "
        "LEFT ANTI on the line hash; corpus never self-joins.",
    ),
    (
        "contamination_overlap",
        "eval side distinct-reduced then BROADCAST (corpus side never "
        "shuffles for the join); shingle hash computed post-explode on the "
        "flat string column (whole-stage codegen, not interpreted HOF "
        "lambdas).",
    ),
    (
        "corpus_profile_by_source",
        "one scan, one shuffle of |strata| × sketch bytes: HLL partial "
        "sketches + percentile_approx partial sketches + decimal sums all "
        "merge map-side.",
    ),
    (
        "embedding_dim_stats",
        "posexplode drops every non-(dim,value) column BEFORE multiplying "
        "rows ×64; aggregation partial-reduces to 64 groups map-side.",
    ),
    (
        "range_join_attribution",
        "bucketized point-in-interval join: equi-join on (user_id, bucket) "
        "with exact containment filter — NO BroadcastNestedLoopJoin (the "
        "plan a bare inequality join degenerates to).",
    ),
    (
        "tfidf_top_terms",
        "corpus exploded ONCE: document frequency re-aggregates the grouped "
        "(id,term) frame, N is a broadcast 1-row aggregate, per-doc top-k is "
        "a window over the id shuffle — no second corpus scan, no self-join; "
        "since r11 the det_ln idf chain evaluates on the VOCAB-sized "
        "docfreq frame (CodegenFallback cost paid per distinct term, never "
        "per posting row).",
    ),
    (
        "docs_authority_boosted_search",
        "PageRank top-10 lowers to TakeOrderedAndProject (per-partition "
        "heap + k-row merge), NEVER a single-partition sort of the full "
        "node-rank frame; the rank-stamp window and rrf_fuse windows run "
        "on k-row / per-query frames (r11 fix, plan-pinned).",
    ),
    (
        "retrieval_tombstone_debt",
        "compaction-trigger observability: one posting-table scan + a "
        "broadcast anti-join against the tombstone id set; the report row "
        "is a single agg — no corpus shuffle, no window.",
    ),
    (
        "docs_phrase_search",
        "positional-postings phrase match: ONE corpus posexplode, the "
        "query-token side broadcasts (BroadcastHashJoin prunes the token "
        "stream to query vocabulary before any exchange), start-vote aggs "
        "run with map-side partials, and the per-query top-k rides "
        "WindowGroupLimit below the final exchange — no corpus self-join, "
        "no single-partition sort.",
    ),
    (
        "docs_repetition_signals",
        "ZERO exchanges: all three Gopher repetition signals are per-row "
        "sorted-array folds in one narrow projection — the filter block runs "
        "at scan speed.",
    ),
    (
        "dedup_chunks",
        "chunk-level dedup: explode → min-struct groupBy on the chunk key "
        "(map-side partial min — no window over a skewable key) → doc_id "
        "shuffle to reassemble; no corpus self-join, no nested loop.",
    ),
    (
        "dedup_incremental",
        "incremental dedup: md5-fingerprint LEFT ANTI join (corpus side "
        "distinct-reduced) then banded-MinHash new×corpus EQUI-join; "
        "never corpus×corpus, never a cross join.",
    ),
    (
        "similarity_pq_topk",
        "PQ/ADC: the 5-row query side (with precomputed LUTs) is BROADCAST; "
        "the encoded corpus is scored in place with O(M) lookups per row; "
        "the only hash exchange is the per-query top-k window.",
    ),
    (
        "temperature_mix_sample",
        "mix materialization: the keep decision is a scan-level narrow "
        "filter (md5 bucket vs collected K-row rates); the single exchange "
        "is the final per-source aggregate.",
    ),
    (
        "dedup_semantic",
        "SemDeDup: centroid assignment is a narrow per-row argmin (no "
        "exchange); pairs come from an EQUI-join on the cluster id; the "
        "drop set anti-joins by id — no cartesian, no nested loop.",
    ),
    (
        "dsir_select_en",
        "DSIR: one featurization explode serves both distributions "
        "(target_col path); the buckets-row log-ratio table and the two "
        "1-row totals are the ONLY broadcast sides; final Gumbel top-k is "
        "TakeOrderedAndProject, no global sort.",
    ),
    (
        "docs_bigram_logprob",
        "bigram LM: bigram/history/unigram tables re-aggregate ONE grouped "
        "frame (single text scan); scoring joins shuffle on token keys "
        "with no vocabulary broadcast assumption.",
    ),
    (
        "docs_split_assign",
        "hash split: pure narrow projection over the scan — zero "
        "exchanges, zero joins.",
    ),
    (
        "similarity_srp_recall",
        "ANN recall: both top-k inputs are k×|queries|-row frames; the "
        "intersection is a LEFT SEMI equi-join + one grouped count — "
        "corpus never re-enters the plan after the top-k stages.",
    ),
]

HEADER = """# PLANS — physical-plan audits of the headline queries

Auto-generated by `scripts/dump_plans.py` (re-run after changing a headline
query). For each query: the property the plan is AUDITED for, then the
formatted physical plan at sf0.01. The same properties are asserted
programmatically in `tests/test_plans_io.py` via `plans/explain.py`.
"""


def main() -> None:
    # Resolve from the module's functions (like bench.py): some audited
    # queries (q6, xxhash minhash) are folded out of the curated 50-entry
    # driver registry but remain first-class module functions.
    import spark_ensemble_spark.queries as qmod
    from spark_ensemble_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    sections = [HEADER]
    for name, note in AUDITED:
        df = getattr(qmod, name)(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        sections.append(f"## {name}\n\n**Audit:** {note}\n\n```\n{plan}\n```\n")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(sections))
    print(f"wrote {out} ({len(AUDITED)} plans)")


if __name__ == "__main__":
    main()
