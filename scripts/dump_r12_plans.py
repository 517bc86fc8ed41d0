"""Dump .explain("formatted") for the r12-touched queries to plans/r12/.

    python scripts/dump_r12_plans.py <suffix> [query ...]

suffix is 'before' or 'after'; with no query list, dumps the default r12
set. Run from a worktree at the pre-change commit for the _before files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_PLANS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"),
)

DEFAULT = [
    # DECIMAL->BIGINT contract change (scores family)
    "docs_bm25_topk",
    "docs_bm25_facets",
    "docs_bm25_scores_full",
    "docs_hybrid_rrf",
    "docs_hybrid_serving",
    "docs_authority_boosted_search",
    "docs_ltr_rerank",
    "docs_unigram_tokens",
    "events_gap_fill_hourly",
    "q11_valuable_parts",
    # optimization targets
    "dedup_clusters",
    "docs_tokenizer_eval",
    "dsir_select_en",
    "docs_split_leakage_safe",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    from spark_ensemble_spark.queries import ALL_SPARK_QUERIES
    from spark_ensemble_spark.session import get_spark

    spark = get_spark("plan-dump", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        try:
            df = ALL_SPARK_QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # best-effort: a failed dump must not stop the rest
            plan = f"ERROR dumping {name}: {e}"
        out = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
