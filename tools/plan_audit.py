"""Plan audit: explain EVERY registered query and flag scale anti-patterns.

The correctness gate proves the numbers match; this proves the PLANS
are the ones you'd want at 100 TB. For each entry in
``__spark_entry__.queries()`` the tool builds the DataFrame against
$SPARK_GRAFT_SF_DIR (analysis only — nothing executes) and inspects
the optimized/physical plan for:

- CartesianProduct / BroadcastNestedLoopJoin on non-trivial inputs
  (all-pairs blowups that kill any cluster);
- BatchEvalPython / PythonUDF in the row path (the slow path; only
  ArrowEvalPython / mapInPandas stages are acceptable, and only where
  COVERAGE.md declares them);
- scans that read every column (no ReadSchema pruning) while the
  query projects few;
- Exchange counts (a 12-exchange plan deserves a written reason).

Output: one line per query + a summary, written to PLAN_AUDIT.md.
Findings are ADVISORY except the hard failures (cartesian on
corpus-sized inputs, row-wise PythonUDF), which exit non-zero so the
audit can gate commits.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Stages allowed to use Arrow-batched Python (declared pandas paths).
ARROW_OK = {
    "similarity_cosine_topk_blas",
    "dedup_semantic",
    "multimodal_frame_sample",
    "multimodal_decode_png",
    "multimodal_decode_jpeg",
    "multimodal_binary_meta",
    "multimodal_resize",
    "multimodal_decode_wav",
    "pipeline_pack_sequences",
    "similarity_cosine_topk",   # BLAS batch kernel (operators/similarity.py:cosine_topk_blas)
    "dedup_embedding_near",     # blocked BLAS pair kernel
    "pipeline_decontam_semantic",  # gemm-vs-eval-matrix batch kernel
    "multimodal_image_neardup",    # real PNG decode + aHash batch stage
    "multimodal_audio_neardup",    # real WAV decode + envelope fingerprint
    "multimodal_video_frames",     # AVI demux + per-frame pixel decode
    "multimodal_jpeg_luma_stats",  # real JPEG encode + entropy decode stages
    # measurement query: its brute-force-TRUTH arm (the yardstick the
    # IVF path is scored against) is a deliberate BLAS batch kernel —
    # the production path it measures is the pruned IVF probe
    "similarity_ivf_quality",
    "similarity_pq_topk",      # PQ encode: per-batch subspace gemm + argmin
    "similarity_pq_quality",   # same encode stage inside the measurement tool
    "similarity_ivfpq_topk",   # IVF-PQ encode: coarse assign + residual PQ
    "similarity_ivfpq_frozen_topk",  # same encode stage, frozen index (r9)
    "similarity_ivfpq_quality",  # same encode stage inside the measurement tool
    # greedy budget admission is inherently serial per shard (one
    # spent-counter state machine); the batch path folds each shard's
    # rows in one pandas group — shard_col parallelizes, and the
    # streaming form is the production shape
    "pipeline_budget_admission",
}

# Queries whose small side is literal/driver-bounded, where a
# broadcast nested-loop join is the PLANNED shape (bounded side is
# a centroid list / spine / quantile thresholds — constant-size).
BNLJ_OK_PATTERNS = (
    "similarity_",       # centroid/query literals
    "sketch_quantile",   # 1024-bin thresholds
    "events_gapfill",    # bounded hourly spine
    "sample_cluster",    # centroid literals
    # one-row aggregate broadcasts (a scalar total/threshold crossed
    # onto the corpus — bounded by construction):
    "q11_important_stock",      # value-fraction threshold scalar
    "q22_acctbal_opportunity",  # avg acctbal scalar
    "sample_dsir_weights",      # corpus-total scalars
    "sample_mix_to_target",     # binding-stratum scale scalar
    "text_bigram_logprob",      # V (distinct successor count) scalar
    "text_unigram_logprob",     # corpus token total scalar
    "text_tfidf_topk",          # N (doc count) scalar
    "join_range_bucket",        # bounded bucket-spine side
    "layout_zorder_keys",       # min/max bounds scalar
    "sample_mix_temperature",   # share-total + binding-scale scalars
    "sample_ccnet_buckets",     # bigram V scalar (same as bigram_logprob)
    # bounded-broadcast BNLJs adjudicated in the round-4 verdict:
    "text_bm25_topk",        # query-term set broadcast (posting-list prune)
    "text_passage_bm25",     # same query-term broadcast, passage granularity
    "text_bm25_incremental", # frozen index snapshot (query-term-sized) broadcast
    "events_funnel",         # three 1-row stage aggregates crossJoined
    "events_cohort_retention",  # 1-row cohort-anchor aggregate crossed on
    "audit_key_skew",        # 1-row total/key-count aggregate crossed on
)


# Queries whose exchange COUNT scales with the number of independent
# one-row branches in a union, not with data volume: each branch is a
# map-side-combinable agg (+ bounded join) folding to a SINGLE row, so
# branches never share a shuffle boundary and the union output is
# edge/table-count rows total.  High exchange count here is the
# catalog's width, not a data-path smell.
EXCHANGES_OK = {
    "audit_fk_orphans": "7 FK edges x (key agg + dim join + 1-row fold)",
    "audit_table_checksums": "10 tables x (1-row checksum agg)",
}


def formatted(df) -> str:
    je = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return je.explainString(mode)


def audit_one(name: str, plan: str) -> tuple[list[str], list[str]]:
    """Returns (hard_failures, advisories)."""
    hard, soft = [], []
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    if "CartesianProduct" in plan:
        hard.append("CartesianProduct in physical plan")
    if "BroadcastNestedLoopJoin" in plan and not any(
        name.startswith(p) for p in BNLJ_OK_PATTERNS
    ):
        soft.append("BroadcastNestedLoopJoin (verify the broadcast side is bounded)")
    if re.search(r"\(\d+\) BatchEvalPython", plan):
        hard.append("row-wise PythonUDF (BatchEvalPython) in the plan")
    if "ArrowEvalPython" in plan and name not in ARROW_OK:
        soft.append("ArrowEvalPython outside the declared pandas paths")
    if ("FlatMapGroupsInPandas" in plan or "MapInPandas" in plan) and name not in ARROW_OK:
        soft.append("pandas stage outside the declared pandas paths")
    if n_ex > 12:
        if name in EXCHANGES_OK:
            soft.append(f"{n_ex} Exchanges (documented: {EXCHANGES_OK[name]})")
        else:
            soft.append(f"{n_ex} Exchanges (document why)")
    return hard, soft


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    import __spark_entry__ as entry
    from pgloader_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows, failures = [], []
    for name, fn in entry.queries().items():
        try:
            plan = formatted(fn(spark, sf_dir))
        except Exception as e:  # a query that cannot even analyze is a failure
            failures.append(f"{name}: ANALYSIS ERROR {e}")
            rows.append((name, -1, ["analysis error"], []))
            continue
        hard, soft = audit_one(name, plan)
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        rows.append((name, n_ex, hard, soft))
        failures.extend(f"{name}: {h}" for h in hard)

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "PLAN_AUDIT.md"), "w") as f:
        f.write("# PLAN_AUDIT — physical-plan scale audit\n\n")
        f.write(f"Generated by `tools/plan_audit.py` at {sf_dir} "
                "(analysis only; plan shapes are data-size-independent "
                "except AQE runtime conversions).\n\n")
        f.write(f"{len(rows)} queries audited; "
                f"{len(failures)} hard failures.\n\n")
        f.write("| query | exchanges | flags |\n|---|---|---|\n")
        for name, n_ex, hard, soft in sorted(rows):
            flags = "; ".join(["**" + h + "**" for h in hard] + soft) or "clean"
            f.write(f"| {name} | {n_ex if n_ex >= 0 else '—'} | {flags} |\n")
        if failures:
            f.write("\n## Hard failures\n\n")
            for x in failures:
                f.write(f"- {x}\n")
    print(f"{len(rows)} audited, {len(failures)} hard failures -> PLAN_AUDIT.md")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
