"""Reproducible 10x scale-up experiment (see SCALE.md).

Replicates the sf0.1 fixtures N-fold with key offsets (stride 1e9 keeps
every FK relationship intact), then times a representative query slice
at both scales.

Usage: python tools/scale_test.py [replication_factor] [out_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 10**9
KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}
QUERY_SLICE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_regional_revenue",
    "q21_window_running",
    "q31_tumbling_window",
    "q32_sessionize",
    "q42_dedup_exact",
    "q50_minhash_neardup",
    "q56_brute_force_knn",
    "q51_simhash",
    "q101_cdc_snapshot",
    "q102_scd2_history",
    "q103_gapfill",
    "q107_market_share",
    "q108_product_profit",
    "q116_semantic_dedup",
    "q119_bm25_rank",
    "q122_source_caps",
    "q125_bigram_fluency",
    "q126_event_paths",
    "q129_pagerank",
    "q134_incremental_join",
    "q148_time_range_frame",
    "q151_rag_prep",
    "q152_char_entropy",
    # r4 additions: runtime-filter join, layout write, cross-doc dup, diff
    "q154_bloom_pruned_join",
    "q155_clustered_layout_roundtrip",
    "q156_crossdoc_ngram_dup",
    "q158_dataset_diff",
    # r4 second wave: two-phase ids, int8 quantize, triangles, grid join,
    # CMS sketch, training shuffle, PMI
    "q171_global_row_ids",
    "q175_embedding_quantize",
    "q176_triangle_count",
    "q177_grid_distance_join",
    "q178_cms_heavy_hitters",
    "q181_training_shuffle",
    "q183_pmi_collocations",
    # r4 final wave
    "q211_temporal_join",
    "q213_seasonality",
    "q214_target_encoding",
    "q215_k_core",
    "q216_one_big_table",
    "q217_rfm_segments",
    # r5: canonicalize, leakage audit + safe split, incremental minhash,
    # FK/key discovery, dup spans, degree stats, CUSUM, stratified sample
    "q218_text_canonicalize",
    "q219_split_leakage",
    "q220_incremental_neardup",
    "q221_fk_discovery",
    "q223_dup_spans",
    "q224_degree_stats",
    "q225_leakage_safe_split",
    "q226_cusum_changepoints",
    "q227_stratified_sample",
    # r5 wave 2: basket lift, blocked ER, digit sketch, rollup shares,
    # GDPR cascade, perceptual image dedup
    "q229_copurchase_lift",
    "q230_entity_resolution",
    "q231_digit_quantile_sketch",
    "q232_percent_of_parent",
    "q233_gdpr_cascade_delete",
    "q234_image_phash_dedup",
    "q235_golden_records",
    "q236_user_lifecycle",
    "q239_ranking_metrics",
    "q240_segment_overlap",
    "q241_lorenz_curve",
    "q242_time_to_conversion",
    "q243_fulfillment_latency",
    "q244_rank_normalize",
    "q245_wow_growth",
    "q246_mixture_token_budget",
    "q247_repetitiveness",
    "q248_psi_label_shift",
    "q249_referential_audit",
    # r6 late waves: sweep-line, robust trend, interpolation, SNM
    # blocking, ledger fold, attribution, budget selection, sliding
    # distinct, PVM bridge, PIT drift, restatement, k-fold OLS
    "q287_max_concurrency",
    "q291_theil_sen",
    "q292_rolling_median",
    "q293_linear_interp",
    "q296_sorted_neighborhood",
    "q297_running_balance",
    "q299_longest_streak",
    "q300_linear_attribution",
    "q301_budget_select",
    "q303_sliding_distinct",
    "q304_pvm_bridge",
    "q305_pit_drift",
    "q307_restatement",
    "q310_kfold_ols",
]


def replicate(spark, src: str, dst: str, factor: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    for t, ks in KEYS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if ks:
            parts = []
            for i in range(factor):
                p = df
                for k in ks:
                    p = p.withColumn(k, F.col(k) + F.lit(i * STRIDE))
                parts.append(p)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx_scale"
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[3:]  # optional query-name subset (reuses an existing dst)
    # explicit names run VERBATIM (QUERY_SLICE order when they overlap);
    # silently dropping an unknown/off-slice name would fake coverage
    slice_ = [q for q in QUERY_SLICE if q in only] + [
        q for q in only if q not in QUERY_SLICE
    ] if only else QUERY_SLICE

    from etl_java_spark import queries as Q
    from etl_java_spark.session import get_session

    spark = get_session("scale-test")
    if only and os.path.isdir(os.path.join(dst, "region.parquet")):
        print(f"reusing existing replica at {dst}", file=sys.stderr)
    else:
        print(f"replicating {src} x{factor} -> {dst}", file=sys.stderr)
        replicate(spark, src, dst, factor)

    results = {}
    for label, d in [("base", src), (f"x{factor}", dst)]:
        spark.read.parquet(d + "/region.parquet").count()  # warm
        for name in slice_:
            t0 = time.time()
            n = Q.QUERIES[name](spark, d).count()
            dt = round(time.time() - t0, 2)
            results.setdefault(name, {})[label] = (dt, n)
            print(f"  [{label}] {name}: {dt}s rows={n}", file=sys.stderr, flush=True)
    for name, r in results.items():
        (a, _), (b, _) = r["base"], r[f"x{factor}"]
        print(f"{name}: base={a}s x{factor}={b}s ratio={b / a:.1f}x")


if __name__ == "__main__":
    main()
