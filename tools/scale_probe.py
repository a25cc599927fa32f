"""Scale probe: replicate sf0.1 tables Nx into /tmp and compare
headline-query latency against the sf0.1 base — evidence that plans scale
linearly (no super-linear shuffle/spill cliffs) beyond fixture sizes.

Run: python tools/scale_probe.py [replication_factor] [--dedup-only]

``--dedup-only`` restricts to the MinHash-LSH probe and, at every factor,
records CANDIDATE pairs (post-banding, pre-verification) and VERIFIED pairs
next to wall time — the measured evidence (round-4 VERDICT item 5) that
dedup's super-unit latency ratio is output-driven (true near-dup pairs grow
quadratically in the replicated fixture) and not a plan property.

Replica transforms keep the data realistic at Nx:
- events: event_id/user_id offset per replica so keys grow with data
  (user-keyed aggregations see more keys, not hotter keys); timestamps
  as-is (same day-partition profile, denser days).
- documents: doc_id offset; a per-replica token is appended to the text so
  replicas are NEAR-dups of each other, not exact dups — replicating text
  verbatim would manufacture identical-text groups of size N and the
  quadratic pair explosion would measure the adversarial-duplication case,
  not latency growth on a realistic corpus (the hot-bucket cap exists for
  that case and is tested separately).
- embeddings: vec_id offset, vectors as-is (the ANN probes broadcast a
  fixed 5-query set, so corpus scan work grows linearly by construction).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from real_time_analytics_with_apache_pinot_on_aws_spark.session import build_session  # noqa: E402
from real_time_analytics_with_apache_pinot_on_aws_spark import queries as Q  # noqa: E402

PROBES = (
    "flagship_dashboard",
    "b62_upsert_latest",
    "c5_sessionization",
    "b43_ranking_windows",
    # LLM-pipeline operators (round-4 VERDICT item 4)
    "c1_dedup_minhash_lsh",
    "c2_cosine_topk",
    # curation suite (round 4): gram-overlap decontamination stresses the
    # explode->broadcast-join path, packing stresses the per-stream window
    "c10_decontamination",
    "c13_sequence_packing",
    "c17_corpus_to_training",
    # round 5: temperature rebalance (per-source broadcast rejoin) and
    # token-budget cap (group-keyed window cumsum) at growing corpora
    "c19_temperature_rebalance",
    "c21_token_budget_cap",
    # model-based quality filter: one codegen dot-product pass per row —
    # should stay ~flat per row at any corpus size
    "c22_quality_classifier",
    # line-level boilerplate dedup: dictionary shuffle is 8-byte hashes,
    # reassembly is one doc-keyed exchange — both linear in corpus size
    "c24_line_dedup",
    # exact-substring dedup: gram-hash count is the only corpus-sized
    # shuffle; covered-start collection and masking are doc-local
    "c25_exact_substring_dedup",
    # LM perplexity filter: vocabulary-sized model, doc-keyed scoring
    "c26_lm_perplexity_filter",
    # DSIR selection: map-side gram hashing, 1024-row fit aggregate,
    # broadcast ratio rejoin, TakeOrderedAndProject top-k — expect ~linear
    "c27_dsir_selection",
    # round 6: both shuffle-free single-pass filters — expect flat-per-row
    "c28_gopher_rules",
    "c29_c4_line_cleaning",
    # CLP encode/decode round trip: pure map-side projections — flat-per-row
    "c31_clp_log_encoding",
    # URL filter: map-side scoring + broadcast list joins — flat-per-row
    "c32_url_filter",
    # Tuple sketch: per-(type,hash) partial agg + k-bounded window rank —
    # the only corpus-sized exchange is the narrow hash aggregate
    "b70_tuple_sketch",
    # round 7: the bounded MV-distinct statement route — Generate (explode)
    # + one hash aggregate on (label, elem); explode multiplies rows
    # map-side but the exchange carries only partial distinct state
    "b17_mv_distinct_route",
    # round 8: the keyed two-level routes — per-correlator / per-key hash
    # aggregate then a tiny outer aggregate; both exchanges carry partial
    # state only (bool flags / one double per key), expect ~linear
    "b16_funnelcount_routed",
    "b70_tuple_value_sql",
    # round 8: theta set-expression route — same two-level shape with
    # per-key bool_or membership flags; exchange carries N booleans/key
    "b21_theta_set_expression_sql",
    # round 8: ordered-funnel window-cascade route — one shuffle+sort per
    # user partition, per-row running-min state, no collected arrays
    "b16_funnelmaxstep_routed",
    # round 8: the IN_SUBQUERY IdSet rewrite — inner distinct set built
    # executor-side then broadcast semi-joined (plan-pinned); both the
    # probe's corpus scan and the distinct build are linear
    "b42_in_subquery_sql",
    # round-8 session: the SUMARRAY positional route — posexplode
    # multiplies rows map-side, the exchange carries one partial sum per
    # (label, position) (5 labels x embedding dims), outer collect is
    # bounded by the array length; expect ~flat-per-row
    "b17_sumarray_route",
    # round-8 session: the MODE-AVG three-level route — three stacked
    # hash aggregates whose exchanges carry one row per (group, value)
    # then per (group, count); both cardinalities fixed here (5 types x
    # 10 values), expect ~flat-per-row
    "b24_mode_avg_route",
    # round 9: FUNNELSTEPDURATIONSTATS on the window cascade — same
    # one-shuffle+sort-per-user-partition shape as the MAXSTEP route
    # (the duration stats are outer-level scalar arithmetic), expect
    # the cascade's ~2x band at 32-64x
    "b16_funnel_duration_route",
    # round 10: the keyed route over a TWO-JOIN chain — same two-level
    # per-correlator shape with the chain re-emitted verbatim in the
    # inner level (dims broadcast; the only corpus exchange carries
    # per-(group, correlator) boolean flags)
    "b16_funnelcount_join2_route",
    # round 10: the twice-referenced deterministic CTE inlined at both
    # sites — main FROM plus IN-subquery; exchange reuse dedups the scan
    "b17_cte_multiref_route",
    # round 10: expression GROUP BY through the keyed route — the
    # time-bucket alias adds one projected column to the same
    # per-(bucket, correlator) two-level plan
    "b16_funnelcount_timebucket_route",
    # round 9: the CTE-inlined MV-distinct route — identical physical
    # plan to b17_mv_distinct_route after inlining (the CTE body
    # re-emits as the derived table), expect the same ~1.3x band
    "b17_cte_inline_route",
    # round 11: a DERIVED-TABLE operand inside the JOIN chain — the
    # pre-filtered dim subquery still broadcasts, so the shape matches
    # the bare-chain probes (~1.2-1.7x band)
    "b16_funnelcount_derived_join_route",
    # round 11: FILTER folded into the window-cascade route — the mask
    # is two extra boolean columns in the same one-shuffle+sort-per-
    # user-partition cascade, expect the cascade's ~2x noise band
    "b16_funnelmaxstep_filter_route",
    # round 11: FILTER folded into the MODE-AVG value mask — the same
    # three stacked hash aggregates with one extra if() projection
    "b24_mode_avg_filter_route",
    # round 11: FILTER folded into the keyed route's per-correlator
    # flag partials — the pred conjoins into the inner bool_or masks
    "b16_funnelcount_filter_route",
    # round 11: FILTER folded into the sumarray route by masking the
    # exploded array — same per-(label, position) exchange
    "b17_sumarray_filter_route",
    # round 11: comma-FROM (implicit cross join) admitted — the comma
    # list re-emits verbatim, same bounded per-correlator plan
    "b16_funnelcount_comma_from_route",
)


def _replicate_events(df, i: int):
    return df.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000)).withColumn(
        "user_id", F.col("user_id") + F.lit(i * 1_000_000)
    )


def _replicate_documents(df, i: int):
    return df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)).withColumn(
        "text", F.concat(F.col("text"), F.lit(f" replica{i}"))
    )


def _replicate_embeddings(df, i: int):
    return df.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))


REPLICATORS = {
    "events": _replicate_events,
    "documents": _replicate_documents,
    "embeddings": _replicate_embeddings,
}


def _dedup_pair_counts(spark) -> dict:
    """Candidate vs verified pair counts for the c1 LSH parameters.

    jaccard_threshold=0.0 keeps every candidate that survives banding (the
    verify filter passes everything), so its count IS the candidate-pair
    count the banded self-join emitted; 0.5 is the production threshold.
    """
    from real_time_analytics_with_apache_pinot_on_aws_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = spark.table("documents")
    kw = dict(num_hashes=16, bands=8, shingle_n=3)
    cand = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.0, **kw).count()
    ver = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.5, **kw).count()
    return {"candidate_pairs": cand, "verified_pairs": ver}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dedup_only = "--dedup-only" in sys.argv[1:]
    only = next(
        (a.split("=", 1)[1].split(",") for a in sys.argv[1:] if a.startswith("--only=")),
        None,
    )
    factor = int(args[0]) if args else 8
    base_sf = "/root/testdata/sf0.1"
    spark = build_session(app_name="scale_probe")
    from real_time_analytics_with_apache_pinot_on_aws_spark import catalog as C

    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    big_dirs = {}
    row_counts = {}
    for table, repl in REPLICATORS.items():
        base = C.load_table(spark, base_sf, table)
        row_counts[table] = base.count()
        replicas = [repl(base, i) for i in range(factor)]
        big = replicas[0]
        for r in replicas[1:]:
            big = big.unionByName(r)
        big_dirs[table] = f"{tmp}/{table}_big"
        big.write.mode("overwrite").parquet(big_dirs[table])

    def timed(build, reps: int = 2) -> float:
        """min-of-N with cache cleared per rep — single-rep numbers swing
        2x on a busy machine (observed), min-of-2 is stable enough."""
        best = None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build().count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return best

    results = {}
    reg = Q.all_queries()
    probes = ("c1_dedup_minhash_lsh",) if dedup_only else tuple(only) if only else PROBES
    for name in probes:
        spark.catalog.clearCache()
        spark._rtap_sf_dir = None  # type: ignore[attr-defined]  # force re-register
        # base timing (warm once, then time)
        reg[name].builder(spark, base_sf).count()
        base_t = timed(lambda: reg[name].builder(spark, base_sf))
        if name == "c1_dedup_minhash_lsh":
            base_pairs = _dedup_pair_counts(spark)
        # big timing: swap every replicated view to the Nx table.  _prep
        # skips re-registration while sf_dir is unchanged, so the swapped
        # views are what the builder reads.
        for table, path in big_dirs.items():
            spark.read.parquet(path).createOrReplaceTempView(table)
        reg[name].builder(spark, base_sf).count()  # warm (listing, codegen)
        big_t = timed(lambda: reg[name].builder(spark, base_sf))
        results[name] = {
            "base_sec": round(base_t, 3),
            f"x{factor}_sec": round(big_t, 3),
            "ratio": round(big_t / base_t, 2),
        }
        if name == "c1_dedup_minhash_lsh":
            big_pairs = _dedup_pair_counts(spark)
            results[name]["pairs"] = {
                "base": base_pairs,
                f"x{factor}": big_pairs,
                "verified_growth": round(
                    big_pairs["verified_pairs"] / max(base_pairs["verified_pairs"], 1), 1
                ),
            }
    print(
        json.dumps(
            {"rows_base": row_counts, "factor": factor, "probes": results}, indent=2
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
