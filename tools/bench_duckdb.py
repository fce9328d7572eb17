#!/usr/bin/env python3
"""DuckDB side of the bench protocol (BASELINE.md): same machine, same
per-query rule as graft.Bench — one warm-up run, then best of 5 timed runs,
executed against the same sf directory. Prints one JSON line.

Usage: bench_duckdb.py <sf_dir> <oracle_sql.json> [names...]
Queries without an oracle entry (x28/x54) are skipped, mirroring the
"shared set" the ratio is computed over.
"""
import os, sys, json, time
import duckdb

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(oracle_path))

con = duckdb.connect()
# same core budget as the Spark side (local[N] from SPARK_GRAFT_CPUS) —
# a hardcoded 32 would silently skew the cross-engine ratio whenever the
# driver benches with a different count
threads = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
con.execute(f"SET threads TO {threads}")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

# the headline bench set, kept in sync with Catalog.benchNames
BENCH = ["q01_project_rename", "q02_cast_date", "q03_eq_filter",
         "q04_range_filter", "q05_daily_distinct", "q06_json_extract",
         "q07_group_count", "q09_join_agg", "q10_anti_join",
         "q11_latest_per_user", "q12_distinct_count", "q13_top_tokens",
         "q14_cosine_topk", "q15_set_except", "q16_join_window",
         "x17_dedup_exact", "x18_dedup_minhash", "x19_dedup_simhash",
         "x20_dedup_ngram", "x21_dedup_embedding", "x22_sim_lsh",
         "x23_text_langid", "x24_text_quality", "x25_text_tokencount",
         "x26_text_fingerprint", "x27_multimodal_decode", "x28_approx_distinct",
         "x29_scalar_kit", "x30_set_ops", "x31_rollup_agg", "x32_asof_join",
         "x33_percentiles", "x34_dedup_embedding_lsh", "x35_full_outer",
         "x36_window_lag", "x37_cube_agg", "x38_except_all"]

# the extended tier (x39+), kept in sync with Catalog.benchNamesExtended;
# timed separately so the headline total stays round-comparable
EXTENDED = [f"x{i}_{s}" for i, s in [
    (39, "tfidf"), (40, "hash_split"), (41, "lev_neardup"), (42, "pivot"),
    (43, "grouping_sets"), (44, "exists_subquery"), (45, "window_frame"),
    (46, "sessionize"), (47, "boilerplate_ngrams"), (48, "ann_ivf"),
    (49, "curation"), (50, "range_join"), (51, "rank_distribution"),
    (52, "array_ops"), (53, "scalar_subquery"), (54, "approx_percentiles"),
    (55, "intersect_all"), (56, "string_agg"), (57, "unpivot"),
    (58, "window_range_frame"), (59, "text_scrub"), (60, "dedup_clusters"),
    (61, "stats_kit"), (62, "funnel"), (63, "stratified_sample"),
    (64, "doc_chunks"), (65, "bpe_pairs"), (66, "decontamination"),
    (67, "winsorize"), (68, "histogram"), (69, "repetition"),
    (70, "source_report"), (71, "knn_label"), (72, "gapfill"),
    (73, "forward_fill"), (74, "debounce"), (75, "share_of_total"),
    (76, "rank_ties"), (77, "mad"), (78, "image_decode"),
    (79, "sequence_packing"), (80, "audio_decode"), (81, "lm_score"),
    (82, "video_decode"), (83, "semantic_dedup"), (84, "mixture_sample"),
    (85, "passage_dedup"), (86, "dsir_weights"), (87, "shuffle_shards"),
    (88, "dsir_resample"), (89, "winnowing"), (90, "bm25"),
    (91, "pmi_collocations"), (92, "domain_caps"), (93, "zipf_spectrum"),
    (94, "centroid_outliers"), (95, "hybrid_search"), (96, "quality_gate"),
    (97, "source_overlap"), (98, "interpolate"),
    (99, "canonical_docs"), (100, "training_pipeline"),
    (101, "topk_exemplars"), (102, "bloom_decontamination")]]


# queries declared WITHOUT an oracle by design — the only names bench_set
# may silently skip; anything else missing is drift between this file and
# Catalog.benchNames/benchNamesExtended and must be loud. Empty since r12:
# x28/x54 now carry in-query tolerance verdicts with real oracle SQL, so
# they joined the shared set (both engines now pay the exact side's cost —
# note when comparing r12+ totals to earlier rounds).
NO_ORACLE = set()


def bench_set(names):
    res = {}
    for name in names:
        if only and name not in only:
            continue
        if name not in oracle:
            if name not in NO_ORACLE:
                print(f"bench_duckdb: DRIFT — {name} has no oracle entry; "
                      "totals are no longer cross-engine comparable",
                      file=sys.stderr)
            continue  # no-oracle queries are not part of the shared set
        sql = oracle[name]
        try:
            con.execute(sql).fetchall()  # warm-up
            best = min(
                (lambda t0: (con.execute(sql).fetchall(), time.perf_counter() - t0)[1])(
                    time.perf_counter())
                for _ in range(5))
            res[name] = round(best, 4)
        except Exception as e:
            # mirror graft.Bench's -1.0 sentinel: one regressed oracle must
            # not abort the whole run and lose the round's DuckDB line
            print(f"bench_duckdb: {name} FAILED: {str(e)[:200]}",
                  file=sys.stderr)
            res[name] = -1.0
    return res

# reverse drift: a query added to the Scala catalog (it lands in
# oracle_sql.json) but not to BENCH/EXTENDED above would silently shrink
# the shared set — make that loud too (q08's write-roundtrip is excluded
# from benching by design)
for name in sorted(set(oracle) - set(BENCH) - set(EXTENDED) -
                   {"q08_roundtrip"}):
    print(f"bench_duckdb: DRIFT — {name} is in the catalog but in neither "
          "bench tier; add it above", file=sys.stderr)

res = bench_set(BENCH)
ext = bench_set(EXTENDED)
# -1.0 sentinels (failed queries) are excluded from totals, like graft.Bench
total = round(sum(v for v in res.values() if v >= 0), 4)
print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                  "queries": res,
                  "extended_total": round(sum(v for v in ext.values() if v >= 0), 4),
                  "extended_queries": ext, "sf": sf_dir}))
