#!/usr/bin/env python3
"""DuckDB side of the bench protocol (BASELINE.md): same machine, same
per-query rule as graft.Bench — one warm-up run, then best of 5 timed runs,
executed against the same sf directory. Prints one JSON line.

Usage: bench_duckdb.py <sf_dir> <oracle_sql.json> [names...]
Queries without an oracle entry (x28/x54) are skipped, mirroring the
"shared set" the ratio is computed over.
"""
import sys, json, time
import duckdb

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(oracle_path))

con = duckdb.connect()
con.execute(f"SET threads TO 32")
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

res = {}
for name in BENCH:
    if only and name not in only:
        continue
    if name not in oracle:
        continue  # no-oracle queries are not part of the shared set
    sql = oracle[name]
    con.execute(sql).fetchall()  # warm-up
    best = min(
        (lambda t0: (con.execute(sql).fetchall(), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(5))
    res[name] = round(best, 4)

total = round(sum(res.values()), 4)
qs = ",".join(f'"{k}":{v}' for k, v in res.items())
print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                  "queries": res, "sf": sf_dir}))
