#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, compare to the Spark parquet dumped by
graft.Verify (column-name-sorted, row order as returned).

Faithful to the driver's VALUE-HASH gate: the driver hashes the
materialized PYTHON-NATIVE values (pandas .tolist()), so a
numerically-equal-but-differently-typed column (e.g. DuckDB SUM(int) ->
HUGEINT -> float64 vs Spark int64: float 56.0 vs int 56) MUST fail here
like it fails there — while int32 vs int64 (both -> Python int, hashed
identically; driver-verified green in CORRECTNESS_r02) must still pass.
Hence: type-sensitive equality on native values, no str() coercion."""
import sys, json, glob, os
import duckdb


def _veq(g, e):
    """Type-sensitive native-value equality (the driver's hash
    distinguishes 56.0 from 56, but not int32-3 from int64-3)."""
    if type(g) is not type(e):
        return False
    if isinstance(g, list):
        return len(g) == len(e) and all(_veq(a, b) for a, b in zip(g, e))
    try:
        if g != g and e != e:  # NaN / NaT on both sides
            return True
    except (TypeError, ValueError):
        pass
    return g == e

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# optional resource bounds for big-SF local runs (sf25: x83's duck side
# needed a spill directory with headroom; r11 died on a full /): the
# driver's own gate never sets these, so its behavior is unchanged
if os.environ.get("DUCK_TMP"):
    con.execute(f"SET temp_directory='{os.environ['DUCK_TMP']}'")
if os.environ.get("DUCK_MEM"):
    con.execute(f"SET memory_limit='{os.environ['DUCK_MEM']}'")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)])
fails = []

# Big-SF local-run routes (driver never sets these → its gate unchanged):
# DUCK_SKIP_QUERIES: comma list checked elsewhere (e.g. x83's sf25 side
#   runs via tools/x83_sf25_check.py's streaming-equivalent form).
# DUCK_AGG_QUERIES: comma list compared as COUNT + order-insensitive
#   sum-of-row-hashes entirely inside DuckDB — no pandas materialization,
#   for outputs (q01/x18/x29/x34/x51 at sf25: 37M-1.7B rows) whose
#   .tolist() would not fit RAM. Column lists are name-sorted and the
#   oracle side is CAST to the dump's parquet types, so a value/type
#   drift still fails; ROW ORDER is not checked on this route (the heavy
#   queries' total sorts are pinned by the exact gate at sf5 and the r11
#   sf25 spot-gate).
skip = set(filter(None, os.environ.get("DUCK_SKIP_QUERIES", "").split(",")))
agg = set(filter(None, os.environ.get("DUCK_AGG_QUERIES", "").split(",")))
# DUCK_FRESH_CON=1: reconnect per query (big-SF local runs). One resource
# casualty on a shared connection poisons every query after it — the r14
# sf25 run had x83's ~78 GB spill fill the disk and the NEXT EIGHT queries
# then OOM'd on allocator state they did not cause; all eight passed
# immediately on fresh connections. The driver never sets this, so its
# gate is unchanged.
fresh_con = bool(os.environ.get("DUCK_FRESH_CON"))

def _connect():
    c = duckdb.connect()
    if os.environ.get("DUCK_TMP"):
        c.execute(f"SET temp_directory='{os.environ['DUCK_TMP']}'")
    if os.environ.get("DUCK_MEM"):
        c.execute(f"SET memory_limit='{os.environ['DUCK_MEM']}'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c

for name in names:
    if fresh_con:
        con.close()
        con = _connect()
    # sorted: multi-file dumps (GATE_HEAVY) should read deterministically;
    # glob order is filesystem order otherwise
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        # residue of a failed/aborted Verify write: a crash here would skip
        # every remaining query; count it as THIS query's failure instead
        print(f"{name:24s} NO PARQUET FILES (failed verify dump?)")
        fails.append(name)
        continue
    if name in skip:
        print(f"{name:24s} SKIPPED (DUCK_SKIP_QUERIES)")
        continue
    if name in agg and name in oracle:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()]
        types = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
        hl = ", ".join(f'"{c}"::{types[c]}' for c in sorted(cols))
        # four independent reductions of the row-hash multiset (ADVICE
        # r12): sum alone can cancel across differing multisets; adding
        # bit_xor, min, and max makes accidental cancellation require a
        # simultaneous collision in four algebraically unrelated folds.
        # Row ORDER remains unchecked by design (documented: these heavy
        # queries end in engine-side sorts verified at smaller SFs).
        fp = (f"count(*), sum(hash({hl})), bit_xor(hash({hl})), "
              f"min(hash({hl})), max(hash({hl}))")
        q = (f"WITH got AS (SELECT * FROM read_parquet({files!r})), "
             f"exp AS ({oracle[name]}) "
             f"SELECT * FROM (SELECT {fp} FROM got), (SELECT {fp} FROM exp)")
        try:
            gn, gh, gx, gmn, gmx, en, eh, ex, emn, emx = con.execute(q).fetchone()
        except Exception as e:
            print(f"{name:24s} AGG ORACLE ERROR: {str(e)[:200]}")
            fails.append(name); continue
        if gn != en:
            print(f"{name:24s} ROWCOUNT MISMATCH got={gn} exp={en}")
            fails.append(name)
        elif (gh, gx, gmn, gmx) != (eh, ex, emn, emx):
            print(f"{name:24s} AGG-HASH MISMATCH got={(gh, gx, gmn, gmx)} "
                  f"exp={(eh, ex, emn, emx)}")
            fails.append(name)
        else:
            print(f"{name:24s} OK rows={gn} (agg-hash route)")
        continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"{name:24s} rows={len(got):6d}  (no oracle: rows-only)")
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {str(e)[:200]}")
        fails.append(name); continue
    got = got[sorted(got.columns)]; exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"{name:24s} COLUMN MISMATCH got={list(got.columns)} exp={list(exp.columns)}")
        fails.append(name); continue
    if len(got) != len(exp):
        print(f"{name:24s} ROWCOUNT MISMATCH got={len(got)} exp={len(exp)}")
        fails.append(name); continue
    ok = True
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (g, e) in enumerate(zip(gv, ev)):
            if not _veq(g, e):
                print(f"{name:24s} VALUE MISMATCH col={c} row={i} got={g!r} exp={e!r}")
                ok = False; break
        if not ok: break
    if ok:
        print(f"{name:24s} OK rows={len(got)}")
    else:
        fails.append(name)
print("\nFAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
