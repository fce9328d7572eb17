#!/usr/bin/env python3
"""Derive an sfN bench directory as (replicas/10 x sf1) = replicas x sf0.1
(oracle-side tooling, like bench_duckdb.py). The replication is designed so
the workload scales LINEARLY rather than turning dedup into a quadratic
cross-replica blowup:

- fact/dim keys shift by k * (dense key range) per replica k in 0..R-1, so
  foreign keys stay consistent and bounded-id query filters (doc_id < 200,
  vec_id < 5) keep their original bounded subsets;
- document text is letter-ROTATED per replica (k = 0 identity): intra-replica
  duplicate classes are preserved exactly (same transform on identical text,
  length unchanged so n_chars stays true), while cross-replica
  shingle/minhash/simhash overlap collapses -- duplicate structure scales
  x R, not x C(R,2) pairs per class. Past 10 replicas the single 10-letter
  rotation runs out of distinct permutations, so the transform is COMPOSITE:
  rotate 'etaoinshrd' by k%10 and the DISJOINT set 'lucmf' by (k//10)%5 --
  50 pairwise-distinct length-preserving permutations (sf5). Replicas
  sharing the first rotation still differ in every l/u/c/m/f occurrence,
  which holds cross-replica Jaccard far below every dedup threshold in the
  catalog (x18's band threshold is ~0.92);
- embeddings are array-ROTATED per replica (norm-preserving; a random
  synthetic vector is near-orthogonal to its rotation) for the same reason.
  The corpus dim is 64, so replicas are capped at 64 (sf6.4) before
  rotations would wrap onto earlier replicas.

Usage: make_sf1.py [src_sf_dir] [dst_dir] [replicas]
  replicas = 10 (default) -> sf1;  50 -> sf5;  250 -> sf25.

Round-11 extension to 250 replicas (sf25): a THIRD disjoint letter set
('bgjkp' -- the corpus alphabet is [a-w,y], so all five occur) multiplies
the text perms to 10 x 5 x 5 = 250, and the embedding transform composes
rotation (k % 64) with global negation ((k // 64) % 2) and reversal
((k // 128) % 2) -- all three are norm-preserving, pairwise compositions of
a random vector stay near-orthogonal (a negated/reversed rotation of a
random vector is as orthogonal as the rotation itself; the one structured
pair, v vs its own negation at the same rotation, has cosine ~-1, which no
catalog threshold treats as a near-dup), giving 64 x 2 x 2 = 256 >= 250
distinct transforms before any wrap onto an earlier replica.

Round-13 fix (x94 sf25 degeneracy): the k >= 64 embedding groups mix in a
deterministic per-label unit anchor at weight 0.2 before re-normalizing,
so per-label centroids stay round-6-visible at R=250 instead of being
cancelled by the negated groups (see the comment above the embeddings
copy for the math and the preserved invariants; sf1/sf5 outputs are
byte-identical to the round-11 generation).
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10
assert 1 <= R <= 250, \
    f"replicas must be in 1..250 (embedding 64 rot x neg x rev, " \
    f"text {10 * 5 * 5} perms), got {R}"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

ROT_A = "etaoinshrd"  # 10 distinct rotations; k=0 is the identity
ROT_B = "lucmf"       # disjoint 5-letter set; composite gives 50 perms
ROT_C = "bgjkp"       # second disjoint set; composite gives 250 perms

# composite length-preserving permutation of replica k (SQL fragment)
TEXT_ROT = (
    f"translate(translate(translate(text,"
    f" '{ROT_A}', substr('{ROT_A}{ROT_A}', CAST(k % 10 AS INT) + 1, 10)),"
    f" '{ROT_B}', substr('{ROT_B}{ROT_B}', CAST((k // 10) % 5 AS INT) + 1, 5)),"
    f" '{ROT_C}', substr('{ROT_C}{ROT_C}', CAST((k // 50) % 5 AS INT) + 1, 5))")


def copy(name, sql):
    con.execute(f"COPY ({sql}) TO '{dst}/{name}.parquet' "
                "(FORMAT PARQUET, CODEC 'snappy')")
    n = con.execute(
        f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows", flush=True)


for t in ("region", "nation"):
    copy(t, f"SELECT * FROM '{src}/{t}.parquet'")

copy("customer", f"""
  SELECT c_custkey + k*15000 AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM '{src}/customer.parquet', range({R}) r(k)""")

copy("supplier", f"""
  SELECT s_suppkey + k*1000 AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{src}/supplier.parquet', range({R}) r(k)""")

copy("part", f"""
  SELECT p_partkey + k*20000 AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM '{src}/part.parquet', range({R}) r(k)""")

copy("orders", f"""
  SELECT o_orderkey + k*150000 AS o_orderkey, o_custkey + k*15000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet', range({R}) r(k)""")

copy("lineitem", f"""
  SELECT l_orderkey + k*150000 AS l_orderkey, l_partkey + k*20000 AS l_partkey,
         l_suppkey + k*1000 AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM '{src}/lineitem.parquet', range({R}) r(k)""")

copy("events", f"""
  SELECT event_id + k*100000 AS event_id, ts, user_id + k*1500 AS user_id,
         event_type, value, props
  FROM '{src}/events.parquet', range({R}) r(k)""")

copy("documents", f"""
  SELECT doc_id + k*5000 AS doc_id,
         {TEXT_ROT} AS text,
         lang, source, n_chars
  FROM '{src}/documents.parquet', range({R}) r(k)""")

# rotate (k % 64) -> optionally reverse ((k // 128) % 2) -> optionally
# negate ((k // 64) % 2); each step preserves the norm and randomness
EMB_ROT = ("embedding[(CAST(k % 64 AS INT) + 1):]"
           " || embedding[:CAST(k % 64 AS INT)]")
EMB_REV = (f"CASE WHEN (k // 128) % 2 = 1 THEN list_reverse({EMB_ROT})"
           f" ELSE {EMB_ROT} END")
EMB_XFORM = (f"CASE WHEN (k // 64) % 2 = 1 THEN "
             f"list_transform({EMB_REV}, x -> -x) ELSE {EMB_REV} END")

# Label-anchor mixing for the k >= 64 groups (round 13, the x94 sf25
# degeneracy fix — VERDICT r12 directive 3). Why a stronger fix than
# "bias the replica signs": with zero-mean base vectors, EVERY +-1
# sign/rotation/label scheme leaves per-label centroid components at
# ~ sigma_m * sqrt(T)/T ~ 5e-4 for T=250 replicas (a random walk over
# decorrelating norm-preserving transforms), below the 7.1e-4 floor
# where x94's round(cp^2, 6) can see them — the negated groups merely
# made an already-marginal quantity exactly cancel. The robust fix is
# COHERENT reinforcement: replicas k >= 64 become
# normalize(ALPHA * a_label + BETA * T_k(v)) with a_label a
# deterministic per-label unit anchor, so per-label centroids carry
# ~(186/250)*ALPHA*a_i ~ 0.019 per dim at R=250 — 25x over the round-6
# visibility floor. Properties preserved: exact unit norm (explicit
# normalize), near-dup structure (two anchored same-label replicas
# have cos ~ ALPHA^2 = 0.04, far below every catalog threshold; the
# structured pair v vs its anchored negation sits at ~ -BETA^2 +
# ALPHA^2 ~ -0.92, still "no threshold treats it as a near-dup"), and
# R <= 64 corpora (sf1/sf5) BYTE-IDENTICAL to the pre-r13 generation
# (the anchor only touches k >= 64, which sf1/sf5 never reach).
EMB_ALPHA = 0.2
EMB_BETA = (1 - EMB_ALPHA ** 2) ** 0.5

copy("embeddings", f"""
  WITH anc0 AS (
    SELECT label,
      list_transform(range(64), i ->
        (CAST(hash(label * 1000 + i) % 1000003 AS DOUBLE)
           / 1000003.0) * 2 - 1) AS araw
    FROM (SELECT DISTINCT label FROM '{src}/embeddings.parquet')
  ), anc AS (
    SELECT label, list_transform(araw, x ->
      x / sqrt(list_sum(list_transform(araw, y -> y*y)))) AS a
    FROM anc0
  ), base AS (
    SELECT vec_id + k*2000 AS vec_id, label, k,
           CAST({EMB_XFORM} AS DOUBLE[]) AS t
    FROM '{src}/embeddings.parquet', range({R}) r(k)
  ), mixed AS (
    SELECT b.vec_id, b.label, b.k,
      CASE WHEN b.k < 64 THEN b.t
      ELSE list_transform(range(64), i ->
        {EMB_ALPHA} * anc.a[CAST(i AS INT) + 1] +
        {EMB_BETA} * b.t[CAST(i AS INT) + 1]) END AS m
    FROM base b JOIN anc ON anc.label = b.label
  )
  SELECT vec_id,
    CAST(CASE WHEN k < 64 THEN m
         ELSE list_transform(m, x ->
           x / sqrt(list_sum(list_transform(m, y -> y*y)))) END
      AS FLOAT[]) AS embedding,
    label
  FROM mixed""")
