#!/usr/bin/env python3
"""Build the 10x scale corpus used for the per-round scale curves
(BASELINE.md "10x scale curves" sections). Dev-only tool; not part of
the library.

Method (established in round 5, kept identical for comparability):
  - documents: 10 replicas; replica k suffixes every token with `_rk`,
    so each replica is structure-isomorphic to the original (same
    lengths, same planted near-dup families) with a DISJOINT vocabulary
    -> shingle/LSH pair counts scale exactly linearly, not
    quadratically. doc_id offset by k * 1_000_000; n_chars recomputed.
  - embeddings: 10 replicas; vec_id offset; deterministic per-replica
    perturbation (+k * 1e-3 on every dimension) so replicas are
    distinct but the geometry (planted near-dup pairs) is preserved.
  - events: 10 replicas; user_id offset by k * 1_000_000 (per-user
    event sequences identical in every replica -> as-of/window work
    scales linearly in users), event_id offset, ts unchanged.
  - customer: 10 replicas; c_custkey offset (class sizes scale 10x).
  - all other tables: copied as-is from the source sf dir.

Usage: python3 tools/make_scale10.py [src_sf_dir] [out_dir]
"""
import sys, shutil, os
import duckdb

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SRC = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.1"
OUT = ARGS[1] if len(ARGS) > 1 else "/tmp/sf0.1_x10"
REPS = 10
# Offset must exceed the max id in SRC. Composing two passes for a 100x
# corpus needs a larger second-pass offset (first-pass ids reach
# 9 * OFF + n): e.g. pass 1 with 1_000_000, pass 2 with 100_000_000.
OFF = int(ARGS[2]) if len(ARGS) > 2 else 1_000_000
# --tpch additionally replicates orders/lineitem/supplier/part into
# disjoint key universes (keys offset per replica, matching the
# replicated customer keys) so the trade-graph queries (graph_pagerank,
# graph_triangles — customer/supplier and co-purchase edges from
# orders x lineitem) scale linearly in replicas, same
# structure-isomorphic construction as documents. Default keeps the
# r5-established method (TPC-H facts copied as-is) for comparability.
TPCH = "--tpch" in sys.argv

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# documents: token-renamed replicas
parts = []
for k in range(REPS):
    parts.append(f"""
      SELECT doc_id + {k * OFF} AS doc_id,
        array_to_string(list_transform(
          list_filter(string_split(text, ' '), t -> t <> ''),
          t -> t || '_r{k}'), ' ') AS text,
        lang, source,
        CAST(len(array_to_string(list_transform(
          list_filter(string_split(text, ' '), t -> t <> ''),
          t -> t || '_r{k}'), ' ')) AS BIGINT) AS n_chars
      FROM '{SRC}/documents.parquet'""")
con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/documents.parquet' (FORMAT PARQUET)")

# embeddings: perturbed replicas (keep FLOAT element type)
parts = []
for k in range(REPS):
    parts.append(f"""
      SELECT vec_id + {k * OFF} AS vec_id,
        list_transform(embedding, x -> CAST(x + {k} * 0.001 AS FLOAT)) AS embedding,
        label
      FROM '{SRC}/embeddings.parquet'""")
con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)")

# events: user/event id offsets, ts unchanged
parts = []
for k in range(REPS):
    parts.append(f"""
      SELECT event_id + {k * OFF} AS event_id, ts,
        user_id + {k * OFF} AS user_id, event_type, value, props
      FROM '{SRC}/events.parquet'""")
con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/events.parquet' (FORMAT PARQUET)")

# customer: custkey offsets
parts = []
for k in range(REPS):
    parts.append(f"""
      SELECT c_custkey + {k * OFF} AS c_custkey, c_name, c_nationkey,
        c_acctbal, c_mktsegment
      FROM '{SRC}/customer.parquet'""")
con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/customer.parquet' (FORMAT PARQUET)")

if TPCH:
    # Disjoint TPC-H universes per replica: offset every key that joins
    # another replicated table. nation/region keys are NOT offset, so
    # those dims stay shared (copied as-is below).
    repl = {
        "orders": "o_orderkey + {o} AS o_orderkey, o_custkey + {o} AS o_custkey",
        "lineitem": ("l_orderkey + {o} AS l_orderkey, "
                     "l_partkey + {o} AS l_partkey, "
                     "l_suppkey + {o} AS l_suppkey"),
        "supplier": "s_suppkey + {o} AS s_suppkey",
        "part": "p_partkey + {o} AS p_partkey",
    }
    for t, cols in repl.items():
        parts = [f"SELECT * REPLACE ({cols.format(o=k * OFF)}) FROM '{SRC}/{t}.parquet'"
                 for k in range(REPS)]
        con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
else:
    for t in ["region", "nation", "supplier", "part", "orders", "lineitem"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

for t in ["documents", "embeddings", "events", "customer"]:
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"done -> {OUT}")
