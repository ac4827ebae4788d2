#!/usr/bin/env python
"""Local single-node baseline: run each bench headliner's ORACLE SQL in
DuckDB (the closest stand-in for the reference's embedded engines) on the
same sf dir, and compare against the Spark bench JSON (cold + warm).

Usage: python tools/bench_baseline.py [sfdir] [bench_json] [out_md]

Dev-only tooling; writes BASELINE_LOCAL.md. The comparison is honest about
regime: at sf0.1 (~600k-row lineitem) an embedded columnar engine wins on
latency because Spark pays JVM/planning/shuffle overheads that only
amortize at scale — the Spark numbers to watch are the WARM ones, and the
design goal is the 1000-executor plan shape, which DuckDB cannot express.
"""
import json, sys, time, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
bench_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_test.json"
out_md = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/BASELINE_LOCAL.md"

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open("/tmp/verify_out/oracle_sql.json"))
bench = json.load(open(bench_json))

# oracles that are brute-force (all-pairs) by design are only tractable
# at sf0.01 — they exist to verify the LSH path, not to race it
SKIP = {"dedup_minhash_lsh": "oracle is O(n^2) brute force by design",
        "llm_corpus_prep": "oracle embeds the O(n^2) brute-force dedup",
        "text_fingerprint": "oracle is a per-row list comprehension",
        "dedup_components": "oracle walks the O(n^2) brute-force pairs",
        "dedup_jaccard_prefix": "oracle is O(n^2) brute force by design",
        "dedup_containment": "oracle is O(n^2) ordered brute force by design"}

rows = []
for q, spark_cold in bench["queries"].items():
    spark_warm = bench.get("warm", {}).get(q)
    if q not in oracle or q in SKIP:
        rows.append((q, spark_cold, spark_warm, None, None))
        continue
    sql = oracle[q]
    t0 = time.time(); con.execute(sql).fetchall(); cold = time.time() - t0
    t0 = time.time(); con.execute(sql).fetchall(); warm = time.time() - t0
    rows.append((q, spark_cold, spark_warm, cold, warm))

with open(out_md, "w") as f:
    f.write("# BASELINE_LOCAL — Spark (this engine) vs DuckDB on the "
            "same queries/data\n\n")
    f.write(f"sf dir: `{sfdir}`; DuckDB runs each bench headliner's "
            "oracle SQL. Spark times include the checksum materialization "
            "of every output column.\n\n")
    f.write("| query | spark cold s | spark warm s | duckdb cold s | "
            "duckdb warm s | warm ratio |\n|---|---|---|---|---|---|\n")
    for q, sc, sw, dc, dw in rows:
        ratio = (f"{sw/dw:.1f}x" if sw and dw and dw > 0 else "—")
        f.write(f"| {q} | {sc:.2f} | {sw:.2f} | "
                f"{dc:.2f} | {dw:.2f} | {ratio} |\n"
                if dc is not None else
                f"| {q} | {sc:.2f} | {sw:.2f} | — | — | — |\n")
    f.write("""
## Reading these numbers

- At this scale (~600k-row lineitem) the embedded engine is expected to
  win on latency: a single-process vectorized scan with no planning/JVM/
  shuffle overhead is the best case for DuckDB and the worst case for
  Spark, whose costs amortize with data volume and executor count.
- The Spark WARM numbers exclude first-run Catalyst planning and codegen
  compilation (which dominate cold times at small SF).
- What the Spark plans buy instead (see EXPLAIN.md): every headliner's
  plan partitions/broadcasts/prunes so the SAME code scales out to a
  1000-executor cluster — the target regime is 100 TB, where a
  single-node engine is not in the race.
""")
print(f"wrote {out_md}")
