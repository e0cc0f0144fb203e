#!/usr/bin/env python3
"""Driver-format correctness artifact from a graft.Verify dump: for each
query in {out_dir}/oracle_sql.json, run the oracle in DuckDB over the
fixture parquet and compare (rows / schema / column-name-sorted hash of
row-sorted values) exactly like the driver, emitting
{name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}} JSON to stdout. Dev tool only.

Usage: correctness_artifact.py <sf_dir> <out_dir> [skip1,skip2,...]

Skipped queries are recorded as {"skipped": "<reason>"} instead of a
result row — used at sf1 for the oracle formulations that are
superlinear in DuckDB (recursive-CTE closures, 64-permutation signature
replays) while the Spark side finishes in seconds; their oracles run at
the sf0.01 driver gate.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()

con = duckdb.connect()
# at-scale replays (sf10/sf100) need out-of-core oracles: an in-memory
# connection has no temp_directory, so big hash tables fail with
# "Out of Memory Error" instead of spilling
con.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
con.sql("SET preserve_insertion_order=false")
# hard cap so the 1000x replays SPILL instead of getting OOM-killed by
# the kernel (the 5M-doc ccnet window replay died at rss>hostmem with
# no limit set; DuckDB only spills when it knows its budget). Capped to
# ~75% of detected host RAM so a smaller host doesn't get a budget
# ABOVE its physical memory, which would reintroduce the OOM-kill the
# limit exists to prevent.
_host_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
con.sql(f"SET memory_limit='{max(1, min(64, int(_host_gb * 0.75)))}GB'")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    # Spark-written tables are directories of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"create view {name} as select * from '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    print(f"[artifact] {name}", file=sys.stderr, flush=True)
    if name in skip:
        results[name] = {"skipped": "oracle formulation superlinear in DuckDB "
                         "at this sf; Spark side ran clean, oracle gated at sf0.01"}
        continue
    row = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        got = con.sql(f"select * from '{out_dir}/{name}/*.parquet'").df()
        exp = con.sql(sql).df()
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        row["spark_rows"] = len(got)
        row["oracle_rows"] = len(exp)
        row["rows_match"] = len(got) == len(exp)
        row["schema_match"] = list(got.columns) == list(exp.columns)
        if row["rows_match"] and row["schema_match"]:
            g = got.sort_values(list(got.columns)).reset_index(drop=True)
            e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
            # dtype-strict: the driver's hash is dtype-sensitive (float64
            # 3.0 != int64 3 at the byte level), so a dtype mismatch must
            # fail here too — never be blinder than the driver.
            dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                  if g[c].dtype != e[c].dtype]
            if dt:
                row["err"] = f"dtype mismatch: {dt}"[:200]
            else:
                try:
                    pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
                    row["hash_match"] = True
                except AssertionError as ex:
                    row["err"] = str(ex).split("\n")[0][:200]
    except Exception as ex:
        row["err"] = str(ex)[:300]
    results[name] = row

ok = sum(1 for r in results.values() if r.get("hash_match"))
ran = sum(1 for r in results.values() if "skipped" not in r)
print(json.dumps(results, indent=1, default=str))
print(f"\n{ok}/{ran} matched ({len(results) - ran} skipped)", file=sys.stderr)
sys.exit(0 if ok == ran else 1)
