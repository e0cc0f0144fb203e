#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: compare each
graft.Verify parquet dump against its DuckDB oracle (rows / schema /
values, column-name-sorted, row-sorted). Dev tool only — the shipped
library has no Python dependency."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# same out-of-core settings as correctness_artifact.py: at-scale oracle
# replays need a temp_directory or DuckDB OOMs instead of spilling
con.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
con.sql("SET preserve_insertion_order=false")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"create view {name} as select * from '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{name}"
    try:
        got = con.sql(f"select * from '{spark_dir}/*.parquet'").df()
        exp = con.sql(sql).df()
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        rows = len(got) == len(exp)
        schema = list(got.columns) == list(exp.columns)
        values = False
        if rows and schema:
            g = got.sort_values(list(got.columns)).reset_index(drop=True)
            e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
            # dtype-strict: the driver's hash is dtype-sensitive (float64
            # 3.0 != int64 3 at the byte level), so a dtype mismatch must
            # fail here too — never be blinder than the driver.
            dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                  if g[c].dtype != e[c].dtype]
            if dt:
                values = f"dtype mismatch: {dt}"[:150]
            else:
                try:
                    pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
                    values = True
                except AssertionError as ex:
                    values = str(ex).split("\n")[0][:150]
        results[name] = {"rows": rows, "schema": schema, "values": values}
        if not (rows and schema and values is True):
            results[name]["got_cols"] = list(got.columns)
            results[name]["exp_cols"] = list(exp.columns)
            results[name]["got_n"] = len(got)
            results[name]["exp_n"] = len(exp)
    except Exception as ex:
        results[name] = {"error": str(ex)[:300]}

ok = sum(1 for r in results.values() if r.get("values") is True)
print(json.dumps(results, indent=1, default=str))
print(f"\n{ok}/{len(results)} oracle-matched")
