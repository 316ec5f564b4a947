#!/usr/bin/env python3
"""Local differential check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet written by graft.Verify, runs the matching SQL from
oracle_sql.json in DuckDB over the sf_dir parquet tables, sorts columns by
name on both sides, and compares schema + values exactly (doubles to 1e-9).
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # queries recorded as thrown in Verify's manifest are FAILURES; any
    # same-named output dir is stale (a prior binary's result) — skip it
    # rather than printing a contradictory PASS for a query that no longer
    # runs
    err_path = os.path.join(out_dir, "errors.json")
    errored = json.load(open(err_path)) if os.path.exists(err_path) else {}
    names = sorted(n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n))
                   and n not in errored)
    n_pass = n_fail = 0
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        if name not in oracle:
            print(f"SKIP  {name}: no oracle ({len(spark_rel.fetchall())} rows)")
            continue
        try:
            duck_rel = con.sql(oracle[name])
            s_cols = sorted(spark_rel.columns)
            d_cols = sorted(duck_rel.columns)
            if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
                print(f"FAIL  {name}: columns {s_cols} vs {d_cols}")
                n_fail += 1
                continue
            s_types = {c.lower(): str(t)
                       for c, t in zip(spark_rel.columns, spark_rel.types)}
            d_types = {c.lower(): str(t)
                       for c, t in zip(duck_rel.columns, duck_rel.types)}
            tmis = [f"{c}: spark={s_types[c.lower()]} duck={d_types[c.lower()]}"
                    for c in s_cols if s_types[c.lower()] != d_types[c.lower()]]
            if tmis:
                print(f"FAIL  {name}: dtype mismatch {tmis}")
                n_fail += 1
                continue
            s_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in s_cols)
                + f" FROM spark_rel").fetchall()
            d_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in d_cols)
                + f" FROM duck_rel").fetchall()
            if len(s_rows) != len(d_rows):
                print(f"FAIL  {name}: rows {len(s_rows)} vs {len(d_rows)}")
                n_fail += 1
                continue
            # compare sorted (row order independent), cells with fp tolerance
            key = lambda r: tuple((x is None, str(x)) for x in r)
            bad = None
            for i, (a, b) in enumerate(zip(sorted(s_rows, key=key),
                                           sorted(d_rows, key=key))):
                if not rows_eq(a, b):
                    bad = (i, a, b)
                    break
            if bad:
                print(f"FAIL  {name}: row {bad[0]}: spark={bad[1]} duck={bad[2]}")
                n_fail += 1
            else:
                print(f"PASS  {name}: {len(s_rows)} rows")
                n_pass += 1
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
    # a query that threw in Verify leaves no (fresh) output dir; count it
    # as a FAILURE, not a silently smaller suite
    for name, msg in sorted(errored.items()):
        print(f"FAIL  {name}: verify threw: {msg}")
        n_fail += 1
    total = len(names) + len(errored)
    print(f"\n{n_pass} pass, {n_fail} fail, {total} total")
    sys.exit(1 if n_fail else 0)

def rows_eq(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y):
                continue
            if abs(x - y) > 1e-9 * max(1.0, abs(x), abs(y)):
                return False
        elif x != y:
            return False
    return True

if __name__ == "__main__":
    main()
