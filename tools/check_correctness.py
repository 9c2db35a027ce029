#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir> [query,query,...]

For each query dir under <verify_out_dir>: load the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sort columns by name, sort rows, and hash-compare values.
This is dev tooling only — the Scala library has no Python dependency.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, round floats, sort rows -> hashable form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        # everything becomes a string so rows with NULLs stay sortable
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # float32 round-trip to absorb representation differences
            return f"{v:.6g}"
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, list):
            return tuple(cell(x) for x in v)
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for tb in TABLES:
        con.execute(
            f"CREATE VIEW {tb} AS SELECT * FROM '{sf_dir}/{tb}.parquet'")
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only is not None and name not in only:
            continue
        sql = oracles[name]
        try:
            q_spark = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            spark_rel = con.execute(q_spark)
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            oracle_rel = con.execute(sql)
            o_cols = [d[0] for d in oracle_rel.description]
            o_rows = oracle_rel.fetchall()
            # dtype kinds via pandas, AFTER the row fetches (execute()
            # replaces the connection's pending result)
            s_kinds = {c: d.kind for c, d in
                       con.execute(q_spark + " LIMIT 0").df().dtypes.items()}
            o_kinds = {c: d.kind for c, d in
                       con.execute(sql).df().head(0).dtypes.items()}
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        # pandas dtype-kind mismatch (e.g. DuckDB HUGEINT -> float64 vs Spark
        # int64) serializes differently in the driver's hash even when every
        # value is numerically equal — treat it as a failure here too
        kind_diff = [c for c in s_cols
                     if s_kinds.get(c, "?") != o_kinds.get(c, "?")
                     and {s_kinds.get(c), o_kinds.get(c)} != {"i", "O"}]
        if kind_diff:
            print(f"FAIL {name}: dtype-kind mismatch "
                  f"{[(c, s_kinds.get(c), o_kinds.get(c)) for c in kind_diff]}")
            n_fail += 1
            continue
        cs, co = canon(s_rows, s_cols), canon(o_rows, o_cols)
        if len(cs) != len(co):
            print(f"FAIL {name}: rows spark={len(cs)} oracle={len(co)}")
            n_fail += 1
        elif cs != co:
            bad = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(cs)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
