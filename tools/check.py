#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each query's Spark parquet output from <outDir>/<name>/, runs the
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the <sfDir> tables,
and compares: column names (sorted), row counts, and exact values
(floats compared bit-exactly, with a fallback report of max abs diff).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.types as pat


def type_kind(t):
    if pat.is_decimal(t):
        return "decimal"
    if pat.is_integer(t):
        return "int"
    if pat.is_floating(t):
        return "float"
    return "other"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if hasattr(v, "timestamp"):  # datetime
        return v.isoformat()
    if isinstance(v, float):
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got_tbl = pq.read_table(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got_cols = sorted(got_tbl.column_names)
        want_cols = sorted(want.column_names)
        if got_cols != want_cols:
            print(f"FAIL {name}: columns differ spark={got_cols} duck={want_cols}")
            n_fail += 1
            continue
        # The DRIVER's gate converts both sides to pandas, where decimal128
        # (Spark decimal output, or DuckDB HUGEINT from SUM(BIGINT)) maps to
        # different dtypes on each side (object-Decimal vs float64) and
        # hash-mismatches even on identical values. This pylist-based
        # replica would silently PASS those (Decimal == int is True in
        # Python), so treat any decimal-typed output column — or an
        # int-vs-float kind mismatch between engines — as a hard failure.
        if len(set(got_cols)) != len(got_cols) or len(set(want_cols)) != len(want_cols):
            print(f"FAIL {name}: duplicate column names spark={got_cols} duck={want_cols}")
            n_fail += 1
            continue
        kind_bad = []
        for c in got_cols:
            gt = got_tbl.schema.field(c).type
            wt = want.schema.field(c).type
            gk, wk = type_kind(gt), type_kind(wt)
            if gk == "decimal" or wk == "decimal":
                kind_bad.append(f"{c}: decimal output (spark={gt}, duck={wt}) — cast to DOUBLE/BIGINT on both sides")
            elif {gk, wk} == {"int", "float"}:
                kind_bad.append(f"{c}: int-vs-float across engines (spark={gt}, duck={wt})")
        if kind_bad:
            print(f"FAIL {name}: gate-unsafe output types: " + "; ".join(kind_bad))
            n_fail += 1
            continue
        if got_tbl.num_rows != want.num_rows:
            print(f"FAIL {name}: rows spark={got_tbl.num_rows} duck={want.num_rows}")
            n_fail += 1
            continue
        got_rows = [[norm_cell(r[c]) for c in got_cols] for r in got_tbl.to_pylist()]
        want_rows = [[norm_cell(r[c]) for c in want_cols] for r in want.to_pylist()]
        exact = got_rows == want_rows
        if exact:
            print(f"PASS {name} ({got_tbl.num_rows} rows)")
            n_pass += 1
            continue
        # order-insensitive retry + float diff report
        try:
            sg = sorted(got_rows, key=repr)
            sw = sorted(want_rows, key=repr)
            if sg == sw:
                print(f"WARN {name}: values match only after row sort (ordering!)")
                n_fail += 1
                continue
        except Exception:
            pass
        maxdiff, loc = 0.0, None
        nbad = 0
        for i, (g, w) in enumerate(zip(got_rows, want_rows)):
            for j, (a, b) in enumerate(zip(g, w)):
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    d = abs(a - b)
                    if math.isnan(a) and math.isnan(b):
                        continue
                    if d > maxdiff:
                        maxdiff, loc = d, (i, got_cols[j], a, b)
                    nbad += 1
                else:
                    nbad += 1
                    if loc is None:
                        loc = (i, got_cols[j], a, b)
        print(f"FAIL {name}: {nbad} differing cells, maxfloatdiff={maxdiff}, first/worst={loc}")
        n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
