#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB against the fixture parquet
tables, and compares: schema (column names, sorted), row count, and
values (exact for ints/strings, bitwise for floats; also reports the
max abs diff when floats mismatch).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t == "events":
            # driver fixtures carry ts as TIMESTAMP_NS; repo-generated
            # sf1 carries BIGINT nanos (Spark cannot write ns
            # timestamps). Normalize either to the micros timestamp
            # Tables.events serves (timestamp_micros(ts div 1000)).
            (ts_type,) = [r[1] for r in con.sql(
                f"DESCRIBE SELECT ts FROM '{src}'").fetchall()][:1] or ("?",)
            ts_expr = ("make_timestamp(ts // 1000)" if ts_type == "BIGINT"
                       else "ts")
            con.sql(f"CREATE VIEW {t} AS SELECT * REPLACE ({ts_expr} AS ts) "
                    f"FROM '{src}'")
        else:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); fails += 1; continue
        got = con.sql(f"SELECT * FROM '{files[0]}'").df()
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: schema {gc} != {wc}"); fails += 1; continue
        got, want = got[gc], want[wc]
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fails += 1; continue
        # The driver sorts rows via pandas sort_values over all columns
        # before hashing — which raises TypeError on non-empty ARRAY
        # columns (unhashable ndarray). Mimic it exactly so an
        # unsortable declared output fails HERE, not in the gate.
        try:
            got = got.sort_values(by=gc, kind="mergesort").reset_index(drop=True)
            want = want.sort_values(by=wc, kind="mergesort").reset_index(drop=True)
        except TypeError as e:
            print(f"FAIL {name}: driver-style sort errs (gate would record err): {e}")
            fails += 1; continue
        # compare row-by-row in sorted order
        def norm(v):
            if hasattr(v, "tolist"):
                v = v.tolist()
            if isinstance(v, (list, tuple)):
                return tuple(norm(x) for x in v)
            return v
        ok, max_diff, bad_col = True, 0.0, None
        for c in gc:
            a, b = got[c].tolist(), want[c].tolist()
            for x, y in zip(a, b):
                x, y = norm(x), norm(y)
                if isinstance(x, float) or isinstance(y, float):
                    fx = float(x); fy = float(y)
                    if math.isnan(fx) and math.isnan(fy):
                        continue
                    if fx != fy or str(fx) != str(fy):
                        ok = False
                        d = abs(fx - fy)
                        if d > max_diff: max_diff, bad_col = d, c
                elif x != y:
                    ok = False; bad_col = c; break
        if ok:
            print(f"PASS {name}: {len(got)} rows")
        else:
            print(f"FAIL {name}: value mismatch col={bad_col} max_abs_diff={max_diff}")
            fails += 1
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
