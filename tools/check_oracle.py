#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

Reads each <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB against the fixture parquet
tables, and compares: schema (column names, sorted), per-column result
DTYPES (the driver's hash is dtype-sensitive — a value-equal column in
a different dtype family/width, e.g. DuckDB widening sum(BIGINT) to
HUGEINT, hash-mismatches at the driver; rounds 7 and 8 shipped exactly
that because this gate compared names+values only), row count, and
values (exact for ints/strings, bitwise for floats; also reports the
max abs diff when floats mismatch).

With a third argument, also writes a machine-readable per-query record
(the driver-gate-shaped artifact) to that path — so a full local gate
run leaves a committable CORRECTNESS_local_rN.json even if the driver's
own artifact fails to materialize (the round-6 incident: the driver
wrote a literal `{}` and the round carried no signed correctness row).

Falls back to oracle_sql.partial.json when oracle_sql.json is absent
(a filtered graft.Verify dev run writes the suffixed name so it cannot
shadow a full artifact).
"""
import sys, json, glob, math, os, tempfile
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    # Bound the oracle's memory and let it SPILL instead of dying:
    # DuckDB's default limit is 80% of PHYSICAL RAM, blind to
    # co-resident JVMs — the round-9 kd2 (50k-row approx-chain)
    # adjudication grew to 68 GB next to a 53 GB Spark heap and the
    # kernel OOM-killed it (exit 137, no verdict at all). A bounded,
    # spilling oracle is also the honest posture for a gate tool on
    # a shared host. Override via GRAFT_ORACLE_MEM.
    # 64GB default: the sf0.01 hnsw_search_filtered oracle (31 levels
    # of materialized O(n^2) CTEs) peaks within ~2GB of 24, failed a
    # pin at 24 once under concurrent load, and in round 11 failed
    # pins at 32GB reproducibly even alone at 8 AND 16 threads (pinned
    # blocks can't spill; duckdb 1.0.0 working-set variance run to
    # run) while 64GB passes with room. The driver's own gate runs
    # DuckDB at its default (80% of RAM) and has always adjudicated
    # this query green — this limit only protects a LOCAL run from
    # OOM-killing a co-resident Spark JVM, and check_oracle runs after
    # graft.Verify exits, so 64GB of 125GB is safe headroom.
    mem = os.environ.get("GRAFT_ORACLE_MEM", "64GB")
    con.sql(f"SET memory_limit='{mem}'")
    # Per-process spill dir (pid-suffixed): a fixed world-shared path
    # collides when two adjudications run concurrently or another user
    # shares the host. Override via GRAFT_ORACLE_SPILL_DIR.
    spill = os.environ.get(
        "GRAFT_ORACLE_SPILL_DIR",
        os.path.join(tempfile.gettempdir(), f"graft_oracle_spill_{os.getpid()}"))
    con.sql(f"SET temp_directory='{spill}'")
    # Fewer threads directly shrink peak memory (per-thread operator
    # state) — the lever to pull when a big-fixture adjudication must
    # fit beside other work. Default 16 (not DuckDB's all-cores): the
    # sf0.01 search oracle at 32 threads peaked past 32GB and OOM'd
    # its own limit on a run where 16 threads fit with room.
    thr = os.environ.get("GRAFT_ORACLE_THREADS", "16")
    con.sql(f"SET threads={int(thr)}")
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        # partial fixtures (FixtureGen --tables, e.g. the embeddings-only
        # scale rungs) lack most tables: skip the view, so adjudicating
        # queries that never touch the absent tables still works
        if not os.path.exists(src):
            print(f"note: {t} absent in {sf_dir}; queries using it will error",
                  file=sys.stderr)
            continue
        # repo-generated fixtures (FixtureGen) are Spark part-file
        # DIRECTORIES; driver fixtures are single files — glob the dir
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
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
    oracle_path = f"{out_dir}/oracle_sql.json"
    if not os.path.exists(oracle_path):
        oracle_path = f"{out_dir}/oracle_sql.partial.json"
    oracle = json.load(open(oracle_path))
    # GRAFT_ORACLE_ONLY=a,b re-adjudicates named queries alone — for
    # re-running one heavy oracle after an environmental (memory)
    # failure without paying the other 101.
    only = os.environ.get("GRAFT_ORACLE_ONLY")
    if only:
        keep = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    fails = 0
    record = {}

    def rec(name, ok, rows=None, reason=None):
        record[name] = {"ok": ok}
        if rows is not None:
            record[name]["rows"] = rows
        if reason is not None:
            record[name]["reason"] = reason

    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            rec(name, False, reason="no spark result parquet")
            fails += 1; continue
        # Reader-unstable dtype guard: this mimic reads BOTH sides
        # through duckdb .df(), which renders DECIMAL as float64 — but
        # the driver's gate reads the Spark parquet through a reader
        # that yields Decimal OBJECTS for the same column (pyarrow), so
        # a decimal column that is value-equal here hash-mismatches at
        # the driver (the r11 dedup_stats red: rows/schema green, hash
        # red, unreproducible through any same-reader path). Fail it
        # HERE so the divergence can never reach the driver unseen.
        # schema probed through duckdb itself (DESCRIBE preserves the
        # DECIMAL type the .df() conversion would erase) — no pyarrow
        # dependency, which this mimic otherwise never needs
        dec_cols = [r[0] for r in
                    con.sql(f"DESCRIBE SELECT * FROM '{files[0]}'").fetchall()
                    if "DECIMAL" in str(r[1]).upper()]
        if dec_cols:
            print(f"FAIL {name}: decimal output column(s) {dec_cols} — "
                  "reader-unstable dtype (duckdb .df() → float64, pyarrow "
                  "→ Decimal objects); the driver's hash mismatches on "
                  "value-equal rows")
            rec(name, False, reason=f"decimal output columns: {dec_cols}")
            fails += 1; continue
        got = con.sql(f"SELECT * FROM '{files[0]}'").df()
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            rec(name, False, reason=f"oracle SQL error: {e}")
            fails += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: schema {gc} != {wc}")
            rec(name, False, reason=f"schema {gc} != {wc}")
            fails += 1; continue
        got, want = got[gc], want[wc]
        # Dtype fidelity: both sides reach pandas through the same
        # duckdb .df() conversion. Empirically (CORRECTNESS_r07/r08 vs
        # this tree's r7 verify outputs), the driver's hash is
        # insensitive to integer WIDTH (int8/int32/int64 drift is
        # hash-green across ~35 queries) but sensitive to numeric
        # FAMILY: the pagerank oracle's HUGEINT `pr` lands in pandas as
        # float64 vs Spark's int64 and hash-FAILs with rows/schema
        # green. So canonicalize each dtype to its family and fail on
        # family drift even when every value compares equal.
        def family(dt):
            k = dt.kind  # i/u -> int, f -> float, b -> bool, O -> object
            return {"i": "int", "u": "int", "f": "float"}.get(k, k)
        dtype_drift = [(c, str(got[c].dtype), str(want[c].dtype))
                       for c in gc
                       if family(got[c].dtype) != family(want[c].dtype)]
        if dtype_drift:
            drift = ", ".join(f"{c}: spark={g} oracle={w}"
                              for c, g, w in dtype_drift)
            print(f"FAIL {name}: dtype drift ({drift})")
            rec(name, False, reason=f"dtype drift: {drift}")
            fails += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            rec(name, False, reason=f"rows {len(got)} != {len(want)}")
            fails += 1; continue
        # The driver sorts rows via pandas sort_values over all columns
        # before hashing — which raises TypeError on non-empty ARRAY
        # columns (unhashable ndarray). Mimic it exactly so an
        # unsortable declared output fails HERE, not in the gate.
        try:
            got = got.sort_values(by=gc, kind="mergesort").reset_index(drop=True)
            want = want.sort_values(by=wc, kind="mergesort").reset_index(drop=True)
        except TypeError as e:
            print(f"FAIL {name}: driver-style sort errs (gate would record err): {e}")
            rec(name, False, reason=f"driver-style sort errs: {e}")
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
            rec(name, True, rows=len(got))
        else:
            print(f"FAIL {name}: value mismatch col={bad_col} max_abs_diff={max_diff}")
            rec(name, False, rows=len(got),
                reason=f"value mismatch col={bad_col} max_abs_diff={max_diff}")
            fails += 1
    if json_out:
        summary = {
            "gate": "local builder-side gate (tools/check_oracle.py)",
            "sf_dir": sf_dir,
            "n_queries": len(record),
            "n_pass": sum(1 for r in record.values() if r["ok"]),
            "n_fail": fails,
            "queries": record,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}: {summary['n_pass']}/{summary['n_queries']} pass")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
