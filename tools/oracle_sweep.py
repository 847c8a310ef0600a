#!/usr/bin/env python3
"""Offline oracle sweep for large SFs (the guard-lifted protocol).

Usage:
  python3 tools/oracle_sweep.py <sf_dir> <verify_out_dir>
      [--artifact <json>] [--timeout <sec>] [--mem 48GB] [--threads 24]
      [--only q1 q2 ...] [--retry-failed]

The driver's correctness gate runs at sf0.01 under `SparkEntry.
OracleMemGuard` (2GB/2 threads) because it shares a box with resident
Spark JVMs. An OFFLINE sweep on a quiet box can lift that guard: this
tool strips the per-oracle `SET memory_limit/threads` prefix and runs
each oracle in its OWN subprocess under a configurable budget (default
48GB / 24 threads) with a hard wall-clock timeout, then compares against
the Verify dump exactly as tools/local_verify.py does (row count, sorted
column names, exact values).

Results accumulate in the artifact JSON (default <verify_out_dir>/
sweep_results.json): re-runs skip queries already OK, so a long sweep is
resumable and can be extended query-by-query across sessions. TIMEOUT
rows record that the ORACLE (DuckDB) hit its budget — the oracle's
scaling limit, not the engine's; they are reported separately from
FAIL (a value mismatch, which is engine-side evidence and fatal).

Subprocess isolation is what makes the timeout honest: DuckDB holds the
GIL inside a query, so an in-process timer cannot interrupt it — the
worker is killed by process group instead.
"""
import json
import os
import re
import subprocess
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

GUARD_RE = re.compile(r"^(?:\s*SET\s+[^;]+;)+\s*", re.IGNORECASE)


def worker(sf_dir: str, out_dir: str, name: str, mem: str, threads: int) -> int:
    """Run ONE oracle and compare; exit 0 ok / 2 mismatch / 3 error."""
    import duckdb
    import pandas as pd

    def norm(df):
        df = df[sorted(df.columns)].reset_index(drop=True)
        for c in df.columns:
            if df[c].dtype == object:
                continue
            if str(df[c].dtype).startswith("float"):
                df[c] = df[c].astype("float64").round(6)
            elif str(df[c].dtype).startswith(("int", "uint", "Int")):
                df[c] = df[c].astype("int64")
        return df

    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    sql = GUARD_RE.sub("", sql)  # lift the per-oracle mem guard
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET threads={threads}")
    con.execute("SET temp_directory='/tmp/graft_duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    try:
        got = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as exc:
        print(f"ERROR {name}: spark output unreadable: {exc}")
        return 3
    try:
        exp = con.execute(sql).df()
    except Exception as exc:
        print(f"ERROR {name}: oracle error: {str(exc)[:300]}")
        return 3
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        print(f"MISMATCH {name}: columns {list(g.columns)} != {list(e.columns)}")
        return 2
    if len(g) != len(e):
        print(f"MISMATCH {name}: rows {len(g)} != {len(e)}")
        return 2
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
    except AssertionError as exc:
        print(f"MISMATCH {name}: values differ: {str(exc)[:400]}")
        return 2
    print(f"OK {name}: {len(g)} rows")
    return 0


def main() -> int:
    args = sys.argv[1:]
    if "--worker" in args:
        i = args.index("--worker")
        name = args[i + 1]
        sf_dir, out_dir = args[0], args[1]
        mem = args[args.index("--mem") + 1]
        threads = int(args[args.index("--threads") + 1])
        return worker(sf_dir, out_dir, name, mem, threads)

    sf_dir, out_dir = args[0], args[1]

    def opt(flag, default):
        return args[args.index(flag) + 1] if flag in args else default

    artifact = opt("--artifact", f"{out_dir}/sweep_results.json")
    timeout = int(opt("--timeout", "2700"))
    mem = opt("--mem", "48GB")
    threads = opt("--threads", "24")
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = [a for a in args[i + 1:] if not a.startswith("--")]
    retry_failed = "--retry-failed" in args

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    if os.path.exists(artifact):
        results = json.load(open(artifact))
    todo = sorted(only if only else oracle.keys())
    skip_states = {"ok"} if retry_failed else {"ok", "mismatch", "error"}
    for name in todo:
        if name not in oracle:
            print(f"SKIP {name}: not in oracle_sql.json")
            continue
        prev = results.get(name, {})
        if prev.get("status") in skip_states:
            print(f"SKIP {name}: already {prev['status']} "
                  f"({prev.get('seconds', '?')}s)")
            continue
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, __file__, sf_dir, out_dir, "--worker", name,
                 "--mem", mem, "--threads", threads],
                timeout=timeout, capture_output=True, text=True)
            status = {0: "ok", 2: "mismatch", 3: "error"}.get(
                proc.returncode, f"exit{proc.returncode}")
            detail = (proc.stdout + proc.stderr).strip()[-400:]
        except subprocess.TimeoutExpired:
            status, detail = "timeout", f"oracle exceeded {timeout}s"
        secs = round(time.time() - t0, 1)
        results[name] = {"status": status, "seconds": secs, "detail": detail}
        print(f"{status.upper():8s} {name} ({secs}s)")
        json.dump(results, open(artifact, "w"), indent=1)

    counts = {}
    for name in (only if only else oracle.keys()):
        st = results.get(name, {}).get("status", "unattempted")
        counts[st] = counts.get(st, 0) + 1
    print("summary:", json.dumps(counts))
    return 1 if counts.get("mismatch", 0) else 0


if __name__ == "__main__":
    sys.exit(main())
