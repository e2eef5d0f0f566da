#!/usr/bin/env python3
"""sf1 oracle-parity sweep (dev tool): selfcheck.py's hash gate with a
PER-ORACLE subprocess timeout, so quadratic-by-design oracles report
TIMEOUT instead of stalling the whole sweep. Usage:

  python3 tools/sf1_sweep.py <sf_dir> <verify_out_dir> [timeout_sec] [only_prefixes]
"""
import glob
import hashlib
import json
import math
import multiprocessing as mp
import os
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if v == 0:
            v = 0.0
        return repr(round(v, 9))
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def oracle_worker(sf_dir, sql, q):
    try:
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        rows = con.execute(sql).fetchall()
        cols = [d[0] for d in con.description]
        q.put(("ok", cols, len(rows), table_hash(rows, cols)))
    except Exception as e:
        q.put(("err", str(e)[:300], 0, ""))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    only = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    results = {}
    names = sorted(n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n)))
    if only:
        names = [n for n in names if any(n.startswith(p) for p in only)]
    for name in names:
        print(f"[sweep] {name} ...", file=sys.stderr, flush=True)
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = con.execute("SELECT * FROM read_parquet(?)", [files]).fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(got)})"
            continue
        q = mp.Queue()
        proc = mp.Process(target=oracle_worker,
                          args=(sf_dir, oracles[name], q))
        proc.start()
        proc.join(timeout)
        if proc.is_alive():
            proc.terminate()
            proc.join(5)
            results[name] = f"TIMEOUT({timeout}s)"
            continue
        if q.empty():
            results[name] = "ORACLE_CRASH"
            continue
        status, cols_or_err, nrows, ohash = q.get()
        if status == "err":
            results[name] = f"ORACLE_ERROR: {cols_or_err}"
        elif sorted(got_cols) != sorted(cols_or_err):
            results[name] = (f"SCHEMA_MISMATCH spark={sorted(got_cols)} "
                             f"duck={sorted(cols_or_err)}")
        elif len(got) != nrows:
            results[name] = f"ROWCOUNT {len(got)} vs {nrows}"
        elif table_hash(got, got_cols) != ohash:
            results[name] = "HASH_MISMATCH"
        else:
            results[name] = f"OK({len(got)})"
    npass = sum(1 for v in results.values()
                if v.startswith(("OK", "ROWS_ONLY")))
    for k, v in results.items():
        tag = "PASS" if v.startswith(("OK", "ROWS_ONLY")) else "FAIL"
        print(f"{tag} {k}: {v}")
    print(f"\n{npass}/{len(results)} pass  (duckdb {duckdb.__version__}, "
          f"timeout {timeout}s)")
    return 0 if npass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
