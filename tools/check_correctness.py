#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_correctness.py [sfDir] [outDir] [--skip-verify]

1. Runs `sbt runMain graft.Verify <sfDir> <outDir>` (unless --skip-verify).
2. Registers each testdata parquet as a DuckDB view named after the table.
3. Runs every oracle_sql.json entry, compares to the Spark result parquet:
   columns sorted by name, rows sorted by all columns, exact cell compare
   (with a report of near-miss float cells).

Not part of the shipped library — developer tooling only (duckdb is
driver-side/dev-side, per the environment contract).
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", capture_output=True, text=True)
        sys.stdout.write(r.stdout[-3000:])
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-3000:])
            print("VERIFY RUN FAILED")
            return 1

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_path = f"{out_dir}/{name}"
        if not Path(res_path).exists():
            print(f"FAIL {name}: no Spark result written")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{res_path}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(got, want)
        if ok:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


def compare(got, want):
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return False, f"columns differ: spark={gc} oracle={wc}"
    got = got[gc]
    want = want[wc]
    if len(got) != len(want):
        return False, f"rowcount differs: spark={len(got)} oracle={len(want)}"
    if len(got) == 0:
        return True, ""
    got = got.sort_values(by=gc, ignore_index=True)
    want = want.sort_values(by=wc, ignore_index=True)
    for c in gc:
        for i, (a, b) in enumerate(zip(got[c], want[c])):
            if cell_eq(a, b):
                continue
            near = ""
            try:
                if abs(float(a) - float(b)) < 1e-6 * max(1, abs(float(b))):
                    near = " (NEAR MISS — float noise; add rounding)"
            except (TypeError, ValueError):
                pass
            return False, f"col {c} row {i}: spark={a!r} oracle={b!r}{near}"
    return True, ""


def cell_eq(a, b):
    a_nan = isinstance(a, float) and math.isnan(a)
    b_nan = isinstance(b, float) and math.isnan(b)
    if a_nan or b_nan:
        return a_nan and b_nan
    if a is None or b is None:
        return (a is None or a != a) and (b is None or b != b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


if __name__ == "__main__":
    sys.exit(main())
