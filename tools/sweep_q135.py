#!/usr/bin/env python3
"""Determinism sweep for q135_budget_select (dev tool).

Runs graft.Verify for q135 under varying parallelism / codegen settings,
canonicalizes each dumped parquet (sorted rows, 10-sig-digit floats — the
same canon as tools/check.py), and reports a digest per configuration plus
the DuckDB oracle digest. Any digest disagreement reproduces the driver's
round-4 hash divergence.

Usage: python3 tools/sweep_q135.py [sfdir]
"""
import hashlib
import json
import math
import os
import subprocess
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
QUERY = "q135_budget_select"
TABLES = ["documents"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, list):
        return "[" + ",".join(str(canon(x)) for x in v) + "]"
    return str(v)


def digest(rows, cols):
    perm = [cols.index(c) for c in sorted(cols)]
    canon_rows = sorted(tuple(canon(r[i]) for i in perm) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(("\x1f".join(r) + "\n").encode())
    return h.hexdigest()[:16]


def run_config(sfdir, outdir, env_extra, jvm_props):
    # runMain executes in the sbt JVM, so spark.* system properties passed
    # via SBT_OPTS reach SparkConf (which loads sys.props) directly.
    env = dict(os.environ, **env_extra)
    if jvm_props:
        env["SBT_OPTS"] = (env.get("SBT_OPTS", "") + " " +
                           " ".join(f"-D{k}={v}" for k, v in jvm_props.items())).strip()
    cmd = ["sbt", "-batch", f"runMain graft.Verify {sfdir} {outdir} {QUERY}"]
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, env=env)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:])
        return False
    return True


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sfdir}/{t}.parquet')")
    oracle = json.loads(Path("/tmp/graft_verify/oracle_sql.json").read_text())[QUERY]
    exp = con.execute(oracle).fetchall()
    ecols = [d[0] for d in con.description]
    print(f"oracle          {digest(exp, ecols)}  ({len(exp)} rows)")

    configs = [
        ("cpus=4 (default)", {"SPARK_GRAFT_CPUS": "4"}, {}),
        ("cpus=1", {"SPARK_GRAFT_CPUS": "1"}, {}),
        ("cpus=32", {"SPARK_GRAFT_CPUS": "32"}, {}),
        ("cpus=4 nocodegen", {"SPARK_GRAFT_CPUS": "4"},
         {"spark.sql.codegen.wholeStage": "false"}),
        ("cpus=32 interp", {"SPARK_GRAFT_CPUS": "32"},
         {"spark.sql.codegen.wholeStage": "false",
          "spark.sql.codegen.factoryMode": "NO_CODEGEN"}),
    ]
    seen = {}
    for label, env_extra, props in configs:
        outdir = f"/tmp/graft_sweep_{label.split()[0].replace('=', '')}_{len(seen)}"
        ok = run_config(sfdir, outdir, env_extra, props)
        if not ok:
            print(f"{label:18s} RUN-FAILED")
            continue
        rows = con.execute(
            f"SELECT * FROM parquet_scan('{outdir}/{QUERY}/*.parquet')").fetchall()
        cols = [d[0] for d in con.description]
        d = digest(rows, cols)
        seen[label] = d
        print(f"{label:18s} {d}  ({len(rows)} rows)")
    uniq = set(seen.values())
    print("DIVERGENT" if len(uniq) > 1 else "ALL-IDENTICAL",
          "| matches-oracle:" , uniq == {digest(exp, ecols)} if len(uniq) == 1 else False)


if __name__ == "__main__":
    main()
