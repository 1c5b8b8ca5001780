#!/usr/bin/env python3
"""Canonicalization-hazard audit for gate outputs (dev tool only).

Round 5 post-mortem: 25 gates were driver-red while byte-identical to the
oracle under check.py's fetchall()-based strict compare. The separating
feature — perfect 25/25 vs 224/224 on the r5 registry — was the ORACLE
result dtype: any final output column DuckDB types as HUGEINT/DECIMAL
(e.g. bare `SUM(bigint_col)` returns HUGEINT) reaches the driver's
arrow/pandas-based fetch as decimal128/float and canonicalizes
differently from Spark's int64, even though fetchall() converts both to
identical Python ints. Doubles (121 green gates), booleans (23 green)
and newline-bearing strings (q183 green) were all exonerated.

Rule enforced here, on every oracled gate:
  FAIL  oracle output column typed decimal*/int128/uint* (cast ::BIGINT)
  FAIL  oracle/spark type-CLASS mismatch (int vs float vs bool vs str)
        — width differences (int32 vs int64) are tolerated, the r5 green
        set proves the driver accepts those
  WARN  spark doubles containing NaN or -0.0 (Cross.r6 normalizes sign;
        a NaN in an output column is almost certainly a bug)

Usage: python3 tools/canon_audit.py [dumpdir]   (default /tmp/graft_verify)
Exits 1 on any FAIL.
"""
import json
import math
import sys
from pathlib import Path


def type_class(t: str) -> str:
    t = t.lower()
    if "decimal" in t or "int128" in t or t.startswith("uint"):
        return "HAZARD"
    if "int" in t:
        return "int"
    if "float" in t or "double" in t or t == "halffloat":
        return "float"
    if t == "bool":
        return "bool"
    if "string" in t or "utf8" in t or "varchar" in t:
        return "str"
    if "timestamp" in t or "date" in t:
        return "time"
    if t.startswith("list") or t.startswith("large_list"):
        return "list"
    return t


def oracle_schema(con, sql: str):
    """Arrow schema of the oracle query — the dtypes the driver's fetch
    sees. LIMIT 0 keeps it cheap."""
    return con.execute(f"SELECT * FROM ({sql}) LIMIT 0").fetch_arrow_table().schema


def audit_gate(name: str, dumpdir: Path, sql, con):
    """Returns (fails, warns) message lists for one gate."""
    import pyarrow.parquet as pq
    fails, warns = [], []
    files = sorted((dumpdir / name).glob("*.parquet"))
    if not files:
        return ([f"{name}: no dumped parquet"], [])
    sschema = pq.read_schema(files[0])
    sclass = {f.name: type_class(str(f.type)) for f in sschema}
    if sql is not None:
        try:
            oschema = oracle_schema(con, sql)
        except Exception as e:  # oracle error surfaces in compare, not here
            return ([], [f"{name}: oracle unschemable: {e}"])
        for f in oschema:
            oc = type_class(str(f.type))
            sc = sclass.get(f.name)
            if oc == "HAZARD":
                fails.append(f"{name}: oracle col '{f.name}' has driver-hazard "
                             f"dtype {f.type} — cast it (::BIGINT) in the oracle SQL")
            elif sc is not None and sc != oc:
                fails.append(f"{name}: type-class mismatch on '{f.name}': "
                             f"spark={sc} oracle={oc}")
    # value-level warnings on the spark dump
    tbl = pq.read_table(files[0])
    for f in tbl.schema:
        tc = type_class(str(f.type))
        if tc == "float":
            vals = tbl.column(f.name).to_pylist()
            if any(v is not None and isinstance(v, float) and math.isnan(v) for v in vals):
                warns.append(f"{name}: spark col '{f.name}' contains NaN")
            if any(v is not None and v == 0.0 and math.copysign(1.0, v) < 0 for v in vals):
                warns.append(f"{name}: spark col '{f.name}' contains -0.0")
    return (fails, warns)


def main():
    import duckdb
    dumpdir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify")
    oracle = json.loads((dumpdir / "oracle_sql.json").read_text())
    sfdir = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"parquet_scan('{sfdir}/{t}.parquet')")
    nfail = 0
    for d in sorted(p for p in dumpdir.iterdir() if p.is_dir()):
        fails, warns = audit_gate(d.name, dumpdir, oracle.get(d.name), con)
        for m in fails:
            print("FAIL", m)
        for m in warns:
            print("warn", m)
        nfail += len(fails)
    print(f"canon_audit: {nfail} failures")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
