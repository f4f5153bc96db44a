#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs `sbt runMain graft.Verify <sfDir> <outDir>` output against the DuckDB
oracle: for each query, loads the engine's parquet result and the oracle SQL
result, sorts columns by name, and compares schemas + values exactly.

Usage: python3 scripts/check.py [sfDir] [outDir] [--skip-verify] [query ...]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
FLAGS = [a for a in sys.argv[3:] if a.startswith("--")]
ONLY = [a for a in sys.argv[3:] if not a.startswith("--")]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    # pass an ONLY selection through to Verify's query filter so targeted
    # local checks dump only what they compare (full dumps are ~20 min at
    # sf0.1; the driver always runs the unfiltered two-arg form)
    filt = f" {','.join(ONLY)}" if ONLY else ""
    cmd = ["sbt", f'runMain graft.Verify {SF_DIR} {OUT_DIR}{filt}']
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        sys.exit(1)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def arrow_sig(t):
    """Canonical signature for an Arrow type, collapsing only the
    encoding-level variants the driver's typed hash is insensitive to
    (string vs large_string, list vs large_list). Everything else —
    notably decimal128 vs int64, the r12 failure mode where DuckDB's
    sum() promoted BIGINT to HUGEINT — must match exactly."""
    import pyarrow as pa
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_sig(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{arrow_sig(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def type_mismatches(mine_schema, oracle_schema):
    """Column-name → (engine, oracle) Arrow-type signature diffs. The
    driver hashes the Arrow-typed encoding, so value-equal results with
    different types (int64 vs decimal128) still hash-FAIL there; this
    makes the local gate fail the same way.

    Deliberately STRICTER than the driver on integer width (int32 vs
    int64 passed the driver's r12 hash but fails here): a width-only
    diff costs one CAST in the oracle and keeps every oracle
    byte-faithful, so the safe failure direction — local FAIL, driver
    pass — is accepted."""
    mt = {f.name: arrow_sig(f.type) for f in mine_schema}
    ot = {f.name: arrow_sig(f.type) for f in oracle_schema}
    return {c: (mt[c], ot[c]) for c in sorted(set(mt) & set(ot))
            if mt[c] != ot[c]}


def compare(name, sql, con):
    res_dir = Path(OUT_DIR) / name
    if not res_dir.exists():
        return f"MISSING (no engine output at {res_dir})"
    try:
        mine = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        mine_cols = sorted(mine.columns)
        mine_rows = con.sql(
            f"SELECT {', '.join(q(c) for c in mine_cols)} FROM '{res_dir}/*.parquet'"
        ).fetchall()
    except Exception as e:
        return f"ENGINE READ FAIL: {e}"
    try:
        oracle = con.sql(sql)
        o_cols = sorted(oracle.columns)
        o_rows = con.sql(
            f"SELECT {', '.join(q(c) for c in o_cols)} FROM ({sql})"
        ).fetchall()
    except Exception as e:
        return f"ORACLE FAIL: {e}"
    if mine_cols != o_cols:
        return f"SCHEMA MISMATCH: engine {mine_cols} vs oracle {o_cols}"
    try:
        diffs = type_mismatches(
            con.sql(f"SELECT * FROM '{res_dir}/*.parquet' LIMIT 0")
               .arrow().schema,
            con.sql(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema)
    except Exception as e:
        return f"TYPE CHECK FAIL: {e}"
    if diffs:
        pretty = ", ".join(f"{c}: engine {a} vs oracle {b}"
                           for c, (a, b) in diffs.items())
        return f"TYPE MISMATCH (driver typed-hash would FAIL): {pretty}"
    if len(mine_rows) != len(o_rows):
        return f"ROWCOUNT MISMATCH: engine {len(mine_rows)} vs oracle {len(o_rows)}"
    for i, (a, b) in enumerate(zip(mine_rows, o_rows)):
        na, nb = tuple(map(norm, a)), tuple(map(norm, b))
        if na != nb:
            return f"VALUE MISMATCH at row {i}: engine {na} vs oracle {nb}"
    return None


def q(c):
    return '"' + c.replace('"', '""') + '"'


def main():
    if "--skip-verify" not in FLAGS:
        run_verify()
    oracles = json.loads(Path(OUT_DIR, "oracle_sql.json").read_text())
    err_path = Path(OUT_DIR, "errors.json")
    engine_errors = json.loads(err_path.read_text()) if err_path.exists() else {}
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    names = [n for n in ONLY if n in oracles] if ONLY else sorted(oracles)
    failed = 0
    for name in names:
        if name in engine_errors:
            print(f"FAIL {name} — ENGINE ERROR: {engine_errors[name]}")
            failed += 1
            continue
        err = compare(name, oracles[name], con)
        status = "OK " if err is None else "FAIL"
        print(f"{status} {name}" + (f" — {err}" if err else ""))
        failed += err is not None
    # rows-only queries (no oracle): just check output exists and has rows.
    # Skip names in engine_errors (reported once below, not twice from a
    # stale output dir) and respect an ONLY selection.
    for d in sorted(Path(OUT_DIR).iterdir()):
        if (d.is_dir() and d.name not in oracles
                and d.name not in engine_errors
                and (not ONLY or d.name in ONLY)):
            try:
                n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
                print(f"ROWS {d.name}: {n}")
            except Exception as e:
                print(f"FAIL {d.name} (rows-only): {e}")
                failed += 1
    for name, msg in engine_errors.items():
        if name not in oracles and (not ONLY or name in ONLY):
            # rows-only query that never produced output
            print(f"FAIL {name} (rows-only) — ENGINE ERROR: {msg}")
            failed += 1
    print(f"\n{len(names) - failed}/{len(names)} oracle queries pass")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
