#!/usr/bin/env python3
"""Convert a full check.py run at sf0.1 into a driver-shaped correctness
artifact (the CORRECTNESS_r{N}.json schema), so the round commits a
machine-checkable full-SF typed-gate record instead of a prose claim.

Usage: python3 scripts/sf01_artifact.py <check_output.txt> <verify_outDir> <out.json> [only1,only2,...]

The optional 4th argument (or GRAFT_ARTIFACT_ONLY env var) names the
query subset a FILTERED check run covered (r16 ADVICE: the declared-set
validation compared against every dump directory, so an ONLY-filtered
check log exited 2 with false "missing" errors). With a filter, the
exact-coverage check runs against the intersection of the declared set
and the filter; full runs keep the exact full-coverage check.

check.py line forms parsed:
  OK  <name>                         -> all three matches true
  FAIL <name> - <why>                -> err recorded, matches false
  ROWS <name>: <n>                   -> rows-only (no oracle): spark_rows only
Row counts for OK/FAIL oracled queries are read from the verify dump's
parquet (spark side); oracle_rows is reported equal on OK (check.py
compared them row-by-row) and None on FAIL (the compare stops at the
first divergence, so no trustworthy count exists).

Hardened (r15 verdict item 7): the parsed names are validated against
the DECLARED query set (the verify dump's per-query directories plus
errors.json keys — everything Verify attempted). A truncated check log
or a regex drift that silently drops queries now exits non-zero naming
the missing/unknown entries, instead of emitting a shorter artifact
that reads as green. Each entry records its provenance (which check.py
line form produced it, from which input file).
"""
import json
import re
import sys
from pathlib import Path

import duckdb

txt, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
only = (sys.argv[4] if len(sys.argv) > 4
        else __import__("os").environ.get("GRAFT_ARTIFACT_ONLY", ""))
only = {q for q in only.split(",") if q}
# r17 ADVICE: a filtered run must not be able to masquerade as full
# typed-gate evidence — the committed round artifacts are full runs by
# contract, so refuse the CORRECTNESS_SF01_* name outright when a filter
# is active, and stamp any other filtered output (below) so the narrowed
# coverage is visible in the artifact itself, not only in the query count.
if only and Path(out_json).name.startswith("CORRECTNESS_SF01"):
    print("ERROR: refusing to write a FILTERED artifact to a "
          f"CORRECTNESS_SF01_* path ({out_json}); filtered runs are not "
          "full typed-gate evidence", file=sys.stderr)
    sys.exit(2)
con = duckdb.connect()


def spark_rows(name):
    d = Path(out_dir) / name
    if not d.exists():
        return None
    try:
        return con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
    except Exception:
        # a rows-only FAIL line exists precisely because this read raised
        # in check.py (empty dir, corrupt parquet) — record no count
        # instead of dying in a traceback before the artifact is written
        return None


def declared_queries():
    """Everything Verify attempted: one dump dir per succeeded query,
    one errors.json key per failed one. This is the ground truth the
    parsed check log must cover exactly."""
    dirs = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    errs_file = Path(out_dir) / "errors.json"
    errs = set(json.loads(errs_file.read_text())) if errs_file.exists() else set()
    return dirs | errs, errs


result = {}
for line in Path(txt).read_text().splitlines():
    m = re.match(r"OK\s+(\S+)\s*$", line)
    if m:
        n = spark_rows(m.group(1))
        result[m.group(1)] = {
            "rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": n, "oracle_rows": n, "err": None,
            "provenance": f"check:OK <- {txt}"}
        continue
    # FAIL forms check.py actually emits (all four):
    #   FAIL <name> — <why>
    #   FAIL <name> — ENGINE ERROR: <msg>
    #   FAIL <name> (rows-only): <why>
    #   FAIL <name> (rows-only) — ENGINE ERROR: <msg>
    m = re.match(r"FAIL\s+(\S+)(\s+\(rows-only\))?\s*(?:[—-]+|:)\s*(.*)$",
                 line)
    if m:
        rows_only = bool(m.group(2))
        result[m.group(1)] = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": spark_rows(m.group(1)), "oracle_rows": None,
            "err": ("rows-only: " if rows_only else "") + m.group(3)[:500],
            "provenance": f"check:FAIL{' (rows-only)' if rows_only else ''}"
                          f" <- {txt}"}
        continue
    m = re.match(r"ROWS\s+(\S+):\s+(\d+)\s*$", line)
    if m:
        result[m.group(1)] = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": int(m.group(2)), "oracle_rows": None,
            "err": "no_oracle",
            "provenance": f"check:ROWS <- {txt}"}

declared, verify_errs = declared_queries()
if only:
    # a filtered check run only covers `only` — validate against that
    # slice, but still reject names outside the FULL declared set
    bogus = sorted(only - declared)
    if bogus:
        print(f"ERROR: filter names not in the declared set: "
              f"{', '.join(bogus[:10])}", file=sys.stderr)
        sys.exit(2)
    declared = declared & only
missing = sorted(declared - set(result))
unknown = sorted(set(result) - declared)
if missing or unknown:
    if missing:
        print(f"ERROR: {len(missing)} declared queries absent from the "
              f"check log (truncated log?): {', '.join(missing[:10])}"
              f"{' ...' if len(missing) > 10 else ''}", file=sys.stderr)
    if unknown:
        print(f"ERROR: {len(unknown)} parsed names not in the declared set "
              f"(parser/regex drift?): {', '.join(unknown[:10])}"
              f"{' ...' if len(unknown) > 10 else ''}", file=sys.stderr)
    sys.exit(2)

out = dict(sorted(result.items()))
if only:
    # reserved marker key: a subset artifact names its subset
    out["__filtered"] = sorted(only)
Path(out_json).write_text(json.dumps(out, indent=1))
ok = sum(1 for v in result.values() if v["hash_match"])
rows_only = sum(1 for v in result.values() if v["err"] == "no_oracle")
fails = len(result) - ok - rows_only
print(f"{out_json}: {len(result)} queries — {ok} hashed-OK, "
      f"{rows_only} rows-only, {fails} FAIL")
sys.exit(1 if fails else 0)
