#!/usr/bin/env python3
"""Assemble SCALE_CORE_r{N}.json from ScaleSmoke core/coreskew/corepressure
stdout logs, so the round commits machine-readable scale evidence instead
of prose.

Usage: scale_core_artifact.py <out.json> <label>=<log> [<label>=<log> ...]

Parses `SCALE <tag> <sec> s` timing lines and the `SCALE   <assertion>`
result lines (plant/ratio/invariant/engagement notes) from each log into
one run object per label. Exits non-zero if a log contains no SCALE lines
(wrong file) so a truncated log cannot silently produce an empty artifact.
"""
import json
import re
import sys
from pathlib import Path

out, runs = sys.argv[1], sys.argv[2:]
doc = {
    "stage": "ScaleSmoke core/coreskew/corepressure",
    "base": "sf0.1 replicated with key-shifting (32-file writes; r17)",
    "invariant": ("q08 per-group count and sum_qty exactly mult x sf0.1; "
                  "PlanAudit.violations empty per query; coreskew: 20% hot-key "
                  "plant verified, AQE skew-split engaged, saltedJoin row-equal, "
                  "latestWinsAgg == latestWins, MERGE counts exact"),
    "runs": {},
}
for spec in runs:
    label, log = spec.split("=", 1)
    if label in doc["runs"]:
        # a duplicate label would silently overwrite an earlier run and the
        # committed evidence would lack one of the runs the round claims
        print(f"ERROR: duplicate run label '{label}'", file=sys.stderr)
        sys.exit(2)
    timings, notes = {}, []
    for line in Path(log).read_text(errors="replace").splitlines():
        m = re.search(r"SCALE (\S+)\s+([0-9.]+) s\s*$", line)
        if m:
            timings[m.group(1)] = float(m.group(2))
            continue
        m = re.search(r"SCALE   (.+)$", line)
        if m:
            notes.append(m.group(1).strip())
    if not timings and not notes:
        print(f"ERROR: no SCALE lines in {log}", file=sys.stderr)
        sys.exit(2)
    doc["runs"][label] = {"timings_sec": timings, "notes": notes}
Path(out).write_text(json.dumps(doc, indent=1) + "\n")
print(f"{out}: {len(doc['runs'])} runs, "
      f"{sum(len(r['timings_sec']) for r in doc['runs'].values())} timings")
