#!/usr/bin/env bash
# Smoke-checks the OTHER half of the bench framing contract that
# BenchFramingSpec can't see: the sbt plumbing (`run / outputStrategy :=
# StdoutOutput`, `showSuccess := false`, Spark logging at ERROR) that
# makes the bare JSON the LAST stdout line of `sbt runMain graft.Bench`
# — exactly what the driver tail-captures. Run from the repo root:
#
#   tools/bench_smoke.sh [sf-dir] [only-list]
#
# Defaults to a 3-query subset on sf0.001 (~1 min). Exits nonzero if
# the last stdout line is not parseable bench JSON or exceeds 1500 chars.
set -euo pipefail
SF="${1:-/root/testdata/sf0.001}"
ONLY="${2:-q01_project,q03_join_inner,l01_dedup_exact}"

last=$(SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_ONLY="$ONLY" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | tail -1)

python3 - "$last" <<'EOF'
import json, sys
line = sys.argv[1]
assert len(line) <= 1500, f"bench line is {len(line)} chars (>1500)"
d = json.loads(line)  # raises if the tail line isn't the bare JSON
assert d["metric"] == "total" and d["n_queries"] > 0, d
print(f"bench_smoke OK: {d['n_queries']} queries, total {d['value']}s, "
      f"line {len(line)} chars")
EOF
