#!/usr/bin/env bash
# Round preflight: every engine-level sweep that is too heavy for
# `sbt test` but should be green before a round ends. Each probe exits
# nonzero on failure; the script stops at the first red.
#
#   tools/preflight.sh            # all sweeps (~10 min)
#
# Individual probes:
#   RobustnessProbe  empty|nulls|ragged|both   degenerate corpora, all 199 queries
#   ConcurrencyProbe [threads] [rounds]        racing one session
#   SkewProbe        [replicas]                hot-key join + mitigations (asserts skew=true)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== robustness: empty + nulls + ragged (199 queries x 3 corpora) =="
sbt -batch "runMain graft.tools.RobustnessProbe both" 2>/dev/null | grep -E "^==|FAIL"

echo "== concurrency: 8 threads x 3 rounds =="
sbt -batch "runMain graft.tools.ConcurrencyProbe" 2>/dev/null | grep -E "\[conc\]|FAIL"

echo "== skew: straggler vs AQE split vs salting =="
sbt -batch "runMain graft.tools.SkewProbe" 2>/dev/null | grep -E "\[skew\]"

echo "== preflight green =="
