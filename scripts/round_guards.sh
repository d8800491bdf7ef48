#!/usr/bin/env bash
# The COMPLETE per-round guard battery in one command (round-16 verdict
# task 4): everything the round's standing adjudications say must run each
# round, so nothing depends on remembering it.
#
#   1. scripts/judge.sh        — Verify gate -> DuckDB oracle -> sbt test
#                                (the driver's correctness loop, replicated)
#   2. scripts/clone_probe.sh  — the clone-regime dedup mass guard (r14
#                                repartition-before-distinct fix + banded
#                                lanes' partial-agg health; masses must
#                                reproduce round over round TO THE DIGIT)
#   3. q21 isolation probe     — cross-round DECADE comparisons use
#                                isolated probes, never in-battery numbers
#                                (r16 adjudication: single-battery rows
#                                carry a ~1.5x position/cache term). Runs
#                                only when the canonical sf100 corpus is
#                                already present WITH its provenance
#                                marker; generating 100+ GB is a deliberate
#                                act, not a side effect of a guard script.
#
# Usage: scripts/round_guards.sh [roundTag]       e.g. scripts/round_guards.sh r17
# Artifacts (comparable across rounds, keyed by tag):
#   bench/<tag>_clone_probe{,_control}.json
#   bench/<tag>_q21_sf100_iso.jsonl                (3 isolated runs, if sf100 present)
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND=${1:-adhoc}
SCALE=${SPARK_GRAFT_SCALE_DIR:-target/scale}

echo "== round_guards 1/3: judge replica (Verify -> oracle -> sbt test)"
scripts/judge.sh

echo "== round_guards 2/3: clone-regime dedup probe"
scripts/clone_probe.sh "$ROUND"

echo "== round_guards 3/3: q21 sf100 isolation probe"
if [ -f "$SCALE/sf100/_GRAFT_SCALEGEN.json" ]; then
  # APPEND, never truncate: each line carries commit + code_fp, and a
  # same-tag re-run (e.g. a final-tree battery after a late edit) must
  # accumulate bands, not erase the earlier ones (the r17 q21 two-band
  # observation only survived because git had the morning rows)
  ISO="bench/${ROUND}_q21_sf100_iso.jsonl"
  for i in 1 2 3; do
    OUT="/tmp/graft_q21_iso_$i.json"
    SPARK_GRAFT_SF_DIR="$SCALE/sf100" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=256 SPARK_GRAFT_ONLY=q21_waiting_suppliers \
    SPARK_GRAFT_BENCH_OUT="$OUT" \
      scripts/run_main.sh graft.Bench >/dev/null
    cat "$OUT" >> "$ISO"
  done
  echo "[round_guards] q21 isolated runs -> $ISO:"
  grep -o '"q21_waiting_suppliers":[0-9.]*' "$ISO"
else
  echo "[round_guards] SKIP: no canonical sf100 corpus at $SCALE/sf100" \
       "(marker absent) — generate it first (canonical x100 -> x10 chain):" \
       "scripts/run_main.sh graft.ScaleGen /root/testdata/sf0.1 $SCALE/sf10 100 &&" \
       "scripts/run_main.sh graft.ScaleGen $SCALE/sf10 $SCALE/sf100 10"
fi

echo "== round_guards: ALL GREEN"
