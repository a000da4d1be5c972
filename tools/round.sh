#!/usr/bin/env bash
# Round routine: the per-round gate + bench sequence, so scale
# regressions surface the round they land (VERDICT r7 "Next round" #4).
#
#   tools/round.sh            # sf0.01 gate + sf0.1 bench (quick loop)
#   tools/round.sh --sf1      # ALSO regenerate testdata_sf1, run the
#                             # 10x gate and the sf1 bench
#
# Artifacts land in the repo root: CORRECTNESS_local.json,
# bench_out.json (sf0.1), CORRECTNESS_sf1.json, bench_sf1.json.
# Compare bench totals across rounds via the __calibration line
# (fixed CPU probe): normalized = value * (cal_ref / cal_run).
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-32}"
XMX="${GRAFT_XMX:-48g}"
# Verify runs the whole 200+-query suite in ONE JVM whose heap also
# holds local-mode executor storage (all the session memos); at sf1 the
# 8g default OOMed once the round-9 shared-decode caches landed.
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}"

echo "== install commit guard (Test/compile pre-commit hook) =="
tools/install-hooks.sh

echo "== sbt test =="
sbt -batch test

echo "== sf0.01 correctness gate =="
python3 tools/localverify.py /root/testdata/sf0.01 /tmp/graft_round_verify \
  --json CORRECTNESS_local.json --workers 4

echo "== sf0.1 bench =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$CPUS" \
  GRAFT_XMX="$XMX" tools/runmain.sh graft.Bench

if [[ "${1:-}" == "--sf1" ]]; then
  echo "== regenerate testdata_sf1 (deterministic 10x) =="
  rm -rf testdata_sf1
  SPARK_GRAFT_CPUS="$CPUS" GRAFT_XMX="$XMX" \
    tools/runmain.sh graft.ScaleUp /root/testdata/sf0.1 \
    "$(pwd)/testdata_sf1" 10

  echo "== sf1 correctness gate (10x) =="
  # 4 compare workers: the sf1 DuckDB+canonicalization phase is CPU-bound
  # per query (hours single-process, ~25 min fanned out)
  python3 tools/localverify.py "$(pwd)/testdata_sf1" /tmp/graft_round_sf1 \
    --json CORRECTNESS_sf1.json --workers 4

  echo "== sf1 bench =="
  SPARK_GRAFT_SF_DIR="$(pwd)/testdata_sf1" SPARK_GRAFT_CPUS="$CPUS" \
    GRAFT_XMX="$XMX" SPARK_GRAFT_BENCH_OUT="$(pwd)/bench_sf1.json" \
    tools/runmain.sh graft.Bench
fi

echo "== commit artifacts of record =="
# HEAD must carry the evidence the round claims (VERDICT r10 #5): the
# gate/bench JSONs this routine just produced are committed here so a
# fresh clone is self-consistent. Only commits when something changed.
git add -- CORRECTNESS_local.json bench_out.json 2>/dev/null || true
[[ "${1:-}" == "--sf1" ]] && git add -- CORRECTNESS_sf1.json bench_sf1.json 2>/dev/null || true
for f in BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json COPYCHECK.json; do
  [[ -f "$f" ]] && git add -- "$f" 2>/dev/null || true
done
if ! git diff --cached --quiet; then
  git commit -m "Round artifacts: gate + bench JSONs from tools/round.sh"
fi

echo "== round routine complete =="
