#!/bin/bash
# Kernels-off bench leg: times the DISTRIBUTED graph fixpoints and the
# distributed star closure — the code paths that actually run at 100 TB —
# which the default bench serves from exact driver kernels at bench-scale
# inputs (DriverGraph.DefaultEdgeCap / Dedup.SmallClosureEdgeCap).
# GRAFT_DRIVER_CAP=0 disables every kernel; DriverGraphSpec proves output
# parity, so this leg is measurement only. Four rungs (sf0.1/sf1/sf3/sf10,
# VERDICT r12 task 2) so per-query growth exponents can be fitted for the
# distributed paths themselves. Writes BENCH_distributed.json with one
# {query: sec} block per scale factor. Requires `sbt compile`.
set -euo pipefail
cd /root/repo
QUERIES="graph_pagerank graph_ppr graph_label_prop graph_kcore dd_incremental_cluster"
OUT="${1:-/root/repo/BENCH_distributed.json}"
LEGS="${GRAFT_DIST_LEGS:-sf0.1:/root/testdata/sf0.1 sf1:/root/repo/testdata_sf1 sf3:/root/repo/testdata_sf3 sf10:/root/repo/testdata_sf10}"
for leg in $LEGS; do
  name="${leg%%:*}"; dir="${leg#*:}"
  GRAFT_DRIVER_CAP=0 SPARK_GRAFT_SF_DIR="$dir" \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" GRAFT_XMX="${GRAFT_XMX:-64g}" \
    SPARK_GRAFT_BENCH_OUT="/tmp/bench_distributed_$name.json" \
    tools/runmain.sh graft.Bench $QUERIES >/dev/null
done
python3 - "$OUT" "$LEGS" <<'EOF'
import json, sys
legs = {}
for leg in sys.argv[2].split():
    name = leg.split(":")[0]
    with open(f"/tmp/bench_distributed_{name}.json") as f:
        d = json.load(f)
    legs[name] = {"queries": d["queries"], "total": d["value"],
                  "errors": d["errors"], "__calibration": d["__calibration"]}
out = {"metric": "distributed_graph", "unit": "sec", "driver_cap": 0,
       "note": "GRAFT_DRIVER_CAP=0: driver kernels disabled; times the "
               "distributed fixpoint/closure paths (parity: DriverGraphSpec)",
       "legs": legs}
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)
print("wrote", sys.argv[1])
EOF
