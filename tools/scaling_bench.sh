#!/usr/bin/env bash
# N-vs-4N scaling bench: each parallelism level in its own JVM, then a
# combined BENCH/BASELINE.md report. Usage: tools/scaling_bench.sh [nDocs]
#
# Also measures the MACHINE's own 8->32-thread scaling ceiling with a pure
# CPU kernel (openssl sha256): this sandbox VM does not deliver 4x CPU from
# 4x threads (host oversubscription), so the report shows both raw and
# machine-normalized efficiency.
set -euo pipefail
cd "$(dirname "$0")/.."
NDOCS="${1:-2000000}"
OUT=/tmp/graft-scaling
mkdir -p "$OUT"

cpu() { openssl speed -multi "$1" -seconds 3 sha256 2>/dev/null | awk '/^sha256/{v=$NF} END{sub(/k$/,"",v); print v}'; }
C8=$(cpu 8); C32=$(cpu 32)
echo "{\"cpu8\":$C8,\"cpu32\":$C32}" > "$OUT/cpu.json"
echo "[scaling] cpu ceiling: 8t=$C8 32t=$C32 ratio=$(awk "BEGIN{printf \"%.2f\", $C32/$C8}")"

if [ "${WITH_L2:-0}" = 1 ]; then
  sbt -batch "runMain graft.tools.ScalingBench level 2  $NDOCS $OUT/l2.json"
fi
sbt -batch "runMain graft.tools.ScalingBench level 8  $NDOCS $OUT/l8.json"
sbt -batch "runMain graft.tools.ScalingBench level 32 $NDOCS $OUT/l32.json"
sbt -batch "runMain graft.tools.ScalingBench report $OUT/l8.json $OUT/l32.json BENCH/BASELINE.md $OUT/cpu.json $OUT/l2.json"
cat BENCH/BASELINE.md
