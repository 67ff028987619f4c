#!/bin/bash
# Weather-gated bench runner: this sandbox VM shares a hypervisor, and
# steal comes in waves that inflate bench wall-times up to 10x (see
# BASELINE.md "Environment caveat"). This wrapper waits for a sustained
# quiet window (steal < 0.2% over 30 s), runs `python bench.py`, and
# accepts the result only if the run's own measured steal_pct stays
# <= 0.3 — retrying up to 6 times. Output lands in $OUT (default
# /tmp/bench_final.json); gate it with bench_gate.py afterwards.
#
# Usage: ./quiet_bench.sh [OUT_JSON]
set -u
cd "$(dirname "$0")"
OUT="${1:-/tmp/bench_final.json}"

# Fail loudly if a probe produced a non-numeric value (an empty $s/$st
# would otherwise turn the awk gate into a syntax error and spin the
# quiet-wait loop forever).
numeric() { [[ "$1" =~ ^-?[0-9]+([.][0-9]+)?$ ]]; }

for attempt in 1 2 3 4 5 6; do
  while true; do
    s=$(python - <<'PY'
import time
def snap(): return [int(x) for x in open('/proc/stat').readline().split()[1:]]
a=snap(); time.sleep(30); b=snap()
d=[y-x for x,y in zip(a,b)]
print(round(100*d[7]/max(1,sum(d)),2))
PY
)
    if ! numeric "${s:-}"; then
      echo "ERROR: steal probe returned non-numeric '$s' — aborting" >&2
      exit 2
    fi
    echo "attempt $attempt pre-run steal=$s%" >&2
    awk "BEGIN{exit !($s < 0.2)}" && break
    sleep 120
  done
  python bench.py > "$OUT" 2>"${OUT%.json}.err"
  st=$(python -c "import json; print(json.load(open('$OUT'))['steal_pct'])" 2>/dev/null)
  bc=$(python -c "import json; print(json.load(open('$OUT'))['busy_cores'])" 2>/dev/null)
  if ! numeric "${st:-}" || ! numeric "${bc:-}"; then
    echo "ERROR: bench output in $OUT unparseable (steal_pct/busy_cores missing);" \
         "stderr in ${OUT%.json}.err — aborting" >&2
    exit 2
  fi
  echo "attempt $attempt run steal_pct=$st% busy_cores=$bc" >&2
  # busy_cores gate: the hypervisor has a DEGRADED mode that is invisible
  # to steal (steal 0.0-0.2% but only ~8 of 32 cores' cycles delivered,
  # uniform wall inflation ~40%). A healthy headline run keeps >=9 busy
  # cores; below that the window is degraded regardless of steal.
  if awk "BEGIN{exit !($st <= 0.3 && $bc >= 9)}"; then
    echo "ACCEPTED attempt $attempt steal=$st% busy=$bc -> $OUT"
    exit 0
  fi
done
echo "NO QUIET RUN in 6 attempts; last (steal-polluted) result left in $OUT"
exit 1
