#!/bin/bash
# Window scanner: repeatedly run graft.Bench at sf0.1/32 cores, appending each
# bench_last.json (with a timestamp) to BENCH/window_scan_r5.jsonl. Host
# weather on this shared VM swings identical binaries ~2-3x on minute
# timescales (documented in BENCH/BASELINE.md since round 3), so the official
# per-round artifact should come from a window where the binary reproduces
# its own clean-window replay number. Stop with: touch /tmp/bench_scan_stop
set -u
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
mkdir -p BENCH
N=${1:-12}
SLEEP=${2:-180}
for i in $(seq 1 "$N"); do
  [ -f /tmp/bench_scan_stop ] && { echo "[scan] stop marker — exiting"; break; }
  t0=$(date -u +%FT%TZ)
  sbt -batch "runMain graft.Bench" >/tmp/bench_scan_run.log 2>&1
  if [ -f BENCH/bench_last.json ]; then
    line=$(cat BENCH/bench_last.json)
    echo "{\"ts\":\"$t0\",\"run\":$line}" >> BENCH/window_scan_r5.jsonl
    python3 - <<PYEOF
import json
d = json.load(open('BENCH/bench_last.json'))
c = d.get('cdc', {})
print(f"[scan] $t0 replay={c.get('replay_sec',0):.2f}s mor={c.get('stream_mor_sec',0):.2f}s "
      f"({c.get('stream_mor_events_per_sec',0)} ev/s) cow={c.get('stream_sec',0):.2f}s total={d.get('value',0):.1f}s")
PYEOF
  fi
  sleep "$SLEEP"
done
