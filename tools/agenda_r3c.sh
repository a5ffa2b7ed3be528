#!/bin/bash
# Round-3c device agenda: retry the f32-HIGHEST throughput measurement.
# The first exec_ens16_f32hp_chunk128 attempt crashed the TPU worker
# mid-execution ("TPU worker process crashed or restarted"); retry once in
# a fresh process, then fall back to chunk64 if the crash reproduces.
# Discipline as tools/tpu_agenda.sh.
#
#   nohup setsid bash tools/agenda_r3c.sh < /dev/null > /tmp/agenda_r3c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/agenda_r3c.log
STATUS=/tmp/agenda_r3c_status

note() { echo "$(date '+%H:%M:%S') $*" | tee -a "$STATUS"; }

health() {
  timeout 600 python - >> "$LOG" 2>&1 <<'EOF'
import time, jax, jax.numpy as jnp, numpy as np
t0 = time.time()
v = float(np.asarray((jnp.ones((256,256)) @ jnp.ones((256,256))).sum()))
print(f"health ok {v} in {time.time()-t0:.1f}s", flush=True)
EOF
}

run() {
  local name=$1 tmo=$2; shift 2
  note "START $name"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  note "DONE  $name rc=$rc"
  if [ $rc -ne 0 ]; then
    note "letting device settle 240s, then health-probing"
    sleep 240
    if ! health; then
      note "relay down after $name; waiting up to 1h in 5-min probes"
      ok=0
      for i in $(seq 1 12); do
        sleep 300
        if health; then ok=1; break; fi
      done
      if [ "$ok" = 0 ]; then note "relay never recovered; aborting"; exit 2; fi
    fi
    note "relay alive; continuing"
  fi
  sleep 45
  return $rc
}

if ! health; then
  note "relay down at launch; waiting up to 2h in 5-min probes"
  ok=0
  for i in $(seq 1 24); do
    sleep 300
    if health; then ok=1; break; fi
  done
  if [ "$ok" = 0 ]; then note "relay never recovered; aborting"; exit 2; fi
fi
note "relay up"

if run exec_hp128_retry 3600 python tools/perf_probe.py exec ens16_f32hp_chunk128; then
  note "AGENDA R3C COMPLETE (chunk128)"
  exit 0
fi
note "chunk128 crashed twice; falling back to chunk64"
run exec_hp64 3600 python tools/perf_probe.py exec ens16_f32hp_chunk64
note "AGENDA R3C COMPLETE"
