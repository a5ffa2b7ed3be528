#!/bin/bash
# Round-3b device agenda: f32 matmul-precision evidence for the headline row.
# Discipline as tools/tpu_agenda.sh: ONE device client at a time, each step
# in its own process, settle + health-probe after any failure.
#
#   nohup setsid bash tools/agenda_r3b.sh < /dev/null > /tmp/agenda_r3b.log 2>&1 &
#
# Progress: /tmp/agenda_r3b_status (one line per step).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/agenda_r3b.log
STATUS=/tmp/agenda_r3b_status

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
    if ! health; then note "relay DEAD after $name; aborting"; exit 2; fi
    note "relay alive; continuing"
  fi
  sleep 45
  return $rc
}

# no explicit straggler wait: the health probe serializes — if a leftover
# client holds the device, health times out and the retry loop below waits
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

run fidelity_ens8_hp      2400 python tools/perf_probe.py fidelity ens8_hp
run exec_ens16_f32hp_128  3600 python tools/perf_probe.py exec ens16_f32hp_chunk128
note "AGENDA R3B COMPLETE"
