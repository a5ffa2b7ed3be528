#!/bin/bash
# Round-3 device measurement agenda (relay verified up at launch).
# Same discipline as tpu_agenda.sh: ONE device client at a time, each step
# in its own process, settle + health-probe after any failure.
#
#   nohup setsid bash tools/agenda_r3.sh < /dev/null > /tmp/agenda_r3.log 2>&1 &
#
# Progress: /tmp/agenda_r3_status (one line per step).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/agenda_r3.log
STATUS=/tmp/agenda_r3_status

note() { echo "$(date '+%H:%M:%S') $*" | tee -a "$STATUS"; }

health() {
  timeout 300 python - >> "$LOG" 2>&1 <<'EOF'
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

# VERDICT r2 missing #1: TemporalTranslation ground truth
run exec_tt1_chunk15 2700 python tools/perf_probe.py exec tt1_chunk15
# VERDICT r2 item 2: BIM device number (reference white-box default scale)
run exec_bim16_chunk8 2400 python tools/perf_probe.py exec bim16_chunk8
# VERDICT r2 item 4: AENS f32 B=16 exec ground truth (hbm says chunk32/64 fit)
run exec_aens16_f32_chunk64 2700 python tools/perf_probe.py exec aens16_f32_chunk64
# VERDICT r2 weak #4: AENS bf16-vs-f32 early-trajectory fidelity at B=8
run fidelity_aens8 2400 python tools/perf_probe.py fidelity aens8
# f32 ENS headline config exec ground truth (bench row exists, exec missing)
run exec_ens16_f32_chunk128 2400 python tools/perf_probe.py exec ens16_f32_chunk128
# AENS f32 fallback chunk
run exec_aens16_f32_chunk32 2700 python tools/perf_probe.py exec aens16_f32_chunk32
# multigrid coarse-chunk tuning (round-2 agenda never ran)
run exec_mg16_bf16_cc256 2700 python tools/perf_probe.py exec mg16_bf16_cc256
run exec_mg16_bf16_ccfull 2700 python tools/perf_probe.py exec mg16_bf16_ccfull
# bf16 chunk sweep completion
run exec_ens16_bf16_chunk128 2400 python tools/perf_probe.py exec ens16_bf16_chunk128

note "AGENDA R3 COMPLETE"
touch /tmp/agenda_r3_done
