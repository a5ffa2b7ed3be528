#!/bin/bash
# Unattended TPU measurement agenda — runs the pending device work the
# moment the relay recovers (a watch loop stamps /tmp/relay_up; see the
# verify skill's relay gotchas). Discipline learned on this relay:
#   - ONE device client at a time (a second client wedges the device)
#   - each step in its own process (RESOURCE_EXHAUSTED poisons later
#     allocations in the same process)
#   - quiet gap + health probe after any failed/timed-out step (a killed
#     client can wedge the device for minutes); abort if the relay died
#
#   nohup setsid bash tools/tpu_agenda.sh < /dev/null > /tmp/agenda.log 2>&1 &
#
# Progress: /tmp/agenda_status (one line per step), /tmp/agenda.log (full).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/agenda.log
STATUS=/tmp/agenda_status

note() { echo "$(date '+%H:%M:%S') $*" | tee -a "$STATUS"; }

# -- wait for the relay (the watch loop owns probing; don't double-client) --
if [ ! -f /tmp/relay_up ]; then
  note "waiting for /tmp/relay_up (relay watch loop probing)..."
  while [ ! -f /tmp/relay_up ]; do
    watch_alive=0
    if [ -f /tmp/relaywatch.pid ]; then
      for p in $(cat /tmp/relaywatch.pid); do
        kill -0 "$p" 2>/dev/null && watch_alive=1
      done
    fi
    if [ "$watch_alive" = 0 ]; then
      # the watch loop died without stamping: take over probing ourselves
      note "watch loop gone; probing directly"
      timeout 900 python - > /tmp/relay_status.log 2>&1 <<'EOF'
import time, jax, jax.numpy as jnp, numpy as np
t0 = time.time()
v = float(np.asarray((jnp.ones((256,256)) @ jnp.ones((256,256))).sum()))
print(f"matmul ok {v} in {time.time()-t0:.1f}s", flush=True)
EOF
      if grep -q "matmul ok" /tmp/relay_status.log; then
        date > /tmp/relay_up
        break
      fi
      sleep 300
    else
      sleep 60
    fi
  done
fi
note "relay up: $(cat /tmp/relay_up)"
sleep 30  # let the successful probe's client exit fully

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

# perf_probe exec cases (ground-truth steps/s -> PERF_PROBE.json).
# ens16_f32_chunk128: the f32 headline config (bench row exists, exec
# entry missing). ens16_bf16_chunk128: completes the bf16 chunk sweep.
run exec_ens16_f32_chunk128 2400 python tools/perf_probe.py exec ens16_f32_chunk128
run exec_ens16_bf16_chunk128 2400 python tools/perf_probe.py exec ens16_bf16_chunk128
# aens16_bf16_chunk256: REFRESH — the recorded 1.518 measured an older
# [1,2]/[2,3] tap mix; bench/CLI now build {n:[2,3]} for all four models
run exec_aens16_bf16_chunk256 2700 python tools/perf_probe.py exec aens16_bf16_chunk256
# multigrid coarse-chunk tuning at full size (30@112 + 30@224)
run exec_mg16_bf16_ccfull 2700 python tools/perf_probe.py exec mg16_bf16_ccfull
run exec_mg16_bf16_cc256 2700 python tools/perf_probe.py exec mg16_bf16_cc256
# remat-vs-chunk interaction on the bf16 headline config
run exec_ens16_bf16_chunk256_remat 2400 python tools/perf_probe.py exec ens16_bf16_chunk256_remat

# full bench (fresh rows for every config; f32 compiles are the long pole).
# Same failed-step discipline as run(): a timed-out bench is a killed
# client that can wedge the device for the CLI drive that follows.
note "START bench"
timeout 10800 python bench.py > /tmp/agenda_bench.json 2>> "$LOG"
rc=$?
note "DONE  bench rc=$rc ($(wc -c < /tmp/agenda_bench.json 2>/dev/null) bytes)"
if [ $rc -ne 0 ]; then
  note "letting device settle 240s, then health-probing"
  sleep 240
  if ! health; then note "relay DEAD after bench; aborting"; exit 2; fi
  note "relay alive; continuing"
fi
sleep 60

# multigrid CLI end-to-end on the real chip: full-size surrogates,
# 60 steps (30 coarse), fused eval on I3D-NL R50, frame_chunk auto
run mg_cli_e2e 3600 env I2V_TPU_OPT_PATH=/tmp/agenda_mg_out \
  python -m i2v_tpu.cli.image_main \
  --attack_method ImageGuidedFML2_Adam_MultiModels \
  --step 60 --step_size 0.005 --data synthetic --n_synthetic 8 \
  --batch_size 8 --sharded --multigrid 30 --frame_chunk auto \
  --param_dtype bfloat16 --u8_ingress \
  --fused_eval i3d_resnet50 --artifact_dtype float16 --file_prefix agenda_mg

# offline single-pass eval of the fused run's artifacts: all six full-size
# video models resident, ONE artifact read + upload per batch (validates
# --single_pass at full scale on the real chip; 8 f16 clips, so cheap)
mg_run_dir=$(ls -d /tmp/agenda_mg_out/*/ 2>/dev/null | head -1)
if [ -n "$mg_run_dir" ]; then
  run eval_single_pass 3600 python -m i2v_tpu.cli.evaluate \
    --adv_path "$mg_run_dir" --single_pass --batch_size 8
else
  note "SKIP eval_single_pass (no run dir under /tmp/agenda_mg_out)"
fi

# TemporalTranslation ground-truth row (README has 0.27 s/step prose;
# this records it machine-readably in PERF_PROBE.json)
run exec_tt1_chunk15 2700 python tools/perf_probe.py exec tt1_chunk15

note "AGENDA COMPLETE"
touch /tmp/agenda_done
