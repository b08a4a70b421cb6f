#!/bin/bash
# Round-5 endgame: run AFTER tools_round5_chain.sh has exited (it stops
# at its deadline). Covers whatever the chain did not reach, in
# leverage order, skipping anything whose success token already exists:
#   A. certified N=2 final evals (sigma=1 @1280, sigma=2 @640)
#   B. relative-FID trajectory over the N=2 run's checkpoints
#   C. on-disk PNG dataset -> --dataset_type normal TPU run
#   D. perf ledger items 9/10: nodonate + autolayout audits
# One TPU process at a time; each stage is timeout-bounded.
#   Deadline:  ENDGAME_DEADLINE=<epoch> ./tools_round5_endgame.sh
#   Logs:      /tmp/r5endgame.log (+ per-stage logs in /tmp)
set -u
cd /root/repo
PY=/opt/venv/bin/python
[ -x "$PY" ] || { echo "FATAL: $PY missing" >&2; exit 1; }
DEADLINE=${ENDGAME_DEADLINE:-0}
exec >> /tmp/r5endgame.log 2>&1

stage() { echo "[r5end $(date +%H:%M:%S)] $*"; }
bail_if_done() {
  [ -e /tmp/STOP_ENDGAME ] && { stage "STOP_ENDGAME -> abort"; exit 0; }
  [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ] \
    && { stage "deadline -> stop"; exit 0; }
  return 0
}
have() { [ -f "$1" ] && grep -q "$2" "$1"; }
# Cap a stage budget by the time left to the deadline, so no stage
# started near the deadline can straddle it and hold the TPU into the
# driver's bench window. Prints the capped budget; 0 = don't start.
budget() { # $1 = wanted seconds
  local rem
  if [ "$DEADLINE" -le 0 ]; then echo "$1"; return; fi
  rem=$(( DEADLINE - $(date +%s) ))
  [ "$rem" -lt 120 ] && { echo 0; return; }
  [ "$rem" -lt "$1" ] && echo "$rem" || echo "$1"
}

stage "=== r5 endgame start (deadline=$DEADLINE) ==="

# Refuse to start while the chain still runs (one TPU process rule).
if [ -f /tmp/r5chain.pid ] && kill -0 "$(cat /tmp/r5chain.pid)" 2>/dev/null; then
  stage "FATAL: r5chain still alive — refusing to double-book the TPU"
  exit 1
fi

# A. certified N=2 final evals (chain stage 3).
if have /tmp/feval_n2s1.log FINAL_EVAL_OK; then
  stage "n2s1 already done — skip"
else
  stage "final eval: n2_20k_bestrecipe (n_batches=160 sigma=1)"
  B=$(budget 3000); [ "$B" -gt 0 ] || { stage "no budget -> stop"; exit 0; }
  timeout "$B" "$PY" tools_final_eval.py experiments/n2_20k_bestrecipe 160 1 \
    > /tmp/feval_n2s1.log 2>&1
  have /tmp/feval_n2s1.log FINAL_EVAL_OK \
    && stage "final eval n2s1 OK" || stage "WARN: final eval n2s1 failed"
fi
bail_if_done
if have /tmp/feval_n2s2.log FINAL_EVAL_OK; then
  stage "n2s2 already done — skip"
else
  stage "final eval: n2_20k_bestrecipe (n_batches=80 sigma=2)"
  B=$(budget 3000); [ "$B" -gt 0 ] || { stage "no budget -> stop"; exit 0; }
  timeout "$B" "$PY" tools_final_eval.py experiments/n2_20k_bestrecipe 80 2 \
    > /tmp/feval_n2s2.log 2>&1
  have /tmp/feval_n2s2.log FINAL_EVAL_OK \
    && stage "final eval n2s2 OK" || stage "WARN: final eval n2s2 failed"
fi
bail_if_done

# B. relative-FID trajectory (chain stage 4).
if have /tmp/fidtraj_n2.log FID_TRAJECTORY_OK; then
  stage "FID trajectory already done — skip"
else
  stage "relative-FID trajectory (N=2 run, 4000-iter checkpoints incl 20k/52k)"
  B=$(budget 3600); [ "$B" -gt 0 ] || { stage "no budget -> stop"; exit 0; }
  timeout "$B" "$PY" tools_fid_trajectory.py experiments/n2_20k_bestrecipe 2000 32 4000 \
    > /tmp/fidtraj_n2.log 2>&1
  have /tmp/fidtraj_n2.log FID_TRAJECTORY_OK \
    && stage "FID trajectory OK" || stage "WARN: FID trajectory failed"
fi
bail_if_done

# C. on-disk datapath (chain stage 5).
if [ -f experiments/ondisk_datapath/training_logs.txt ] \
   && grep -q "imgs/s" experiments/ondisk_datapath/training_logs.txt; then
  stage "on-disk run already done — skip"
else
  if ! have /tmp/makedata.log MAKE_DATASET_OK; then
    stage "rasterizing synthetic family to PNGs"
    B=$(budget 1800); [ "$B" -gt 0 ] || { stage "no budget -> stop"; exit 0; }
    timeout "$B" "$PY" tools_make_dataset.py experiments/data_png 2048 256 default \
      > /tmp/makedata.log 2>&1
    have /tmp/makedata.log MAKE_DATASET_OK \
      && stage "dataset written" || stage "WARN: dataset write failed"
  fi
  stage "on-disk datapath run (--dataset_type normal, 1200 iters)"
  B=$(budget 2700); [ "$B" -gt 0 ] || { stage "no budget -> stop"; exit 0; }
  timeout "$B" "$PY" -m ideas_tpu.train_cli --exp_name ondisk_datapath \
    --dataset_type normal --dataset_path experiments/data_png \
    --num_iters 1200 --image_size 256 --channel 32 --batch_size 8 --bf16 \
    --lambda_Ex 30 --ex_margin 0.2 --share_phase_noise --compact_adam \
    --save_every 1200 --keep_checkpoints 1 \
    > /tmp/ondisk_run.log 2>&1
  grep -q "imgs/s" experiments/ondisk_datapath/training_logs.txt 2>/dev/null \
    && stage "on-disk run OK" || stage "WARN: on-disk run failed"
fi
bail_if_done

# D. perf ledger items 9/10 (chain stage 6).
if have /tmp/nodonate.log BENCH_R3_OK; then
  stage "nodonate already done — skip"
else
  stage "perf audit: nodonate"
  B=$(budget 1800); [ "$B" -gt 0 ] || { stage "no budget -> stop"; exit 0; }
  timeout "$B" "$PY" tools_bench_r3.py nodonate > /tmp/nodonate.log 2>&1
  have /tmp/nodonate.log BENCH_R3_OK \
    && stage "nodonate OK" || stage "WARN: nodonate failed"
fi
bail_if_done
if have /tmp/autolayout.log BENCH_R3_OK; then
  stage "autolayout already done — skip"
else
  stage "perf audit: autolayout"
  B=$(budget 1800); [ "$B" -gt 0 ] || { stage "no budget -> stop"; exit 0; }
  timeout "$B" "$PY" tools_bench_r3.py autolayout > /tmp/autolayout.log 2>&1
  have /tmp/autolayout.log BENCH_R3_OK \
    && stage "autolayout OK" || stage "WARN: autolayout failed"
fi

stage "=== r5 endgame done ==="
