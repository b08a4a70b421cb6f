#!/bin/bash
# Unattended segmented quality pipeline for the single-TPU host.
#
# Trains n1_80k_bestrecipe to 80k iters in BOUNDED segments (the TPU is
# freed every <=45 min so a round-end driver bench is never starved for
# long), archiving + git-committing the latest completed checkpoint at
# every segment boundary (only committed files survive host recycles —
# see PERF.md round-3 second-re-seed note). After 80k: final-eval sweep,
# then the N=2 20k run (same segmenting + seeding), its sweep, and the
# relative-FID trajectory.
#
# Stop cleanly at any time:  touch /tmp/STOP_CHAIN
# Logs:                      /tmp/segchain.log  (+ per-stage logs in /tmp)
set -u
cd /root/repo
PY=/opt/venv/bin/python
[ -x "$PY" ] || PY=python
exec >> /tmp/segchain.log 2>&1

stage() { echo "[segchain $(date +%H:%M:%S)] $*"; }

latest_step() { # latest COMPLETED orbax step for an experiment (0 if none)
  ls "experiments/$1/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' \
    | sort -n | tail -1 || true
}

train_to() { # $1 exp_name, $2 num_iters, $3 extra flags (may be empty)
  local exp="$1" iters="$2" extra="$3" step seg=0
  while :; do
    [ -e /tmp/STOP_CHAIN ] && { stage "STOP_CHAIN -> abort"; exit 0; }
    step=$(latest_step "$exp"); step=${step:-0}
    if [ "$step" -ge "$iters" ]; then stage "$exp reached $step/$iters"; return 0; fi
    seg=$((seg + 1))
    stage "$exp segment $seg from step $step"
    # shellcheck disable=SC2086
    timeout 2700 "$PY" -m ideas_tpu.train_cli --exp_name "$exp" \
      --dataset_type synthetic_device --num_iters "$iters" \
      --image_size 256 --channel 32 --batch_size 8 --bf16 \
      --lambda_Ex 30 --ex_margin 0.2 --share_phase_noise \
      --compact_adam --save_every 2000 --keep_checkpoints 100 $extra \
      > "/tmp/${exp}_seg${seg}.log" 2>&1
    rc=$?
    rm -rf "experiments/$exp/checkpoints"/*.orbax-checkpoint-tmp*
    new=$(latest_step "$exp"); new=${new:-0}
    stage "$exp segment $seg exited rc=$rc at step $new"
    if [ "$new" -le "$step" ] && [ "$rc" -ne 124 ]; then
      stage "ABORT: no progress and not a timeout (rc=$rc) — see the log"
      exit 1
    fi
    if [ "$new" -gt "$step" ]; then
      "$PY" -m ideas_tpu.tools.seed_checkpoint archive "experiments/$exp" seeds/ \
        && git add seeds/ \
        && git commit -q -m "Seed: $exp @${new} iters (segment $seg)" \
        && stage "seed committed @$new" \
        || stage "WARN: seed archive/commit failed (continuing)"
    fi
  done
}

stage "=== chain start ==="

train_to n1_80k_bestrecipe 80000 ""

stage "final eval: n1_80k_bestrecipe"
timeout 2400 "$PY" tools_final_eval.py experiments/n1_80k_bestrecipe 16 \
  > /tmp/feval80k.log 2>&1
grep -q "FINAL_EVAL_OK" /tmp/feval80k.log \
  && stage "final eval 80k OK" || stage "WARN: 80k final eval failed"

[ -e /tmp/STOP_CHAIN ] && { stage "STOP_CHAIN -> abort"; exit 0; }

train_to n2_20k_bestrecipe 20000 "--N 2"

stage "final eval: n2_20k_bestrecipe"
timeout 2400 "$PY" tools_final_eval.py experiments/n2_20k_bestrecipe 16 \
  > /tmp/fevaln2.log 2>&1
grep -q "FINAL_EVAL_OK" /tmp/fevaln2.log \
  && stage "final eval N=2 OK" || stage "WARN: N=2 final eval failed"

[ -e /tmp/STOP_CHAIN ] && { stage "STOP_CHAIN -> abort"; exit 0; }

stage "relative-FID trajectory over the 80k checkpoints"
timeout 7200 "$PY" tools_fid_trajectory.py experiments/n1_80k_bestrecipe 2000 32 \
  > /tmp/fidtraj.log 2>&1
grep -q "FID_TRAJECTORY_OK" /tmp/fidtraj.log \
  && stage "FID trajectory OK" || stage "WARN: FID trajectory failed"

stage "=== chain done ==="
