#!/bin/bash
# Round-4 continuation of tools_segment_chain.sh: the 80k N=1 run is
# complete; this finishes the quality pipeline with the TPU handed over
# stage by stage:
#   final-eval sweep (80k) -> rgb_micro perf wedge -> N=2 20k run
#   (bounded segments) -> its sweep -> relative-FID trajectory
#   (checkpoints at 8000-iter multiples).
#
# Same hardening as tools_segment_chain.sh: orphan-ref seed snapshots
# (zero main-history blobs), no-progress abort, STOP file, deadline.
#   Stop:      touch /tmp/STOP_CHAIN
#   Deadline:  CHAIN_DEADLINE=<epoch> ./tools_round4_chain.sh
#   Logs:      /tmp/r4chain.log (+ per-stage logs in /tmp)
set -u
cd /root/repo
PY=/opt/venv/bin/python
[ -x "$PY" ] || { echo "FATAL: $PY missing" >&2; exit 1; }
DEADLINE=${CHAIN_DEADLINE:-0}
exec >> /tmp/r4chain.log 2>&1

stage() { echo "[r4chain $(date +%H:%M:%S)] $*"; }
past_deadline() { [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; }
stop_requested() { [ -e /tmp/STOP_CHAIN ]; }

latest_step() {
  ls "experiments/$1/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' \
    | sort -n | tail -1 || true
}

# Recycle-proof archival: orphan refs (snapshot_seed below) protect
# against intra-round crashes but do NOT survive the between-rounds
# host recycle (learned 2026-08-19: refs/seeds/* were dropped; the
# objects survived only as dangling blobs). A COMPLETED run's seed
# must land on main.
commit_seed_main() {
  local exp="$1"
  "$PY" -m ideas_tpu.tools.seed_checkpoint archive "experiments/$exp" seeds/ \
    || { stage "WARN: main-seed archive failed for $exp"; return 0; }
  git add seeds/"$exp".seed.tar.gz seeds/"$exp".seed.json \
    && git commit -q -m "seed (main, recycle-proof): $exp at completion

No-Verification-Needed: data-only checkpoint tarball" \
         -- seeds/"$exp".seed.tar.gz seeds/"$exp".seed.json \
    && stage "seed committed to main: $exp" \
    || stage "WARN: main-seed commit failed for $exp"
}

snapshot_seed() {
  local exp="$1" idx tree commit
  mkdir -p seeds/live
  "$PY" -m ideas_tpu.tools.seed_checkpoint archive "experiments/$exp" seeds/live/ \
    || { stage "WARN: seed archive failed for $exp (continuing)"; return 0; }
  idx="/tmp/seedidx.$$"
  rm -f "$idx"
  if GIT_INDEX_FILE="$idx" git add -f "seeds/live/$exp.seed.tar.gz" \
       "seeds/live/$exp.seed.json" \
     && tree=$(GIT_INDEX_FILE="$idx" git write-tree) \
     && commit=$(git commit-tree -m "seed snapshot: $exp" "$tree") \
     && git update-ref "refs/seeds/$exp" "$commit"; then
    stage "seed snapshot $exp -> refs/seeds/$exp ($commit)"
  else
    stage "WARN: seed git snapshot failed for $exp (continuing)"
  fi
  rm -f "$idx"
}

train_to() { # $1 exp_name, $2 num_iters, $3 extra flags
  local exp="$1" iters="$2" extra="$3" step seg=0 noprog=0 new rc
  while :; do
    stop_requested && { stage "STOP_CHAIN -> abort"; exit 0; }
    past_deadline && { stage "deadline -> stop before next segment"; exit 0; }
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
      > "/tmp/${exp}_r4seg${seg}.log" 2>&1
    rc=$?
    rm -rf "experiments/$exp/checkpoints"/*.orbax-checkpoint-tmp*
    new=$(latest_step "$exp"); new=${new:-0}
    stage "$exp segment $seg exited rc=$rc at step $new"
    if [ "$new" -le "$step" ]; then
      noprog=$((noprog + 1))
      if [ "$rc" -ne 124 ] || [ "$noprog" -ge 3 ]; then
        stage "ABORT: $noprog consecutive no-progress segments (rc=$rc)"
        exit 1
      fi
      stage "no progress yet (rc=124, attempt $noprog/3) — retrying"
      continue
    fi
    noprog=0
    snapshot_seed "$exp"
  done
}

stage "=== r4 chain start (deadline=$DEADLINE) ==="

# Stage 0: make sure the 80k run is actually complete (resume if the
# old chain's deadline cut it short), then snapshot.
train_to n1_80k_bestrecipe 80000 ""
commit_seed_main n1_80k_bestrecipe

stop_requested && { stage "STOP_CHAIN -> abort"; exit 0; }
past_deadline && { stage "deadline -> stop"; exit 0; }

stage "final eval: n1_80k_bestrecipe"
timeout 2400 "$PY" tools_final_eval.py experiments/n1_80k_bestrecipe 16 \
  > /tmp/feval80k.log 2>&1
grep -q "FINAL_EVAL_OK" /tmp/feval80k.log \
  && stage "final eval 80k OK" || stage "WARN: 80k final eval failed"

stop_requested && { stage "STOP_CHAIN -> abort"; exit 0; }
past_deadline && { stage "deadline -> stop"; exit 0; }

stage "perf wedge: rgb_micro"
timeout 1500 "$PY" tools_bench_r3.py rgb_micro > /tmp/rgbmicro.log 2>&1
grep -q "BENCH_R3_OK" /tmp/rgbmicro.log \
  && stage "rgb_micro OK" || stage "WARN: rgb_micro failed"

stop_requested && { stage "STOP_CHAIN -> abort"; exit 0; }
past_deadline && { stage "deadline -> stop"; exit 0; }

train_to n2_20k_bestrecipe 20000 "--N 2"
commit_seed_main n2_20k_bestrecipe

stop_requested && { stage "STOP_CHAIN -> abort"; exit 0; }
past_deadline && { stage "deadline -> skip evals"; exit 0; }

stage "final eval: n2_20k_bestrecipe"
timeout 2400 "$PY" tools_final_eval.py experiments/n2_20k_bestrecipe 16 \
  > /tmp/fevaln2.log 2>&1
grep -q "FINAL_EVAL_OK" /tmp/fevaln2.log \
  && stage "final eval N=2 OK" || stage "WARN: N=2 final eval failed"

stop_requested && { stage "STOP_CHAIN -> abort"; exit 0; }
past_deadline && { stage "deadline -> stop"; exit 0; }

stage "relative-FID trajectory (checkpoints at 8000-iter multiples)"
timeout 3600 "$PY" tools_fid_trajectory.py experiments/n1_80k_bestrecipe 2000 32 8000 \
  > /tmp/fidtraj.log 2>&1
grep -q "FID_TRAJECTORY_OK" /tmp/fidtraj.log \
  && stage "FID trajectory OK" || stage "WARN: FID trajectory failed"

git prune --expire=now 2>/dev/null || true
stage "=== r4 chain done ==="
