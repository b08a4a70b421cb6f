#!/bin/bash
# Unattended segmented quality pipeline for the single-TPU host.
#
# Trains n1_80k_bestrecipe to 80k iters in BOUNDED segments (the TPU is
# freed every <=45 min so a round-end driver bench is never starved for
# long), then: final-eval sweep, the N=2 20k run (same segmenting), its
# sweep, and the relative-FID trajectory.
#
# Recycle durability (round-3 lesson: only git survives some recycles;
# round-4 ADVICE: stacking ~1 GB gzip seed tarballs on main bloats
# history unboundedly). Strategy here:
#   * every segment boundary: archive the latest completed checkpoint to
#     gitignored seeds/live/ and snapshot it on the ORPHAN ref
#     refs/seeds/<exp> via commit-tree — main history gains ZERO blobs,
#     old snapshots become unreachable and are dropped by the occasional
#     `git prune`. Restore after a git-only recycle:
#       git cat-file blob refs/seeds/<exp>:seeds/live/<exp>.seed.tar.gz \
#         > /tmp/seed.tar.gz
#       python -m ideas_tpu.tools.seed_checkpoint restore /tmp/seed.tar.gz experiments/
#   * main-branch seed commits (the expensive kind) are a MANUAL,
#     occasional action (e.g. once mid-run), not automated here.
#
# Stop cleanly at any time:  touch /tmp/STOP_CHAIN
# Deadline (epoch seconds):  CHAIN_DEADLINE=... ./tools_segment_chain.sh
#   — no new segment/stage starts past the deadline, so the TPU is free
#   for the round-end driver bench.
# Logs:                      /tmp/segchain.log  (+ per-stage logs in /tmp)
set -u
cd /root/repo
PY=/opt/venv/bin/python
[ -x "$PY" ] || { echo "FATAL: $PY missing (non-login shells must not fall back to the jax-less system python)" >&2; exit 1; }
DEADLINE=${CHAIN_DEADLINE:-0}
exec >> /tmp/segchain.log 2>&1

stage() { echo "[segchain $(date +%H:%M:%S)] $*"; }

past_deadline() { [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; }

latest_step() { # latest COMPLETED orbax step for an experiment (0 if none)
  ls "experiments/$1/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' \
    | sort -n | tail -1 || true
}

snapshot_seed() { # $1 exp — recycle-proof snapshot on an orphan ref
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

train_to() { # $1 exp_name, $2 num_iters, $3 extra flags (may be empty)
  local exp="$1" iters="$2" extra="$3" step seg=0 noprog=0 new rc
  while :; do
    [ -e /tmp/STOP_CHAIN ] && { stage "STOP_CHAIN -> abort"; exit 0; }
    past_deadline && { stage "deadline reached -> stop before next segment"; exit 0; }
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
    if [ "$new" -le "$step" ]; then
      noprog=$((noprog + 1))
      # rc=124 (timeout) with no new checkpoint can be a legitimate slow
      # first segment (2-6 min fresh-process compile), but not forever:
      # abort after 3 consecutive no-progress segments regardless of rc.
      if [ "$rc" -ne 124 ] || [ "$noprog" -ge 3 ]; then
        stage "ABORT: $noprog consecutive no-progress segments (rc=$rc) — see the log"
        exit 1
      fi
      stage "no progress yet (rc=124, attempt $noprog/3) — retrying"
      continue
    fi
    noprog=0
    snapshot_seed "$exp"
  done
}

stage "=== chain start (deadline=$DEADLINE) ==="

train_to n1_80k_bestrecipe 80000 ""
snapshot_seed n1_80k_bestrecipe

past_deadline && { stage "deadline reached -> skip evals"; exit 0; }
stage "final eval: n1_80k_bestrecipe"
timeout 2400 "$PY" tools_final_eval.py experiments/n1_80k_bestrecipe 16 \
  > /tmp/feval80k.log 2>&1
grep -q "FINAL_EVAL_OK" /tmp/feval80k.log \
  && stage "final eval 80k OK" || stage "WARN: 80k final eval failed"

[ -e /tmp/STOP_CHAIN ] && { stage "STOP_CHAIN -> abort"; exit 0; }
past_deadline && { stage "deadline reached -> stop"; exit 0; }

train_to n2_20k_bestrecipe 20000 "--N 2"
snapshot_seed n2_20k_bestrecipe

past_deadline && { stage "deadline reached -> skip evals"; exit 0; }
stage "final eval: n2_20k_bestrecipe"
timeout 2400 "$PY" tools_final_eval.py experiments/n2_20k_bestrecipe 16 \
  > /tmp/fevaln2.log 2>&1
grep -q "FINAL_EVAL_OK" /tmp/fevaln2.log \
  && stage "final eval N=2 OK" || stage "WARN: N=2 final eval failed"

[ -e /tmp/STOP_CHAIN ] && { stage "STOP_CHAIN -> abort"; exit 0; }
past_deadline && { stage "deadline reached -> stop"; exit 0; }

stage "relative-FID trajectory over the 80k checkpoints"
timeout 7200 "$PY" tools_fid_trajectory.py experiments/n1_80k_bestrecipe 2000 32 \
  > /tmp/fidtraj.log 2>&1
grep -q "FID_TRAJECTORY_OK" /tmp/fidtraj.log \
  && stage "FID trajectory OK" || stage "WARN: FID trajectory failed"

git prune --expire=now 2>/dev/null || true
stage "=== chain done ==="
