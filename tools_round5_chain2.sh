#!/bin/bash
# Round-5 chain, phase 2 (takeover of tools_round5_chain.sh): finish the
# N=2 80k run with LOWER segment overhead, then hand off to
# tools_round5_endgame.sh for evals / FID trajectory / on-disk run /
# perf audits.
#
# Why the takeover (measured, /tmp/r5chain.log): 2700 s segments with
# --save_every 2000 banked 6000-10000 iters/segment — ~25-45% of wall
# went to compile + 4-5 orbax saves (~71 s each on this 1-core host) +
# iters lost past the last save (one save near a segment end hung >6
# min and was killed mid-write). Fix: 3600 s segments + --save_every
# 4000 (the FID trajectory only needs 8000-multiples; 80000 % 4000 == 0
# so the final checkpoint still lands).
#   Stop:      touch /tmp/STOP_CHAIN2
#   Deadline:  CHAIN_DEADLINE=<epoch> ./tools_round5_chain2.sh
#   Logs:      /tmp/r5chain2.log
set -u
cd /root/repo
PY=/opt/venv/bin/python
[ -x "$PY" ] || { echo "FATAL: $PY missing" >&2; exit 1; }
DEADLINE=${CHAIN_DEADLINE:-0}
exec >> /tmp/r5chain2.log 2>&1

stage() { echo "[r5chain2 $(date +%H:%M:%S)] $*"; }
bail_if_done() {
  [ -e /tmp/STOP_CHAIN2 ] && { stage "STOP_CHAIN2 -> abort"; exit 0; }
  [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ] \
    && { stage "deadline -> stop"; exit 0; }
  return 0
}

latest_step() {
  ls "experiments/$1/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' \
    | sort -n | tail -1 || true
}

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
    bail_if_done
    step=$(latest_step "$exp"); step=${step:-0}
    if [ "$step" -ge "$iters" ]; then stage "$exp reached $step/$iters"; return 0; fi
    seg=$((seg + 1))
    stage "$exp segment $seg from step $step"
    # shellcheck disable=SC2086
    timeout 3600 "$PY" -m ideas_tpu.train_cli --exp_name "$exp" \
      --dataset_type synthetic_device --num_iters "$iters" \
      --image_size 256 --channel 32 --batch_size 8 --bf16 \
      --lambda_Ex 30 --ex_margin 0.2 --share_phase_noise \
      --compact_adam --save_every 4000 --keep_checkpoints 0 $extra \
      > "/tmp/${exp}_r5c2seg${seg}.log" 2>&1
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

stage "=== r5 chain2 start (deadline=$DEADLINE) ==="

# Refuse to start while chain 1 still runs (one TPU process rule).
if [ -f /tmp/r5chain.pid ] && kill -0 "$(cat /tmp/r5chain.pid)" 2>/dev/null; then
  stage "FATAL: r5chain (phase 1) still alive — refusing to double-book"
  exit 1
fi

train_to n2_20k_bestrecipe 80000 "--N 2"
commit_seed_main n2_20k_bestrecipe
bail_if_done

# Hand off: evals, FID trajectory, on-disk datapath, perf audits.
ENDGAME_DEADLINE="$DEADLINE" ./tools_round5_endgame.sh

stage "=== r5 chain2 done ==="
