#!/bin/bash
# Round-5 TPU job chain (VERDICT r4 items 1-6), one TPU process at a
# time, in leverage order with cheap evidence banked first:
#   1. n1_80k final-eval certification at 1280 imgs (sigma=1) and the
#      sigma=2 capacity sweep (VERDICT items 3+4)
#   2. N=2 run resumed 20k -> 80k, keep-all checkpoints (item 1)
#   3. its certified final eval (sigma=1 @1280, sigma=2) (items 1+3+4)
#   4. relative-FID trajectory over the N=2 run's checkpoints (item 2)
#   5. on-disk PNG dataset -> --dataset_type normal TPU run (item 5)
#   6. perf ledger items 9/10: nodonate + autolayout audits (item 6)
#
# Same hardening as tools_round4_chain.sh: orphan-ref seed snapshots,
# no-progress abort, STOP file, deadline.
#   Stop:      touch /tmp/STOP_CHAIN
#   Deadline:  CHAIN_DEADLINE=<epoch> ./tools_round5_chain.sh
#   Logs:      /tmp/r5chain.log (+ per-stage logs in /tmp)
set -u
cd /root/repo
PY=/opt/venv/bin/python
[ -x "$PY" ] || { echo "FATAL: $PY missing" >&2; exit 1; }
DEADLINE=${CHAIN_DEADLINE:-0}
exec >> /tmp/r5chain.log 2>&1

stage() { echo "[r5chain $(date +%H:%M:%S)] $*"; }
past_deadline() { [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; }
stop_requested() { [ -e /tmp/STOP_CHAIN ]; }
bail_if_done() {
  stop_requested && { stage "STOP_CHAIN -> abort"; exit 0; }
  past_deadline && { stage "deadline -> stop"; exit 0; }
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
    timeout 2700 "$PY" -m ideas_tpu.train_cli --exp_name "$exp" \
      --dataset_type synthetic_device --num_iters "$iters" \
      --image_size 256 --channel 32 --batch_size 8 --bf16 \
      --lambda_Ex 30 --ex_margin 0.2 --share_phase_noise \
      --compact_adam --save_every 2000 --keep_checkpoints 0 $extra \
      > "/tmp/${exp}_r5seg${seg}.log" 2>&1
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

final_eval() { # $1 exp, $2 n_batches, $3 sigma, $4 tag
  stage "final eval: $1 (n_batches=$2 sigma=$3)"
  timeout 3000 "$PY" tools_final_eval.py "experiments/$1" "$2" "$3" \
    > "/tmp/feval_$4.log" 2>&1
  grep -q "FINAL_EVAL_OK" "/tmp/feval_$4.log" \
    && stage "final eval $4 OK" || stage "WARN: final eval $4 failed"
}

stage "=== r5 chain start (deadline=$DEADLINE) ==="

# Stage 1: certified evals on the completed N=1 80k run (cheap evidence
# first — no training needed). 160 batches x 8 = 1280 images/cell.
if [ ! -d experiments/n1_80k_bestrecipe ]; then
  "$PY" -m ideas_tpu.tools.seed_checkpoint restore \
    seeds/n1_80k_bestrecipe.seed.tar.gz experiments/ \
    && stage "restored n1_80k seed" || stage "WARN: n1 restore failed"
fi
final_eval n1_80k_bestrecipe 160 1 n1s1
bail_if_done
final_eval n1_80k_bestrecipe 160 2 n1s2
bail_if_done

# Stage 2: N=2 to the paper's 80k budget (VERDICT item 1; ~3.3 h).
train_to n2_20k_bestrecipe 80000 "--N 2"
commit_seed_main n2_20k_bestrecipe
bail_if_done

# Stage 3: certified N=2 evals (1024 bits/img at sigma=1).
final_eval n2_20k_bestrecipe 160 1 n2s1
bail_if_done
final_eval n2_20k_bestrecipe 80 2 n2s2
bail_if_done

# Stage 4: relative-FID trajectory over the N=2 run's retained
# checkpoints (multiples of 8000) — VERDICT item 2's missing deliverable.
stage "relative-FID trajectory (N=2 run, checkpoints at 8000-iter multiples)"
timeout 3600 "$PY" tools_fid_trajectory.py experiments/n2_20k_bestrecipe 2000 32 8000 \
  > /tmp/fidtraj_n2.log 2>&1
grep -q "FID_TRAJECTORY_OK" /tmp/fidtraj_n2.log \
  && stage "FID trajectory OK" || stage "WARN: FID trajectory failed"
bail_if_done

# Stage 5: production on-disk data path — write PNGs, train from them
# through FolderDataset + raw-uint8 device normalize (VERDICT item 5).
if [ ! -d experiments/data_png ]; then
  stage "rasterizing synthetic family to PNGs"
  timeout 1800 "$PY" tools_make_dataset.py experiments/data_png 2048 256 default \
    > /tmp/makedata.log 2>&1
  grep -q "MAKE_DATASET_OK" /tmp/makedata.log \
    && stage "dataset written" || stage "WARN: dataset write failed"
fi
stage "on-disk datapath run (--dataset_type normal, 1200 iters)"
timeout 2700 "$PY" -m ideas_tpu.train_cli --exp_name ondisk_datapath \
  --dataset_type normal --dataset_path experiments/data_png \
  --num_iters 1200 --image_size 256 --channel 32 --batch_size 8 --bf16 \
  --lambda_Ex 30 --ex_margin 0.2 --share_phase_noise --compact_adam \
  --save_every 1200 --keep_checkpoints 1 \
  > /tmp/ondisk_run.log 2>&1
grep -q "imgs/s" experiments/ondisk_datapath/training_logs.txt \
  && stage "on-disk run OK" || stage "WARN: on-disk run failed"
bail_if_done

# Stage 6: perf ledger items 9/10 — donation + layout audits.
stage "perf audit: nodonate"
timeout 1800 "$PY" tools_bench_r3.py nodonate > /tmp/nodonate.log 2>&1
grep -q "BENCH_R3_OK" /tmp/nodonate.log \
  && stage "nodonate OK" || stage "WARN: nodonate failed"
bail_if_done
stage "perf audit: autolayout"
timeout 1800 "$PY" tools_bench_r3.py autolayout > /tmp/autolayout.log 2>&1
grep -q "BENCH_R3_OK" /tmp/autolayout.log \
  && stage "autolayout OK" || stage "WARN: autolayout failed"

git prune --expire=now 2>/dev/null || true
stage "=== r5 chain done ==="
