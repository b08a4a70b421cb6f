#!/bin/bash
# Round-4 TPU job chain: keeps the single TPU busy end-to-end.
#   1. wait for the live n1_80k_bestrecipe supervisor (PID in /tmp/n1run.pid)
#   2. final-eval sweep of the 80k run (delta = 0/25/50)
#   3. launch the N=2 (512 bits/image) 20k run with the same recipe
#   4. final-eval sweep of the N=2 run
#   5. relative-FID trajectory over the 80k run's checkpoints
# One TPU process at a time throughout (CLAUDE.md). Each stage writes its
# own log under /tmp and a STAGE_OK marker line; the chain aborts on the
# first failure so a broken stage can't waste TPU hours downstream.
set -u
PY=/opt/venv/bin/python
[ -x "$PY" ] || PY=python  # fall back when the venv moves
cd /root/repo
CHAIN_LOG=/tmp/chain.log
exec >> "$CHAIN_LOG" 2>&1

stage() { echo "[chain $(date +%H:%M:%S)] $*"; }

NPID=$(cat /tmp/n1run.pid 2>/dev/null || true)
if [ -n "${NPID}" ]; then
  stage "waiting on 80k supervisor pid ${NPID}"
  while [ -d "/proc/${NPID}" ]; do sleep 60; done
fi
if [ ! -d experiments/n1_80k_bestrecipe/checkpoints/80000 ]; then
  stage "ABORT: 80k run ended without an 80000 checkpoint"
  exit 1
fi
stage "80k run complete"

stage "final eval: n1_80k_bestrecipe"
timeout 2400 "$PY" tools_final_eval.py experiments/n1_80k_bestrecipe 16 \
  > /tmp/feval80k.log 2>&1
grep -q "FINAL_EVAL_OK" /tmp/feval80k.log || { stage "ABORT: 80k final eval failed"; exit 1; }
stage "final eval 80k OK"

stage "launching N=2 20k run"
"$PY" -m ideas_tpu.tools.supervise --stall-minutes 15 -- \
  "$PY" -m ideas_tpu.train_cli --exp_name n2_20k_bestrecipe \
    --dataset_type synthetic_device --num_iters 20000 --N 2 \
    --image_size 256 --channel 32 --batch_size 8 --bf16 \
    --lambda_Ex 30 --ex_margin 0.2 --share_phase_noise \
    --compact_adam --save_every 2000 --keep_checkpoints 100 \
  > /tmp/n2run.log 2>&1
if [ ! -d experiments/n2_20k_bestrecipe/checkpoints/20000 ]; then
  stage "ABORT: N=2 run ended without a 20000 checkpoint"
  exit 1
fi
stage "N=2 run complete"

stage "final eval: n2_20k_bestrecipe"
timeout 2400 "$PY" tools_final_eval.py experiments/n2_20k_bestrecipe 16 \
  > /tmp/feval_n2.log 2>&1
grep -q "FINAL_EVAL_OK" /tmp/feval_n2.log || { stage "ABORT: N=2 final eval failed"; exit 1; }
stage "final eval N=2 OK"

stage "FID trajectory over the 80k checkpoints"
timeout 7200 "$PY" tools_fid_trajectory.py experiments/n1_80k_bestrecipe 2000 32 \
  > /tmp/fidtraj.log 2>&1
stage "FID trajectory done (rc=$?)"

stage "CHAIN_DONE"
