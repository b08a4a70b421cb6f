"""Archive / restore a training run's latest checkpoint through git.

The driver host is recycled between rounds and ONLY git-committed files
survive (round 3 lost a 9k-iter seed run that lived in the gitignored
`experiments/`). This tool makes long runs recycle-proof:

  # end of round: pack the newest checkpoint (+ config + logs) into a
  # tracked tarball
  python -m ideas_tpu.tools.seed_checkpoint archive \
      experiments/n1_80k_bestrecipe seeds/

  # start of next round: unpack so train_cli auto-resumes from
  # manager.latest_step()
  python -m ideas_tpu.tools.seed_checkpoint restore \
      seeds/n1_80k_bestrecipe.seed.tar.gz experiments/

The archive holds exactly one checkpoint step (the latest completed
one), `training_config.txt`, and `training_logs.txt`/`metrics.jsonl`
when present — everything `train_cli.py:146` needs to resume, nothing
else. Orbax writes checkpoints atomically (tmp dir + rename), so the
latest *committed* step is always consistent even if the run was killed
mid-save; in-progress tmp dirs are skipped.

Reference contract being preserved: `/root/reference/train.py:307-320`
(single-file save/resume of iter + all model/optimizer slots) — here the
unit of durability is the git history instead of a filesystem path.
"""

from __future__ import annotations

import json
import os
import sys
import tarfile


def _latest_step_dir(ckpt_dir: str) -> tuple[int, str]:
    """Newest *completed* orbax step dir (numeric name, no tmp marker)."""
    steps = []
    for name in os.listdir(ckpt_dir):
        path = os.path.join(ckpt_dir, name)
        if not (name.isdigit() and os.path.isdir(path)):
            continue  # skips orbax tmp dirs (e.g. "7000.orbax-checkpoint-tmp-...")
        steps.append(int(name))
    if not steps:
        raise FileNotFoundError(f"no completed checkpoint under {ckpt_dir}")
    step = max(steps)
    return step, os.path.join(ckpt_dir, str(step))


def archive(exp_dir: str, out_dir: str) -> str:
    exp_dir = os.path.abspath(exp_dir)
    exp_name = os.path.basename(exp_dir.rstrip("/"))
    step, step_dir = _latest_step_dir(os.path.join(exp_dir, "checkpoints"))
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{exp_name}.seed.tar.gz")
    tmp_path = out_path + ".tmp"
    with tarfile.open(tmp_path, "w:gz", compresslevel=4) as tar:
        tar.add(step_dir, arcname=f"{exp_name}/checkpoints/{step}")
        for extra in ("training_config.txt", "training_logs.txt",
                      "metrics.jsonl"):
            p = os.path.join(exp_dir, extra)
            if os.path.exists(p):
                tar.add(p, arcname=f"{exp_name}/{extra}")
    os.replace(tmp_path, out_path)
    manifest = {"exp_name": exp_name, "step": step,
                "size_bytes": os.path.getsize(out_path)}
    with open(os.path.join(out_dir, f"{exp_name}.seed.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))
    return out_path


def restore(seed_tar: str, experiments_dir: str) -> None:
    os.makedirs(experiments_dir, exist_ok=True)
    with tarfile.open(seed_tar, "r:gz") as tar:
        tar.extractall(experiments_dir, filter="data")
    print(f"restored {seed_tar} under {experiments_dir}")


def main(argv) -> int:
    if len(argv) != 3 or argv[0] not in ("archive", "restore"):
        print(__doc__)
        return 2
    if argv[0] == "archive":
        archive(argv[1], argv[2])
    else:
        restore(argv[1], argv[2])
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
