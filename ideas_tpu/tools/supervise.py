"""Training supervisor: stall detection + automatic resume.

The reference has no failure handling — a crash means manually
restarting from `--ckpt` (SURVEY.md §5, `/root/reference/train.py:434-442`).
On remote-attached TPUs, a dropped relay RPC can also *hang* the client
forever (observed: trainer frozen on a futex mid-dispatch with the
device idle). This supervisor closes that gap:

    python -m ideas_tpu.tools.supervise --stall-minutes 15 -- \
        python -m ideas_tpu.train_cli --exp_name run ...

It launches the command, watches the newest mtime among the experiment's
log files, and if nothing advances for --stall-minutes, kills the
process group and relaunches. The train CLI resumes from the latest
orbax checkpoint automatically, so each restart loses at most
`save_every` iterations. Exits when the child exits 0 (training done)
or after --max-restarts consecutive restarts without progress.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def newest_mtime(paths):
    ts = 0.0
    for p in paths:
        try:
            ts = max(ts, os.stat(p).st_mtime)
        except OSError:
            pass
    return ts


def total_size(paths):
    n = 0
    for p in paths:
        try:
            n += os.stat(p).st_size
        except OSError:
            pass
    return n


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--watch", action="append", default=[],
                   help="file(s) whose mtime indicates progress "
                        "(default: <experiments_dir>/<exp>/training_logs.txt "
                        "guessed from the command line)")
    p.add_argument("--stall-minutes", type=float, default=15.0)
    p.add_argument("--startup-minutes", type=float, default=40.0,
                   help="grace period after each (re)launch before stall "
                        "detection arms — covers the initial jit compiles "
                        "(2-6 min per program on the remote relay, more "
                        "under host-CPU contention), during which the log "
                        "legitimately goes quiet after its header line")
    p.add_argument("--poll-seconds", type=float, default=30.0)
    p.add_argument("--max-restarts", type=int, default=10)
    p.add_argument("command", nargs=argparse.REMAINDER,
                   help="-- followed by the training command")
    a = p.parse_args(argv)
    cmd = a.command[1:] if a.command and a.command[0] == "--" else a.command
    if not cmd:
        p.error("no command given (use: supervise [opts] -- cmd ...)")

    watch = list(a.watch)
    if not watch:
        # Guess <experiments_dir>/<exp_name>/training_logs.txt from flags.
        exp, base = None, "experiments"
        for i, tok in enumerate(cmd):
            if tok == "--exp_name" and i + 1 < len(cmd):
                exp = cmd[i + 1]
            if tok == "--experiments_dir" and i + 1 < len(cmd):
                base = cmd[i + 1]
        if exp:
            watch = [os.path.join(base, exp, "training_logs.txt")]
    if not watch:
        p.error("could not infer a --watch file; pass one explicitly")

    stall = a.stall_minutes * 60.0
    restarts_without_progress = 0
    while True:
        print(f"[supervise] launching: {' '.join(cmd)}", flush=True)
        child = subprocess.Popen(cmd, start_new_session=True)
        launch_t = time.time()
        launch_size = total_size(watch)
        progressed = False
        # Progress = the watched logs GROW after stall detection arms
        # (end of the startup grace). Headers — config dump, device
        # line, the post-compile "resumed from checkpoint" — all land
        # during the grace window, so they can never reset the restart
        # counter; training lines recur every log_every iters, so real
        # progress keeps growing the file after arming. Progress made
        # DURING the grace window also counts: a child that trains real
        # iterations before hanging grows the log far beyond the
        # per-launch header (~one device line), and abandoning a run
        # that advances through checkpoints each restart would be wrong.
        header_allowance = 512  # bytes; per-launch header is ~60
        armed_size = None
        while True:
            try:
                rc = child.wait(timeout=a.poll_seconds)
                if rc == 0:
                    print("[supervise] training finished", flush=True)
                    return 0
                print(f"[supervise] child exited rc={rc}; restarting", flush=True)
                break
            except subprocess.TimeoutExpired:
                pass
            last = newest_mtime(watch)
            size = total_size(watch)
            in_grace = time.time() - launch_t < a.startup_minutes * 60.0
            if not in_grace:
                if armed_size is None:
                    armed_size = size  # snapshot once, at arming
                    if size > launch_size + header_allowance:
                        progressed = True  # grew during grace = real work
                elif size > armed_size:
                    progressed = True
            # Startup grace: the config/log header is written immediately
            # at launch, then the log goes quiet through the first jit
            # compiles — don't count that as a stall.
            if in_grace:
                continue
            # Stall = no watched-file update for `stall` seconds (measured
            # from launch if nothing was ever written).
            ref = max(last, launch_t)
            if time.time() - ref > stall:
                print(
                    f"[supervise] no progress on {watch} for "
                    f"{a.stall_minutes} min; killing pgid {child.pid}",
                    flush=True,
                )
                try:
                    os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                except OSError:
                    child.kill()
                child.wait()
                break
        restarts_without_progress = 0 if progressed else restarts_without_progress + 1
        if restarts_without_progress >= a.max_restarts:
            print("[supervise] too many restarts without progress; giving up",
                  flush=True)
            return 1
        time.sleep(5.0)


if __name__ == "__main__":
    sys.exit(main())
