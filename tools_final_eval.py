"""Final quality eval of a trained 256^2 run: extraction-ACC sweep at
delta in {0, 25, 50}% (the paper's headline table, BASELINE.md) from the
latest EMA checkpoint. One TPU process; ~3-6 min of compiles.

    python tools_final_eval.py [exp_dir=/tmp/exp/paper256dev] [n_batches=16] [sigma=1]

n_batches * batch_size images are evaluated (bits = images * N * res^2 *
sigma); flips are counted exactly and a 95% Wilson CI is printed so
100.00% cells carry their sample size. sigma=2 exercises the adaptive
mapping's capacity axis (`/root/reference/utils.py:74-97`): 2 bits per
latent element, i.e. 512 bits/image at N=1, 256^2.
"""

import sys

import jax
import jax.numpy as jnp


def _cfg_from_experiment(exp_dir):
    """Rebuild the TrainConfig from the experiment's training_config.txt
    (so N=2 / non-default runs evaluate with their own geometry)."""
    import os

    from ideas_tpu.config import TrainConfig

    over = {}
    path = os.path.join(exp_dir, "training_config.txt")

    def _bool(v):
        return v.strip() == "True"

    # compact_adam/adam_nu_dtype flip the OPT-STATE pytree structure, so
    # the checkpoint-restore template must be built with them or orbax
    # rejects the tree (the round-3 80k run trains with --compact_adam).
    want = {"image_size": int, "channel": int, "batch_size": int, "N": int,
            "texture_channel": int, "structure_channel": int,
            "num_iters": int, "channel_multiplier": int,
            "lambda_Ex": float, "ex_margin": float,
            "compact_adam": _bool, "share_phase_noise": _bool,
            "adam_nu_dtype": str, "synthetic_family": str}
    if os.path.exists(path):
        for line in open(path):
            k, _, v = line.partition(":")
            k, v = k.strip(), v.strip()
            if k in want:
                over[k] = want[k](v)
            if k == "compute_dtype" and "bfloat16" in v:
                over["compute_dtype"] = jnp.bfloat16
    else:
        print(f"WARNING: {path} missing; using paper-256 defaults")
        over = dict(image_size=256, channel=32, batch_size=8,
                    compute_dtype=jnp.bfloat16, num_iters=80000)
    return TrainConfig(**over)


def main():
    exp_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/exp/paper256dev"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sigma = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from ideas_tpu.checkpoint import CheckpointManager
    from ideas_tpu.eval.metrics import extraction_accuracy_sweep, wilson_interval
    from ideas_tpu.train import Trainer

    cfg = _cfg_from_experiment(exp_dir)
    print(f"config: size={cfg.image_size} channel={cfg.channel} "
          f"N={cfg.N} batch={cfg.batch_size} dtype={cfg.compute_dtype}")
    trainer = Trainer(cfg)
    # Abstract template: eval_shape traces init_state without compiling
    # it (the init program alone is minutes of remote compile on the
    # relay); orbax only needs shapes/dtypes/structure to restore.
    template = jax.eval_shape(
        lambda k: trainer.init_state(k), jax.random.PRNGKey(0)
    )
    manager = CheckpointManager(f"{exp_dir}/checkpoints")
    step = manager.latest_step()
    state = manager.restore(template, step)
    print(f"checkpoint iter: {int(jax.device_get(state.step))}", flush=True)

    sweep = extraction_accuracy_sweep(
        trainer, state, jax.random.PRNGKey(123), n_batches=n_batches,
        sigma=sigma,
    )
    bits = cfg.N * (cfg.image_size // 16) ** 2 * sigma
    print(f"payload: {bits} bits/image (N={cfg.N}, sigma={sigma}); "
          f"{n_batches * cfg.batch_size} images/cell")
    for delta, r in sweep.items():
        lo, hi = wilson_interval(r["flips"], r["bits"])
        print(f"ACC @ delta={int(delta*100)}%: {r['acc']*100:.2f}% "
              f"({r['flips']} flips / {r['bits']} bits; "
              f"95% CI [{(1-hi)*100:.3f}, {(1-lo)*100:.3f}]%)")
    print("FINAL_EVAL_OK")


if __name__ == "__main__":
    main()
