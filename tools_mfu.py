"""MFU ledger: analytic FLOPs-per-step for the full IDEAS training
iteration, from XLA's own cost model (jit(...).lower(...).cost_analysis()
— trace only, no compile), at the paper 256^2 config.

    python tools_mfu.py [--step-ms 208 --r1-ms 233]

Prints FLOPs for the plain step and the R1 step, the d_reg_every-
amortized average, and — given measured step times (PERF.md) — the
resulting model FLOP utilization against both the measured bf16 matmul
peak on this chip (176 TF/s) and the v5e nominal 197 TF/s.

Runs on the CPU backend (cost analysis is backend-independent at this
level; lowering happens pre-partitioning).
"""

import argparse

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--step-ms", type=float, default=208.0,
                   help="measured no-R1 step time (PERF.md)")
    p.add_argument("--r1-ms", type=float, default=233.0,
                   help="measured R1 step time (PERF.md)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--channel", type=int, default=32)
    a = p.parse_args()

    from ideas_tpu.config import TrainConfig
    from ideas_tpu.train import Trainer

    cfg = TrainConfig(image_size=a.image_size, channel=a.channel,
                      batch_size=a.batch, compute_dtype=jnp.bfloat16)
    trainer = Trainer(cfg)
    state_shape = jax.eval_shape(trainer.init_state, jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct(
        (cfg.batch_size, cfg.image_size, cfg.image_size, 3), jnp.float32)

    flops = {}
    for name, do_r1 in (("plain", False), ("r1", True)):
        step = jax.jit(trainer.build_train_step(do_r1))
        lowered = step.lower(state_shape, x, jax.random.PRNGKey(1))
        ca = lowered.cost_analysis()
        flops[name] = float(ca["flops"])
        print(f"{name} step: {flops[name] / 1e12:.3f} TFLOP "
              f"({ca.get('bytes accessed', float('nan')) / 1e9:.2f} GB accessed)")

    k = cfg.d_reg_every
    avg_flops = ((k - 1) * flops["plain"] + flops["r1"]) / k
    avg_ms = ((k - 1) * a.step_ms + a.r1_ms) / k
    tf_per_s = avg_flops / (avg_ms / 1e3) / 1e12
    print(f"amortized (1/{k} R1): {avg_flops / 1e12:.3f} TFLOP / "
          f"{avg_ms:.1f} ms -> {tf_per_s:.1f} TF/s")
    print(f"MFU vs 176 TF/s measured bf16 peak: {tf_per_s / 176 * 100:.1f}%")
    print(f"MFU vs 197 TF/s v5e nominal:        {tf_per_s / 197 * 100:.1f}%")
    ips = cfg.batch_size / (avg_ms / 1e3)
    print(f"imgs/sec at these times: {ips:.1f}")
    print("MFU_OK")


if __name__ == "__main__":
    main()
