"""Round-3 perf-candidate bench: ONE config per process invocation
(a failed config's HBM poisons the next in-process — PERF.md gotcha).

    python tools_bench_r3.py <mode> [batch=8] [iters=48]

Modes (all: 256^2, channel 32, bf16 compute, share_phase_noise on —
the bench.py headline config — unless stated):

    base           headline config, control datapoint
    compact        + compact_adam (fp32 nu; exact update parity)
    compact_bf16   + compact_adam with bfloat16 nu
    rgb_micro      standalone micro-bench: C=3 from/to-RGB convs vs
                   8-lane-padded variants (no trainer)
    demod_micro    standalone micro-bench: is the demod multiply fused
                   into the conv epilogue? (no trainer)
    nodonate       headline config with buffer donation DISABLED
                   (quantifies what donate_argnums is worth)
"""

import sys
import time


def sync_scalar(x):
    import jax
    import jax.numpy as jnp

    return float(jax.device_get(jnp.sum(x)))


def bench_step(donate=True, **cfg_kw):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ideas_tpu.config import TrainConfig
    from ideas_tpu.train import Trainer

    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    cfg = TrainConfig(image_size=256, channel=32, batch_size=batch,
                      compute_dtype=jnp.bfloat16, share_phase_noise=True,
                      **cfg_kw)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x = jax.device_put(np.random.default_rng(0)
                       .uniform(-1, 1, (batch, 256, 256, 3)).astype(np.float32))
    step_plain = trainer.train_step_fn(do_r1=False, donate=donate)
    step_r1 = trainer.train_step_fn(do_r1=True, donate=donate)
    for _ in range(2):
        state, m = step_plain(state, x)
    state, m = step_r1(state, x)
    sync_scalar(m["Loss_total"])
    t0 = time.time()
    n = 0
    for i in range(iters):
        fn = step_r1 if (i + 1) % cfg.d_reg_every == 0 else step_plain
        state, m = fn(state, x)
        n += batch
    sync_scalar(m["Loss_total"])
    dt = time.time() - t0
    print(f"RESULT {sys.argv[1]}: {n/dt:.2f} imgs/s "
          f"({dt/iters*1000:.2f} ms/step, batch {batch}, {iters} iters)")
    print("BENCH_R3_OK")


def bench_rgb_micro():
    """C=3 boundary convs: does explicit lane padding beat XLA's own
    handling of 3-channel operands? Measures the two real boundary ops:
      from_rgb: 1x1 conv 3->32 at 256^2 (encoder stem / D stems)
      to_rgb:   1x1 conv 128->3 at 256^2 (generator head)
    against variants where C=3 is zero-padded to 8 lanes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    B, H = 24, 256  # the trainer's 3x-batch generator/discriminator load
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((B, H, H, 3)), jnp.bfloat16)
    x8 = jnp.pad(x3, ((0, 0), (0, 0), (0, 0), (0, 5)))
    f128 = jnp.asarray(rng.standard_normal((B, H, H, 128)), jnp.bfloat16)
    w3_32 = jnp.asarray(rng.standard_normal((1, 1, 3, 32)), jnp.bfloat16)
    w8_32 = jnp.pad(w3_32, ((0, 0), (0, 0), (0, 5), (0, 0)))
    w128_3 = jnp.asarray(rng.standard_normal((1, 1, 128, 3)), jnp.bfloat16)
    w128_8 = jnp.pad(w128_3, ((0, 0), (0, 0), (0, 0), (0, 5)))

    # Arrays are ARGUMENTS, not closures: a closed-over 384 MB bf16
    # activation becomes an HLO constant and blows the axon remote-compile
    # request body limit (HTTP 413, observed round 3).
    @jax.jit
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cases = {
        "from_rgb C=3": (x3, w3_32),
        "from_rgb padded C=8": (x8, w8_32),
        "to_rgb Cout=3": (f128, w128_3),
        "to_rgb padded Cout=8": (f128, w128_8),
    }
    for name, (x, w) in cases.items():
        sync_scalar(conv(x, w))  # compile
        t0 = time.time()
        out = None
        for _ in range(50):
            out = conv(x, w)
        sync_scalar(out)
        print(f"RESULT {name}: {(time.time()-t0)/50*1000:.3f} ms")
    print("BENCH_R3_OK")


def bench_demod_micro():
    """Is the per-(batch, out-channel) demodulation multiply an extra HBM
    round trip, or does XLA fuse it into the conv epilogue with the bias
    and leaky-relu? Measures the hot 3x3 StyledConv shape (128^2 x 256,
    3B=24, bf16) in four forms:
      conv            bare modulated conv (no demod multiply, no act)
      conv+demod      + the y * demod[b,o] multiply
      conv+demod+act  + bias + fused leaky-relu (the real StyledConv tail)
      conv+act        bias + lrelu but demod skipped (isolates demod cost)
    If all four sit within conv's time +- noise, the epilogue is already
    fused and the 'XLA-level fused demod epilogue' candidate is closed."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ideas_tpu.ops.fused_act import fused_leaky_relu

    B, H, C = 24, 128, 256
    rng = np.random.default_rng(0)
    xm = jnp.asarray(rng.standard_normal((B, H, H, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02, jnp.bfloat16)
    demod = jnp.asarray(rng.uniform(0.5, 2.0, (B, C)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((C,)), jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cases = {
        "conv": jax.jit(lambda x, w, d, b: conv(x, w)),
        "conv+demod": jax.jit(
            lambda x, w, d, b: conv(x, w) * d[:, None, None, :]),
        "conv+demod+act": jax.jit(
            lambda x, w, d, b: fused_leaky_relu(
                conv(x, w) * d[:, None, None, :], b)),
        "conv+act": jax.jit(
            lambda x, w, d, b: fused_leaky_relu(conv(x, w), b)),
    }
    for name, fn in cases.items():
        sync_scalar(fn(xm, w, demod, bias))  # compile
        t0 = time.time()
        out = None
        for _ in range(50):
            out = fn(xm, w, demod, bias)
        sync_scalar(out)
        print(f"RESULT {name}: {(time.time()-t0)/50*1000:.3f} ms")
    print("BENCH_R3_OK")


def bench_autolayout():
    """Layout audit: let XLA choose entry/exit layouts (Layout.AUTO) for
    the R1 train step instead of JAX's default row-major, and time the
    steady-state loop. If XLA wants a non-default layout for the Adam
    states / params, this wins; if default layouts are already optimal
    (likely — everything is NHWC/HWIO dense), it's neutral and the audit
    closes. Times the R1 step ALONE (one program; cross-program layout
    consistency only matters if this shows a win)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    from ideas_tpu.config import TrainConfig
    from ideas_tpu.train import Trainer

    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    cfg = TrainConfig(image_size=256, channel=32, batch_size=8,
                      compute_dtype=jnp.bfloat16, share_phase_noise=True,
                      compact_adam=True)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x = jax.device_put(np.random.default_rng(0)
                       .uniform(-1, 1, (8, 256, 256, 3)).astype(np.float32))
    inner = trainer.build_train_step(do_r1=True)

    # Compile BOTH programs and lay out the auto copy BEFORE running the
    # default loop: the default loop donates `state`, so the auto inputs
    # must be copied out of it first.
    c_default = jax.jit(inner, donate_argnums=(0,)).lower(state, x).compile()
    c_auto = jax.jit(
        inner, donate_argnums=(0,),
        in_shardings=Format(Layout.AUTO),
        out_shardings=Format(Layout.AUTO),
    ).lower(state, x).compile()
    fmts_d = jax.tree.leaves(c_default.input_formats[0]) + \
        jax.tree.leaves(c_default.input_formats[1])
    fmts_a = jax.tree.leaves(c_auto.input_formats[0]) + \
        jax.tree.leaves(c_auto.input_formats[1])
    ndiff = sum(1 for a, b in zip(fmts_a, fmts_d) if str(a) != str(b))
    print(f"INFO auto picked {ndiff}/{len(fmts_a)} non-default input layouts")
    st_a, x_a = jax.device_put((state, x), c_auto.input_formats[0:2])

    for name, compiled, st, xx in (
        ("default-layout", c_default, state, x),
        ("auto-layout", c_auto, st_a, x_a),
    ):
        st, m = compiled(st, xx)
        sync_scalar(m["Loss_total"])
        t0 = time.time()
        for _ in range(iters):
            st, m = compiled(st, xx)
        sync_scalar(m["Loss_total"])
        print(f"RESULT {name}: {(time.time()-t0)/iters*1000:.2f} ms/step "
              f"({iters} R1 iters)")
    print("BENCH_R3_OK")


def main():
    mode = sys.argv[1]
    if mode == "base":
        bench_step()
    elif mode == "compact":
        bench_step(compact_adam=True)
    elif mode == "compact_bf16":
        bench_step(compact_adam=True, adam_nu_dtype="bfloat16")
    elif mode == "rgb_micro":
        bench_rgb_micro()
    elif mode == "demod_micro":
        bench_demod_micro()
    elif mode == "nodonate":
        bench_step(donate=False, compact_adam=True)
    elif mode == "autolayout":
        bench_autolayout()
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
