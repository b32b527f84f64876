"""Microbench: dilated causal conv formulations for the WaveNet train step.

The 40-layer gated stack is FLOP-bound at training shapes (B=16 x 11k crops)
and measured ~96 TF/s bf16 via lax.conv_general_dilated — ~49% of v5e peak.
Candidates for the same math:
  conv  — lax.conv_general_dilated k=3, rhs_dilation=d (current)
  taps  — y = x@W2 + shift(x,d)@W1 + shift(x,2d)@W0 (three [B*T,C] matmuls)
  wide  — y = concat(shift(x,2d), shift(x,d), x) @ W  (one [B*T,3C] matmul)

Times fwd and fwd+bwd of a full 40-layer gated stack (no cond) per form.

Usage: python scripts/bench_wavenet_conv_forms.py [--batch 16] [--t 11000]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_train import _enable_compile_cache  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--t", type=int, default=11000)
    p.add_argument("--layers", type=int, default=40)
    p.add_argument("--rc", type=int, default=128)
    p.add_argument("--gc", type=int, default=256)
    p.add_argument("--sc", type=int, default=128)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args(argv)

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    B, T, L = args.batch, args.t, args.layers
    RC, GC, SC = args.rc, args.gc, args.sc
    dilations = [2 ** (i % 20) for i in range(L)]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    params = []
    for d in dilations:
        params.append(dict(
            wk=jnp.asarray(rng.normal(size=(3, RC, GC)) * 0.05, dt),
            ws=jnp.asarray(rng.normal(size=(GC // 2, SC)) * 0.05, dt),
            wo=jnp.asarray(rng.normal(size=(GC // 2, RC)) * 0.05, dt)))
    x0 = jnp.asarray(rng.normal(size=(B, T, RC)) * 0.1, dt)

    def block_tail(y, x, p):
        a, b = jnp.split(y, 2, axis=-1)
        h = jnp.tanh(a) * jax.nn.sigmoid(b)
        s = h @ p["ws"]
        return (h @ p["wo"] + x) * jnp.asarray(np.sqrt(0.5), dt), s

    def stack_conv(params, x):
        skips = 0.
        for p, d in zip(params, dilations):
            xp = jnp.pad(x, ((0, 0), (2 * d, 0), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xp, p["wk"], (1,), "VALID", rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"))
            x, s = block_tail(y, x, p)
            skips = skips + s
        return jnp.sum(skips.astype(jnp.float32) ** 2)

    def shift(x, d):
        return jnp.pad(x, ((0, 0), (d, 0), (0, 0)))[:, :x.shape[1]]

    def stack_taps(params, x):
        skips = 0.
        for p, d in zip(params, dilations):
            y = (shift(x, 2 * d) @ p["wk"][0] + shift(x, d) @ p["wk"][1]
                 + x @ p["wk"][2])
            x, s = block_tail(y, x, p)
            skips = skips + s
        return jnp.sum(skips.astype(jnp.float32) ** 2)

    def stack_wide(params, x):
        skips = 0.
        for p, d in zip(params, dilations):
            xw = jnp.concatenate([shift(x, 2 * d), shift(x, d), x], axis=-1)
            y = xw @ p["wk"].reshape(3 * RC, GC)
            x, s = block_tail(y, x, p)
            skips = skips + s
        return jnp.sum(skips.astype(jnp.float32) ** 2)

    flops_fwd = L * B * T * (3 * RC * GC + GC // 2 * SC + GC // 2 * RC) * 2

    def timeit(name, fn, *a, iters=args.steps, mult=1.0):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(leaves[0].ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(leaves[0].ravel()[0]))
        dtms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:24s} {dtms:8.2f} ms   {flops_fwd * mult / dtms / 1e9:7.1f} TF/s",
              flush=True)
        return dtms

    for name, fn in [("conv", stack_conv), ("taps", stack_taps),
                     ("wide", stack_wide)]:
        timeit(f"{name} fwd", jax.jit(fn), params, x0)
        timeit(f"{name} fwd+bwd", jax.jit(jax.grad(fn)), params, x0, mult=3.0)


if __name__ == "__main__":
    main()
