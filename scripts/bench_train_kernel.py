"""Bench the fused teacher-forced decoder (fwd + custom_vjp bwd) on chip vs
the XLA scan path, at full model size.

Usage: python scripts/bench_train_kernel.py [--batch 32] [--t-in 128]
       [--steps 200] [--dtype bfloat16] [--fwd-only] [--scan]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--t-in", type=int, default=128)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--m", type=int, default=768)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--scan", action="store_true",
                   help="also time the flax scan fwd+bwd")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from tacotron2_tpu.config import get_config
    from tacotron2_tpu.models.tacotron.decoder import Decoder
    from tacotron2_tpu.ops.tacotron_train_kernel import (
        extract_decoder_params_traced, make_fused_teacher_forced)

    B, T_IN, STEPS, M = args.batch, args.t_in, args.steps, args.m
    wd = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = get_config("default")
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.normal(size=(B, T_IN, M)) * 0.1, jnp.float32)
    mask = jnp.ones((B, T_IN), bool)
    keys = jnp.asarray(rng.normal(size=(B, T_IN, 128)) * 0.1, jnp.float32)
    r, mels = cfg.tacotron.outputs_per_step, cfg.audio.num_mels
    mel_targets = jnp.asarray(rng.normal(size=(B, STEPS * r, mels)),
                              jnp.float32)
    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2),
                teacher_forcing=jax.random.PRNGKey(3))
    variables = dec.init(rngs, mel_targets, keys, memory, mask, 1.0,
                         train=True, method=Decoder.teacher_forced)
    params = variables["params"]

    fused = make_fused_teacher_forced(cfg, B, T_IN, STEPS, M, weight_dtype=wd)
    tf_inputs = mel_targets[:, r - 1::r, :]
    teacher = jnp.concatenate(
        [jnp.zeros((B, 1, mels)), tf_inputs[:, :-1]], 1).transpose(1, 0, 2)
    coins = jnp.ones((STEPS,), jnp.int32)
    seed = jnp.asarray(3, jnp.int32)

    def sync(x):
        return float(jnp.sum(x.ravel()[-1:]))

    def timeit(fn, label, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        sync(leaf)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps(dict(label=label, ms=round(dt * 1e3, 2),
                              us_per_step=round(dt / STEPS * 1e6, 2),
                              compile_s=round(compile_s, 1))))
        return dt

    # fwd only
    fwd_fn = jax.jit(lambda p, k, m: fused(
        extract_decoder_params_traced({"decoder": p}, cfg), k, m, mask,
        teacher, coins, seed)[0])
    timeit(fwd_fn, f"fused fwd B={B} {args.dtype}", params, keys, memory)

    if not args.fwd_only:
        def loss_fused(p, k, m):
            f, s, a = fused(extract_decoder_params_traced({"decoder": p}, cfg),
                            k, m, mask, teacher, coins, seed)
            return jnp.sum(f * f) + jnp.sum(s * s)

        grad_fn = jax.jit(jax.grad(loss_fused))
        timeit(grad_fn, f"fused fwd+bwd B={B} {args.dtype}", params, keys,
               memory)

    if args.scan:
        bf = args.dtype == "bfloat16"
        cfg_s = cfg.with_overrides(
            "tacotron.compute_dtype=bfloat16") if bf else cfg

        dec_s = Decoder(config=cfg_s)

        def loss_scan(p, k, m):
            f, s, a, _ = dec_s.apply(
                {"params": p}, mel_targets, k, m, mask, 1.0, train=True,
                method=Decoder.teacher_forced,
                rngs=dict(dropout=jax.random.PRNGKey(7),
                          zoneout=jax.random.PRNGKey(8),
                          teacher_forcing=jax.random.PRNGKey(9)))
            return jnp.sum(f * f) + jnp.sum(s * s)

        timeit(jax.jit(loss_scan), f"scan fwd B={B} {args.dtype}",
               params, keys, memory)
        timeit(jax.jit(jax.grad(loss_scan)), f"scan fwd+bwd B={B} {args.dtype}",
               params, keys, memory)


if __name__ == "__main__":
    main()
