"""Decompose the Tacotron train step time (real chip): which parts own the
~40 ms outside the fused decoder at B=96 x 400 frames?

Times, as separately jitted fwd+bwd closures over the real trained params:
  - full train_step (reference point)
  - encoder path (embed + conv stack + BiLSTM + ref encoders + GST + keys)
  - postnet fwd+bwd alone
  - optimizer apply alone (adam update on ready grads)

Usage: python scripts/profile_taco_train.py [--batch 96] [--t-out 400]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_train import _enable_compile_cache  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--t-out", type=int, default=400)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args(argv)

    _enable_compile_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.train.tacotron_step import TacotronTrainer

    cfg = Config()
    if not args.f32:
        cfg = cfg.replace(tacotron=dataclasses.replace(
            cfg.tacotron, compute_dtype="bfloat16",
            use_fused_train_decoder=True))

    B, T_out = args.batch, args.t_out
    T_in = max(8, T_out // 8)
    rng = np.random.default_rng(0)
    batch = dict(
        inputs=jnp.asarray(rng.integers(2, 60, (B, T_in)), jnp.int32),
        input_lengths=jnp.full((B,), T_in, jnp.int32),
        mel_targets=jnp.asarray(
            rng.uniform(-4, 4, (B, T_out, cfg.audio.num_mels)), jnp.float32),
        stop_token_targets=jnp.zeros((B, T_out), jnp.float32),
        targets_lengths=jnp.full((B,), T_out, jnp.int32),
        ref_mel_emt=jnp.asarray(
            rng.uniform(-4, 4, (B, 128, cfg.audio.num_mels)), jnp.float32),
        ref_mel_spk=jnp.asarray(
            rng.uniform(-4, 4, (B, 128, cfg.audio.num_mels)), jnp.float32),
        emt_labels=jnp.zeros((B,), jnp.int32),
        spk_labels=jnp.zeros((B,), jnp.int32))

    trainer = TacotronTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    model = trainer.model

    def timeit(name, fn, *a, iters=args.steps):
        out = fn(*a)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
        # sync through a scalar fetch (tunnel-safe, see bench.py)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "ravel") and x.size]
        float(jnp.sum(leaves[0].ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "ravel") and x.size]
        float(jnp.sum(leaves[0].ravel()[0]))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:42s} {dt:8.2f} ms")
        return dt

    # 1. full step
    step = jax.jit(trainer.train_step)
    timeit("full train_step", step, state, batch, jax.random.PRNGKey(1))

    # 2. forward-only loss
    rngs = dict(zip(["dropout", "zoneout", "teacher_forcing"],
                    jax.random.split(jax.random.PRNGKey(1), 3)))

    def fwd_loss(params):
        out, _ = trainer._forward(params, state.batch_stats, batch, rngs,
                                  jnp.asarray(1.0), train=True)
        terms = trainer._losses(out, batch, params)
        return terms["loss"]

    timeit("forward-only (loss value)", jax.jit(fwd_loss), state.params)

    # 3. encoder path fwd+bwd: embed+convs+BiLSTM+refenc+GST+keys
    def enc_loss(params):
        if cfg.tacotron.compute_dtype == "bfloat16":
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        keys, memory, mask = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["inputs"], batch["input_lengths"],
            batch["ref_mel_emt"], batch["ref_mel_spk"],
            method=model.synthesis_memory)
        return jnp.sum(keys.astype(jnp.float32) ** 2) + \
            jnp.sum(memory.astype(jnp.float32) ** 2)

    timeit("encoder+refenc+GST fwd+bwd", jax.jit(jax.grad(enc_loss)),
           state.params)

    # 4. postnet fwd+bwd alone
    frames = batch["mel_targets"]

    def post_loss(params):
        if cfg.tacotron.compute_dtype == "bfloat16":
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        dec, mel = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            frames, method=model.postnet_pass)
        return jnp.sum(mel.astype(jnp.float32) ** 2)

    timeit("postnet fwd+bwd", jax.jit(jax.grad(post_loss)), state.params)

    # 5. optimizer apply alone
    tx_main = trainer.ensure_tx(state.params)[0]
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)

    def opt_apply(g, opt_state, params):
        import optax
        upd, new_opt = tx_main.update(g, opt_state, params)
        return optax.apply_updates(params, upd), new_opt

    timeit("optimizer update+apply", jax.jit(opt_apply), grads,
           state.opt_state_main, state.params)

    # 6. losses alone on ready outputs
    out, _ = trainer._forward(state.params, state.batch_stats, batch, rngs,
                              jnp.asarray(1.0), train=True)
    timeit("losses on ready outputs",
           jax.jit(lambda o: trainer._losses(o, batch, state.params)["loss"]),
           out)


if __name__ == "__main__":
    main()
