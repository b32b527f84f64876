"""Ablation: where do the unexplained ~18 ms of the Tacotron train step go?

Times jit(value_and_grad(loss)) variants at B=96 x 400 frames:
  A. full loss (all terms)           — fwd+bwd, no optimizer
  B. loss with decoder bypassed      — frames := mel_targets (no decode)
  C. full loss, postnet bypassed     — mel_outputs := decoder_output
A-B isolates the decoder's true in-graph cost; A-C the postnet's.

Usage: python scripts/profile_taco_ablate.py
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
    args = p.parse_args(argv)

    _enable_compile_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.models.tacotron.losses import (masked_mse,
                                                      masked_stop_ce)
    from tacotron2_tpu.train.tacotron_step import TacotronTrainer

    cfg = Config()
    cfg = cfg.replace(tacotron=dataclasses.replace(
        cfg.tacotron, compute_dtype="bfloat16", use_fused_train_decoder=True))

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
    rngs = dict(zip(["dropout", "zoneout", "teacher_forcing"],
                    jax.random.split(jax.random.PRNGKey(1), 3)))

    def timeit(name, fn, *a, iters=args.steps):
        out = fn(*a)
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
        print(f"{name:48s} {dt:8.2f} ms", flush=True)
        return dt

    # A. full fwd+bwd (exact train-step loss, no optimizer)
    def loss_full(params):
        out, _ = trainer._forward(params, state.batch_stats, batch, rngs,
                                  jnp.asarray(1.0), train=True)
        return trainer._losses(out, batch, params)["loss"]

    timeit("A: full fwd+bwd", jax.jit(jax.grad(loss_full)), state.params)

    # B. decoder bypassed: same encoder/style/postnet/losses graph, but
    # frames = mel_targets (+0*sum(keys) so encoder params still get grads)
    def loss_nodec(params):
        cast = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
        keys, memory, mask = model.apply(
            {"params": cast, "batch_stats": state.batch_stats},
            batch["inputs"], batch["input_lengths"],
            batch["ref_mel_emt"], batch["ref_mel_spk"],
            method=model.synthesis_memory)
        frames = batch["mel_targets"] + 0.0 * jnp.sum(
            memory.astype(jnp.float32)) + 0.0 * jnp.sum(
            keys.astype(jnp.float32))
        dec, mel = model.apply(
            {"params": cast, "batch_stats": state.batch_stats},
            frames, method=model.postnet_pass)
        r = cfg.tacotron.outputs_per_step
        before = masked_mse(batch["mel_targets"], dec,
                            batch["targets_lengths"], r)
        after = masked_mse(batch["mel_targets"], mel,
                           batch["targets_lengths"], r)
        return before + after

    timeit("B: decoder bypassed (enc+postnet+losses)",
           jax.jit(jax.grad(loss_nodec)), state.params)

    # C. full minus postnet: frames -> losses directly
    def loss_nopost(params):
        out, _ = trainer._forward(params, state.batch_stats, batch, rngs,
                                  jnp.asarray(1.0), train=True)
        r = cfg.tacotron.outputs_per_step
        before = masked_mse(batch["mel_targets"], out.decoder_output,
                            batch["targets_lengths"], r)
        stop = masked_stop_ce(batch["stop_token_targets"],
                              out.stop_token_prediction,
                              batch["targets_lengths"], r)
        return before + stop

    timeit("C: postnet unused (decoder+enc+stop losses)",
           jax.jit(jax.grad(loss_nopost)), state.params)


if __name__ == "__main__":
    main()
