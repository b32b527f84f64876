"""Benchmark the fused Pallas Tacotron decoder vs the XLA scan anchor.

Full-size decoder (2x1024 zoneout-LSTM, LSA attention over T_in=256 memory
of width 1024 = encoder 512 + GST style 512), B utterances, `steps` decode
steps. The XLA scan path measures ~322 us/step at B=32 (DESIGN.md §1); the
fused kernel runs the whole decode in one Pallas program.

Usage: python scripts/bench_decoder_kernel.py [B] [steps] [T_in]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(B=32, steps=500, T_in=256, M=1024):
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from tacotron2_tpu.config import get_config
    from tacotron2_tpu.models.tacotron.decoder import Decoder
    from tacotron2_tpu.ops.tacotron_decoder_kernel import (
        build_decoder_kernel, extract_decoder_params)

    cfg = get_config("default")
    overrides = []
    if os.environ.get("BENCH_NO_DROP") == "1":
        overrides.append("tacotron.dropout_rate=0.0")
    if os.environ.get("BENCH_NO_CONSTRAINT") == "1":
        overrides.append("tacotron.synthesis_constraint=false")
    if overrides:
        cfg = cfg.with_overrides(",".join(overrides))
        print("overrides:", overrides, flush=True)
    rng = np.random.default_rng(0)
    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2))
    mem_small = jnp.asarray(rng.normal(size=(2, 8, M)) * 0.1, jnp.float32)
    keys_small = jnp.zeros((2, 8, cfg.tacotron.attention_dim))
    variables = dec.init(rngs, 2, 1, keys_small, mem_small, None,
                         method=Decoder.autoregressive)
    dp = extract_decoder_params({"decoder": variables["params"]}, cfg)

    memory = jnp.asarray(rng.normal(size=(B, T_in, M)) * 0.1, jnp.float32)
    keys = jnp.asarray(rng.normal(size=(B, T_in, 128)) * 0.1, jnp.float32)
    mask = jnp.ones((B, T_in), bool)

    for emit_aligns in (True, False):
        run = build_decoder_kernel(cfg, B, T_in, steps, M,
                                   weight_dtype=jnp.bfloat16,
                                   emit_alignments=emit_aligns)
        # scalar-fetch sync: block_until_ready does not drain the queue on
        # the tunneled backend, and np.asarray of the [steps,B,*] outputs
        # would add ~14 MB/iter of network transfer
        def sync(x):
            return float(jnp.sum(x[-1, :, 0]))

        t0 = time.perf_counter()
        f, s, a = run(dp, keys, memory, mask, 7)
        sync(f)
        compile_s = time.perf_counter() - t0
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            f, s, a = run(dp, keys, memory, mask, 8 + i)
        sync(f)
        dt = (time.perf_counter() - t0) / iters
        r = cfg.tacotron.outputs_per_step
        frames_per_s = B * steps * r / dt
        audio_s = frames_per_s * cfg.audio.hop_size / cfg.audio.sample_rate
        print(f"aligns={emit_aligns}: {dt / steps * 1e6:.1f} us/step, "
              f"{audio_s:,.0f} mel audio-s/s at B={B} "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
