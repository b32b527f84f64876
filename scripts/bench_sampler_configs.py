"""Sweep fused-sampler configs (batch / HBM threshold / window) on the chip.

Usage: python scripts/bench_sampler_configs.py [B:thr:W[:chunk] ...]
Each spec compiles one kernel variant and times 3 runs of 1 s of audio.
Defaults sweep the current production point and the next batch rungs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(specs):
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from tacotron2_tpu.config import get_config
    from tacotron2_tpu.models.wavenet.model import WaveNet
    from tacotron2_tpu.models.wavenet.sampler import extract_sampler_params
    from tacotron2_tpu.ops.wavenet_kernel import build_sampler_kernel

    cfg = get_config("default")
    sr = cfg.audio.sample_rate
    T = (sr // 1024) * 1024
    model = WaveNet(config=cfg)
    chunk = 512
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
        jnp.zeros((8, chunk, 1)), None, train=False)
    sp = extract_sampler_params(variables["params"], cfg)
    rng = np.random.default_rng(0)

    for spec in specs:
        parts = [int(x) for x in spec.split(":")]
        B, thr, W = parts[:3]
        chunk = parts[3] if len(parts) > 3 else 512
        try:
            run = build_sampler_kernel(cfg, B, T, chunk=chunk,
                                       cache_dtype=jnp.bfloat16,
                                       weight_dtype=jnp.bfloat16,
                                       hbm_delay_threshold=thr, window=W)
            c_up = jnp.asarray(
                rng.uniform(0, 1, (B, T, cfg.wavenet.cin_channels)),
                jnp.float32)
            # scalar-fetch sync: block_until_ready does not drain the queue
            # on the tunneled backend; full np.asarray adds MBs of transfer
            def sync(x):
                return float(jnp.sum(x[:, -1]))

            t0 = time.perf_counter()
            sync(run(sp, c_up, 7))
            compile_s = time.perf_counter() - t0
            iters = 3
            t0 = time.perf_counter()
            for i in range(iters):
                out = run(sp, c_up, 8 + i)
            sync(out)
            dt = (time.perf_counter() - t0) / iters
            print(f"B={B} thr={thr} W={W}: {dt / T * 1e6:.2f} us/step, "
                  f"{B * T / dt / sr:.1f} audio-s/s "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 - sweep survives OOM configs
            msg = str(e).splitlines()[0][:200]
            print(f"B={B} thr={thr} W={W}: FAILED {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["128:64:16", "192:64:16", "256:32:8"])
