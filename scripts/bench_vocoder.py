"""Benchmark the WaveNet incremental sampler on the real chip.

Measures samples/sec (and audio-seconds/sec) for the default-size vocoder
(20 layers, 128 residual channels, Gaussian head) at several batch sizes —
the BASELINE north-star 'dilated-conv vocoder step with activation caching'
number. Run on TPU: python scripts/bench_vocoder.py [seconds_of_audio]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from tacotron2_tpu.config import get_config
from tacotron2_tpu.models.wavenet.model import WaveNet
from tacotron2_tpu.models.wavenet.sampler import incremental_sample


def main(audio_seconds=1.0, batches=(1, 4, 8)):
    cfg = get_config("default")
    sr, hop = cfg.audio.sample_rate, cfg.audio.effective_hop
    frames = int(audio_seconds * sr) // hop
    T = frames * hop

    model = WaveNet(config=cfg)
    rng = np.random.default_rng(0)

    for B in batches:
        c = jax.numpy.asarray(
            rng.uniform(0, 1, (B, frames, cfg.wavenet.cin_channels)),
            jax.numpy.float32)
        variables = model.init(
            dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
            jax.numpy.zeros((B, T, 1)), c, train=False)
        c_up = jax.jit(lambda p, cc: model.apply({"params": p}, cc,
                                                 method=WaveNet.upsample))(
            variables["params"], c)

        fn = jax.jit(lambda p, cu, k: incremental_sample(p, cfg, cu, k))
        t0 = time.perf_counter()
        s, _ = fn(variables["params"], c_up, jax.random.PRNGKey(2))
        s.block_until_ready()
        compile_time = time.perf_counter() - t0

        iters = 2
        t0 = time.perf_counter()
        for i in range(iters):
            s, _ = fn(variables["params"], c_up, jax.random.PRNGKey(3 + i))
            s.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        sps = T / dt
        print(f"B={B}: {T} samples in {dt:.2f}s -> {sps:,.0f} samples/s/stream, "
              f"{B * T / dt / sr:.2f} audio-s/s total "
              f"(compile {compile_time:.1f}s)")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 1.0)
