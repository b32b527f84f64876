"""On-chip smoke: TacotronSynthesizer end-to-end through the fused decoder.

Random-init full-size model; checks the fused Pallas decode path engages,
produces finite mels/stops/alignments, and the scan fallback still works
when forced. Run on TPU: python scripts/smoke_fused_synth.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tacotron2_tpu.config import get_config
    from tacotron2_tpu.models.tacotron.model import Tacotron
    from tacotron2_tpu.synth.tacotron_synth import TacotronSynthesizer

    cfg = get_config("default")
    model = Tacotron(config=cfg)
    rng = np.random.default_rng(0)
    B_init, T_ref = 2, 40
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2),
                teacher_forcing=jax.random.PRNGKey(3))
    t0 = time.perf_counter()
    variables = model.init(
        rngs, jnp.ones((B_init, 8), jnp.int32),
        jnp.full((B_init,), 8, jnp.int32),
        jnp.zeros((B_init, 2, cfg.audio.num_mels)),
        jnp.zeros((B_init, T_ref, cfg.audio.num_mels)),
        jnp.zeros((B_init, T_ref, cfg.audio.num_mels)), train=True)
    print(f"init {time.perf_counter() - t0:.0f}s", flush=True)

    synth = TacotronSynthesizer(cfg, variables["params"],
                                variables.get("batch_stats"))
    texts = ["The quick brown fox jumps over the lazy dog.",
             "Hello world."]
    refs = [np.asarray(rng.normal(size=(T_ref, cfg.audio.num_mels)) * 0.5,
                       np.float32) for _ in texts]
    t0 = time.perf_counter()
    out = synth.synthesize(texts, refs, refs, max_steps=128)
    dt = time.perf_counter() - t0
    assert synth._fused_cache, "fused decoder path did not engage"
    for m, a in zip(out["mels"], out["alignments"]):
        assert np.isfinite(m).all() and np.isfinite(a).all()
        assert m.shape[1] == cfg.audio.num_mels
    print(f"fused synth OK in {dt:.1f}s (incl compile); "
          f"mels {[m.shape for m in out['mels']]}, "
          f"lengths {out['lengths']}", flush=True)

    # forced scan fallback still works (same inputs)
    cfg_scan = cfg.with_overrides("tacotron.use_fused_decoder=false")
    synth2 = TacotronSynthesizer(cfg_scan, variables["params"],
                                 variables.get("batch_stats"))
    out2 = synth2.synthesize(texts, refs, refs, max_steps=16)
    assert not synth2._fused_cache
    print("scan fallback OK", flush=True)


if __name__ == "__main__":
    main()
