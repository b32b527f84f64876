"""Tacotron autoregressive decode throughput (real chip).

Measured anchor (TPU v5e, full-size model, B=32, max_steps=400, r=1):
~322 us/step = ~1243 audio-s/s/chip, so the two-stage pipeline bottleneck
is the WaveNet sampler (bench.py headline). First compile of the 400-step
decode scan is slow through the remote-compile tunnel (~17 min); the
persistent cache at /tmp/jax_cache makes reruns start in seconds.
"""
import os, sys, time
os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tacotron2_tpu.config import get_config
from tacotron2_tpu.models.tacotron.model import Tacotron
from tacotron2_tpu.synth.tacotron_synth import TacotronSynthesizer

cfg = get_config("default")  # full-size model
model = Tacotron(config=cfg)
B, T_in, T_ref = 32, 128, 256
rng = np.random.default_rng(0)
inputs = jnp.asarray(rng.integers(2, 60, (B, T_in)), jnp.int32)
lengths = jnp.full((B,), T_in, jnp.int32)
ref = jnp.asarray(rng.uniform(-4, 4, (B, T_ref, 80)), jnp.float32)
rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
            zoneout=jax.random.PRNGKey(2), teacher_forcing=jax.random.PRNGKey(3))
t0=time.time()
variables = model.init(rngs, inputs, lengths,
                       mel_targets=jnp.zeros((B, 32, 80)),
                       ref_mel_emt=ref, ref_mel_spk=ref, train=True)
print(f"init {time.time()-t0:.1f}s", flush=True)
synth = TacotronSynthesizer(cfg, variables["params"], variables.get("batch_stats", {}), model=model)

max_steps = 400
app_rngs = {k: v for k, v in rngs.items() if k != "params"}
fn = jax.jit(lambda p, bs, i, l, re, rs, r: model.apply(
    {"params": p, "batch_stats": bs}, i, l, ref_mel_emt=re, ref_mel_spk=rs,
    synthesis=True, max_steps=max_steps, train=False, rngs=r).mel_outputs)
t0=time.time()
out = fn(variables["params"], variables.get("batch_stats", {}), inputs, lengths, ref, ref, app_rngs)
np.asarray(out); print(f"compile+run {time.time()-t0:.1f}s", flush=True)
for trial in range(2):
    t0=time.time()
    out = fn(variables["params"], variables.get("batch_stats", {}), inputs, lengths, ref, ref, app_rngs)
    np.asarray(out)
    dt = time.time()-t0
    r = cfg.tacotron.outputs_per_step
    frames = max_steps * r
    hop_s = cfg.audio.effective_hop / cfg.audio.sample_rate
    audio_s = B * frames * hop_s
    print(f"decode {max_steps} steps B={B}: {dt:.3f}s = {dt/max_steps*1e6:.0f} us/step, "
          f"{audio_s/dt:.1f} audio-s/s/chip (r={r})", flush=True)
