"""Real-chip statistical validation of the fused sampler's in-kernel PRNG.

The interpret-mode (CPU) TPU PRNG yields all-zero bits, so noise statistics
can only be validated on hardware. Three checks, one per output head:

- gaussian: with the network forced to mean=0 / log_scale=0, samples must be
  N(0,1) clipped to [-1,1]: check mean≈0, the clipped-mass fraction, and
  that the interior stddev matches a truncated normal.
- mol: component 0 forced dominant with mean 0, log_scale 0 → samples are
  standard-logistic clipped to [-1,1]: check symmetric mass and median≈0.
- categorical: uniform logits → class frequencies ~ Uniform(Q).

Run: python scripts/check_sampler_noise.py   (uses the axon TPU)
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tacotron2_tpu.config import Config  # noqa: E402
from tacotron2_tpu.models.wavenet.model import WaveNet  # noqa: E402
from tacotron2_tpu.ops.wavenet_kernel import fused_incremental_sample  # noqa: E402


def _model(out_channels, input_type="raw", Q=256):
    cfg = Config()
    cfg = cfg.replace(
        wavenet=dataclasses.replace(
            cfg.wavenet, layers=2, stacks=1, residual_channels=128,
            gate_channels=256, skip_out_channels=128, upsample_scales=(2, 2),
            cin_channels=80, out_channels=out_channels, input_type=input_type,
            quantize_channels=Q),
        audio=dataclasses.replace(cfg.audio, num_mels=80))
    B, frames = 8, 64
    model = WaveNet(config=cfg)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(0, 1, (B, frames, 80)), jnp.float32)
    in_dim = 1 if input_type == "raw" else Q
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
        jnp.zeros((B, frames * 4, in_dim)), c, train=False)
    params = variables["params"]
    c_up = model.apply({"params": params}, c, method=WaveNet.upsample)
    return cfg, params, c_up


def _zero_head(params, n_out, pins):
    """Zero the final projection and pin selected output biases."""
    fc2 = params["final_convolution_2"]["Dense_0"]
    fc2["kernel"] = fc2["kernel"] * 0.0
    b = fc2["bias"] * 0.0
    for i, v in pins.items():
        b = b.at[i].set(v)
    fc2["bias"] = b


def main():
    ok = True

    # --- gaussian: mean 0, log_scale 0 -> clipped N(0,1)
    cfg, params, c_up = _model(2)
    _zero_head(params, 2, {0: 0.0, 1: 0.0})
    s = np.asarray(fused_incremental_sample(params, cfg, c_up, seed=7,
                                            chunk=64)).ravel()
    interior = s[np.abs(s) < 0.999]
    clip_frac = 1 - len(interior) / len(s)
    # N(0,1): P(|x|>1) = 0.3173; interior std of truncated normal = 0.5227
    checks = [abs(s.mean()) < 0.02, abs(clip_frac - 0.3173) < 0.02,
              abs(interior.std() - 0.5227) < 0.02]
    print(f"gaussian: mean={s.mean():+.4f} clip_frac={clip_frac:.4f} "
          f"interior_std={interior.std():.4f} -> "
          f"{'OK' if all(checks) else 'FAIL'}")
    ok &= all(checks)

    # --- mol: component 0 dominant, mean 0, log_scale 0 -> clipped logistic
    cfg, params, c_up = _model(30)
    _zero_head(params, 30, {0: 50.0, 10: 0.0, 20: 0.0})
    for i in range(1, 10):  # other components far away
        params["final_convolution_2"]["Dense_0"]["bias"] = \
            params["final_convolution_2"]["Dense_0"]["bias"].at[i].set(-50.0)
    s = np.asarray(fused_incremental_sample(params, cfg, c_up, seed=7,
                                            chunk=64)).ravel()
    # logistic(0,1): P(|x|>1) = 2/(1+e) = 0.5379
    clip_frac = (np.abs(s) > 0.999).mean()
    checks = [abs(np.median(s)) < 0.03, abs(clip_frac - 0.5379) < 0.02,
              abs((s > 0).mean() - 0.5) < 0.02]
    print(f"mol: median={np.median(s):+.4f} clip_frac={clip_frac:.4f} "
          f"p(pos)={(s > 0).mean():.4f} -> "
          f"{'OK' if all(checks) else 'FAIL'}")
    ok &= all(checks)

    # --- categorical: uniform logits -> uniform class histogram
    cfg, params, c_up = _model(256, input_type="mulaw-quantize")
    _zero_head(params, 256, {})
    s = np.asarray(fused_incremental_sample(params, cfg, c_up, seed=7,
                                            chunk=64)).ravel().astype(int)
    hist = np.bincount(s, minlength=256) / len(s)
    chi2 = len(s) * 256 * np.sum((hist - 1 / 256) ** 2)
    # chi-square df=255: mean 255, std ~22.6; accept within 6 sigma
    checks = [abs(chi2 - 255) < 140, s.min() >= 0, s.max() < 256]
    print(f"categorical: chi2={chi2:.1f} (df=255) "
          f"min={s.min()} max={s.max()} -> "
          f"{'OK' if all(checks) else 'FAIL'}")
    ok &= all(checks)

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
