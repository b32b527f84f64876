"""Pallas kernel parity tests (TPU interpreter on CPU).

The fused WaveNet sampler must match the XLA scan sampler exactly when
sampling noise is suppressed (log-scale forced to -30 → sample == mean).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.config import Config
from tacotron2_tpu.models.wavenet.model import WaveNet
from tacotron2_tpu.models.wavenet.sampler import incremental_sample
from tacotron2_tpu.ops.wavenet_kernel import fused_incremental_sample


def _setup(layers=4, B=2, frames=12):
    cfg = Config()
    cfg = cfg.replace(
        wavenet=dataclasses.replace(
            cfg.wavenet, layers=layers, stacks=2, residual_channels=128,
            gate_channels=256, skip_out_channels=128, upsample_scales=(2, 2),
            cin_channels=80),
        audio=dataclasses.replace(cfg.audio, num_mels=80))
    T = frames * 4
    model = WaveNet(config=cfg)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(0, 1, (B, frames, 80)), jnp.float32)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
        jnp.zeros((B, T, 1)), c, train=False)
    params = variables["params"]
    # suppress sampling noise: log-scale channel pinned to -30
    fc2 = params["final_convolution_2"]["Dense_0"]
    fc2["bias"] = fc2["bias"].at[1].set(-30.0)
    fc2["kernel"] = fc2["kernel"].at[:, 1].set(0.0)
    c_up = model.apply({"params": params}, c, method=WaveNet.upsample)
    return cfg, params, c_up


def test_fused_sampler_matches_xla_scan():
    cfg, params, c_up = _setup()
    s_ref, _ = incremental_sample(params, cfg, c_up, jax.random.PRNGKey(9))
    s_fused = fused_incremental_sample(params, cfg, c_up, seed=9, chunk=16,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s_ref),
                               atol=2e-4, rtol=1e-3)


def test_fused_sampler_chunk_padding():
    """T not a multiple of chunk: padded internally and trimmed."""
    cfg, params, c_up = _setup(frames=13)  # T = 52, chunk 16 -> pad to 64
    s_ref, _ = incremental_sample(params, cfg, c_up, jax.random.PRNGKey(9))
    s_fused = fused_incremental_sample(params, cfg, c_up, seed=9, chunk=16,
                                       interpret=True)
    assert s_fused.shape == s_ref.shape
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s_ref),
                               atol=2e-4, rtol=1e-3)


def _setup_mol(layers=4, B=2, frames=12):
    """MoL-head model (paper preset head, out_channels=30) with noise
    suppressed: component 0\'s logit dominates (+/-100 bias) and all
    log_scales pin to -30, so both samplers deterministically emit mean_0."""
    cfg = Config()
    cfg = cfg.replace(
        wavenet=dataclasses.replace(
            cfg.wavenet, layers=layers, stacks=2, residual_channels=128,
            gate_channels=256, skip_out_channels=128, upsample_scales=(2, 2),
            cin_channels=80, out_channels=30),
        audio=dataclasses.replace(cfg.audio, num_mels=80))
    T = frames * 4
    model = WaveNet(config=cfg)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(0, 1, (B, frames, 80)), jnp.float32)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
        jnp.zeros((B, T, 1)), c, train=False)
    params = variables["params"]
    fc2 = params["final_convolution_2"]["Dense_0"]
    bias = fc2["bias"].at[0].set(100.0)
    bias = bias.at[1:10].set(-100.0)
    bias = bias.at[20:30].set(-30.0)
    fc2["bias"] = bias
    kernel = fc2["kernel"].at[:, 0:10].set(0.0)
    fc2["kernel"] = kernel.at[:, 20:30].set(0.0)
    c_up = model.apply({"params": params}, c, method=WaveNet.upsample)
    return cfg, params, c_up


def test_fused_sampler_mol_matches_xla_scan():
    cfg, params, c_up = _setup_mol()
    s_ref, _ = incremental_sample(params, cfg, c_up, jax.random.PRNGKey(9))
    s_fused = fused_incremental_sample(params, cfg, c_up, seed=9, chunk=16,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s_ref),
                               atol=2e-4, rtol=1e-3)


def test_fused_sampler_mol_hbm_matches_vmem():
    cfg, params, c_up = _setup_mol(layers=6)  # dilations up to 32
    s_vmem = fused_incremental_sample(params, cfg, c_up, seed=5, chunk=16,
                                      interpret=True)
    s_hbm = fused_incremental_sample(params, cfg, c_up, seed=5, chunk=16,
                                     interpret=True, hbm_delay_threshold=4,
                                     window=4)
    np.testing.assert_allclose(np.asarray(s_hbm), np.asarray(s_vmem),
                               atol=2e-4, rtol=1e-3)


def _setup_categorical(layers=4, B=2, frames=12, Q=256, temp=30000.0):
    """mulaw-quantize head. The interpret-mode TPU PRNG yields all-zero bits
    (u collapses to the 2^-25 floor), so kernel draws cannot be compared to
    the scan sampler's threefry draws; the tests below use PRNG-independent
    oracles instead. temp sharpens logits so trajectories are near-argmax."""
    cfg = Config()
    cfg = cfg.replace(
        wavenet=dataclasses.replace(
            cfg.wavenet, layers=layers, stacks=2, residual_channels=128,
            gate_channels=256, skip_out_channels=128, upsample_scales=(2, 2),
            cin_channels=80, out_channels=Q, input_type="mulaw-quantize",
            quantize_channels=Q),
        audio=dataclasses.replace(cfg.audio, num_mels=80))
    T = frames * 4
    model = WaveNet(config=cfg)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(0, 1, (B, frames, 80)), jnp.float32)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
        jnp.zeros((B, T, Q)), c, train=False)
    params = variables["params"]
    fc2 = params["final_convolution_2"]["Dense_0"]
    fc2["kernel"] = fc2["kernel"] * temp
    fc2["bias"] = fc2["bias"] * temp
    c_up = model.apply({"params": params}, c, method=WaveNet.upsample)
    return cfg, params, c_up


def test_fused_sampler_categorical_matches_teacher_forced_oracle():
    """Conv-stack + inverse-CDF parity without comparable PRNG streams:
    teacher-force the XLA scan sampler along the FUSED kernel's own output
    trajectory to recover the logits the kernel saw at every step, then
    assert each fused pick equals the inverse-CDF pick at u = 2^-25 + 2^-26
    (the all-zero-bits floor of the interpret-mode TPU PRNG)."""
    cfg, params, c_up = _setup_categorical()
    Q = cfg.wavenet.quantize_channels
    s_fused = np.asarray(fused_incremental_sample(
        params, cfg, c_up, seed=9, chunk=16, interpret=True))
    # scan with test_inputs follows the fused trajectory exactly: the input
    # override at step t is one_hot(fused sample at t) (sampler.py:216-218)
    tf_inputs = jax.nn.one_hot(jnp.asarray(s_fused, jnp.int32), Q)
    _, y_hat = incremental_sample(params, cfg, c_up, jax.random.PRNGKey(0),
                                  test_inputs=tf_inputs)
    yh = np.asarray(y_hat, np.float32)                 # [B, T, Q]
    u_floor = np.float32(1.0 / (1 << 25) + 0.5 / (1 << 25))
    e = np.exp(yh - yh.max(-1, keepdims=True))
    cum = np.cumsum(e.astype(np.float32), axis=-1, dtype=np.float32)
    expected = (u_floor * cum[..., -1:] < cum).argmax(-1)  # first True
    np.testing.assert_array_equal(s_fused, expected)


def test_inverse_cdf_onehot_distribution():
    """_inverse_cdf_onehot (pure JAX, outside pallas) draws from the same
    categorical distribution as the reference's tf.multinomial semantics:
    empirical frequencies over real uniforms match the softmax."""
    from tacotron2_tpu.ops.wavenet_kernel import _HeadPlan
    logits = jnp.asarray([[1.0, 0.0, 2.0, -1.0, 0.5, 0.0, 0.0, 1.5]])
    probs = np.asarray(jax.nn.softmax(logits))[0]
    n = 4000
    u = jax.random.uniform(jax.random.PRNGKey(0), (n,))
    onehots = jax.vmap(
        lambda ui: _HeadPlan._inverse_cdf_onehot(logits, ui[None]))(u)
    freq = np.asarray(onehots).mean(axis=0)[0]
    assert np.all(np.abs(freq - probs) < 4.0 / np.sqrt(n)), (freq, probs)
    # every draw is exactly one-hot
    assert np.all(np.asarray(onehots).sum(-1) == 1.0)



def test_fused_sampler_bf16_cache_close():
    """bf16 delay-line cache: samples stay close to the f32-cache output
    (activation quantization only at the layer-delay boundary)."""
    cfg, params, c_up = _setup()
    s_f32 = fused_incremental_sample(params, cfg, c_up, seed=9, chunk=16,
                                     interpret=True)
    s_bf16 = fused_incremental_sample(params, cfg, c_up, seed=9, chunk=16,
                                      interpret=True,
                                      cache_dtype=jnp.bfloat16)
    err = np.max(np.abs(np.asarray(s_f32) - np.asarray(s_bf16)))
    assert err < 0.05, f"bf16 cache drifted too far: max err {err}"


def test_fused_sampler_hbm_delay_matches_vmem():
    """HBM-resident large-dilation delay lines: bit-identical to the pure
    VMEM kernel (same op order; only the cache residency changes)."""
    cfg, params, c_up = _setup(layers=6)   # dilations 1,2,4 x 2 stacks
    s_vmem = fused_incremental_sample(params, cfg, c_up, seed=9, chunk=16,
                                      interpret=True)
    s_hbm = fused_incremental_sample(params, cfg, c_up, seed=9, chunk=16,
                                     interpret=True, hbm_delay_threshold=2)
    np.testing.assert_array_equal(np.asarray(s_hbm), np.asarray(s_vmem))
    # and against the XLA scan reference
    s_ref, _ = incremental_sample(params, cfg, c_up, jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(s_hbm), np.asarray(s_ref),
                               atol=2e-4, rtol=1e-3)
    # bf16 cache + weights through the HBM path stays close
    s_bf16 = fused_incremental_sample(params, cfg, c_up, seed=9, chunk=16,
                                      interpret=True, hbm_delay_threshold=2,
                                      cache_dtype=jnp.bfloat16,
                                      weight_dtype=jnp.bfloat16)
    err = np.max(np.abs(np.asarray(s_vmem) - np.asarray(s_bf16)))
    assert err < 0.1, f"bf16 HBM-path drifted too far: max err {err}"


def test_fused_sampler_hbm_windowed_matches_vmem():
    """Multi-row prefetch windows (W>1): dilations 1..16, threshold 8 keeps
    d=16 in HBM with W=4 windows; parity must still be exact."""
    cfg, params, c_up = _setup(layers=10, frames=24)  # dil 1,2,4,8,16 x 2
    s_vmem = fused_incremental_sample(params, cfg, c_up, seed=5, chunk=16,
                                      interpret=True)
    s_hbm = fused_incremental_sample(params, cfg, c_up, seed=5, chunk=16,
                                     interpret=True, hbm_delay_threshold=8)
    np.testing.assert_array_equal(np.asarray(s_hbm), np.asarray(s_vmem))


def test_fused_sampler_hbm_threshold_guard():
    """Dilations 1/2 must stay in VMEM (write-back retire window)."""
    cfg, params, c_up = _setup(layers=4)   # dilations 1,2 x 2 stacks
    with pytest.raises(AssertionError, match="windowing"):
        fused_incremental_sample(params, cfg, c_up, seed=0, chunk=16,
                                 interpret=True, hbm_delay_threshold=1)


def test_fused_griffin_lim():
    """Fused single-kernel G-L vs the XLA path.

    Sample-wise equality is only meaningful at iters=0 (the pure iSTFT):
    with iterations, near-zero-magnitude bins have noise-dominated phase
    est/|est| and any f32 reordering diverges sample-wise (the same holds
    between XLA CPU and TPU). The convergence criterion — spectral
    consistency |STFT(y)| vs target S — must match.
    """
    from tacotron2_tpu.ops import stft as st
    from tacotron2_tpu.ops.griffin_lim import griffin_lim
    from tacotron2_tpu.ops.griffin_lim_kernel import fused_griffin_lim

    n_fft, hop, win = 512, 128, 512
    B, F = 2, 17
    t = np.linspace(0, 1, hop * (F - 1))
    y0 = np.stack([np.sin(2 * np.pi * (300 + 100 * b) * t)
                   for b in range(B)]).astype(np.float32)
    S = np.asarray(st.stft_mag(jnp.asarray(y0), n_fft, hop, win))

    # iters=0: pure iSTFT, bit-comparable
    ref0 = np.asarray(griffin_lim(jnp.asarray(S), n_fft, hop, win, iters=0))
    out0 = np.asarray(fused_griffin_lim(jnp.asarray(S), n_fft, hop, win,
                                        iters=0, interpret=True))
    np.testing.assert_allclose(out0, ref0, atol=1e-5)

    # iters=8: equal spectral-consistency error (within 10%)
    def consistency(y):
        mag = np.asarray(st.stft_mag(jnp.asarray(y), n_fft, hop, win))
        return float(np.mean(np.abs(mag - S)))

    ref8 = np.asarray(griffin_lim(jnp.asarray(S), n_fft, hop, win, iters=8))
    out8 = np.asarray(fused_griffin_lim(jnp.asarray(S), n_fft, hop, win,
                                        iters=8, interpret=True))
    c_ref, c_out = consistency(ref8), consistency(out8)
    assert c_out < c_ref * 1.1 + 1e-4, (c_out, c_ref)

    # the reconstructed tone keeps its spectral peak
    for b in range(B):
        spec = np.abs(np.fft.rfft(out8[b]))
        freq = np.fft.rfftfreq(out8.shape[-1], 1.0 / (hop * (F - 1)))
        peak = freq[spec.argmax()]
        assert abs(peak - (300 + 100 * b)) < 15, peak


def test_fused_sampler_bf16_weights_close():
    """bf16 weight storage (MXU-native rate): output stays close to f32."""
    cfg, params, c_up = _setup()
    s_f32 = fused_incremental_sample(params, cfg, c_up, seed=9, chunk=16,
                                     interpret=True)
    s_bf16 = fused_incremental_sample(params, cfg, c_up, seed=9, chunk=16,
                                      interpret=True,
                                      cache_dtype=jnp.bfloat16,
                                      weight_dtype=jnp.bfloat16)
    err = np.max(np.abs(np.asarray(s_f32) - np.asarray(s_bf16)))
    assert err < 0.1, f"bf16 weights drifted too far: max err {err}"


def test_inverse_cdf_onehot_extreme_uniform():
    """u at (or rounding to) 1.0 must still emit a valid one-hot: without
    the last-class fallback, u*tot == tot makes every CDF comparison False
    and the sampler would emit an all-zero vector (review finding)."""
    import jax.numpy as jnp

    from tacotron2_tpu.ops.wavenet_kernel import _HeadPlan

    logits = jnp.asarray(np.log([[0.2, 0.5, 0.3],
                                 [0.9, 0.05, 0.05]]), jnp.float32)
    for u_val in (0.0, 0.5, 1.0 - 2 ** -25, 1.0):
        u = jnp.full((2,), u_val, jnp.float32)
        oh = np.asarray(_HeadPlan._inverse_cdf_onehot(logits, u))
        np.testing.assert_allclose(oh.sum(-1), 1.0)
        assert ((oh == 0) | (oh == 1)).all()
    # u=0 -> first class, u→1 -> last class
    oh0 = np.asarray(_HeadPlan._inverse_cdf_onehot(logits, jnp.zeros(2)))
    assert oh0.argmax(-1).tolist() == [0, 0]
    oh1 = np.asarray(_HeadPlan._inverse_cdf_onehot(logits, jnp.ones(2)))
    assert oh1.argmax(-1).tolist() == [2, 2]
