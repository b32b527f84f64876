"""WaveNet: forward shapes, loss, upsampling, and the critical
incremental-sampler ≡ full-convolution parity check."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.config import Config
from tacotron2_tpu.models.wavenet import distributions as D
from tacotron2_tpu.models.wavenet.model import WaveNet, compute_wavenet_loss
from tacotron2_tpu.models.wavenet.sampler import incremental_sample


def tiny_wn_config(**kw) -> Config:
    cfg = Config()
    wn = dict(layers=4, stacks=2, residual_channels=8, gate_channels=16,
              skip_out_channels=8, kernel_size=3, cin_channels=10,
              upsample_scales=(2, 2), out_channels=2, dropout=0.0)
    wn.update(kw)
    return cfg.replace(
        wavenet=dataclasses.replace(cfg.wavenet, **wn),
        audio=dataclasses.replace(cfg.audio, num_mels=10))


RNGS = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1))


def init_model(cfg, B=2, T_mel=6):
    model = WaveNet(config=cfg)
    hop = int(np.prod(cfg.wavenet.upsample_scales))
    T = T_mel * hop
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (B, T, 1)), jnp.float32)
    c = jnp.asarray(rng.uniform(-4, 4, (B, T_mel, cfg.wavenet.cin_channels)),
                    jnp.float32)
    variables = model.init(RNGS, x, c, train=False)
    return model, variables, x, c, T


def test_forward_shapes():
    cfg = tiny_wn_config()
    model, variables, x, c, T = init_model(cfg)
    out = model.apply(variables, x, c, train=False)
    assert out.y_hat.shape == (2, T, 2)
    assert out.upsampled_features.shape == (2, T, cfg.wavenet.cin_channels)


def test_receptive_field():
    cfg = tiny_wn_config()
    # layers=4, stacks=2, k=3 -> dilations (1,2,1,2), RF = 2*6+1 = 13
    assert cfg.wavenet.dilations == (1, 2, 1, 2)
    assert cfg.wavenet.receptive_field == 13
    full = Config()
    assert full.wavenet.receptive_field == (3 - 1) * sum(full.wavenet.dilations) + 1


def test_loss_finite_and_positive():
    cfg = tiny_wn_config()
    model, variables, x, c, T = init_model(cfg)
    out = model.apply(variables, x, c, train=False)
    lengths = jnp.asarray([T, T - 5])
    loss = compute_wavenet_loss(out, x, lengths, cfg)["loss"]
    assert np.isfinite(float(loss))


def test_nn_init_upsampling_is_nearest_neighborish():
    """With NN_init, the upsample net ≈ nearest-neighbor × NN_scaler at init
    (the reference's checkerboard-free property, modules.py:571-580)."""
    cfg = tiny_wn_config(upsample_type="SubPixel")
    model, variables, x, c, T = init_model(cfg)
    up = model.apply(variables, c, method=WaveNet.upsample)
    hop = int(np.prod(cfg.wavenet.upsample_scales))
    nn_ref = jnp.repeat(c, hop, axis=1) * cfg.wavenet.nn_scaler
    # both layers are Relu-activated; compare on positive entries
    mask = np.asarray(nn_ref > 0)
    err = np.abs(np.asarray(up) - np.asarray(nn_ref))[mask]
    assert err.max() < 1e-4, f"NN-init upsample deviates: {err.max()}"


@pytest.mark.parametrize("upsample_type", ["Resize", "2D", "1D", "NearestNeighbor"])
def test_upsample_variants(upsample_type):
    cfg = tiny_wn_config(upsample_type=upsample_type)
    model, variables, x, c, T = init_model(cfg)
    up = model.apply(variables, c, method=WaveNet.upsample)
    assert up.shape == (2, T, cfg.wavenet.cin_channels)


def test_incremental_matches_full_forward():
    """Ring-buffer sampler with ground-truth feeding ≡ full dilated-conv
    forward — the queue-correctness invariant (reference modules.py:281-303)."""
    cfg = tiny_wn_config()
    model, variables, x, c, T = init_model(cfg)
    full = model.apply(variables, x, c, train=False)

    c_up = model.apply(variables, c, method=WaveNet.upsample)
    B = x.shape[0]
    # feed ground truth: input at step t must be x[t] -> initial=x[0],
    # test_inputs[t] becomes the input at step t+1
    test_inputs = jnp.concatenate([x[:, 1:, :], jnp.zeros((B, 1, 1))], axis=1)
    samples, y_hat = incremental_sample(
        variables["params"], cfg, c_up, jax.random.PRNGKey(3),
        initial_input=x[:, 0, :], test_inputs=test_inputs)
    np.testing.assert_allclose(np.asarray(y_hat), np.asarray(full.y_hat),
                               atol=2e-4, rtol=1e-3)


def test_free_running_sampler():
    cfg = tiny_wn_config()
    model, variables, x, c, T = init_model(cfg)
    c_up = model.apply(variables, c, method=WaveNet.upsample)
    samples, y_hat = incremental_sample(variables["params"], cfg, c_up,
                                        jax.random.PRNGKey(3))
    assert samples.shape == (2, T)
    assert np.abs(np.asarray(samples)).max() <= 1.0
    assert np.isfinite(np.asarray(y_hat)).all()


def test_mulaw_quantize_mode():
    cfg = tiny_wn_config(input_type="mulaw-quantize", quantize_channels=256,
                         out_channels=256)
    model = WaveNet(config=cfg)
    B, T_mel = 2, 4
    hop = 4
    T = T_mel * hop
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, (B, T))
    x = jax.nn.one_hot(jnp.asarray(ids), 256)
    c = jnp.asarray(rng.uniform(-4, 4, (B, T_mel, 10)), jnp.float32)
    variables = model.init(RNGS, x, c, train=False)
    out = model.apply(variables, x, c, train=False)
    assert out.y_hat.shape == (B, T, 256)
    loss = compute_wavenet_loss(out, jnp.asarray(ids), jnp.asarray([T, T]), cfg)
    assert np.isfinite(float(loss["loss"]))
    # categorical sampler path
    c_up = model.apply(variables, c, method=WaveNet.upsample)
    samples, _ = incremental_sample(variables["params"], cfg, c_up,
                                    jax.random.PRNGKey(1))
    assert samples.shape == (B, T)
    assert samples.min() >= 0 and samples.max() <= 255


def test_mol_distribution():
    rng = np.random.default_rng(0)
    y_hat = jnp.asarray(rng.normal(0, 1, (2, 5, 30)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (2, 5, 1)), jnp.float32)
    loss = D.discretized_mix_logistic_loss(y_hat, y, num_classes=256,
                                           log_scale_min=-7.0)
    assert np.isfinite(float(loss))
    s = D.sample_from_discretized_mix_logistic(jax.random.PRNGKey(0), y_hat)
    assert np.abs(np.asarray(s)).max() <= 1.0


def test_gaussian_distribution():
    # sharp gaussian centered at target -> low loss; wrong mean -> higher
    y = jnp.zeros((1, 3, 1))
    good = jnp.concatenate([jnp.zeros((1, 3, 1)), -3 * jnp.ones((1, 3, 1))], -1)
    bad = jnp.concatenate([0.8 * jnp.ones((1, 3, 1)), -3 * jnp.ones((1, 3, 1))], -1)
    lg = float(D.gaussian_mle_loss(good, y, use_cdf=False))
    lb = float(D.gaussian_mle_loss(bad, y, use_cdf=False))
    assert lg < lb
    s = D.sample_from_gaussian(jax.random.PRNGKey(0), good)
    assert np.abs(np.asarray(s)).max() <= 1.0


def test_weight_normalization():
    """WN reparam: initial effective kernel ≈ glorot draw; incremental parity
    holds with weight-normed params."""
    cfg = tiny_wn_config(weight_normalization=True)
    model, variables, x, c, T = init_model(cfg)
    p = variables["params"]["residual_block_0"]["skip_conv"]
    assert "v" in p and "g" in p  # reparameterized
    out = model.apply(variables, x, c, train=False)
    assert np.isfinite(np.asarray(out.y_hat)).all()
    # incremental sampler resolves effective kernels
    c_up = model.apply(variables, c, method=WaveNet.upsample)
    B = x.shape[0]
    test_inputs = jnp.concatenate([x[:, 1:, :], jnp.zeros((B, 1, 1))], axis=1)
    _, y_hat = incremental_sample(
        variables["params"], cfg, c_up, jax.random.PRNGKey(3),
        initial_input=x[:, 0, :], test_inputs=test_inputs)
    np.testing.assert_allclose(np.asarray(y_hat), np.asarray(out.y_hat),
                               atol=2e-4, rtol=1e-3)


def test_synthesize_debug_teacher_forced():
    """Teacher-forced debug path: a trained-ish model reproduces its input
    one step ahead far better than noise level (wavenet_synth_debug)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.synth.wavenet_synth import WaveNetSynthesizer

    cfg = Config()
    hop = 4
    cfg = cfg.replace(
        wavenet=dataclasses.replace(
            cfg.wavenet, layers=4, stacks=2, residual_channels=8,
            gate_channels=16, skip_out_channels=8, upsample_scales=(2, 2)),
        audio=dataclasses.replace(cfg.audio, hop_size=hop))
    assert cfg.audio.effective_hop == hop
    from tacotron2_tpu.models.wavenet.model import WaveNet
    model = WaveNet(config=cfg)
    rng = np.random.default_rng(0)
    B, T_mel = 2, 8
    wav = rng.uniform(-0.3, 0.3, (B, T_mel * hop)).astype(np.float32)
    mel = rng.uniform(-4, 4, (B, T_mel, cfg.wavenet.cin_channels)).astype(np.float32)
    variables = model.init(dict(params=jax.random.PRNGKey(0),
                                dropout=jax.random.PRNGKey(1)),
                           jnp.asarray(wav[..., None]), jnp.asarray(mel),
                           train=False)
    synth = WaveNetSynthesizer(cfg, variables["params"], use_fused_kernel=False)
    preds = synth.synthesize_debug(list(wav), list(mel))
    assert len(preds) == B
    for p in preds:
        assert p.shape == (T_mel * hop,)
        assert np.all(np.isfinite(p))
