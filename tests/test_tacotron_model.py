"""Tacotron model: shape, mode, and gradient sanity on a tiny config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.config import Config
from tacotron2_tpu.models.tacotron.losses import compute_losses
from tacotron2_tpu.models.tacotron.model import Tacotron
from tacotron2_tpu.ops.grad_reversal import flip_gradient


def tiny_config(**gst_kw) -> Config:
    cfg = Config()
    return cfg.replace(
        tacotron=dataclasses.replace(
            cfg.tacotron, embedding_dim=32, enc_conv_num_layers=2,
            enc_conv_channels=32, enc_conv_kernel_size=3, encoder_lstm_units=16,
            attention_dim=16, attention_filters=8, attention_kernel=7,
            prenet_layers=(16, 16), decoder_lstm_units=32,
            postnet_num_layers=2, postnet_channels=32, postnet_kernel_size=3,
            outputs_per_step=2),
        gst=dataclasses.replace(
            cfg.gst, num_gst=4, num_heads=2, style_embed_depth=8,
            style_att_dim=8, reference_filters=(4, 4), reference_depth=8,
            n_emt=4, n_spk=3, **gst_kw),
        audio=dataclasses.replace(cfg.audio, num_mels=20),
    )


def make_batch(B=2, T_in=11, T_out=12, T_ref=9, mels=20, seed=0):
    rng = np.random.default_rng(seed)
    lengths = np.full(B, T_in, np.int32)
    lengths[1::2] = T_in - 3  # every other sample padded
    tgt_lengths = np.full(B, T_out, np.int32)
    tgt_lengths[1::2] = T_out - 2
    return dict(
        inputs=jnp.asarray(rng.integers(2, 60, (B, T_in)), jnp.int32),
        input_lengths=jnp.asarray(lengths),
        mel_targets=jnp.asarray(rng.uniform(-4, 4, (B, T_out, mels)), jnp.float32),
        stop_token_targets=jnp.concatenate(
            [jnp.zeros((B, T_out - 2)), jnp.ones((B, 2))], axis=1),
        targets_lengths=jnp.asarray(tgt_lengths),
        ref_mel_emt=jnp.asarray(rng.uniform(-4, 4, (B, T_ref, mels)), jnp.float32),
        ref_mel_spk=jnp.asarray(rng.uniform(-4, 4, (B, T_ref, mels)), jnp.float32),
        emt_labels=jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32),
        spk_labels=jnp.asarray(rng.integers(0, 3, (B,)), jnp.int32),
    )


RNGS = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
            zoneout=jax.random.PRNGKey(2), teacher_forcing=jax.random.PRNGKey(3))


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_config()
    model = Tacotron(config=cfg)
    batch = make_batch()
    variables = model.init(
        RNGS, batch["inputs"], batch["input_lengths"],
        mel_targets=batch["mel_targets"], ref_mel_emt=batch["ref_mel_emt"],
        ref_mel_spk=batch["ref_mel_spk"], train=True)
    return cfg, model, variables, batch


def test_train_forward_shapes(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    out, _ = model.apply(
        variables, batch["inputs"], batch["input_lengths"],
        mel_targets=batch["mel_targets"], ref_mel_emt=batch["ref_mel_emt"],
        ref_mel_spk=batch["ref_mel_spk"], train=True,
        rngs={k: v for k, v in RNGS.items() if k != "params"},
        mutable=["batch_stats"])
    B, T_out, mels = batch["mel_targets"].shape
    assert out.decoder_output.shape == (B, T_out, mels)
    assert out.mel_outputs.shape == (B, T_out, mels)
    assert out.stop_token_prediction.shape == (B, T_out)
    assert out.alignments.shape == (B, batch["inputs"].shape[1],
                                    T_out // cfg.tacotron.outputs_per_step)
    assert out.refnet_out_emt.shape == (B, 128)
    assert out.style_emb_logit_emt.shape == (B, cfg.gst.n_emt)
    assert out.style_emb_logit_spk.shape == (B, cfg.gst.n_spk)
    # outputs clipped to T2 range with lower-bound decay
    assert out.mel_outputs.min() >= -4 - cfg.tacotron.lower_bound_decay - 1e-5
    assert out.mel_outputs.max() <= 4 + 1e-5


def test_alignments_are_distributions(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    out, _ = model.apply(
        variables, batch["inputs"], batch["input_lengths"],
        mel_targets=batch["mel_targets"], ref_mel_emt=batch["ref_mel_emt"],
        ref_mel_spk=batch["ref_mel_spk"], train=True,
        rngs={k: v for k, v in RNGS.items() if k != "params"},
        mutable=["batch_stats"])
    sums = np.asarray(out.alignments).sum(axis=1)  # over T_in
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)
    # encoder masking: padded positions of sample 1 get ~zero attention
    assert np.asarray(out.alignments)[1, -3:, :].max() < 1e-6


def test_synthesis_forward(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    out = model.apply(
        variables, batch["inputs"], batch["input_lengths"],
        ref_mel_emt=batch["ref_mel_emt"], ref_mel_spk=batch["ref_mel_spk"],
        synthesis=True, max_steps=7,
        rngs={k: v for k, v in RNGS.items() if k != "params"})
    B = batch["inputs"].shape[0]
    r = cfg.tacotron.outputs_per_step
    assert out.mel_outputs.shape == (B, 7 * r, cfg.audio.num_mels)
    # stop predictions are probabilities at synthesis
    assert (np.asarray(out.stop_token_prediction) >= 0).all()
    assert (np.asarray(out.stop_token_prediction) <= 1).all()


def test_loss_and_grads(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **other}, batch["inputs"], batch["input_lengths"],
            mel_targets=batch["mel_targets"], ref_mel_emt=batch["ref_mel_emt"],
            ref_mel_spk=batch["ref_mel_spk"], train=True,
            rngs={k: v for k, v in RNGS.items() if k != "params"},
            mutable=["batch_stats"])
        terms = compute_losses(out, batch, p, cfg)
        return terms["loss"], terms

    (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert float(terms["before_loss"]) > 0
    assert float(terms["stop_token_loss"]) > 0
    assert float(terms["style_emb_orthog_loss"]) != 0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # gradients reach the encoder embedding and the GST tokens
    assert np.abs(np.asarray(grads["inputs_embedding"]["embedding"])).max() > 0
    assert np.abs(np.asarray(grads["style_tokens_emt"])).max() > 0


def test_grad_reversal():
    f = lambda x: jnp.sum(flip_gradient(x) * 2.0)
    g = jax.grad(f)(jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(g), -2.0)


def test_emt_attn_variant():
    cfg = tiny_config(emt_attn=True, emt_attn_type="simple")
    model = Tacotron(config=cfg)
    batch = make_batch()
    variables = model.init(
        RNGS, batch["inputs"], batch["input_lengths"],
        mel_targets=batch["mel_targets"], ref_mel_emt=batch["ref_mel_emt"],
        ref_mel_spk=batch["ref_mel_spk"], train=True)
    out, _ = model.apply(
        variables, batch["inputs"], batch["input_lengths"],
        mel_targets=batch["mel_targets"], ref_mel_emt=batch["ref_mel_emt"],
        ref_mel_spk=batch["ref_mel_spk"], train=True,
        rngs={k: v for k, v in RNGS.items() if k != "params"},
        mutable=["batch_stats"])
    assert out.mel_outputs.shape == batch["mel_targets"].shape
    assert out.alignments_emt is not None


def test_unpaired_second_pass():
    cfg = tiny_config()
    model = Tacotron(config=cfg, pretrained_emb_disc_all=True)
    batch = make_batch()
    kw = dict(
        mel_targets=batch["mel_targets"], ref_mel_emt=batch["ref_mel_emt"],
        ref_mel_spk=batch["ref_mel_spk"], ref_mel_up_emt=batch["ref_mel_spk"],
        ref_mel_up_spk=batch["ref_mel_emt"], use_unpaired=True, train=True)
    variables = model.init(RNGS, batch["inputs"], batch["input_lengths"], **kw)
    out, _ = model.apply(
        variables, batch["inputs"], batch["input_lengths"], **kw,
        rngs={k: v for k, v in RNGS.items() if k != "params"},
        mutable=["batch_stats"])
    assert out.mel_outputs_up is not None
    assert out.refnet_out_mel_up_emt is not None


def test_emt_attn_l2_spk_emb_loss():
    """l2_spk_emb variant (tacotron_emt_attn.py:691-695): the orthogonality
    slot carries 0.1*||E_spk||_F instead, and only for the emt_attn model."""
    cfg = tiny_config(emt_attn=True, emt_attn_type="simple", l2_spk_emb=True)
    model = Tacotron(config=cfg)
    batch = make_batch()
    variables = model.init(
        RNGS, batch["inputs"], batch["input_lengths"],
        mel_targets=batch["mel_targets"], ref_mel_emt=batch["ref_mel_emt"],
        ref_mel_spk=batch["ref_mel_spk"], train=True)
    out, _ = model.apply(
        variables, batch["inputs"], batch["input_lengths"],
        mel_targets=batch["mel_targets"], ref_mel_emt=batch["ref_mel_emt"],
        ref_mel_spk=batch["ref_mel_spk"], train=True,
        rngs={k: v for k, v in RNGS.items() if k != "params"},
        mutable=["batch_stats"])
    losses = compute_losses(out, batch, variables["params"], cfg)
    expected = 0.1 * float(jnp.linalg.norm(out.refnet_out_spk))
    got = float(losses["style_emb_orthog_loss"])
    assert got > 0.0
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    # without the flag: zero in the emt_attn variant
    cfg0 = tiny_config(emt_attn=True, emt_attn_type="simple")
    losses0 = compute_losses(out, batch, variables["params"], cfg0)
    assert float(losses0["style_emb_orthog_loss"]) == 0.0


def test_style_tokens_emt_attn_synthesis_without_labels():
    """The style_tokens emt_attn variant queries decoder attention with a
    one-hot emt label (tacotron_emt_attn.py:261-285); synthesis without
    labels must default to a neutral label instead of crashing."""
    cfg = tiny_config(emt_attn=True, emt_attn_type="style_tokens")
    model = Tacotron(config=cfg)
    batch = make_batch(B=2)
    variables = model.init(
        RNGS, batch["inputs"], batch["input_lengths"],
        mel_targets=batch["mel_targets"], ref_mel_emt=batch["ref_mel_emt"],
        ref_mel_spk=batch["ref_mel_spk"], emt_labels=batch["emt_labels"],
        train=True)
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        batch["inputs"], batch["input_lengths"],
        ref_mel_emt=batch["ref_mel_emt"], ref_mel_spk=batch["ref_mel_spk"],
        synthesis=True, max_steps=5,
        rngs={k: v for k, v in RNGS.items() if k != "params"})
    assert np.isfinite(np.asarray(out.mel_outputs)).all()
