"""Tacotron loss assembly (pure jnp).

Parity with reference Tacotron.add_loss (tacotron.py:683-1000) and the masked
variants (modules.py:523-605): before/after MSE, stop-token BCE (weighted),
linear L1 with low-frequency priority, style CE heads, orthogonality, cosine
similarity, nat-GAN d/g losses, and L2 regularization with the reference's
name-based exclusions.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...config import Config
from .model import TacotronOutput


def _round_up(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    rem = x % multiple
    return jnp.where(rem == 0, x, x + multiple - rem)


def sequence_mask(lengths, max_len: int, r: int = 1, expand: bool = True):
    """[B] → [B, max_len(, 1)] float mask; lengths rounded to r like the
    reference (modules.py:523-530 uses maxlen rounded up to r)."""
    t = jnp.arange(max_len)[None, :]
    mask = (t < lengths[:, None]).astype(jnp.float32)
    return mask[:, :, None] if expand else mask


def masked_mse(targets, outputs, lengths, r: int):
    """MaskedMSE (modules.py:532-551)."""
    mask = sequence_mask(lengths, targets.shape[1], r, expand=True)
    mask = jnp.broadcast_to(mask, targets.shape)
    se = (targets - outputs) ** 2 * mask
    return jnp.sum(se) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_stop_ce(targets, logits, lengths, r: int, pos_weight: float = 1.0):
    """MaskedSigmoidCrossEntropy (modules.py:553-575): weighted BCE, averaged
    over nonzero (in-mask) positions."""
    mask = sequence_mask(lengths, targets.shape[1], r, expand=False)
    # tf.nn.weighted_cross_entropy_with_logits
    log_w = 1.0 + (pos_weight - 1.0) * targets
    losses = ((1.0 - targets) * logits +
              log_w * (jnp.log1p(jnp.exp(-jnp.abs(logits))) +
                       nn_relu(-logits)))
    masked = losses * mask
    denom = jnp.maximum(jnp.sum((masked != 0).astype(jnp.float32)), 1.0)
    return jnp.sum(masked) / denom


def nn_relu(x):
    return jnp.maximum(x, 0.0)


def stop_ce(targets, logits):
    """Unmasked sigmoid CE (the default path, tacotron.py:778-779)."""
    losses = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(losses)


def linear_loss(linear_targets, linear_outputs, cfg: Config):
    """L1 with priority below 2 kHz (tacotron.py:781-787)."""
    l1 = jnp.abs(linear_targets - linear_outputs)
    n_priority = int(2000 / (cfg.audio.sample_rate * 0.5) * cfg.audio.num_freq)
    return 0.5 * jnp.mean(l1) + 0.5 * jnp.mean(l1[:, :, :n_priority])


def masked_linear_loss(linear_targets, linear_outputs, lengths, cfg: Config):
    """MaskedLinearLoss (modules.py:577-605)."""
    mask = jnp.broadcast_to(
        sequence_mask(lengths, linear_targets.shape[1], cfg.tacotron.outputs_per_step),
        linear_targets.shape)
    l1 = jnp.abs(linear_targets - linear_outputs) * mask
    n_priority = int(2000 / (cfg.audio.sample_rate * 0.5) * cfg.audio.num_freq)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return 0.5 * jnp.sum(l1) / denom + 0.5 * jnp.sum(l1[:, :, :n_priority]) / denom


def softmax_ce(logits, labels_onehot):
    return jnp.mean(-jnp.sum(labels_onehot * jax.nn.log_softmax(logits), axis=-1))


def cossim(x, y):
    """Global (non-normalized-input) cosine similarity (tacotron.py:1267-1276)."""
    xn = jnp.sqrt(jnp.sum(x ** 2) + 1e-6)
    yn = jnp.sqrt(jnp.sum(y ** 2) + 1e-6)
    return jnp.sum(x * y) / xn / yn


def l2_regularization(params, reg_weight: float) -> jnp.ndarray:
    """0.5·Σ‖W‖² over weights, excluding biases, projections, embeddings and
    RNN/LSTM kernels (reference exclusions, tacotron.py:862-867)."""
    total = 0.0
    excluded = ("bias", "projection", "inputs_embedding", "lstm", "rnn", "gru",
                "fw", "bw")

    def visit(path, leaf):
        nonlocal total
        name = "/".join(str(p.key if hasattr(p, "key") else p) for p in path).lower()
        if any(tok in name for tok in excluded):
            return
        total += 0.5 * jnp.sum(leaf ** 2)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        visit(path, leaf)
    return total * reg_weight


def compute_losses(out: TacotronOutput, batch: Dict[str, Any], params,
                   cfg: Config, *, use_unpaired: bool = False,
                   nat_gan: bool = False, adv_emb_disc: bool = False,
                   emt_only: bool = False, pretrained_emb_disc_all: bool = False,
                   nat_gan_derate: float = 1.0) -> Dict[str, jnp.ndarray]:
    """All loss terms + the three optimizer targets.

    Returns a dict with per-term scalars plus:
      'loss'          — main optimizer target (tacotron.py:935-936)
      'loss_no_mo_up' — refnet/style optimizer target (tacotron.py:929-932)
      'd_loss'        — nat-GAN discriminator target (tacotron.py:892)
    """
    tc, gst = cfg.tacotron, cfg.gst
    mel_targets = batch["mel_targets"]
    lengths = batch.get("targets_lengths")
    r = tc.outputs_per_step

    if tc.mask_decoder:
        before = masked_mse(mel_targets, out.decoder_output, lengths, r)
        after = masked_mse(mel_targets, out.mel_outputs, lengths, r)
        stop_loss = masked_stop_ce(batch["stop_token_targets"],
                                   out.stop_token_prediction, lengths, r,
                                   tc.cross_entropy_pos_weight)
    else:
        before = jnp.mean((mel_targets - out.decoder_output) ** 2)
        after = jnp.mean((mel_targets - out.mel_outputs) ** 2)
        stop_loss = stop_ce(batch["stop_token_targets"], out.stop_token_prediction)

    lin_loss = 0.0
    if tc.predict_linear and out.linear_outputs is not None:
        if tc.mask_decoder:
            lin_loss = masked_linear_loss(batch["linear_targets"],
                                          out.linear_outputs, lengths, cfg)
        else:
            lin_loss = linear_loss(batch["linear_targets"], out.linear_outputs, cfg)

    # regularization with reference scaling switch (tacotron.py:856-860)
    if cfg.train.tacotron_scale_regularization:
        scaler = 1.0 / (2 * cfg.audio.max_abs_value) if cfg.audio.symmetric_mels \
            else 1.0 / cfg.audio.max_abs_value
        reg_weight = cfg.train.tacotron_reg_weight * scaler
    else:
        reg_weight = cfg.train.tacotron_reg_weight
    reg = l2_regularization(params, reg_weight)

    terms: Dict[str, jnp.ndarray] = dict(
        before_loss=before, after_loss=after, stop_token_loss=stop_loss,
        linear_loss=jnp.asarray(lin_loss), regularization_loss=reg)

    zero = jnp.asarray(0.0)
    style_emt = style_spk = orthog = zero
    style_up_emt = style_up_spk = mo_up_emt = mo_up_spk = zero
    style_emt_adv = style_spk_adv = up_emt_adv = up_spk_adv = zero
    mo_up_emt_adv = mo_up_spk_adv = zero
    g_loss = g_loss_p = g_loss_up = d_loss = zero

    n_emt, n_spk = gst.n_emt, gst.n_spk
    if pretrained_emb_disc_all and out.refnet_out_mel_up_emt is not None:
        B = mel_targets.shape[0]
        style_mo_emt = tc.unpaired_loss_derate * (
            (B - cossim(out.refnet_out_up_emt, out.refnet_out_mel_up_emt)) / B)
        style_mo_spk = tc.unpaired_loss_derate * (
            (B - cossim(out.refnet_out_up_spk, out.refnet_out_mel_up_spk)) / B)
        mo_up_emt, mo_up_spk = style_mo_emt, style_mo_spk
    elif out.style_emb_logit_emt is not None:
        emt_oh = jax.nn.one_hot(batch["emt_labels"], n_emt)
        spk_oh = jax.nn.one_hot(batch["spk_labels"], n_spk)
        style_emt = softmax_ce(out.style_emb_logit_emt, emt_oh)
        if adv_emb_disc and out.style_emb_logit_emt_adv is not None:
            style_emt_adv = softmax_ce(out.style_emb_logit_emt_adv, spk_oh)
        if not emt_only and out.style_emb_logit_spk is not None:
            style_spk = softmax_ce(out.style_emb_logit_spk, spk_oh)
            if adv_emb_disc and out.style_emb_logit_spk_adv is not None:
                style_spk_adv = softmax_ce(out.style_emb_logit_spk_adv, emt_oh)

    if use_unpaired and not pretrained_emb_disc_all and \
            out.style_emb_logit_up_emt is not None:
        emt_up_oh = jax.nn.one_hot(batch["emt_up_labels"], n_emt)
        spk_up_oh = jax.nn.one_hot(batch["spk_up_labels"], n_spk)
        style_up_emt = softmax_ce(out.style_emb_logit_up_emt, emt_up_oh)
        if out.style_emb_logit_mel_out_up_emt is not None:
            mo_up_emt = tc.unpaired_loss_derate * softmax_ce(
                out.style_emb_logit_mel_out_up_emt, emt_up_oh)
        if not emt_only:
            style_up_spk = softmax_ce(out.style_emb_logit_up_spk, spk_up_oh)
            if out.style_emb_logit_mel_out_up_spk is not None:
                mo_up_spk = tc.unpaired_loss_derate * softmax_ce(
                    out.style_emb_logit_mel_out_up_spk, spk_up_oh)

    # orthogonality: 0.02·‖E_emt·E_spkᵀ‖_F (tacotron.py:840-848)
    if gst.emt_attn:
        # emt_attn variant: no emt/spk orthogonality (the emt path is a
        # sequence); optional l2_spk_emb penalty 0.1·‖E_spk‖_F instead
        # (tacotron_emt_attn.py:691-695)
        if gst.l2_spk_emb and not emt_only and \
                gst.emt_attn_type != "style_tokens" and \
                out.refnet_out_spk is not None:
            orthog = 0.1 * jnp.linalg.norm(out.refnet_out_spk)
            if use_unpaired and out.refnet_out_up_spk is not None:
                orthog = 0.1 * (jnp.linalg.norm(out.refnet_out_spk)
                                + jnp.linalg.norm(out.refnet_out_up_spk))
    elif gst.use_orthog_loss and not emt_only and not gst.adain and \
            not pretrained_emb_disc_all and out.refnet_out_spk is not None:
        orthog = 0.02 * jnp.linalg.norm(out.refnet_out_emt @ out.refnet_out_spk.T)
        if use_unpaired and out.refnet_out_up_spk is not None:
            orthog = orthog + 0.02 * jnp.linalg.norm(
                out.refnet_out_up_emt @ out.refnet_out_up_spk.T)

    # nat-GAN 3-class real/paired/unpaired (tacotron.py:869-893)
    if nat_gan and out.nat_gan:
        B = mel_targets.shape[0]
        ng = out.nat_gan
        oh = lambda c: jax.nn.one_hot(jnp.full((B,), c), 3)
        d_targ = softmax_ce(ng["logits_targets"], oh(0))
        d_p = softmax_ce(ng["logits_mel_p"], oh(1))
        d_up = softmax_ce(ng["logits_mel_up"], oh(2)) if "logits_mel_up" in ng else zero
        d_adv = 0.1
        emt_oh = jax.nn.one_hot(batch["emt_labels"], n_emt)
        spk_oh = jax.nn.one_hot(batch["spk_labels"], n_spk)
        d_targ_emt = d_adv * softmax_ce(ng["logits_targets_emt"], emt_oh)
        d_p_emt = d_adv * softmax_ce(ng["logits_mel_p_emt"], emt_oh)
        d_targ_spk = d_adv * softmax_ce(ng["logits_targets_spk"], spk_oh)
        d_p_spk = d_adv * softmax_ce(ng["logits_mel_p_spk"], spk_oh)
        d_up_emt = d_up_spk = zero
        if "logits_mel_up_emt" in ng:
            emt_up_oh = jax.nn.one_hot(batch["emt_up_labels"], n_emt)
            spk_up_oh = jax.nn.one_hot(batch["spk_up_labels"], n_spk)
            d_up_emt = d_adv * softmax_ce(ng["logits_mel_up_emt"], emt_up_oh)
            d_up_spk = d_adv * softmax_ce(ng["logits_mel_up_spk"], spk_up_oh)
        g_loss_p = nat_gan_derate * softmax_ce(ng["logits_mel_p"], oh(0))
        g_loss_up = (nat_gan_derate * softmax_ce(ng["logits_mel_up"], oh(0))
                     if "logits_mel_up" in ng else zero)
        d_loss = (d_targ + d_p + d_up + d_targ_emt + d_p_emt + d_up_emt +
                  d_targ_spk + d_p_spk + d_up_spk)
        g_loss = g_loss_p + g_loss_up
        terms.update(d_loss_targ=d_targ, d_loss_p=d_p, d_loss_up=d_up)

    terms.update(
        style_emb_loss_emt=style_emt, style_emb_loss_spk=style_spk,
        style_emb_orthog_loss=orthog,
        style_emb_loss_up_emt=style_up_emt, style_emb_loss_up_spk=style_up_spk,
        style_emb_loss_mel_out_up_emt=mo_up_emt,
        style_emb_loss_mel_out_up_spk=mo_up_spk,
        g_loss_p=g_loss_p, g_loss_up=g_loss_up, d_loss=d_loss)

    loss_no_mo_up = (before + after + stop_loss + reg + terms["linear_loss"] +
                     style_emt + style_spk + orthog + style_up_emt +
                     style_up_spk + g_loss + style_emt_adv + style_spk_adv +
                     up_emt_adv + up_spk_adv)
    loss = loss_no_mo_up + mo_up_emt + mo_up_spk + mo_up_emt_adv + mo_up_spk_adv

    terms["loss_no_mo_up"] = loss_no_mo_up
    terms["loss"] = loss
    return terms
