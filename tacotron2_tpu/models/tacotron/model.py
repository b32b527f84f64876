"""Tacotron-2 spectrogram predictor with style disentanglement (flax).

One module covering the reference's `Tacotron` (tacotron.py:25-681) and its
`Tacotron_emt_attn` variant (tacotron_emt_attn.py, via config.gst.emt_attn):
character embedding → conv+BiLSTM encoder → dual reference encoders → GST
multi-head style attention → LSA decoder (scan) → postnet residual → style
classifier / adversarial / nat-GAN heads.

The reference's 4-GPU tower loop + py_func splitting (tacotron.py:83-138)
disappears: one pjit-sharded batch, data-parallel over the mesh 'data' axis.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import Config
from ...ops.grad_reversal import flip_gradient
from ...text.symbols import symbols
from .decoder import Decoder
from .modules import (CBHG, BiLSTMEncoder, EncoderConvStack, FrameProjection,
                      MultiheadStyleAttention, Postnet, ReferenceEncoder,
                      ReferenceEncoderAdaIn, StyleEmbDisc, glorot)


@jax.tree_util.register_dataclass
@dataclass
class TacotronOutput:
    """Forward-pass outputs (the reference's tower_* lists, tacotron.py:142-195)."""

    decoder_output: jnp.ndarray          # [B, T_out, mels] pre-postnet
    mel_outputs: jnp.ndarray             # [B, T_out, mels] post-postnet
    stop_token_prediction: jnp.ndarray   # [B, T_out] logits (train) / probs (synth)
    alignments: jnp.ndarray              # [B, T_in, steps]
    style_embeddings: jnp.ndarray        # [B, T_in, S]
    refnet_out_emt: Optional[jnp.ndarray] = None       # [B, 128]
    refnet_out_spk: Optional[jnp.ndarray] = None       # [B, 128]
    style_emb_logit_emt: Optional[jnp.ndarray] = None  # [B, n_emt]
    style_emb_logit_spk: Optional[jnp.ndarray] = None  # [B, n_spk]
    style_emb_logit_emt_adv: Optional[jnp.ndarray] = None
    style_emb_logit_spk_adv: Optional[jnp.ndarray] = None
    linear_outputs: Optional[jnp.ndarray] = None       # [B, T_out, num_freq]
    alignments_emt: Optional[jnp.ndarray] = None
    # unpaired second pass (tacotron.py:389-462)
    mel_outputs_up: Optional[jnp.ndarray] = None
    decoder_output_up: Optional[jnp.ndarray] = None
    refnet_out_up_emt: Optional[jnp.ndarray] = None
    refnet_out_up_spk: Optional[jnp.ndarray] = None
    style_emb_logit_up_emt: Optional[jnp.ndarray] = None
    style_emb_logit_up_spk: Optional[jnp.ndarray] = None
    refnet_out_mel_up_emt: Optional[jnp.ndarray] = None
    refnet_out_mel_up_spk: Optional[jnp.ndarray] = None
    style_emb_logit_mel_out_up_emt: Optional[jnp.ndarray] = None
    style_emb_logit_mel_out_up_spk: Optional[jnp.ndarray] = None
    # synth-mode re-embeddings (tacotron.py:383-386)
    refnet_out_mel_emt: Optional[jnp.ndarray] = None
    refnet_out_mel_spk: Optional[jnp.ndarray] = None
    # nat-GAN heads (tacotron.py:538-568)
    nat_gan: Dict[str, jnp.ndarray] = field(default_factory=dict)


class Tacotron(nn.Module):
    """config-driven Tacotron-2; see module docstring."""

    config: Config
    # feature switches (reference argparse flags, train.py:94-158)
    emt_only: bool = False
    adv_emb_disc: bool = False
    nat_gan: bool = False
    pretrained_emb_disc: bool = False
    pretrained_emb_disc_all: bool = False

    def setup(self):
        cfg, tc, gst = self.config, self.config.tacotron, self.config.gst

        self.embedding = nn.Embed(len(symbols), tc.embedding_dim,
                                  embedding_init=glorot, name="inputs_embedding")
        # under mixed precision the conv stacks run their matmuls in bf16
        # (BatchNorm statistics stay f32) — the postnet alone is ~20 ms/step
        # of f32 conv at B=96x400 frames
        conv_dtype = (jnp.bfloat16 if tc.compute_dtype == "bfloat16"
                      else None)
        self.encoder_conv = EncoderConvStack(
            tc.enc_conv_num_layers, tc.enc_conv_channels, tc.enc_conv_kernel_size,
            tc.dropout_rate, tc.batch_norm_position, dtype=conv_dtype)
        self.encoder_lstm = BiLSTMEncoder(tc.encoder_lstm_units, tc.zoneout_rate)

        if gst.adain:
            self.reference_encoder = ReferenceEncoderAdaIn(
                tuple(gst.reference_filters), gst.reference_depth)
        else:
            all_out = gst.emt_attn
            self.reference_encoder_emt = ReferenceEncoder(
                tuple(gst.reference_filters), gst.reference_depth,
                all_outputs=all_out, emt_ref_gru=gst.emt_ref_gru,
                name="refnet_emt")
            if not self.emt_only:
                self.reference_encoder_spk = ReferenceEncoder(
                    tuple(gst.reference_filters), gst.reference_depth,
                    name="refnet_spk")

        if gst.use_gst and not gst.adain:
            tok_dim = gst.style_embed_depth // gst.num_heads
            init = nn.initializers.truncated_normal(stddev=0.5)
            self.gst_tokens_emt = self.param("style_tokens_emt", init,
                                             (gst.num_gst, tok_dim))
            self.gst_tokens_spk = self.param("style_tokens_spk", init,
                                             (gst.num_gst, tok_dim))
            self.style_attention_emt = MultiheadStyleAttention(
                gst.num_heads, gst.style_att_dim, gst.style_att_type, name="gst_attn_emt")
            self.style_attention_spk = MultiheadStyleAttention(
                gst.num_heads, gst.style_att_dim, gst.style_att_type, name="gst_attn_spk")

        self.decoder = Decoder(cfg)
        self.postnet = Postnet(tc.postnet_num_layers, tc.postnet_channels,
                               tc.postnet_kernel_size, tc.dropout_rate,
                               tc.batch_norm_position, dtype=conv_dtype)
        self.postnet_projection = FrameProjection(cfg.audio.num_mels,
                                                  name="postnet_projection")

        if tc.predict_linear:
            self.post_cbhg = CBHG(tc.cbhg_kernels, tc.cbhg_conv_channels,
                                  tc.cbhg_pool_size,
                                  (tc.cbhg_projection, cfg.audio.num_mels),
                                  tc.cbhg_projection_kernel_size,
                                  tc.cbhg_highwaynet_layers, tc.cbhg_highway_units,
                                  tc.cbhg_rnn_units, tc.batch_norm_position)
            self.linear_projection = FrameProjection(cfg.audio.num_freq,
                                                     name="cbhg_linear_specs_projection")

        if gst.use_style_emb_disc and not gst.adain:
            self.style_disc_emt = StyleEmbDisc(gst.n_emt, name="style_disc_emt")
            if not self.emt_only:
                self.style_disc_spk = StyleEmbDisc(gst.n_spk, name="style_disc_spk")
            if self.adv_emb_disc:
                self.style_disc_emt_adv = StyleEmbDisc(gst.n_spk, name="style_disc_emt_adv")
                if not self.emt_only:
                    self.style_disc_spk_adv = StyleEmbDisc(gst.n_emt, name="style_disc_spk_adv")

        if self.pretrained_emb_disc or self.pretrained_emb_disc_all:
            # frozen pretrained classifiers restored from spk_disc checkpoints
            # (reference tacotron.py:513-524, scopes pretrained_ref_enc_{emt,spk})
            self.pretrained_ref_enc_emt = ReferenceEncoder(
                tuple(gst.reference_filters), gst.reference_depth,
                name="pretrained_ref_enc_emt")
            self.pretrained_ref_enc_spk = ReferenceEncoder(
                tuple(gst.reference_filters), gst.reference_depth,
                name="pretrained_ref_enc_spk")
            self.pretrained_dense_emt = nn.Dense(gst.n_emt, kernel_init=glorot,
                                                 name="pretrained_ref_enc_emt_dense")
            self.pretrained_dense_spk = nn.Dense(gst.n_spk, kernel_init=glorot,
                                                 name="pretrained_ref_enc_spk_dense")

        if self.nat_gan:
            self.nat_gan_enc = ReferenceEncoder(tuple(gst.reference_filters),
                                                gst.reference_depth, name="nat_gan_enc")
            self.nat_gan_disc = StyleEmbDisc(3, name="nat_gan_disc")
            self.nat_gan_disc_emt = StyleEmbDisc(gst.n_emt, name="nat_gan_disc_emt")
            self.nat_gan_disc_spk = StyleEmbDisc(gst.n_spk, name="nat_gan_disc_spk")

    # ------------------------------------------------------------------ parts

    def encode(self, inputs, input_lengths, *, train: bool):
        """Characters → encoder hidden states [B, T_in, 512]."""
        embedded = self.embedding(inputs)
        conv_out = self.encoder_conv(embedded, train=train)
        return self.encoder_lstm(conv_out, input_lengths, train=train)

    def _style_embeddings(self, ref_mel_emt, ref_mel_spk, *, train: bool):
        """Reference mels → (style_emb [B, 1, S], refnet_emt, refnet_spk, emt_memory)."""
        gst = self.config.gst
        if gst.adain:
            refnet_spk, _ = self.reference_encoder(ref_mel_spk, ref_mel_emt, train=train)
            return refnet_spk[:, None, :], None, refnet_spk, None

        refnet_emt = self.reference_encoder_emt(ref_mel_emt, train=train)
        emt_memory = None
        if gst.emt_attn:
            emt_memory = refnet_emt                      # [B, T_ref', D] sequence
            refnet_emt = emt_memory.mean(axis=1)         # pooled for style losses
        refnet_spk = None
        if not self.emt_only:
            refnet_spk = self.reference_encoder_spk(ref_mel_spk, train=train)

        if gst.use_gst and not self.pretrained_emb_disc_all:
            B = ref_mel_emt.shape[0]
            value_emt = jnp.tanh(jnp.broadcast_to(
                self.gst_tokens_emt[None], (B,) + self.gst_tokens_emt.shape))
            style_emt = self.style_attention_emt(refnet_emt[:, None, :], value_emt)
            parts = [style_emt]
            if not self.emt_only:
                value_spk = jnp.tanh(jnp.broadcast_to(
                    self.gst_tokens_spk[None], (B,) + self.gst_tokens_spk.shape))
                parts.append(self.style_attention_spk(refnet_spk[:, None, :], value_spk))
            style = jnp.concatenate(parts, axis=-1)
        else:
            parts = [refnet_emt[:, None, :]]
            if not self.emt_only:
                parts.append(refnet_spk[:, None, :])
            style = jnp.concatenate(parts, axis=-1)
        return style, refnet_emt, refnet_spk, emt_memory

    def _clip(self, x):
        tc, au = self.config.tacotron, self.config.audio
        if not tc.clip_outputs:
            return x
        lo = (-au.max_abs_value if au.symmetric_mels else 0.0) - tc.lower_bound_decay
        return jnp.clip(x, lo, au.max_abs_value)

    def _decode_pass(self, encoder_outputs, style_emb, input_lengths,
                     mel_targets, teacher_forcing_ratio, *, train: bool,
                     synthesis: bool, max_steps: Optional[int],
                     emt_memory=None, ref_spk=None, labels=None):
        """Concat style → memory; run decoder; postnet; clip. One full pass."""
        T_in = encoder_outputs.shape[1]
        style_tiled = jnp.broadcast_to(
            style_emb, (style_emb.shape[0], T_in, style_emb.shape[2]))
        memory = jnp.concatenate([encoder_outputs, style_tiled], axis=-1)
        memory_mask = (jnp.arange(T_in)[None, :] < input_lengths[:, None]) \
            if self.config.tacotron.mask_encoder else None

        keys = self.decoder.cell.attention.compute_keys(memory)
        if synthesis:
            frames, stops, aligns, aligns_emt = self.decoder.autoregressive(
                memory.shape[0], max_steps, keys, memory, memory_mask,
                emt_memory=emt_memory, ref_spk=ref_spk, labels=labels)
        else:
            frames, stops, aligns, aligns_emt = self.decoder.teacher_forced(
                mel_targets, keys, memory, memory_mask, teacher_forcing_ratio,
                train=train, emt_memory=emt_memory, ref_spk=ref_spk, labels=labels)

        decoder_output = self._clip(frames)
        residual = self.postnet(decoder_output, train=train)
        mel_outputs = self._clip(decoder_output + self.postnet_projection(residual))
        return decoder_output, mel_outputs, stops, aligns, aligns_emt, style_tiled

    # ------------------------------------------------ fused-decoder split
    # The fused Pallas decode (ops/tacotron_decoder_kernel.py) runs the
    # autoregressive loop outside flax; these two methods expose everything
    # before and after it as separately jittable passes.

    def synthesis_memory(self, inputs, input_lengths, ref_mel_emt,
                         ref_mel_spk):
        """Encoder + style + memory concat + attention keys + padding mask —
        the part of _decode_pass that runs once per utterance batch."""
        keys, memory, mask, _, _ = self.synthesis_memory_ext(
            inputs, input_lengths, ref_mel_emt, ref_mel_spk)
        return keys, memory, mask

    def synthesis_memory_ext(self, inputs, input_lengths, ref_mel_emt,
                             ref_mel_spk):
        """synthesis_memory plus the decoder-side emt-attention operands
        (emt_memory sequence, spk ref feed) needed to drive
        Decoder.autoregressive step blocks under the `emt_attn` variant
        (reference tacotron_emt_attn.py:261-285)."""
        gst = self.config.gst
        encoder_outputs = self.encode(inputs, input_lengths, train=False)
        style_emb, _, refnet_spk, emt_memory = self._style_embeddings(
            ref_mel_emt, ref_mel_spk, train=False)
        T_in = encoder_outputs.shape[1]
        style_tiled = jnp.broadcast_to(
            style_emb, (style_emb.shape[0], T_in, style_emb.shape[2]))
        memory = jnp.concatenate([encoder_outputs, style_tiled], axis=-1)
        if self.config.tacotron.mask_encoder:
            mask = jnp.arange(T_in)[None, :] < input_lengths[:, None]
        else:
            mask = jnp.ones((memory.shape[0], T_in), bool)
        keys = self.decoder.cell.attention.compute_keys(memory)
        ref_spk_feed = refnet_spk if (gst.emt_attn and not self.emt_only) \
            else None
        return keys, memory, mask, emt_memory, ref_spk_feed

    def postnet_pass(self, frames):
        """Clip + postnet residual + clip — the tail of _decode_pass."""
        decoder_output = self._clip(frames)
        residual = self.postnet(decoder_output, train=False)
        mel_outputs = self._clip(decoder_output + self.postnet_projection(residual))
        return decoder_output, mel_outputs

    # ------------------------------------------------------------------ main

    def __call__(self, inputs, input_lengths, mel_targets=None,
                 ref_mel_emt=None, ref_mel_spk=None,
                 ref_mel_up_emt=None, ref_mel_up_spk=None,
                 emt_labels=None, spk_labels=None,
                 teacher_forcing_ratio: float = 1.0,
                 *, train: bool = False, gta: bool = False,
                 synthesis: bool = False, max_steps: Optional[int] = None,
                 use_unpaired: bool = False, synth_embeddings: bool = False
                 ) -> TacotronOutput:
        """Full forward pass.

        Modes (reference initialize() args, tacotron.py:31-35): train
        (teacher-forced + losses heads), eval (natural ratio handled by
        caller via teacher_forcing_ratio), gta (ratio=1), synthesis
        (autoregressive, needs max_steps).
        """
        gst, tc = self.config.gst, self.config.tacotron
        if gta:
            teacher_forcing_ratio = 1.0

        encoder_outputs = self.encode(inputs, input_lengths, train=train)
        style_emb, refnet_emt, refnet_spk, emt_memory = self._style_embeddings(
            ref_mel_emt, ref_mel_spk, train=train)

        labels_oh = None
        if gst.emt_attn and gst.emt_attn_type == "style_tokens":
            if emt_labels is None:  # synthesis without labels: neutral mix
                emt_labels = jnp.zeros((inputs.shape[0],), jnp.int32)
            labels_oh = jax.nn.one_hot(emt_labels, gst.n_emt)

        ref_spk_feed = refnet_spk if (gst.emt_attn and not self.emt_only) else None
        dec_out, mel_out, stops, aligns, aligns_emt, style_tiled = self._decode_pass(
            encoder_outputs, style_emb, input_lengths, mel_targets,
            teacher_forcing_ratio, train=train, synthesis=synthesis,
            max_steps=max_steps, emt_memory=emt_memory, ref_spk=ref_spk_feed,
            labels=labels_oh)

        out = TacotronOutput(
            decoder_output=dec_out, mel_outputs=mel_out,
            stop_token_prediction=stops, alignments=aligns,
            alignments_emt=aligns_emt,
            style_embeddings=style_tiled, refnet_out_emt=refnet_emt,
            refnet_out_spk=refnet_spk)

        # mel→linear CBHG post-processing net (disabled by default,
        # hparams.py:194; reference tacotron.py:465-482)
        if tc.predict_linear and not gta:
            post_out = self.post_cbhg(mel_out, None, train=train)
            out.linear_outputs = self._clip(self.linear_projection(post_out))

        # style-classifier heads (tacotron.py:484-537)
        if gst.use_style_emb_disc and not gst.adain and not self.pretrained_emb_disc_all:
            out.style_emb_logit_emt = self.style_disc_emt(refnet_emt)
            if not self.emt_only:
                out.style_emb_logit_spk = self.style_disc_spk(refnet_spk)
            if self.adv_emb_disc:
                out.style_emb_logit_emt_adv = self.style_disc_emt_adv(
                    flip_gradient(refnet_emt))
                if not self.emt_only:
                    out.style_emb_logit_spk_adv = self.style_disc_spk_adv(
                        flip_gradient(refnet_spk))

        if synth_embeddings and not gst.adain:
            out.refnet_out_mel_emt = self.reference_encoder_emt(mel_out, train=False)
            if not self.emt_only:
                out.refnet_out_mel_spk = self.reference_encoder_spk(mel_out, train=False)

        # unpaired second decode pass with crossed references (tacotron.py:389-462)
        if use_unpaired:
            style_up, ref_up_emt, ref_up_spk, emt_memory_up = self._style_embeddings(
                ref_mel_up_emt, ref_mel_up_spk, train=train)
            dec_up, mel_up, _, _, _, _ = self._decode_pass(
                encoder_outputs, style_up, input_lengths, mel_targets,
                teacher_forcing_ratio, train=train, synthesis=False,
                max_steps=None, emt_memory=emt_memory_up, ref_spk=None,
                labels=labels_oh)
            out.decoder_output_up = dec_up
            out.mel_outputs_up = mel_up
            out.refnet_out_up_emt = ref_up_emt
            out.refnet_out_up_spk = ref_up_spk
            if self.pretrained_emb_disc_all:
                out.refnet_out_mel_up_emt = self.reference_encoder_emt(mel_up, train=False)
                out.refnet_out_mel_up_spk = self.reference_encoder_spk(mel_up, train=False)
            elif gst.use_style_emb_disc and not gst.adain:
                out.style_emb_logit_up_emt = self.style_disc_emt(ref_up_emt)
                if not self.emt_only:
                    out.style_emb_logit_up_spk = self.style_disc_spk(ref_up_spk)
                if self.pretrained_emb_disc:
                    out.style_emb_logit_mel_out_up_emt = self.pretrained_dense_emt(
                        self.pretrained_ref_enc_emt(mel_up, train=False))
                    if not self.emt_only:
                        out.style_emb_logit_mel_out_up_spk = self.pretrained_dense_spk(
                            self.pretrained_ref_enc_spk(mel_up, train=False))
                else:
                    r_emt = self.reference_encoder_emt(mel_up, train=False)
                    out.refnet_out_mel_up_emt = r_emt
                    out.style_emb_logit_mel_out_up_emt = self.style_disc_emt(r_emt)
                    if not self.emt_only:
                        r_spk = self.reference_encoder_spk(mel_up, train=False)
                        out.refnet_out_mel_up_spk = r_spk
                        out.style_emb_logit_mel_out_up_spk = self.style_disc_spk(r_spk)

        # naturalness-GAN heads (tacotron.py:538-568): encoder feeds the
        # 3-class disc directly, and emt/spk discs through gradient reversal
        if self.nat_gan and mel_targets is not None:
            enc_t = self.nat_gan_enc(mel_targets, train=train)
            enc_p = self.nat_gan_enc(mel_out, train=train)
            ng = {
                "logits_targets": self.nat_gan_disc(enc_t),
                "logits_mel_p": self.nat_gan_disc(enc_p),
                "logits_targets_emt": self.nat_gan_disc_emt(flip_gradient(enc_t)),
                "logits_mel_p_emt": self.nat_gan_disc_emt(flip_gradient(enc_p)),
                "logits_targets_spk": self.nat_gan_disc_spk(flip_gradient(enc_t)),
                "logits_mel_p_spk": self.nat_gan_disc_spk(flip_gradient(enc_p)),
            }
            if use_unpaired:
                enc_up = self.nat_gan_enc(out.mel_outputs_up, train=train)
                ng["logits_mel_up"] = self.nat_gan_disc(enc_up)
                ng["logits_mel_up_emt"] = self.nat_gan_disc_emt(flip_gradient(enc_up))
                ng["logits_mel_up_spk"] = self.nat_gan_disc_spk(flip_gradient(enc_up))
            out.nat_gan = ng

        return out
