"""Tacotron decoder: one `lax.scan` per utterance batch, TPU-first.

Re-design of the reference's dynamic_decode stack (CustomDecoder +
TacotronDecoderCell + Taco{Training,Test}Helper; Architecture_wrappers.py:71-267,
custom_decoder.py:20-139, helpers.py:6-179):

- Training/GTA/eval: a fixed-length `nn.scan` over T_out/r steps with per-step
  teacher-forcing coin flips (one uniform per step, shared across the batch —
  helpers.py:116-128).
- Inference: the same scan over a static `max_steps`. The reference's
  dynamic_decode stops the whole batch when all (or any, per stop_at_any)
  samples predict <stop>; here extra steps past that point are simply computed
  and trimmed on the host from the recorded stop tokens
  (synthesizer.get_output_lengths parity). Static trip counts are what XLA
  wants; callers bound `max_steps` by bucketing on input length.
- Prenet dropout stays ON at inference (required for autoregressive
  diversity); zoneout is deterministic EMA at inference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import Config
from .attention import AttentionParams, SimpleBahdanauAttention
from .modules import (FrameProjection, MultiheadStyleAttention, Prenet,
                      StopProjection, ZoneoutLSTMCell, glorot)


class DecoderState(NamedTuple):
    """Scan carry (reference TacotronDecoderCellState, Architecture_wrappers.py:48-69)."""

    lstm_c1: jnp.ndarray
    lstm_h1: jnp.ndarray
    lstm_c2: jnp.ndarray
    lstm_h2: jnp.ndarray
    context: jnp.ndarray          # [B, M] attention context
    cum_alignments: jnp.ndarray   # [B, T_in]
    max_attention: jnp.ndarray    # [B] int32
    prev_output: jnp.ndarray      # [B, num_mels] last emitted frame
    context_emt: jnp.ndarray      # [B, E] emt-attention context (emt_attn variant)


class DecoderCell(nn.Module):
    """Single decoder step: prenet → 2×zoneout-LSTM → LSA → projections.

    Reference: TacotronDecoderCell.__call__ (Architecture_wrappers.py:197-267).
    """

    config: Config

    def setup(self):
        tc, gst = self.config.tacotron, self.config.gst
        self.prenet = Prenet(tuple(tc.prenet_layers), tc.dropout_rate)
        self.lstm1 = ZoneoutLSTMCell(tc.decoder_lstm_units, tc.zoneout_rate)
        self.lstm2 = ZoneoutLSTMCell(tc.decoder_lstm_units, tc.zoneout_rate)
        self.attention = AttentionParams(tc.attention_dim, tc.attention_filters,
                                         tc.attention_kernel)
        num_mels = self.config.audio.num_mels
        self.frame_projection = FrameProjection(num_mels * tc.outputs_per_step)
        self.stop_projection = StopProjection(tc.outputs_per_step)

        if gst.emt_attn:
            if gst.emt_attn_type == "simple":
                self.attention_emt = SimpleBahdanauAttention(2 * gst.reference_depth)
            else:
                self.attention_emt = MultiheadStyleAttention(
                    gst.num_heads, gst.style_att_dim, gst.style_att_type)
                if gst.emt_attn_type == "multihead":
                    self.attn_emt_out = nn.Dense(128, kernel_init=glorot)

    def emt_context_size(self) -> int:
        gst = self.config.gst
        if not gst.emt_attn:
            return 0
        if gst.emt_attn_type == "simple":
            return 2 * gst.reference_depth
        if gst.emt_attn_type == "multihead":
            return 128
        # style_tokens: MultiheadStyleAttention concatenates num_heads FULL
        # value vectors (value = the 2*reference_depth emt-ref sequence)
        return gst.num_heads * 2 * gst.reference_depth

    def __call__(self, state: DecoderState, frame_input, keys, memory,
                 memory_mask, *, train: bool, synthesis: bool,
                 emt_memory=None, ref_spk=None, labels=None,
                 apply_stop_sigmoid: bool = False):
        tc, gst = self.config.tacotron, self.config.gst

        prenet_out = self.prenet(frame_input)
        lstm_in = jnp.concatenate([prenet_out, state.context], axis=-1)

        # emt-attention input feeding (Architecture_wrappers.py:203-211)
        if gst.emt_attn and emt_memory is not None:
            if ref_spk is not None:
                if gst.emt_attn_type == "multihead":
                    lstm_in = jnp.concatenate([lstm_in, ref_spk + state.context_emt], -1)
                else:
                    lstm_in = jnp.concatenate([lstm_in, state.context_emt, ref_spk], -1)
            else:
                lstm_in = jnp.concatenate([lstm_in, state.context_emt], -1)

        (c1, h1), out1 = self.lstm1((state.lstm_c1, state.lstm_h1), lstm_in, train=train)
        (c2, h2), out2 = self.lstm2((state.lstm_c2, state.lstm_h2), out1, train=train)

        context, alignments, cum_align, max_att = self.attention(
            out2, keys, memory, state.cum_alignments, memory_mask,
            state.max_attention,
            synthesis_constraint=tc.synthesis_constraint and synthesis,
            constraint_type=tc.synthesis_constraint_type,
            attention_win_size=tc.attention_win_size,
            smoothing=tc.smoothing)

        # emt-attention context for next step (Architecture_wrappers.py:228-241)
        context_emt = state.context_emt
        alignments_emt = jnp.zeros((frame_input.shape[0], 1), frame_input.dtype)
        if gst.emt_attn and emt_memory is not None:
            if gst.emt_attn_type == "simple":
                context_emt, alignments_emt = self.attention_emt(out2, emt_memory)
            elif gst.emt_attn_type == "multihead":
                ctx = self.attention_emt(out2[:, None, :], emt_memory)
                context_emt = self.attn_emt_out(jnp.squeeze(ctx, 1))
            else:  # style_tokens
                q = jnp.concatenate([out2, labels], axis=-1)[:, None, :]
                context_emt = jnp.squeeze(self.attention_emt(q, emt_memory), 1)

        proj_in = jnp.concatenate([out2, context], axis=-1)
        frames = self.frame_projection(proj_in)                 # [B, r·mels]
        stops = self.stop_projection(proj_in, apply_sigmoid=apply_stop_sigmoid)

        new_state = DecoderState(
            lstm_c1=c1, lstm_h1=h1, lstm_c2=c2, lstm_h2=h2,
            context=context, cum_alignments=cum_align, max_attention=max_att,
            prev_output=frames[:, -self.config.audio.num_mels:],
            context_emt=context_emt)
        # pin the carry dtype to the input state's dtype: under mixed
        # precision the caller chooses a bf16 carry, but during model.init
        # (f32 params) or f32-param apply the math may come out f32 — the
        # scan requires carry-in == carry-out.
        new_state = jax.tree_util.tree_map(
            lambda n, o: n.astype(o.dtype), new_state, state)
        return new_state, (frames, stops, alignments, alignments_emt)

    def zero_state(self, batch: int, t_in: int, memory_dim: int,
                   dtype=jnp.float32) -> DecoderState:
        u = self.config.tacotron.decoder_lstm_units
        num_mels = self.config.audio.num_mels
        z = lambda *s: jnp.zeros(s, dtype)
        return DecoderState(
            lstm_c1=z(batch, u), lstm_h1=z(batch, u),
            lstm_c2=z(batch, u), lstm_h2=z(batch, u),
            context=z(batch, memory_dim),
            cum_alignments=z(batch, t_in),
            max_attention=jnp.zeros((batch,), jnp.int32),
            prev_output=z(batch, num_mels),
            context_emt=z(batch, max(self.emt_context_size(), 1)))


def _cell_scan(cell: DecoderCell, carry, xs_step_major, step_fn,
               remat: bool = False):
    """nn.scan wrapper: params broadcast, fresh dropout/zoneout rngs per step.

    remat=True wraps the step in nn.remat (rematerialize decoder-step
    activations in the backward pass) — the TPU-native replacement for the
    reference's `swap_memory=True` CPU offload (tacotron.py:354,
    hparams.py:262): trade recompute FLOPs for HBM instead of PCIe swaps.
    """
    if remat:
        step_fn = nn.remat(step_fn, prevent_cse=False)
    scan = nn.scan(step_fn,
                   variable_broadcast="params",
                   split_rngs={"params": False, "dropout": True, "zoneout": True,
                               "batch_stats": False},
                   in_axes=0, out_axes=0)
    return scan(cell, carry, xs_step_major)


_FUSED_TF_CACHE: dict = {}


def _fused_teacher_forced_fn(cfg: Config, B: int, T_in: int, steps: int,
                             M: int, train_zoneout: bool):
    """Build (and cache) the fused teacher-forced decode for these shapes."""
    from ...ops.tacotron_train_kernel import (build_train_fwd,
                                              make_fused_teacher_forced)
    import jax.numpy as jnp  # noqa: F811 (local alias for dtype lookup)

    tc = cfg.tacotron
    wd = (jnp.bfloat16 if tc.fused_train_dtype == "bfloat16"
          else jnp.float32)
    interpret = jax.default_backend() != "tpu"
    key = (B, T_in, steps, M, tc.fused_train_dtype, train_zoneout, interpret,
           tc.decoder_lstm_units, tc.attention_dim, tuple(tc.prenet_layers),
           tc.outputs_per_step, cfg.audio.num_mels, tc.dropout_rate,
           tc.zoneout_rate)
    fn = _FUSED_TF_CACHE.get(key)
    if fn is None:
        if train_zoneout:
            fn = make_fused_teacher_forced(cfg, B, T_in, steps, M,
                                           weight_dtype=wd,
                                           interpret=interpret)
        else:
            # eval/GTA: forward-only, EMA zoneout — no vjp wrapper needed
            fwd = build_train_fwd(cfg, B, T_in, steps, M, weight_dtype=wd,
                                  train_zoneout=False, interpret=interpret)
            r = tc.outputs_per_step
            mels = cfg.audio.num_mels
            FO = r * mels + r

            def fn(dp, keys, memory, mask, teacher, coins, seed):
                res = fwd(dp, keys, memory, mask, teacher, coins, seed)
                out, align = res["out"], res["align"]
                frames = (out[:, :, :r * mels].transpose(1, 0, 2)
                          .reshape(B, steps * r, mels))
                stops = (out[:, :, r * mels:FO].transpose(1, 0, 2)
                         .reshape(B, steps * r))
                return frames, stops, align[:, :, :T_in].transpose(1, 2, 0)
        _FUSED_TF_CACHE[key] = fn
    return fn


class Decoder(nn.Module):
    """Full decode loops (teacher-forced and autoregressive) around DecoderCell."""

    config: Config

    def setup(self):
        self.cell = DecoderCell(self.config)

    def _teacher_forced_fused(self, mel_targets, keys, memory, memory_mask,
                              teacher_forcing_ratio, *, train: bool):
        """Teacher-forced decode through the fused Pallas train kernels
        (ops/tacotron_train_kernel.py): forward + custom_vjp BPTT backward
        with all decoder weights VMEM-resident across the whole loop."""
        from ...ops.tacotron_train_kernel import extract_decoder_params_traced

        tc = self.config.tacotron
        num_mels = self.config.audio.num_mels
        B, T_out, _ = mel_targets.shape
        r = tc.outputs_per_step
        steps = T_out // r
        T_in, M = memory.shape[1], memory.shape[2]

        tf_inputs = mel_targets[:, r - 1::r, :]
        teacher = jnp.concatenate(
            [jnp.zeros((B, 1, num_mels), jnp.float32),
             tf_inputs[:, :-1].astype(jnp.float32)], axis=1).transpose(1, 0, 2)
        coins = (jax.random.uniform(self.make_rng("teacher_forcing"), (steps,))
                 < teacher_forcing_ratio).astype(jnp.int32)
        seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        dp = extract_decoder_params_traced(
            {"decoder": {"cell": self.cell.variables["params"]}}, self.config)
        if memory_mask is None:
            memory_mask = jnp.ones((B, T_in), bool)

        # multi-chip: under an active ('data', ...) mesh, run the kernel
        # per-shard via shard_map — batch rows split over 'data', params
        # replicated (shard_map's transpose psums their cotangents, which IS
        # the gradient all-reduce), per-shard PRNG decorrelated by axis index.
        # On non-TPU backends the interpret-mode kernel runs under shard_map
        # too, so CPU virtual meshes (tests, dryrun_multichip) exercise the
        # same sharded-kernel branch a real multi-chip TPU takes.
        from ...parallel.mesh import current_mesh_and_axis
        mesh, ndata = current_mesh_and_axis("data")
        if ndata > 1 and B % ndata == 0:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            fn = _fused_teacher_forced_fn(self.config, B // ndata, T_in,
                                          steps, M, train_zoneout=train)

            def body(dp, k, m, msk, te, co, se):
                se = se + jax.lax.axis_index("data").astype(jnp.int32)
                return fn(dp, k, m, msk, te, co, se)

            sharded = shard_map(
                body, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"),
                          P(None, "data"), P(), P()),
                out_specs=(P("data"), P("data"), P("data")),
                check_vma=False)
            frames, stops, aligns = sharded(
                dp, keys.astype(jnp.float32), memory.astype(jnp.float32),
                memory_mask, teacher, coins, seed)
            return frames, stops, aligns, None

        fn = _fused_teacher_forced_fn(self.config, B, T_in, steps, M,
                                      train_zoneout=train)
        frames, stops, aligns = fn(dp, keys.astype(jnp.float32),
                                   memory.astype(jnp.float32), memory_mask,
                                   teacher, coins, seed)
        return frames, stops, aligns, None

    def teacher_forced(self, mel_targets, keys, memory, memory_mask,
                       teacher_forcing_ratio, *, train: bool,
                       emt_memory=None, ref_spk=None, labels=None):
        """Teacher-forced decode over T_out/r steps.

        mel_targets: [B, T_out, mels] (T_out divisible by r). Per-step input is
        the last frame of the previous r-group (helpers.py:77-79), replaced by
        the model's own output with prob (1 - ratio) — one coin per step shared
        across the batch (helpers.py:116-128).
        Returns (frames [B, T_out, mels], stop_logits [B, T_out], alignments
        [B, T_in, steps], alignments_emt or None).
        """
        tc = self.config.tacotron
        if (tc.use_fused_train_decoder and not self.is_initializing()
                and not self.config.gst.emt_attn and not tc.smoothing
                and emt_memory is None
                and tuple(tc.prenet_layers)
                == (tc.prenet_layers[-1], tc.prenet_layers[-1])):
            return self._teacher_forced_fused(
                mel_targets, keys, memory, memory_mask,
                teacher_forcing_ratio, train=train)
        num_mels = self.config.audio.num_mels
        B, T_out, _ = mel_targets.shape
        r = tc.outputs_per_step
        steps = T_out // r
        tf_inputs = mel_targets[:, r - 1::r, :]                        # [B, steps, mels]
        shifted = jnp.concatenate(
            [jnp.zeros((B, 1, num_mels), mel_targets.dtype), tf_inputs[:, :-1]],
            axis=1).transpose(1, 0, 2)                                  # [steps, B, mels]

        coins = (jax.random.uniform(self.make_rng("teacher_forcing"), (steps,))
                 < teacher_forcing_ratio)

        bf16 = tc.compute_dtype == "bfloat16"
        if bf16:
            keys, memory, shifted = (x.astype(jnp.bfloat16)
                                     for x in (keys, memory, shifted))
            if emt_memory is not None:
                emt_memory = emt_memory.astype(jnp.bfloat16)
            if ref_spk is not None:
                ref_spk = ref_spk.astype(jnp.bfloat16)

        carry = self._initial_carry(B, memory, bf16)

        def step(cell, st, xs):
            teacher_frame, coin = xs
            frame_in = jnp.where(coin, teacher_frame, st.prev_output)
            return cell(st, frame_in, keys, memory, memory_mask,
                        train=train, synthesis=False, emt_memory=emt_memory,
                        ref_spk=ref_spk, labels=labels,
                        apply_stop_sigmoid=False)

        _, (frames, stops, aligns, aligns_emt) = _cell_scan(
            self.cell, carry, (shifted, coins), step,
            remat=tc.remat_decoder)
        return self._assemble(frames, stops, aligns, aligns_emt, B)

    def _initial_carry(self, B, memory, bf16: bool):
        """Zero carry; in bf16 mode the LSTM/context state is bf16 but the
        cumulative alignments stay f32 (they accumulate ~1 unit/step — bf16's
        8-bit mantissa would quantize the location features)."""
        carry = self.cell.zero_state(B, memory.shape[1], memory.shape[2],
                                     memory.dtype)
        if bf16:
            carry = carry._replace(cum_alignments=jnp.zeros(
                (B, memory.shape[1]), jnp.float32))
        return carry

    def autoregressive(self, batch: int, max_steps: int, keys, memory,
                       memory_mask, *, emt_memory=None, ref_spk=None,
                       labels=None, initial_state: DecoderState | None = None,
                       return_state: bool = False):
        """Free-running decode over a static number of steps.

        Returns (frames, stop_probs, alignments, alignments_emt); stop_probs
        are post-sigmoid (TacoTestHelper semantics) for host-side length
        recovery. `initial_state`/`return_state` let callers decode in
        blocks with host-side early stopping (the reference dynamic_decode's
        stop-token exit, custom_decoder.py:107-139) — see
        TacotronSynthesizer._scan_block_synth.
        """
        bf16 = self.config.tacotron.compute_dtype == "bfloat16"
        if bf16:
            keys, memory = (x.astype(jnp.bfloat16) for x in (keys, memory))
            if emt_memory is not None:
                emt_memory = emt_memory.astype(jnp.bfloat16)
            if ref_spk is not None:
                ref_spk = ref_spk.astype(jnp.bfloat16)
        carry = (initial_state if initial_state is not None
                 else self._initial_carry(batch, memory, bf16))

        def step(cell, st, _):
            return cell(st, st.prev_output, keys, memory, memory_mask,
                        train=False, synthesis=True, emt_memory=emt_memory,
                        ref_spk=ref_spk, labels=labels, apply_stop_sigmoid=True)

        scan = nn.scan(step,
                       variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True,
                                   "zoneout": True, "batch_stats": False},
                       in_axes=0, out_axes=0, length=max_steps)
        final, (frames, stops, aligns, aligns_emt) = scan(self.cell, carry, None)
        out = self._assemble(frames, stops, aligns, aligns_emt, batch)
        return out + (final,) if return_state else out

    def _assemble(self, frames, stops, aligns, aligns_emt, B):
        """Scan outputs (step-major) → batch-major reference layout; losses
        and host-side length recovery always see f32."""
        num_mels = self.config.audio.num_mels
        frames, stops, aligns = (x.astype(jnp.float32)
                                 for x in (frames, stops, aligns))
        if aligns_emt is not None:
            aligns_emt = aligns_emt.astype(jnp.float32)
        # frames: [steps, B, r·mels] → [B, steps·r, mels] (tacotron.py:359)
        frames = frames.transpose(1, 0, 2).reshape(B, -1, num_mels)
        # stops: [steps, B, r] → [B, steps·r] (tacotron.py:360)
        stops = stops.transpose(1, 0, 2).reshape(B, -1)
        # alignments: [steps, B, T_in] → [B, T_in, steps] (tacotron.py:571)
        aligns = aligns.transpose(1, 2, 0)
        if aligns_emt is not None and aligns_emt.ndim == 3:
            aligns_emt = aligns_emt.transpose(1, 2, 0)
        return frames, stops, aligns, aligns_emt
