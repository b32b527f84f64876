"""Fused Pallas kernels for the TEACHER-FORCED Tacotron decode (training/GTA).

The training decode (models/tacotron/decoder.py:teacher_forced — the
re-design of reference helpers.py:116-128 teacher forcing over
Architecture_wrappers.py:197-267 decoder steps) is the hot loop of Tacotron
training: a T_out/r-step `nn.scan` that re-streams ~27 MB (bf16) of decoder
weights from HBM on every step, forward AND backward. These kernels run the
whole loop with weights VMEM-resident, one grid step per decoder step:

- `build_train_fwd`: teacher-forced forward. Per-step residuals (gate
  pre-activations, states, contexts, alignments) stream to HBM as blocked
  outputs — Pallas double-buffers the per-step DMA behind the math.
- `build_train_bwd`: the sequential backward chain (BPTT through zoneout-LSTMs,
  location-sensitive attention, prenet, and the scheduled-sampling feedback
  path), emitting per-step activation gradients. All weight-gradient GEMMs and
  the attention-parameter gradients are then computed OUTSIDE the kernel as a
  handful of big MXU-friendly XLA contractions over the stacked per-step
  tensors (`attention_param_grads`, `weight_grads`) — the sequential kernel
  only computes what is truly sequential.
- `make_fused_teacher_forced`: the `jax.custom_vjp` wrapper gluing the three
  pieces into a drop-in replacement for the decoder scan, used by the trainer
  when `tacotron.use_fused_train_decoder` is on (train + GTA + teacher-forced
  eval forward).

Semantics matched (and tested in tests/test_train_kernel.py against the flax
scan + jax.grad): TF LSTMCell gate order with forget_bias fold, train-mode
zoneout (Bernoulli(1-z) select — reference modules.py:187-248), always-on
prenet dropout (modules.py:326-357), per-step teacher-forcing coins
(helpers.py:116-128), masked softmax attention with cumulative alignments
(attention.py:94-227; smoothing/synthesis-constraint are synthesis-only and
asserted off here), stop-token LOGITS (training loss takes logits).

In-kernel randomness uses the TPU PRNG reseeded per (seed, step) so the
backward pass regenerates the fwd masks exactly; the prenet dropout backward
needs no mask regeneration at all — `[saved_activation > 0]` recovers
relu-and-dropout gating in one predicate.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config
from .tacotron_decoder_kernel import (DecoderParams, _uniform_from_bits,
                                      extract_decoder_params)

NEG_INF = -(2.0 ** 32) + 1.0


def _ctx_group(B: int) -> int:
    """Row-group size for the block-masked context matmuls: the largest
    divisor of B that is <= 8 (8 rows keep the MXU dispatch worthwhile while
    wasting only 8x the useful context FLOPs instead of Bx)."""
    for g in (8, 6, 4, 3, 2, 1):
        if B % g == 0:
            return g
    return 1


def _pad_lanes(x, lanes: int = 128):
    """Pad the minor dim up to a lane multiple."""
    pad = (-x.shape[-1]) % lanes
    if pad == 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, cfg)


@functools.lru_cache(maxsize=8)
def _band_selector(K: int, Tp: int):
    """np constant [Tp*Tp, K]: Sel[s*Tp+t, k] = 1 iff s == t + k - pad.

    Turns the banded (Toeplitz) operand construction into ONE small matmul
    `Sel @ wp` per train step instead of K sequential [Tp,Tp,A] broadcast
    adds — the operands depend on live params (loc conv taps, v_a) so they
    are rebuilt inside every jitted step and must be cheap.
    """
    pad = (K - 1) // 2
    s_idx = np.arange(Tp)[:, None, None]
    t_idx = np.arange(Tp)[None, :, None]
    k_idx = np.arange(K)[None, None, :]
    sel = (s_idx == t_idx + k_idx - pad).astype(np.float32)
    return sel.reshape(Tp * Tp, K)


def make_band(dp: DecoderParams, Tp: int, dtype):
    """Banded location operand band_a [Tp, Tp*A] (location conv FOLDED with
    the location projection) as one MXU matmul against a cached selector."""
    wp = dp.loc_k.astype(jnp.float32) @ dp.wloc.astype(jnp.float32)   # [K, A]
    K, A = wp.shape
    sel = jnp.asarray(_band_selector(K, Tp))
    # rows s, cols (t, a) — flattening [s, t, a] directly gives the
    # [Tp, Tp*A] layout `cum @ band` expects
    return (sel @ wp).reshape(Tp, Tp * A).astype(dtype)



def make_keys2(dp: DecoderParams, keys_padded, dtype):
    """Flattened keys with the attention bias (and the location-conv bias
    routed through W_loc) pre-added: [B, Tp*A]."""
    b_eff = (dp.b_a.astype(jnp.float32)
             + dp.loc_b.astype(jnp.float32) @ dp.wloc.astype(jnp.float32))
    B, Tp, A = keys_padded.shape
    return ((keys_padded.astype(jnp.float32) + b_eff[None, None, :])
            .reshape(B, Tp * A).astype(dtype))


# ===================================================================== forward


def build_train_fwd(cfg: Config, B: int, T_in: int, steps: int, M: int, *,
                    weight_dtype=jnp.bfloat16, train_zoneout: bool = True,
                    interpret: bool = False):
    """Teacher-forced fused decode for fixed (B, T_in, steps).

    Returns run(dp, keys [B,T,A], memory [B,T,M], mask [B,T], teacher
    [steps,B,mels], coins [steps] int32, seed int32) -> dict of stacked
    per-step tensors (see `outs` below). `out` packs [frames | stop logits]
    per step; everything else is backward residuals.

    train_zoneout=False uses the deterministic EMA zoneout mix (eval/GTA
    semantics, modules.py ZoneoutLSTMCell eval branch) — forward-only; the
    backward kernel assumes train-mode Bernoulli zoneout.
    """
    tc, au = cfg.tacotron, cfg.audio
    assert not cfg.gst.emt_attn, "emt_attn uses the XLA scan path"
    assert not tc.smoothing, "smoothing attention uses the XLA scan path"
    U = tc.decoder_lstm_units
    A = tc.attention_dim
    P = tc.prenet_layers[-1]
    assert tuple(tc.prenet_layers) == (P, P)
    r = tc.outputs_per_step
    mels = au.num_mels
    FO = r * mels + r
    FOp = ((FO + 127) // 128) * 128
    drop = float(tc.dropout_rate)
    keep = 1.0 - drop
    zo = float(tc.zoneout_rate)
    Tp = ((T_in + 127) // 128) * 128
    melsp = ((mels + 127) // 128) * 128

    def kernel(seed_ref, coins_ref,
               teacher_ref,                                   # blocked [1,B,melsp]
               keys_ref, mem_ref, mask_ref, band_ref, va_ref,
               pre_w0, pre_b0, pre_w1, pre_b1,
               l1_wp, l1_wc, l1_wh, l1_b, l2_wx, l2_wh, l2_b,
               wq, proj_wo, proj_wc, proj_b,
               # blocked outputs [1, B, ·]
               out_ref, align_ref, cum_ref,
               z1_ref, z2_ref, h0d_ref, hpre_ref, ctx_ref,
               h1_ref, c1_ref, h2_ref, c2_ref,
               # scratch (persistent across grid steps)
               xprev, c1s, h1s, c2s, h2s, ctxs, cums):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            xprev[:] = jnp.zeros((B, melsp), jnp.float32)
            c1s[:] = jnp.zeros((B, U), jnp.float32)
            h1s[:] = jnp.zeros((B, U), jnp.float32)
            c2s[:] = jnp.zeros((B, U), jnp.float32)
            h2s[:] = jnp.zeros((B, U), jnp.float32)
            ctxs[:] = jnp.zeros((B, M), jnp.float32)
            cums[:] = jnp.zeros((B, Tp), jnp.float32)

        pltpu.prng_seed(seed_ref[0], t)
        mask = mask_ref[:]                                    # [B, Tp] f32

        # ---- input frame: teacher vs feedback (helpers.py:116-128)
        coin = coins_ref[t]
        x = jnp.where(coin > 0, teacher_ref[0], xprev[:])     # [B, melsp]

        # ---- prenet (dropout ALWAYS on, modules.py:326-357)
        h0 = jnp.maximum(
            jnp.dot(x[:, :mels].astype(weight_dtype), pre_w0[:],
                    preferred_element_type=jnp.float32) + pre_b0[:], 0.0)
        if drop > 0:
            bits = pltpu.bitcast(pltpu.prng_random_bits((2, B, P)), jnp.uint32)
            u = _uniform_from_bits(bits)
            h0d = jnp.where(u[0] < keep, h0 * (1.0 / keep), 0.0)
        else:
            h0d = h0
        h1p = jnp.maximum(
            jnp.dot(h0d.astype(weight_dtype), pre_w1[:],
                    preferred_element_type=jnp.float32) + pre_b1[:], 0.0)
        hpre = (jnp.where(u[1] < keep, h1p * (1.0 / keep), 0.0)
                if drop > 0 else h1p)
        if zo > 0 and train_zoneout:
            zbits = pltpu.bitcast(pltpu.prng_random_bits((4, B, U)), jnp.uint32)
            zu = _uniform_from_bits(zbits)

        # ---- LSTM1 on concat(prenet, context)
        ctx_now = ctxs[:]
        z1 = (jnp.dot(hpre.astype(weight_dtype), l1_wp[:],
                      preferred_element_type=jnp.float32)
              + jnp.dot(ctx_now.astype(weight_dtype), l1_wc[:],
                        preferred_element_type=jnp.float32)
              + jnp.dot(h1s[:].astype(weight_dtype), l1_wh[:],
                        preferred_element_type=jnp.float32)
              + l1_b[:])
        i1, j1, f1, o1 = (z1[:, :U], z1[:, U:2 * U],
                          z1[:, 2 * U:3 * U], z1[:, 3 * U:])
        nc1 = jax.nn.sigmoid(f1) * c1s[:] + jax.nn.sigmoid(i1) * jnp.tanh(j1)
        nh1 = jax.nn.sigmoid(o1) * jnp.tanh(nc1)
        if zo > 0 and train_zoneout:
            # train zoneout: Bernoulli(1-z) select (modules.py:187-248)
            c1n = jnp.where(zu[0] < 1.0 - zo, nc1, c1s[:])
            h1n = jnp.where(zu[1] < 1.0 - zo, nh1, h1s[:])
        elif zo > 0:
            c1n = (1.0 - zo) * nc1 + zo * c1s[:]
            h1n = (1.0 - zo) * nh1 + zo * h1s[:]
        else:
            c1n, h1n = nc1, nh1
        c1s[:] = c1n
        h1s[:] = h1n

        z2 = (jnp.dot(h1n.astype(weight_dtype), l2_wx[:],
                      preferred_element_type=jnp.float32)
              + jnp.dot(h2s[:].astype(weight_dtype), l2_wh[:],
                        preferred_element_type=jnp.float32)
              + l2_b[:])
        i2, j2, f2, o2 = (z2[:, :U], z2[:, U:2 * U],
                          z2[:, 2 * U:3 * U], z2[:, 3 * U:])
        nc2 = jax.nn.sigmoid(f2) * c2s[:] + jax.nn.sigmoid(i2) * jnp.tanh(j2)
        nh2 = jax.nn.sigmoid(o2) * jnp.tanh(nc2)
        if zo > 0 and train_zoneout:
            c2n = jnp.where(zu[2] < 1.0 - zo, nc2, c2s[:])
            h2n = jnp.where(zu[3] < 1.0 - zo, nh2, h2s[:])
        elif zo > 0:
            c2n = (1.0 - zo) * nc2 + zo * c2s[:]
            h2n = (1.0 - zo) * nh2 + zo * h2s[:]
        else:
            c2n, h2n = nc2, nh2
        c2s[:] = c2n
        h2s[:] = h2n
        out2 = h2n

        # ---- location-sensitive attention: banded MXU matmul + VPU v_a
        # lane reduce over the 3-D view (r3's [Tp*A, Tp] vmat matmul cost
        # Tp x padding FLOPs; VERDICT r3 item 5)
        q = jnp.dot(out2.astype(weight_dtype), wq[:],
                    preferred_element_type=jnp.float32)           # [B, A]
        cum_now = cums[:]
        loc = jnp.dot(cum_now.astype(weight_dtype), band_ref[:],
                      preferred_element_type=jnp.float32)         # [B, Tp*A]
        e3 = jnp.tanh(keys_ref[:].reshape(B, Tp, A) + q[:, None, :]
                      + loc.reshape(B, Tp, A))                    # [B, Tp, A]
        energy = jnp.sum(e3 * va_ref[:].reshape(1, 1, A), axis=-1)
        energy = jnp.where(mask > 0, energy, NEG_INF)
        emax = jnp.max(energy, axis=-1, keepdims=True)
        ex = jnp.exp(energy - emax) * mask
        align = ex / jnp.sum(ex, axis=-1, keepdims=True)
        cums[:] = cum_now + align

        # context as a batched dot_general over the 3-D memory — useful
        # FLOPs only (r3 used g-grouped block-masked matmuls, g x waste)
        new_ctx = jax.lax.dot_general(
            align[:, None, :].astype(weight_dtype), mem_ref[:],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]          # [B, M]
        ctxs[:] = new_ctx

        # ---- fused frame+stop projection (LOGITS for training)
        proj = (jnp.dot(out2.astype(weight_dtype), proj_wo[:],
                        preferred_element_type=jnp.float32)
                + jnp.dot(new_ctx.astype(weight_dtype), proj_wc[:],
                          preferred_element_type=jnp.float32)
                + proj_b[:])                                      # [B, FOp]
        frames = proj[:, :r * mels]
        xprev[:, :mels] = frames[:, (r - 1) * mels:r * mels]

        # ---- emit step outputs + residuals
        out_ref[0] = proj
        align_ref[0] = align
        cum_ref[0] = cum_now                                      # pre-update
        z1_ref[0] = z1.astype(z1_ref.dtype)
        z2_ref[0] = z2.astype(z2_ref.dtype)
        h0d_ref[0] = h0d.astype(h0d_ref.dtype)
        hpre_ref[0] = hpre.astype(hpre_ref.dtype)
        ctx_ref[0] = new_ctx.astype(ctx_ref.dtype)
        h1_ref[0] = h1n.astype(h1_ref.dtype)
        c1_ref[0] = c1n.astype(c1_ref.dtype)
        h2_ref[0] = h2n.astype(h2_ref.dtype)
        c2_ref[0] = c2n.astype(c2_ref.dtype)

    res_dt = jnp.bfloat16 if weight_dtype == jnp.bfloat16 else jnp.float32
    blocked = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda t, *_: (t,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shapes = dict(
        out=((steps, B, FOp), jnp.float32),
        align=((steps, B, Tp), jnp.float32),
        cum_pre=((steps, B, Tp), jnp.float32),
        z1=((steps, B, 4 * U), res_dt), z2=((steps, B, 4 * U), res_dt),
        h0d=((steps, B, P), res_dt), hpre=((steps, B, P), res_dt),
        ctx=((steps, B, M), res_dt),
        h1=((steps, B, U), res_dt), c1=((steps, B, U), res_dt),
        h2=((steps, B, U), res_dt), c2=((steps, B, U), res_dt))
    names = list(out_shapes)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # seed [1], coins [steps]
        grid=(steps,),
        in_specs=[blocked(B, melsp)] + [const] * (5 + 15),
        out_specs=[blocked(*out_shapes[n][0][1:]) for n in names],
        scratch_shapes=[
            pltpu.VMEM((B, melsp), jnp.float32),  # xprev
            pltpu.VMEM((B, U), jnp.float32),      # c1
            pltpu.VMEM((B, U), jnp.float32),      # h1
            pltpu.VMEM((B, U), jnp.float32),      # c2
            pltpu.VMEM((B, U), jnp.float32),      # h2
            pltpu.VMEM((B, M), jnp.float32),      # context
            pltpu.VMEM((B, Tp), jnp.float32),     # cumulative alignments
        ])

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(*out_shapes[n]) for n in names],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )

    def run(dp: DecoderParams, keys, memory, mask, teacher, coins, seed):
        wd = weight_dtype
        pad_t = Tp - keys.shape[1]
        keys = jnp.pad(keys.astype(jnp.float32), ((0, 0), (0, pad_t), (0, 0)))
        memory = jnp.pad(memory.astype(jnp.float32),
                         ((0, 0), (0, pad_t), (0, 0)))
        if mask is None:
            mask = jnp.ones((B, T_in), bool)
        mask = jnp.pad(mask, ((0, 0), (0, pad_t))).astype(jnp.float32)
        band_a = make_band(dp, Tp, wd)
        va_row = dp.v_a.astype(jnp.float32).reshape(1, A)
        keys2 = make_keys2(dp, keys, jnp.float32)
        mem3 = memory.astype(wd)                       # [B, Tp, M]
        teacher = _pad_lanes(teacher.astype(jnp.float32))
        weights = (
            dp.pre_w0.astype(wd), dp.pre_b0.astype(jnp.float32),
            dp.pre_w1.astype(wd), dp.pre_b1.astype(jnp.float32),
            dp.l1_wp.astype(wd), dp.l1_wc.astype(wd), dp.l1_wh.astype(wd),
            dp.l1_b.astype(jnp.float32),
            dp.l2_wx.astype(wd), dp.l2_wh.astype(wd),
            dp.l2_b.astype(jnp.float32),
            dp.wq.astype(wd),
            _pad_lanes(dp.proj_wo.astype(wd)),
            _pad_lanes(dp.proj_wc.astype(wd)),
            _pad_lanes(dp.proj_b.astype(jnp.float32)))
        outs = call(jnp.asarray([seed], jnp.int32),
                    coins.astype(jnp.int32),
                    teacher, keys2, mem3, mask, band_a, va_row, *weights)
        return dict(zip(names, outs))

    return run


# ==================================================================== backward


def build_train_bwd(cfg: Config, B: int, T_in: int, steps: int, M: int, *,
                    weight_dtype=jnp.bfloat16, interpret: bool = False):
    """Sequential backward chain over the decode, one grid step per decoder
    step in REVERSE order. Emits per-step activation gradients; all weight
    gradients are big XLA GEMMs afterwards (`weight_grads`).

    Carried across steps (VMEM scratch): dh/dc for both LSTMs, the context
    gradient flowing into the previous step's LSTM1 input, the cumulative-
    alignment gradient chain, and the scheduled-sampling feedback gradient
    into the previous step's output frames.
    """
    tc, au = cfg.tacotron, cfg.audio
    U = tc.decoder_lstm_units
    A = tc.attention_dim
    P = tc.prenet_layers[-1]
    r = tc.outputs_per_step
    mels = au.num_mels
    FO = r * mels + r
    FOp = ((FO + 127) // 128) * 128
    drop = float(tc.dropout_rate)
    keep = 1.0 - drop
    zo = float(tc.zoneout_rate)
    Tp = ((T_in + 127) // 128) * 128
    melsp = ((mels + 127) // 128) * 128
    S = steps

    def kernel(seed_ref, coins_ref,
               # blocked residuals/cotangents at fwd step t = S-1-g
               dout_ref, dalign_up_ref, align_ref, cum_ref,
               z1_res, z2_res, h0d_res, hpre_res, h2_res,
               c1_prev_res, c2_prev_res,
               # constant operands
               keys_ref, mem3_ref, band_ref, band_t_ref, va_ref,
               wq, wq_t,
               l1_wpT, l1_wcT, l1_whT, l2_wxT, l2_whT,
               pre_w0T, pre_w1T, proj_woT, proj_wcT,
               # blocked outputs
               dz1_ref, dz2_ref, da0_ref, da1_ref, dproj_ref,
               dctx_ref, dq_ref, dkeys_ref, t1_ref, dv_ref,
               # scratch
               dh1, dc1, dh2, dc2, dctx_c, dcum_c, dxprev):
        g = pl.program_id(0)
        t = S - 1 - g

        @pl.when(g == 0)
        def _init():
            dkeys_ref[:] = jnp.zeros((B, Tp * A), jnp.float32)
            t1_ref[:] = jnp.zeros((Tp, Tp * A), jnp.float32)
            dv_ref[:] = jnp.zeros((Tp, A), jnp.float32)
            dh1[:] = jnp.zeros((B, U), jnp.float32)
            dc1[:] = jnp.zeros((B, U), jnp.float32)
            dh2[:] = jnp.zeros((B, U), jnp.float32)
            dc2[:] = jnp.zeros((B, U), jnp.float32)
            dctx_c[:] = jnp.zeros((B, M), jnp.float32)
            dcum_c[:] = jnp.zeros((B, Tp), jnp.float32)
            dxprev[:] = jnp.zeros((B, melsp), jnp.float32)

        # regenerate the fwd step's masks (same seed, same draw order)
        pltpu.prng_seed(seed_ref[0], t)
        if drop > 0:
            pltpu.prng_random_bits((2, B, P))     # prenet draws (unused here)
        if zo > 0:
            zbits = pltpu.bitcast(pltpu.prng_random_bits((4, B, U)),
                                  jnp.uint32)
            zu = _uniform_from_bits(zbits)
        coin = coins_ref[t]

        # ---- upstream frame/stop grads + scheduled-sampling feedback
        dproj = dout_ref[0]                                    # [B, FOp] f32
        fb = jnp.pad(dxprev[:, :mels],
                     ((0, 0), ((r - 1) * mels, FOp - r * mels)))
        dproj = dproj + fb
        dproj_ref[0] = dproj.astype(dproj_ref.dtype)

        dout2 = jnp.dot(dproj.astype(weight_dtype), proj_woT[:],
                        preferred_element_type=jnp.float32)    # [B, U]
        dctx_t = (jnp.dot(dproj.astype(weight_dtype), proj_wcT[:],
                          preferred_element_type=jnp.float32)
                  + dctx_c[:])                                  # [B, M]
        dctx_ref[0] = dctx_t.astype(dctx_ref.dtype)

        # ---- attention backward
        # dalign[b,t] = sum_m dctx[b,m] * mem[b,t,m]: a batched NT
        # dot_general over the 3-D memory — useful FLOPs only (r3 used
        # g-grouped block-masked matmuls, g x waste; probed on v5e, r4)
        dalign = jax.lax.dot_general(
            dctx_t[:, None, :].astype(weight_dtype), mem3_ref[:],
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]       # [B, Tp]
        dalign = dalign + dalign_up_ref[0] + dcum_c[:]

        align = align_ref[0]                                   # [B, Tp] f32
        dots = jnp.sum(dalign * align, axis=-1, keepdims=True)
        denergy = align * (dalign - dots)

        # e2 recompute (the only non-saved intermediate: [B, Tp*A]/step is
        # too large to stream; recompute costs one fwd-loc matmul). The
        # energy-grad fan-out denergy -> de2 is a pure broadcast times v_a
        # (r3 spent a [Tp, Tp*A] vmat_t matmul on it — Tp x padding FLOPs)
        q = jnp.dot(h2_res[0].astype(weight_dtype), wq[:],
                    preferred_element_type=jnp.float32)
        loc = jnp.dot(cum_ref[0].astype(weight_dtype), band_ref[:],
                      preferred_element_type=jnp.float32)
        e3 = jnp.tanh(keys_ref[:].astype(jnp.float32).reshape(B, Tp, A)
                      + q[:, None, :] + loc.reshape(B, Tp, A))
        de3 = (denergy[:, :, None] * va_ref[:].reshape(1, 1, A)
               * (1.0 - e3 * e3))                              # [B, Tp, A]
        de2 = de3.reshape(B, Tp * A)
        dkeys_ref[:] += de2

        # ---- attention-parameter accumulators (in-VMEM across the grid;
        # replaces the XLA chunk scan that streamed [S,B,Tp*A] e2/de2
        # tensors (~630 MB/step at B=96) through HBM):
        #   T1[u, t*A+a] += sum_b cum[b,u] * de2[b, t*A+a]
        #     -> outside: d_wloc = ein('utf,uta->fa', bandF, T1) and
        #        d_loc_k via the banded selector (see weight_grads)
        #   dv[t*A+a]    += sum_b e2[b, t*A+a] * denergy[b, t]
        #     -> outside: d_v_a = dv.reshape(Tp, A).sum(0)
        t1_ref[:] += jax.lax.dot_general(
            cum_ref[0].astype(weight_dtype), de2.astype(weight_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [Tp, Tp*A]
        # dv[t,a] += sum_b e2[b,t,a] * denergy[b,t]: an elementwise
        # broadcast + batch reduce (r3 broadcast denergy across A lanes
        # with an eyerep matmul first)
        dv_ref[:] += jnp.sum(e3 * denergy[:, :, None], axis=0)  # [Tp, A]
        dq = jnp.sum(de3, axis=1)                               # [B, A]
        dq_ref[0] = dq.astype(dq_ref.dtype)
        dh2_att = jnp.dot(dq.astype(weight_dtype), wq_t[:],
                          preferred_element_type=jnp.float32)  # [B, U]
        dcum_c[:] = dcum_c[:] + jnp.dot(de2.astype(weight_dtype),
                                        band_t_ref[:],
                                        preferred_element_type=jnp.float32)

        # ---- LSTM2 backward
        def lstm_bwd(zv, c_prev, dh_total, dc_total, m_c, m_h):
            i, j, f, o = (zv[:, :U], zv[:, U:2 * U],
                          zv[:, 2 * U:3 * U], zv[:, 3 * U:])
            si, sf, so = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            tj = jnp.tanh(j)
            nc = sf * c_prev + si * tj
            tnc = jnp.tanh(nc)
            if zo > 0:
                dnh = dh_total * m_h
                dh_prev = dh_total * (1.0 - m_h)
                dnc = dc_total * m_c + dnh * so * (1.0 - tnc * tnc)
                dc_prev = dc_total * (1.0 - m_c) + dnc * sf
            else:
                dnh = dh_total
                dh_prev = jnp.zeros_like(dh_total)
                dnc = dc_total + dnh * so * (1.0 - tnc * tnc)
                dc_prev = dnc * sf
            do = dnh * tnc * so * (1.0 - so)
            df = dnc * c_prev * sf * (1.0 - sf)
            di = dnc * tj * si * (1.0 - si)
            dj = dnc * si * (1.0 - tj * tj)
            dz = jnp.concatenate([di, dj, df, do], axis=-1)
            return dz, dh_prev, dc_prev

        zero_prev = (t == 0)
        c2_prev = jnp.where(zero_prev, 0.0, c2_prev_res[0].astype(jnp.float32))
        m_c2 = (zu[2] < 1.0 - zo).astype(jnp.float32) if zo > 0 else None
        m_h2 = (zu[3] < 1.0 - zo).astype(jnp.float32) if zo > 0 else None
        dh2_total = dout2 + dh2_att + dh2[:]
        dz2, dh2_prev, dc2_prev = lstm_bwd(
            z2_res[0].astype(jnp.float32), c2_prev, dh2_total, dc2[:],
            m_c2, m_h2)
        dz2_ref[0] = dz2.astype(dz2_ref.dtype)
        dx2 = jnp.dot(dz2.astype(weight_dtype), l2_wxT[:],
                      preferred_element_type=jnp.float32)
        dh2[:] = dh2_prev + jnp.dot(dz2.astype(weight_dtype), l2_whT[:],
                                    preferred_element_type=jnp.float32)
        dc2[:] = dc2_prev

        # ---- LSTM1 backward
        c1_prev = jnp.where(zero_prev, 0.0, c1_prev_res[0].astype(jnp.float32))
        m_c1 = (zu[0] < 1.0 - zo).astype(jnp.float32) if zo > 0 else None
        m_h1 = (zu[1] < 1.0 - zo).astype(jnp.float32) if zo > 0 else None
        dz1, dh1_prev, dc1_prev = lstm_bwd(
            z1_res[0].astype(jnp.float32), c1_prev, dx2 + dh1[:], dc1[:],
            m_c1, m_h1)
        dz1_ref[0] = dz1.astype(dz1_ref.dtype)
        dhpre = jnp.dot(dz1.astype(weight_dtype), l1_wpT[:],
                        preferred_element_type=jnp.float32)     # [B, P]
        dctx_c[:] = jnp.dot(dz1.astype(weight_dtype), l1_wcT[:],
                            preferred_element_type=jnp.float32)
        dh1[:] = dh1_prev + jnp.dot(dz1.astype(weight_dtype), l1_whT[:],
                                    preferred_element_type=jnp.float32)
        dc1[:] = dc1_prev

        # ---- prenet backward ([act>0] recovers relu+dropout gating at once)
        inv_keep = (1.0 / keep) if drop > 0 else 1.0
        da1 = dhpre * (hpre_res[0].astype(jnp.float32) > 0) * inv_keep
        da1_ref[0] = da1.astype(da1_ref.dtype)
        dh0d = jnp.dot(da1.astype(weight_dtype), pre_w1T[:],
                       preferred_element_type=jnp.float32)
        da0 = dh0d * (h0d_res[0].astype(jnp.float32) > 0) * inv_keep
        da0_ref[0] = da0.astype(da0_ref.dtype)
        dx = jnp.dot(da0.astype(weight_dtype), pre_w0T[:],
                     preferred_element_type=jnp.float32)        # [B, melsp]
        dxprev[:] = jnp.where(coin > 0, 0.0, dx)

    res_dt = jnp.bfloat16 if weight_dtype == jnp.bfloat16 else jnp.float32
    rev = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda g, *_: (S - 1 - g,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    rev_prev = lambda *shape: pl.BlockSpec(
        (1,) + shape,
        lambda g, *_: (jnp.maximum(S - 2 - g, 0),) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = ([rev(B, FOp), rev(B, Tp), rev(B, Tp), rev(B, Tp),
                 rev(B, 4 * U), rev(B, 4 * U), rev(B, P), rev(B, P),
                 rev(B, U), rev_prev(B, U), rev_prev(B, U)]
                + [const] * 16)
    # dkeys2/t1/dv are accumulated ACROSS steps in VMEM (constant-index
    # outputs: Pallas flushes them once at grid end) — together with the
    # per-step dq they carry everything the XLA attention-param pass needs,
    # so no [S,B,Tp*A]-sized tensor (e2/de2, ~630 MB at B=96/S=200) ever
    # touches HBM
    accum_shapes = {"dkeys2": (B, Tp * A), "t1": (Tp, Tp * A),
                    "dv": (Tp, A)}
    out_shapes = dict(
        dz1=((S, B, 4 * U), res_dt), dz2=((S, B, 4 * U), res_dt),
        da0=((S, B, P), res_dt), da1=((S, B, P), res_dt),
        dproj=((S, B, FOp), res_dt), dctx=((S, B, M), res_dt),
        dq=((S, B, A), res_dt),
        dkeys2=((B, Tp * A), jnp.float32),
        t1=((Tp, Tp * A), jnp.float32),
        dv=((Tp, A), jnp.float32))
    names = list(out_shapes)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=in_specs,
        out_specs=[(rev(*out_shapes[n][0][1:]) if n not in accum_shapes else
                    pl.BlockSpec(accum_shapes[n], lambda g, *_: (0, 0),
                                 memory_space=pltpu.VMEM))
                   for n in names],
        scratch_shapes=[
            pltpu.VMEM((B, U), jnp.float32),      # dh1
            pltpu.VMEM((B, U), jnp.float32),      # dc1
            pltpu.VMEM((B, U), jnp.float32),      # dh2
            pltpu.VMEM((B, U), jnp.float32),      # dc2
            pltpu.VMEM((B, M), jnp.float32),      # dctx carry
            pltpu.VMEM((B, Tp), jnp.float32),     # dcum carry
            pltpu.VMEM((B, melsp), jnp.float32),  # dxprev (feedback grad)
        ])

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(*out_shapes[n]) for n in names],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )

    def run(dp: DecoderParams, res: dict, memory_padded, dout, dalign_up,
            coins, seed):
        """res: dict from build_train_fwd's run; memory_padded [B,Tp,M] f32;
        dout [S,B,FOp] f32; dalign_up [S,B,Tp] f32."""
        wd = weight_dtype
        band_a = make_band(dp, Tp, wd)
        band_t = band_a.T.astype(wd)
        va_row = dp.v_a.astype(jnp.float32).reshape(1, A)
        mem3 = memory_padded.astype(wd)                        # [B, Tp, M]
        weights = (
            res["keys2"], mem3, band_a, band_t, va_row,
            dp.wq.astype(wd), dp.wq.T.astype(wd),
            dp.l1_wp.T.astype(wd), dp.l1_wc.T.astype(wd), dp.l1_wh.T.astype(wd),
            dp.l2_wx.T.astype(wd), dp.l2_wh.T.astype(wd),
            _pad_lanes(dp.pre_w0.T).astype(wd), dp.pre_w1.T.astype(wd),
            _pad_lanes(dp.proj_wo).T.astype(wd),
            _pad_lanes(dp.proj_wc).T.astype(wd))
        outs = call(jnp.asarray([seed], jnp.int32), coins.astype(jnp.int32),
                    dout, dalign_up,
                    res["align"], res["cum_pre"], res["z1"], res["z2"],
                    res["h0d"], res["hpre"], res["h2"],
                    res["c1"], res["c2"],
                    *weights)
        return dict(zip(names, outs))

    return run


# ====================================================== XLA weight-grad pass


def _f32(x):
    return x.astype(jnp.float32)


def weight_grads(cfg: Config, dp: DecoderParams, res: dict, bwd: dict,
                 keys_padded, teacher, coins):
    """All parameter gradients + dkeys/dmemory as big XLA contractions over
    the stacked per-step tensors. Everything here is trivially parallel over
    (step, batch) — exactly what the sequential kernel should NOT compute.

    keys_padded: [B, Tp, A] f32 (the raw keys input, zero-padded to Tp).
    Returns (d_dp: DecoderParams, dkeys [B,Tp,A], dmem [B,Tp,M]).
    """
    tc, au = cfg.tacotron, cfg.audio
    U = tc.decoder_lstm_units
    A = tc.attention_dim
    r = tc.outputs_per_step
    mels = au.num_mels
    FO = r * mels + r
    S, B = res["z1"].shape[0], res["z1"].shape[1]
    Tp = keys_padded.shape[1]
    M = res["ctx"].shape[-1]

    def shift1(x):  # x[t-1] with zeros at t=0 (step-major)
        return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)

    ein = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)

    # ---- prenet (GEMM operands stay in the residual precision — bf16 in
    # production — with f32 accumulation via preferred_element_type)
    rdt = res["h0d"].dtype
    prev_frames = shift1(res["out"][:, :, (r - 1) * mels:r * mels])
    x_in = jnp.where((coins > 0)[:, None, None], teacher,
                     prev_frames).astype(rdt)
    da0, da1 = bwd["da0"], bwd["da1"]
    d_pre_w0 = ein("sbm,sbp->mp", x_in, da0)
    d_pre_b0 = _f32(da0).sum((0, 1))
    d_pre_w1 = ein("sbp,sbq->pq", res["h0d"], da1)
    d_pre_b1 = _f32(da1).sum((0, 1))

    # ---- LSTMs (x1 = [hpre | ctx_prev | h1_prev], x2 = [h1 | h2_prev])
    dz1, dz2 = bwd["dz1"], bwd["dz2"]
    d_l1_wp = ein("sbp,sbk->pk", res["hpre"], dz1)
    d_l1_wc = ein("sbm,sbk->mk", shift1(res["ctx"]), dz1)
    d_l1_wh = ein("sbu,sbk->uk", shift1(res["h1"]), dz1)
    d_l1_b = _f32(dz1).sum((0, 1))
    d_l2_wx = ein("sbu,sbk->uk", res["h1"], dz2)
    d_l2_wh = ein("sbu,sbk->uk", shift1(res["h2"]), dz2)
    d_l2_b = _f32(dz2).sum((0, 1))

    # ---- projections (input [h2 | ctx]); dproj includes the feedback grad
    dproj = bwd["dproj"][:, :, :FO]
    d_proj_wo = ein("sbu,sbf->uf", res["h2"], dproj)
    d_proj_wc = ein("sbm,sbf->mf", res["ctx"], dproj)
    d_proj_b = _f32(dproj).sum((0, 1))

    # ---- attention parameters from the bwd kernel's in-VMEM accumulators
    # (t1/dv/dkeys2/dq): nothing [S,B,Tp*A]-sized is ever materialized.
    #   t1[u, t*A+a] = sum_{s,b} cum[s,b,u] * de2[s,b,t,a]
    #   dv[t*A+a]    = sum_{s,b} e2[s,b,t,a] * denergy[s,b,t]
    wloc = _f32(dp.wloc)
    loc_k = _f32(dp.loc_k)                                    # [K, F]
    K, F = loc_k.shape
    # channel-1 convolutions lower poorly on TPU; the cached banded selector
    # (same one the kernels use) expresses the conv fwd/filter-grad banding
    sel = jnp.asarray(_band_selector(K, Tp))                  # [Tp*Tp, K]

    # dkeys / dq / d_beff come straight from the kernel's own accumulations
    dkeys = bwd["dkeys2"].reshape(B, Tp, A)
    d_beff = dkeys.sum((0, 1))
    d_wq = ein("sbu,sba->ua", res["h2"], bwd["dq"])

    t1 = bwd["t1"].reshape(Tp, Tp, A)                         # [u, t, a]
    d_v_a = bwd["dv"].sum(0)                                  # dv is [Tp, A]
    # d_wloc[f,a] = sum_{u,t} bandF[u,t,f] * t1[u,t,a]
    #   where bandF[u, t*F+f] = sum_k sel[u*Tp+t, k] loc_k[k, f] is the
    #   Toeplitz expansion of the location conv (f = cum @ bandF)
    bandF = (sel @ loc_k).reshape(Tp, Tp, F)
    d_wloc = ein("utf,uta->fa", bandF, t1)
    # d_loc_k[k,f] = sum_a wloc[f,a] * sum_{u=t+k-pad} t1[u,t,a]
    sel3 = sel.reshape(Tp, Tp, K)
    d_ka = ein("uta,utk->ka", t1, sel3)
    d_loc_k = d_ka @ wloc.T                                   # [K, F]
    # b_eff = b_a + loc_b @ wloc: route the bias gradient through the fold
    d_b_a = d_beff
    d_loc_b = d_beff @ wloc.T
    d_wloc = d_wloc + jnp.outer(_f32(dp.loc_b), d_beff)

    # ---- memory grad (context formation only; keys handled above)
    dmem = ein("sbt,sbm->btm", res["align"].astype(rdt),
               bwd["dctx"])                                   # [B,Tp,M]

    d_dp = DecoderParams(
        pre_w0=d_pre_w0, pre_b0=d_pre_b0, pre_w1=d_pre_w1, pre_b1=d_pre_b1,
        l1_wp=d_l1_wp, l1_wc=d_l1_wc, l1_wh=d_l1_wh, l1_b=d_l1_b,
        l2_wx=d_l2_wx, l2_wh=d_l2_wh, l2_b=d_l2_b,
        wq=d_wq, loc_k=d_loc_k, loc_b=d_loc_b, wloc=d_wloc,
        v_a=d_v_a, b_a=d_b_a, proj_wo=d_proj_wo, proj_wc=d_proj_wc,
        proj_b=d_proj_b)
    return d_dp, dkeys, dmem


# ========================================================== custom_vjp glue


def make_fused_teacher_forced(cfg: Config, B: int, T_in: int, steps: int,
                              M: int, *, weight_dtype=jnp.bfloat16,
                              interpret: bool = False):
    """Drop-in fused replacement for Decoder.teacher_forced's scan.

    Returns fn(dp, keys [B,T_in,A], memory [B,T_in,M], mask [B,T_in] bool,
    teacher [steps,B,mels], coins [steps] int32, seed int32[])
    -> (frames [B,steps*r,mels], stop_logits [B,steps*r],
        aligns [B,T_in,steps]) with full gradients wrt dp/keys/memory.
    """
    tc, au = cfg.tacotron, cfg.audio
    r = tc.outputs_per_step
    mels = au.num_mels
    FO = r * mels + r
    FOp = ((FO + 127) // 128) * 128
    Tp = ((T_in + 127) // 128) * 128
    fwd_run = build_train_fwd(cfg, B, T_in, steps, M,
                              weight_dtype=weight_dtype, interpret=interpret)
    bwd_run = build_train_bwd(cfg, B, T_in, steps, M,
                              weight_dtype=weight_dtype, interpret=interpret)

    def _assemble(out, align):
        frames = (out[:, :, :r * mels].transpose(1, 0, 2)
                  .reshape(B, steps * r, mels))
        stops = (out[:, :, r * mels:FO].transpose(1, 0, 2)
                 .reshape(B, steps * r))
        aligns = align[:, :, :T_in].transpose(1, 2, 0)
        return frames, stops, aligns

    @jax.custom_vjp
    def fused(dp, keys, memory, mask, teacher, coins, seed):
        res = fwd_run(dp, keys, memory, mask, teacher, coins, seed)
        return _assemble(res["out"], res["align"])

    def fused_fwd(dp, keys, memory, mask, teacher, coins, seed):
        res = fwd_run(dp, keys, memory, mask, teacher, coins, seed)
        keys_p = jnp.pad(keys.astype(jnp.float32),
                         ((0, 0), (0, Tp - T_in), (0, 0)))
        mem_p = jnp.pad(memory.astype(jnp.float32),
                        ((0, 0), (0, Tp - T_in), (0, 0)))
        res["keys2"] = make_keys2(dp, keys_p, jnp.float32)
        saved = (dp, res, keys_p, mem_p, mask, teacher, coins, seed)
        return _assemble(res["out"], res["align"]), saved

    def _zero_cot(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        shape = getattr(x, "shape", ())
        return np.zeros(shape, dtype=jax.dtypes.float0)

    def fused_bwd(saved, cots):
        dp, res, keys_p, mem_p, mask, teacher, coins, seed = saved
        dframes, dstops, daligns = cots
        # cotangents back to step-major kernel layout
        dfr = dframes.reshape(B, steps, r * mels).transpose(1, 0, 2)
        dst = dstops.reshape(B, steps, r).transpose(1, 0, 2)
        dout = jnp.concatenate(
            [dfr, dst, jnp.zeros((steps, B, FOp - FO), dframes.dtype)],
            axis=-1).astype(jnp.float32)
        dalign_up = jnp.pad(
            daligns.transpose(2, 0, 1), ((0, 0), (0, 0), (0, Tp - T_in))
        ).astype(jnp.float32)
        bwd = bwd_run(dp, res, mem_p, dout, dalign_up, coins, seed)
        d_dp, dkeys, dmem = weight_grads(cfg, dp, res, bwd, keys_p,
                                         teacher, coins)
        # mask/coins/seed are non-float (float0 cotangents); the teacher
        # frames are treated as non-differentiable data (targets never
        # receive gradients from the feeding path)
        return (d_dp, dkeys[:, :T_in], dmem[:, :T_in],
                _zero_cot(mask), jnp.zeros_like(teacher),
                _zero_cot(coins), _zero_cot(seed))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def extract_decoder_params_traced(params, cfg: Config) -> DecoderParams:
    """jnp-only variant of extract_decoder_params (tacotron_decoder_kernel.py)
    so gradients flow back through the extraction into the flax tree."""
    tc = cfg.tacotron
    U = tc.decoder_lstm_units
    P = tc.prenet_layers[-1]
    cell = params["decoder"]["cell"]
    pre = cell["prenet"]
    l1k = cell["lstm1"]["kernel"]
    l2k = cell["lstm2"]["kernel"]
    M = l1k.shape[0] - P - U
    fold = jnp.concatenate(
        [jnp.zeros((2 * U,)), jnp.ones((U,)), jnp.zeros((U,))])
    att = cell["attention"]
    fp = cell["frame_projection"]["Dense_0"]
    sp = cell["stop_projection"]["Dense_0"]
    proj_w = jnp.concatenate([fp["kernel"], sp["kernel"]], axis=1)
    proj_b = jnp.concatenate([fp["bias"], sp["bias"]], axis=0)
    return DecoderParams(
        pre_w0=pre["Dense_0"]["kernel"], pre_b0=pre["Dense_0"]["bias"],
        pre_w1=pre["Dense_1"]["kernel"], pre_b1=pre["Dense_1"]["bias"],
        l1_wp=l1k[:P], l1_wc=l1k[P:P + M], l1_wh=l1k[P + M:],
        l1_b=cell["lstm1"]["bias"] + fold,
        l2_wx=l2k[:U], l2_wh=l2k[U:], l2_b=cell["lstm2"]["bias"] + fold,
        wq=att["query_layer"]["kernel"],
        loc_k=jnp.squeeze(att["location_features_convolution"]["kernel"], 1),
        loc_b=att["location_features_convolution"]["bias"],
        wloc=att["location_features_layer"]["kernel"],
        v_a=jnp.squeeze(att["attention_variable_projection"], -1),
        b_a=att["attention_bias"],
        proj_wo=proj_w[:U], proj_wc=proj_w[U:], proj_b=proj_b)
