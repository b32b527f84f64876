"""Fused Pallas kernel for the full autoregressive Tacotron decode loop.

The XLA `lax.scan` synthesis path (models/tacotron/decoder.py) pays ~322 us
per decoder step at B=32 — almost entirely op-dispatch latency on a loop whose
actual math is ~1 GFLOP/step (prenet -> 2x zoneout-LSTM(1024) -> location-
sensitive attention -> frame/stop projections; reference call chain
Architecture_wrappers.py:197-267 + attention.py:94-227 + helpers.py:6-133).
This kernel runs the ENTIRE decode (all `max_steps` steps) in one Pallas
program, mirroring ops/wavenet_kernel.py:

- every weight (LSTM kernels dominate: [1920,4096] + [2048,4096]) lives in
  VMEM for the whole utterance batch, in bf16 at the MXU's native rate with
  f32 accumulation;
- the location-sensitive conv (k=31, 32 filters, attention.py:37-44) over the
  cumulative alignments is reformulated as ONE banded matmul: a precomputed
  [T, T, F] Toeplitz expansion of the conv kernel turns the per-step conv
  into `cum [B,T] x K [T, T*F]` on the MXU — no gather, no shifted adds;
- the per-step prenet dropout (always on, modules.py:326-357) draws from the
  on-core PRNG; zoneout at inference is the deterministic EMA mix;
- the stop/frame projections fuse into one matmul; stop sigmoid applied
  in-kernel (TacoTestHelper semantics) so the host only trims lengths.

Support envelope (asserted at build): the default/paper model families.
GST/style conditioning is untouched: style embeddings concat into `memory`
before the loop. The BLOCKED kernel (build_decoder_block_kernel) extends
coverage to long inputs (tile-local location operands + carried state) and
runs the `emt_attn` 'simple' AND 'multihead' (mlp scorer) decoder-side
attentions in-kernel; the style_tokens variant (whose query needs emt
labels) and the dot_attention scorer keep the XLA scan path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config

NEG_INF = -(2.0 ** 32) + 1.0  # reference masking value (attention.py:214)


class DecoderParams(NamedTuple):
    """Matmul-ready decoder weights (extracted from the flax tree)."""

    pre_w0: jnp.ndarray   # [mels, P]
    pre_b0: jnp.ndarray   # [P]
    pre_w1: jnp.ndarray   # [P, P]
    pre_b1: jnp.ndarray   # [P]
    l1_wp: jnp.ndarray    # [P, 4U]   prenet rows of LSTM1 kernel
    l1_wc: jnp.ndarray    # [M, 4U]   context rows
    l1_wh: jnp.ndarray    # [U, 4U]   hidden rows
    l1_b: jnp.ndarray     # [4U] (forget bias folded)
    l2_wx: jnp.ndarray    # [U, 4U]
    l2_wh: jnp.ndarray    # [U, 4U]
    l2_b: jnp.ndarray     # [4U]
    wq: jnp.ndarray       # [U, A]
    loc_k: jnp.ndarray    # [K, F] location conv taps
    loc_b: jnp.ndarray    # [F]
    wloc: jnp.ndarray     # [F, A]
    v_a: jnp.ndarray      # [A]
    b_a: jnp.ndarray      # [A]
    proj_wo: jnp.ndarray  # [U, FO]  FO = r*mels + r  ([frames | stops])
    proj_wc: jnp.ndarray  # [M, FO]
    proj_b: jnp.ndarray   # [FO]
    # emt_attn 'simple' variant (None otherwise): the decoder-side emotion
    # attention (SimpleBahdanauAttention, attention.py:104-121) and the
    # extra LSTM1 input rows for [context_emt | ref_spk]
    l1_we: jnp.ndarray = None    # [E, 4U]  context_emt rows
    l1_wr: jnp.ndarray = None    # [R, 4U]  ref_spk rows (R=0 when emt_only)
    emt_w1: jnp.ndarray = None   # [V, A2]
    emt_b1: jnp.ndarray = None   # [A2]
    emt_w2: jnp.ndarray = None   # [U, A2]
    emt_b2: jnp.ndarray = None   # [A2]
    emt_v: jnp.ndarray = None    # [A2]
    # emt_attn 'multihead' variant: GST MultiheadStyleAttention over the
    # emt-ref sequence + Dense(128) output (decoder.py:73-75,124-126;
    # reference tacotron_emt_attn.py:261-285 + multihead_attention.py:5-132)
    mh_q_w: jnp.ndarray = None   # [U, units] query projection
    mh_q_b: jnp.ndarray = None   # [units]
    mh_k_w: jnp.ndarray = None   # [V, units] key projection
    mh_k_b: jnp.ndarray = None   # [units]
    mh_v: jnp.ndarray = None     # [hd] mlp score vector (shared per head)
    mh_g: jnp.ndarray = None     # [] weight-norm gain (normalize=True)
    mh_b: jnp.ndarray = None     # [hd] score bias
    mh_out_w: jnp.ndarray = None  # [H*V, 128] attn_emt_out Dense
    mh_out_b: jnp.ndarray = None  # [128]


def extract_decoder_params(params, cfg: Config, *, emt_only: bool = False
                           ) -> DecoderParams:
    """Flatten the flax decoder subtree into DecoderParams.

    Layout produced by models/tacotron/decoder.py: cell/{prenet,lstm1,lstm2,
    attention,frame_projection,stop_projection}. LSTM kernels are
    [(x_dim + U), 4U] with x = concat(prenet_out, context[, context_emt,
    ref_spk]) (TF LSTMCell (i,j,f,o) gate order, forget_bias=1 — folded into
    the bias here).
    """
    tc, gst = cfg.tacotron, cfg.gst
    U = tc.decoder_lstm_units
    P = tc.prenet_layers[-1]
    r = tc.outputs_per_step
    mels = cfg.audio.num_mels
    cell = params["decoder"]["cell"]

    emt_simple = gst.emt_attn and gst.emt_attn_type == "simple"
    emt_mh = gst.emt_attn and gst.emt_attn_type == "multihead"
    # multihead feeds ONE extra 128-wide block (ref_spk + context_emt added
    # elementwise, decoder.py:100-102); simple concatenates both
    E = 2 * gst.reference_depth if emt_simple else (128 if emt_mh else 0)
    R = (gst.reference_depth if emt_simple and not emt_only else 0)

    pre = cell["prenet"]
    l1k = cell["lstm1"]["kernel"]
    l1b = np.asarray(cell["lstm1"]["bias"]).copy()
    l2k = cell["lstm2"]["kernel"]
    l2b = np.asarray(cell["lstm2"]["bias"]).copy()
    M = l1k.shape[0] - P - U - E - R
    assert l2k.shape[0] == 2 * U, l2k.shape
    # fold forget_bias=1.0 (modules.py lstm_step) into the f-gate bias
    l1b[2 * U:3 * U] += 1.0
    l2b[2 * U:3 * U] += 1.0

    att = cell["attention"]
    loc_k = jnp.squeeze(att["location_features_convolution"]["kernel"], 1)
    fp = cell["frame_projection"]["Dense_0"]
    sp = cell["stop_projection"]["Dense_0"]
    proj_w = jnp.concatenate([fp["kernel"], sp["kernel"]], axis=1)
    proj_b = jnp.concatenate([fp["bias"], sp["bias"]], axis=0)
    assert proj_w.shape == (U + M, r * mels + r), proj_w.shape

    emt = {}
    if emt_simple:
        ae = cell["attention_emt"]
        emt = dict(
            l1_we=l1k[P + M:P + M + E],
            l1_wr=(l1k[P + M + E:P + M + E + R] if R else None),
            emt_w1=ae["W1"]["kernel"], emt_b1=ae["W1"]["bias"],
            emt_w2=ae["W2"]["kernel"], emt_b2=ae["W2"]["bias"],
            emt_v=jnp.squeeze(ae["V"]["kernel"], -1))
    elif emt_mh:
        ae = cell["attention_emt"]
        out = cell["attn_emt_out"]
        emt = dict(
            l1_we=l1k[P + M:P + M + E], l1_wr=None,
            mh_q_w=ae["q_proj"]["kernel"], mh_q_b=ae["q_proj"]["bias"],
            mh_k_w=ae["k_proj"]["kernel"], mh_k_b=ae["k_proj"]["bias"],
            mh_v=ae["attention_v"],
            mh_g=ae.get("attention_g"), mh_b=ae.get("attention_b"),
            mh_out_w=out["kernel"], mh_out_b=out["bias"])

    return DecoderParams(
        pre_w0=pre["Dense_0"]["kernel"], pre_b0=pre["Dense_0"]["bias"],
        pre_w1=pre["Dense_1"]["kernel"], pre_b1=pre["Dense_1"]["bias"],
        l1_wp=l1k[:P], l1_wc=l1k[P:P + M], l1_wh=l1k[P + M + E + R:],
        l1_b=jnp.asarray(l1b),
        l2_wx=l2k[:U], l2_wh=l2k[U:], l2_b=jnp.asarray(l2b),
        wq=att["query_layer"]["kernel"],
        loc_k=loc_k,
        loc_b=att["location_features_convolution"]["bias"],
        wloc=att["location_features_layer"]["kernel"],
        v_a=jnp.squeeze(att["attention_variable_projection"], -1),
        b_a=att["attention_bias"],
        proj_wo=proj_w[:U], proj_wc=proj_w[U:],
        proj_b=proj_b, **emt)


def _uniform_from_bits(bits):
    """uint32 random bits -> uniform in (0, 1) (same recipe as the vocoder
    kernel: mantissa bits into [1,2), subtract 1, nudge off zero)."""
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return jnp.maximum(f - 1.0, 1e-20)


def _band_matrix(loc_k, T: int):
    """[K, F] conv taps -> [T, T, F] banded (Toeplitz) expansion.

    out[b,t,f] = sum_k cum[b, t+k-pad, f] * loc_k[k,f] (SAME correlation,
    flax nn.Conv semantics) == einsum('bs,stf->btf', cum, band).
    """
    K, F = loc_k.shape
    pad = (K - 1) // 2
    band = jnp.zeros((T, T, F), loc_k.dtype)
    for k in range(K):
        off = k - pad
        eye = jnp.eye(T, T, off, dtype=loc_k.dtype)     # [s, t]: s = t + off
        band = band + eye.T[:, :, None] * loc_k[k][None, None, :]
    return band


def _attention_operands(dp: DecoderParams, keys, T: int, dtype,
                        energy_mode: str = "vpu"):
    """Precompute the attention operands for the fused decode step.

    - band_a [T, T*A]: location conv FOLDED with the location projection —
      loc[b, t*A+a] = (cum @ band_a)[b, t*A+a] = (conv31(cum) @ W_loc)[b,t,a];
      at T <= 256 this matmul is already MXU-minimal (contraction dim = T
      can't go below one 128-pass, and the 31-tap band spans 2 tiles);
    - the v_a reduction operand, per `energy_mode` (the r5 ablation,
      scripts/bench_decode_ablate.py):
        'vpu'  — va_row [1, A] f32; energy = VPU lane reduce over the 3-D
                 [B, T, A] tanh view (r4 form, useful FLOPs only but pays
                 a per-step [B,T*A]→[B,T,A] lane-split relayout of `loc`);
        'vmat' — [T*A, T] block-diagonal matmul (r3 form: T× padding FLOPs
                 on the MXU, zero relayouts — keys stay 2-D);
        'dot'  — va_col [A, 8]: the reduce as a thin MXU matmul on the 3-D
                 view;
    - keys: [B, T, A] with the attention bias pre-added ('vpu'/'dot'), or
      flattened [B, T*A] ('vmat').
    """
    A = dp.wq.shape[1]
    wp = (dp.loc_k.astype(jnp.float32) @ dp.wloc.astype(jnp.float32))  # [K, A]
    band_a = _band_matrix(wp, T).reshape(T, T * A)
    b_eff = dp.b_a + dp.loc_b @ dp.wloc
    if energy_mode == "vmat":
        # r3 form: block-diagonal v_a, energy as one [B,T*A] x [T*A,T]
        # matmul on 2-D operands (no in-step lane reshapes)
        vmat = (jnp.eye(T, dtype=jnp.float32)[:, None, :]
                * dp.v_a.astype(jnp.float32)[None, :, None]).reshape(T * A, T)
        B = keys.shape[0]
        keys2 = (keys.astype(jnp.float32)
                 + b_eff[None, None, :]).reshape(B, T * A)
        return band_a.astype(dtype), vmat.astype(dtype), keys2.astype(dtype)
    keys3 = keys.astype(jnp.float32) + b_eff[None, None, :]
    if energy_mode == "dot":
        # v_a as a thin matmul rhs: e3 [B,T,A] x [A,8] -> [B,T,8], col 0
        va_col = jnp.zeros((A, 8), jnp.float32).at[:, 0].set(
            dp.v_a.astype(jnp.float32))
        return band_a.astype(dtype), va_col.astype(dtype), keys3.astype(dtype)
    va_row = dp.v_a.astype(jnp.float32).reshape(1, A)
    return band_a.astype(dtype), va_row, keys3.astype(dtype)


class DecoderKernelState(NamedTuple):
    """Carry state of the blocked fused decode (build_decoder_block_kernel).

    Mirrors models/tacotron/decoder.py DecoderState (reference
    TacotronDecoderCellState, Architecture_wrappers.py:48-69) in the kernel's
    padded layouts: lane-padded xprev/pmax, Tp-padded cumulative alignments.
    """

    xprev: jnp.ndarray   # [B, 128] f32 (first `mels` cols = last frame)
    c1: jnp.ndarray      # [B, U] f32
    h1: jnp.ndarray      # [B, U] f32
    c2: jnp.ndarray      # [B, U] f32
    h2: jnp.ndarray      # [B, U] f32
    ctx: jnp.ndarray     # [B, M] f32 attention context
    cum: jnp.ndarray     # [B, Tp] f32 cumulative alignments
    pmax: jnp.ndarray    # [B, 128] i32 previous argmax (window constraint)
    ctx_emt: jnp.ndarray  # [B, E] f32 emt-attention context ([B,1] unused)


def init_decoder_state(cfg: Config, B: int, T_in: int, M: int
                       ) -> DecoderKernelState:
    """Zero carry for a fresh utterance batch (decoder.zero_state parity)."""
    gst = cfg.gst
    U = cfg.tacotron.decoder_lstm_units
    Tp = ((T_in + 127) // 128) * 128
    E = 1
    if gst.emt_attn and gst.emt_attn_type == "simple":
        E = 2 * gst.reference_depth
    elif gst.emt_attn and gst.emt_attn_type == "multihead":
        E = 128
    z = lambda *s: jnp.zeros(s, jnp.float32)
    return DecoderKernelState(
        xprev=z(B, 128), c1=z(B, U), h1=z(B, U), c2=z(B, U), h2=z(B, U),
        ctx=z(B, M), cum=z(B, Tp),
        pmax=jnp.zeros((B, 128), jnp.int32), ctx_emt=z(B, E))


def _tiled_attention_operands(dp: DecoderParams, keys, Tp: int, dtype,
                              energy_mode: str = "vpu"):
    """Tile-local attention operands for the blocked kernel.

    The monolithic kernel's [Tp, Tp*A] Toeplitz band is quadratic in T_in and
    is what capped it at T_in <= 256. The location conv only spans +-15
    positions (k=31, attention.py:37-44), so a 128-wide tile of location
    features depends on a 384-wide window of the cumulative alignments — ONE
    [384, 128*A] operand shared by every tile (edges handled by zero padding
    of the cum buffer):

    - band3 [384, 128*A]: band3[w, tl*A+a] = wp[k, a] at w = tl + k + 128-pad
      where wp = loc_k @ wloc (conv folded with the location projection);
    - va_row [1, A] f32: v_a for the per-tile VPU energy reduction over the
      3-D [B, 128, A] view (r3 used a [128*A, 128] block-diagonal matmul —
      128x padding FLOPs per tile, VERDICT r3 item 5);
    - keys2 [B, Tp*A]: flattened keys with the attention bias pre-added
      (tile i occupies columns [i*128*A, (i+1)*128*A)).
    """
    K, F = dp.loc_k.shape
    A = dp.wq.shape[1]
    pad = (K - 1) // 2
    wp = (dp.loc_k.astype(jnp.float32) @ dp.wloc.astype(jnp.float32))  # [K, A]
    Wb = 384
    band3 = jnp.zeros((Wb, 128 * A), jnp.float32)
    for k in range(K):
        eye = jnp.eye(Wb, 128, -(k + 128 - pad), dtype=jnp.float32)
        band3 = band3 + (eye[:, :, None] * wp[k][None, None, :]
                         ).reshape(Wb, 128 * A)
    if energy_mode == "vmat":
        va_op = (jnp.eye(128, dtype=jnp.float32)[:, None, :]
                 * dp.v_a.astype(jnp.float32)[None, :, None]
                 ).reshape(128 * A, 128)
    elif energy_mode == "dot":
        va_op = jnp.zeros((A, 8), jnp.float32).at[:, 0].set(
            dp.v_a.astype(jnp.float32))
    else:
        va_op = dp.v_a.astype(jnp.float32).reshape(1, A)
    b_eff = dp.b_a + dp.loc_b @ dp.wloc
    B = keys.shape[0]
    keys2 = (keys.astype(jnp.float32)
             + b_eff[None, None, :]).reshape(B, Tp * A)
    return band3.astype(dtype), va_op.astype(dtype), keys2.astype(dtype)


def build_decoder_block_kernel(cfg: Config, B: int, T_in: int, K_steps: int,
                               M: int, *,
                               weight_dtype=jnp.bfloat16,
                               emit_alignments: bool = True,
                               emt_T: int = None,
                               energy_mode: str = None,
                               context_mode: str = "batched",
                               interpret: bool = False):
    """Compile a K-step fused decode block with explicit carry state.

    energy_mode=None resolves per variant: 'vmat' for the plain blocked
    kernel — the r5 on-chip ablation (artifacts/decode_ablate_r5.json)
    showed it fastest there (med 118.4 us vs 175.4 'vpu' at B=32/T_in=400;
    the 'vpu' lane-split relayout of the tile-local `loc` operand dominates)
    — and 'vpu' for the in-kernel emt variants ('vmat' fails Mosaic gather
    lowering on real TPU there). The monolithic kernel keeps 'vpu' (med
    89.8 vs 96.4 at B=48/T=256, and 'vmat' exceeds VMEM at B=64).

    Long-input complement to build_decoder_kernel: the quadratic [Tp, Tp*A]
    location operands are replaced by tile-local ones (_tiled_attention_
    operands), and the decode runs K_steps per kernel call with the decoder
    state as explicit inputs/outputs — the host loops blocks and stops early
    once every stream's stop token fired (the reference dynamic_decode exit,
    custom_decoder.py:107-139). VMEM then scales with B*Tp*M (the resident
    memory/keys operands), not Tp^2, covering T_in up to ~512 at B=32 and
    ~1024 at B=16 on v5e.

    Returns fn(dp, keys [B,T,A], memory [B,T,M], mask [B,T] bool,
    state: DecoderKernelState, seed[, emt_memory [B,Te,V], ref_spk [B,R]])
    -> (frames [B, K*r, mels], stop_probs [B, K*r],
    alignments [B, T_in, K] | None, new_state).

    With `emt_T` set and an emt_attn='simple' config, the decoder-side
    emotion attention (SimpleBahdanauAttention over the emt-ref sequence,
    attention.py:104-121, reference tacotron_emt_attn.py:261-285) runs
    in-kernel: its keys are precomputed per call, the ref_spk LSTM feed is
    folded into one constant [B, 4U] addend, and context_emt joins the
    carried state.
    """
    tc, gst, au = cfg.tacotron, cfg.gst, cfg.audio
    has_emt = emt_T is not None
    emt_mh = has_emt and gst.emt_attn_type == "multihead"
    if has_emt:
        assert gst.emt_attn and gst.emt_attn_type in ("simple", "multihead"), \
            "kernel emt support covers the 'simple' and 'multihead' variants"
        if emt_mh:
            assert gst.style_att_type == "mlp_attention", \
                "in-kernel multihead covers the mlp_attention scorer"
    else:
        assert not gst.emt_attn, "emt_attn decode needs emt_T"
    U = tc.decoder_lstm_units
    A = tc.attention_dim
    P = tc.prenet_layers[-1]
    assert tuple(tc.prenet_layers) == (P, P), "kernel assumes 2 equal prenet FCs"
    r = tc.outputs_per_step
    mels = au.num_mels
    FO = r * mels + r
    drop = float(tc.dropout_rate)
    keep = 1.0 - drop
    zo = float(tc.zoneout_rate)
    Tp = ((T_in + 127) // 128) * 128
    nt = Tp // 128
    smoothing = bool(tc.smoothing)
    K = int(K_steps)
    constraint = bool(tc.synthesis_constraint)
    ctype = tc.synthesis_constraint_type
    win = int(tc.attention_win_size)
    fwd = win // 2 if ctype == "window" else win
    back = (win // 2 + win % 2) if ctype == "window" else 0
    Te = int(emt_T) if has_emt else 0
    E = (128 if emt_mh else 2 * gst.reference_depth) if has_emt else 1
    ns = 9 if has_emt else 8        # carried state arrays
    # A2 = scorer width: simple uses the 2R Bahdanau dim; multihead scores
    # per head over hd = units/H lanes of the 'units'-wide projections
    MH_H = gst.num_heads
    MH_U = gst.style_att_dim
    MH_V = 2 * gst.reference_depth
    A2 = (MH_U if emt_mh else 2 * gst.reference_depth) if has_emt else 0
    if energy_mode is None:
        # measured default (artifacts/decode_ablate_r5.json): 'vmat' wins for
        # the plain blocked kernel (med 118.4 vs 175.4 us 'vpu' at
        # B=32/T_in=400 — the 'vpu' per-tile lane-split relayout dominates);
        # the in-kernel emt variants keep 'vpu': their 'vmat' leg hits a
        # Mosaic gather-lowering shape mismatch on real TPU (interpret mode
        # passes), and 'vpu' is the r4-proven path there
        energy_mode = "vmat" if emt_T is None else "vpu"
    assert energy_mode in ("vpu", "vmat", "dot")
    assert context_mode in ("batched", "blockdiag")
    blockdiag = context_mode == "blockdiag"

    def kernel(seed_ref, *refs):
        it = iter(refs)
        (keys_ref, mem_ref, mask_ref, band_ref,
         va_ref) = (next(it) for _ in range(5))
        smask_ref = next(it) if blockdiag else None
        if has_emt:
            (ekeys_ref, eva_ref, emem_ref,
             rs_ref) = (next(it) for _ in range(4))
        (xprev_in, c1_in, h1_in, c2_in, h2_in, ctx_in, cum_in,
         pmax_in) = (next(it) for _ in range(8))
        if has_emt:
            ctxe_in = next(it)
        (pre_w0, pre_b0, pre_w1, pre_b1,
         l1_wp, l1_wc, l1_wh, l1_b, l2_wx, l2_wh, l2_b,
         wq, proj_wo, proj_wc, proj_b) = (next(it) for _ in range(15))
        if has_emt:
            l1_we, w2e = next(it), next(it)
            if emt_mh:
                mh_ow, mh_ob = next(it), next(it)
        out_ref = next(it)
        if emit_alignments:
            align_out = next(it)
        state_out = [next(it) for _ in range(ns)]
        scratch = list(it)
        (xprev, c1, h1, c2, h2, ctx, pmax, cum_pad, energy_s) = scratch[:9]
        if has_emt:
            ctx_e = scratch[9]
            if emt_mh:
                ctx_mh = scratch[10]
        pltpu.prng_seed(seed_ref[0])
        xprev[:] = xprev_in[:]
        c1[:] = c1_in[:]
        h1[:] = h1_in[:]
        c2[:] = c2_in[:]
        h2[:] = h2_in[:]
        ctx[:] = ctx_in[:]
        pmax[:] = pmax_in[:]
        cum_pad[:] = jnp.zeros((B, Tp + 256), jnp.float32)
        cum_pad[:, 128:128 + Tp] = cum_in[:]
        if has_emt:
            ctx_e[:] = ctxe_in[:]

        idx_t = jax.lax.broadcasted_iota(jnp.int32, (B, Tp), 1)
        mask = mask_ref[:]                                   # [B, Tp] f32 1/0

        def step_body(t, _):
            # ---- prenet (dropout ALWAYS on)
            x = xprev[:, :mels]
            hpre = jnp.maximum(
                jnp.dot(x.astype(weight_dtype), pre_w0[:],
                        preferred_element_type=jnp.float32) + pre_b0[:], 0.0)
            if drop > 0:
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((2, B, P)), jnp.uint32)
                u = _uniform_from_bits(bits)
                hpre = jnp.where(u[0] < keep, hpre * (1.0 / keep), 0.0)
            hpre = jnp.maximum(
                jnp.dot(hpre.astype(weight_dtype), pre_w1[:],
                        preferred_element_type=jnp.float32) + pre_b1[:], 0.0)
            if drop > 0:
                hpre = jnp.where(u[1] < keep, hpre * (1.0 / keep), 0.0)

            # ---- LSTM1 on concat(prenet, context[, ctx_emt, ref_spk])
            # via split matmuls; the static ref_spk rows arrive pre-folded
            # as one [B, 4U] addend (rs_ref)
            ctx_now = ctx[:]
            z1 = (jnp.dot(hpre.astype(weight_dtype), l1_wp[:],
                          preferred_element_type=jnp.float32)
                  + jnp.dot(ctx_now.astype(weight_dtype), l1_wc[:],
                            preferred_element_type=jnp.float32)
                  + jnp.dot(h1[:].astype(weight_dtype), l1_wh[:],
                            preferred_element_type=jnp.float32)
                  + l1_b[:])
            if has_emt:
                z1 = (z1 + jnp.dot(ctx_e[:].astype(weight_dtype), l1_we[:],
                                   preferred_element_type=jnp.float32)
                      + rs_ref[:])
            i1, j1, f1, o1 = (z1[:, :U], z1[:, U:2 * U],
                              z1[:, 2 * U:3 * U], z1[:, 3 * U:])
            nc1 = jax.nn.sigmoid(f1) * c1[:] + jax.nn.sigmoid(i1) * jnp.tanh(j1)
            nh1 = jax.nn.sigmoid(o1) * jnp.tanh(nc1)
            c1[:] = (1 - zo) * nc1 + zo * c1[:]
            h1[:] = (1 - zo) * nh1 + zo * h1[:]

            z2 = (jnp.dot(h1[:].astype(weight_dtype), l2_wx[:],
                          preferred_element_type=jnp.float32)
                  + jnp.dot(h2[:].astype(weight_dtype), l2_wh[:],
                            preferred_element_type=jnp.float32)
                  + l2_b[:])
            i2, j2, f2, o2 = (z2[:, :U], z2[:, U:2 * U],
                              z2[:, 2 * U:3 * U], z2[:, 3 * U:])
            nc2 = jax.nn.sigmoid(f2) * c2[:] + jax.nn.sigmoid(i2) * jnp.tanh(j2)
            nh2 = jax.nn.sigmoid(o2) * jnp.tanh(nc2)
            c2[:] = (1 - zo) * nc2 + zo * c2[:]
            h2[:] = (1 - zo) * nh2 + zo * h2[:]
            out2 = h2[:]

            # ---- emt-reference attention: next step's context_emt.
            # 'simple': SimpleBahdanau over the emt-ref seq (attention.py:
            # 104-121). 'multihead': GST MultiheadStyleAttention (mlp
            # scorer) run as H per-head Bahdanau-style passes sharing the
            # normed score vector, value = the raw emt-ref sequence per
            # head, then the attn_emt_out Dense (decoder.py:124-126,
            # reference multihead_attention.py:56-132)
            if has_emt and emt_mh:
                qe = jnp.dot(out2.astype(weight_dtype), w2e[:],
                             preferred_element_type=jnp.float32)  # [B, units]
                ek3 = ekeys_ref[:].reshape(B, Te, A2)
                # full-lane-width tanh ONCE; per-head reduce via the masked
                # score rows (eva_ref[h] = normed_v in head-h's lane slice,
                # zeros elsewhere). Equivalent to slicing [h*hd:(h+1)*hd]
                # per head, but Mosaic cannot lower sub-tile lane slices
                # (gather shape mismatch on real TPU; hd = MH_U//MH_H < 128)
                eh = jnp.tanh(ek3 + qe[:, None, :])                # [B,Te,A2]
                for h in range(MH_H):
                    enh = jnp.sum(
                        eh * eva_ref[h:h + 1, :].reshape(1, 1, A2),
                        axis=-1)                                   # [B, Te]
                    hmx = jnp.max(enh, axis=-1, keepdims=True)
                    hex_ = jnp.exp(enh - hmx)
                    al_h = hex_ / jnp.sum(hex_, axis=-1, keepdims=True)
                    ctx_mh[:, h * MH_V:(h + 1) * MH_V] = jax.lax.dot_general(
                        al_h[:, None, :].astype(weight_dtype), emem_ref[:],
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)[:, 0, :]
                ctx_e[:] = (jnp.dot(ctx_mh[:].astype(weight_dtype), mh_ow[:],
                                    preferred_element_type=jnp.float32)
                            + mh_ob[:])                            # [B, 128]
            elif has_emt:
                qe = jnp.dot(out2.astype(weight_dtype), w2e[:],
                             preferred_element_type=jnp.float32)   # [B, A2]
                ee = jnp.tanh(ekeys_ref[:].reshape(B, Te, A2)
                              + qe[:, None, :])                    # [B,Te,A2]
                en = jnp.sum(ee * eva_ref[:].reshape(1, 1, A2),
                             axis=-1)                              # [B, Te]
                emx = jnp.max(en, axis=-1, keepdims=True)
                eex = jnp.exp(en - emx)
                align_e = eex / jnp.sum(eex, axis=-1, keepdims=True)
                ctx_e[:] = jax.lax.dot_general(
                    align_e[:, None, :].astype(weight_dtype), emem_ref[:],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, 0, :]   # [B, E]

            # ---- location-sensitive attention, tiled over 128-wide tiles:
            # per tile, loc = cum_window[B,384] @ band3 (MXU) and the energy
            # reduction as a VPU v_a lane reduce over the [B, 128, A] view
            # (r3's vmat128 matmul cost 128x padding FLOPs per tile);
            # softmax and the context then run full-width (attention.py:54-96)
            q = jnp.dot(out2.astype(weight_dtype), wq[:],
                        preferred_element_type=jnp.float32)       # [B, A]
            if energy_mode == "vmat":
                q_rep = pltpu.repeat(q, 128, axis=1)              # [B, 128*A]
                for i in range(nt):
                    window = cum_pad[:, i * 128:i * 128 + 384]
                    loc_i = jnp.dot(window.astype(weight_dtype), band_ref[:],
                                    preferred_element_type=jnp.float32)
                    e2 = jnp.tanh(keys_ref[:, i * 128 * A:(i + 1) * 128 * A]
                                  + q_rep + loc_i)
                    energy_s[:, i * 128:(i + 1) * 128] = jnp.dot(
                        e2.astype(weight_dtype), va_ref[:],
                        preferred_element_type=jnp.float32)
            else:
                va3 = (None if energy_mode == "dot"
                       else va_ref[:].reshape(1, 1, A))
                for i in range(nt):
                    window = cum_pad[:, i * 128:i * 128 + 384]
                    loc_i = jnp.dot(window.astype(weight_dtype), band_ref[:],
                                    preferred_element_type=jnp.float32)
                    e3 = jnp.tanh(keys_ref[:, i * 128 * A:(i + 1) * 128 * A]
                                  .reshape(B, 128, A)
                                  + q[:, None, :] + loc_i.reshape(B, 128, A))
                    if energy_mode == "dot":
                        et = jax.lax.dot_general(
                            e3.astype(weight_dtype), va_ref[:],
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [B,128,8]
                        energy_s[:, i * 128:(i + 1) * 128] = et[:, :, 0]
                    else:
                        energy_s[:, i * 128:(i + 1) * 128] = jnp.sum(
                            e3 * va3, axis=-1)
            energy = energy_s[:]

            if constraint:
                p = pmax[:, :1]
                forbidden = (idx_t < p - back) | (idx_t >= p + fwd)
                energy = jnp.where(forbidden, NEG_INF, energy)
            energy = jnp.where(mask > 0, energy, NEG_INF)
            if smoothing:
                sig = jax.nn.sigmoid(energy) * mask
                align = sig / jnp.sum(sig, axis=-1, keepdims=True)
            else:
                emax = jnp.max(energy, axis=-1, keepdims=True)
                ex = jnp.exp(energy - emax) * mask
                align = ex / jnp.sum(ex, axis=-1, keepdims=True)
            cum_pad[:, 128:128 + Tp] = cum_pad[:, 128:128 + Tp] + align
            if constraint:
                pmax[:, :1] = jnp.argmax(align, axis=-1,
                                         keepdims=True).astype(jnp.int32)
            if blockdiag:
                # r3 form: one dense [B, B*Tp] x [B*Tp, M] matmul (B x
                # padding FLOPs but identical MXU pass count)
                a_rep = pltpu.repeat(align, B, axis=1)            # [B, B*Tp]
                new_ctx = jnp.dot(
                    (a_rep * smask_ref[:]).astype(weight_dtype), mem_ref[:],
                    preferred_element_type=jnp.float32)            # [B, M]
            else:
                # batched dot_general over the 3-D memory — useful FLOPs
                # only (r4 form)
                new_ctx = jax.lax.dot_general(
                    align[:, None, :].astype(weight_dtype), mem_ref[:],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, 0, :]   # [B, M]
            ctx[:] = new_ctx

            # ---- fused frame+stop projection on concat(out2, context)
            proj = (jnp.dot(out2.astype(weight_dtype), proj_wo[:],
                            preferred_element_type=jnp.float32)
                    + jnp.dot(new_ctx.astype(weight_dtype), proj_wc[:],
                              preferred_element_type=jnp.float32)
                    + proj_b[:])                                  # [B, FO]
            frames, stops = proj[:, :r * mels], proj[:, r * mels:]
            out = jnp.concatenate(
                [frames, jax.nn.sigmoid(stops)], axis=-1)
            out_ref[t] = out
            if emit_alignments:
                align_out[t] = align.astype(align_out.dtype)
            xprev[:, :mels] = frames[:, (r - 1) * mels:]
            return 0

        jax.lax.fori_loop(0, K, step_body, 0)

        (xprev_o, c1_o, h1_o, c2_o, h2_o, ctx_o, cum_o,
         pmax_o) = state_out[:8]
        xprev_o[:] = xprev[:]
        c1_o[:] = c1[:]
        h1_o[:] = h1[:]
        c2_o[:] = c2[:]
        h2_o[:] = h2[:]
        ctx_o[:] = ctx[:]
        cum_o[:] = cum_pad[:, 128:128 + Tp]
        pmax_o[:] = pmax[:]
        if has_emt:
            state_out[8][:] = ctx_e[:]

    state_shapes = [
        jax.ShapeDtypeStruct((B, 128), jnp.float32),   # xprev
        jax.ShapeDtypeStruct((B, U), jnp.float32),     # c1
        jax.ShapeDtypeStruct((B, U), jnp.float32),     # h1
        jax.ShapeDtypeStruct((B, U), jnp.float32),     # c2
        jax.ShapeDtypeStruct((B, U), jnp.float32),     # h2
        jax.ShapeDtypeStruct((B, M), jnp.float32),     # ctx
        jax.ShapeDtypeStruct((B, Tp), jnp.float32),    # cum
        jax.ShapeDtypeStruct((B, 128), jnp.int32),     # pmax
    ]
    if has_emt:
        state_shapes.append(jax.ShapeDtypeStruct((B, E), jnp.float32))
    n_weights = 15 + ((4 if emt_mh else 2) if has_emt else 0)
    n_ops = 5 + (1 if blockdiag else 0) + (4 if has_emt else 0)
    out_shapes = [jax.ShapeDtypeStruct((K, B, FO), jnp.float32)]
    if emit_alignments:
        out_shapes.append(jax.ShapeDtypeStruct((K, B, Tp), jnp.bfloat16))
    out_shapes.extend(state_shapes)
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shapes)

    scratch_shapes = [
        pltpu.VMEM((B, 128), jnp.float32),        # xprev
        pltpu.VMEM((B, U), jnp.float32),          # c1
        pltpu.VMEM((B, U), jnp.float32),          # h1
        pltpu.VMEM((B, U), jnp.float32),          # c2
        pltpu.VMEM((B, U), jnp.float32),          # h2
        pltpu.VMEM((B, M), jnp.float32),          # context
        pltpu.VMEM((B, 128), jnp.int32),          # prev max attention
        pltpu.VMEM((B, Tp + 256), jnp.float32),   # padded cum alignments
        pltpu.VMEM((B, Tp), jnp.float32),         # energy scratch
    ]
    if has_emt:
        scratch_shapes.append(pltpu.VMEM((B, E), jnp.float32))  # ctx_emt
        if emt_mh:
            scratch_shapes.append(
                pltpu.VMEM((B, MH_H * MH_V), jnp.float32))  # head contexts
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (n_ops + len(state_shapes) + n_weights),
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )

    @jax.jit
    def run(dp: DecoderParams, keys, memory, mask, state: DecoderKernelState,
            seed, emt_memory=None, ref_spk=None):
        wd = weight_dtype
        pad_t = Tp - keys.shape[1]
        keys = jnp.pad(keys, ((0, 0), (0, pad_t), (0, 0)))
        memory = jnp.pad(memory, ((0, 0), (0, pad_t), (0, 0)))
        if mask is None:
            mask = jnp.ones((B, T_in), bool)
        mask = jnp.pad(mask, ((0, 0), (0, pad_t))).astype(jnp.float32)
        band3, va_op, keys2 = _tiled_attention_operands(dp, keys, Tp, wd,
                                                        energy_mode)
        if blockdiag:
            mem_op = memory.reshape(B * Tp, M).astype(wd)
            smask = (jnp.arange(B)[:, None]
                     == jnp.arange(B * Tp)[None, :] // Tp
                     ).astype(jnp.float32)
            ctx_ops = (smask,)
        else:
            mem_op = memory.astype(wd)                 # [B, Tp, M]
            ctx_ops = ()
        emt_ops, emt_weights = (), ()
        if has_emt and emt_mh:
            assert emt_memory is not None and emt_memory.shape[1] == Te
            hd = MH_U // MH_H
            # key projection with k/q biases and the per-head score bias
            # pre-folded (all constant across steps): tanh(ks + qs + b)
            ekeys = (emt_memory.astype(jnp.float32) @ dp.mh_k_w
                     + dp.mh_k_b[None, None] + dp.mh_q_b[None, None]
                     + jnp.tile(dp.mh_b, MH_H)[None, None]
                     ).reshape(B, Te * A2).astype(wd)
            if dp.mh_g is not None:
                normed_v = (dp.mh_g * dp.mh_v
                            * jax.lax.rsqrt(jnp.sum(dp.mh_v ** 2)))
            else:
                normed_v = dp.mh_v
            # per-head masked score rows at FULL lane width: row h holds
            # normed_v in head-h's lane slice, zeros elsewhere (8 sublane
            # rows for tile alignment; kernel reads rows [0, MH_H))
            assert MH_H <= 8, "masked score rows assume <=8 heads"
            eva = jnp.zeros((8, A2), jnp.float32)
            for h_ in range(MH_H):
                eva = eva.at[h_, h_ * hd:(h_ + 1) * hd].set(
                    normed_v.astype(jnp.float32).reshape(-1))
            emem3 = emt_memory.astype(wd)              # [B, Te, V]
            if ref_spk is not None:
                # ref_spk + context_emt share the SAME l1 weight block
                # (elementwise sum input, decoder.py:100-102); the static
                # half pre-multiplies into one addend
                rs_add = (ref_spk.astype(jnp.float32)
                          @ dp.l1_we).astype(jnp.float32)
            else:
                rs_add = jnp.zeros((B, 4 * U), jnp.float32)
            emt_ops = (ekeys, eva, emem3, rs_add)
            emt_weights = (dp.l1_we.astype(wd), dp.mh_q_w.astype(wd),
                           dp.mh_out_w.astype(wd),
                           dp.mh_out_b.astype(jnp.float32).reshape(1, -1))
        elif has_emt:
            assert emt_memory is not None and emt_memory.shape[1] == Te
            # SimpleBahdanau keys with both dense biases pre-folded; the
            # score bias (V layer) shifts every energy equally — dropped
            ekeys = (emt_memory.astype(jnp.float32) @ dp.emt_w1
                     + dp.emt_b1[None, None] + dp.emt_b2[None, None]
                     ).reshape(B, Te * A2).astype(wd)
            eva = dp.emt_v.astype(jnp.float32).reshape(1, A2)
            emem3 = emt_memory.astype(wd)              # [B, Te, V]
            if dp.l1_wr is not None and ref_spk is not None:
                rs_add = (ref_spk.astype(jnp.float32)
                          @ dp.l1_wr).astype(jnp.float32)
            else:
                rs_add = jnp.zeros((B, 4 * U), jnp.float32)
            emt_ops = (ekeys, eva, emem3, rs_add)
            emt_weights = (dp.l1_we.astype(wd), dp.emt_w2.astype(wd))
        weights = (
            dp.pre_w0.astype(wd), dp.pre_b0.astype(jnp.float32),
            dp.pre_w1.astype(wd), dp.pre_b1.astype(jnp.float32),
            dp.l1_wp.astype(wd), dp.l1_wc.astype(wd), dp.l1_wh.astype(wd),
            dp.l1_b.astype(jnp.float32),
            dp.l2_wx.astype(wd), dp.l2_wh.astype(wd),
            dp.l2_b.astype(jnp.float32),
            dp.wq.astype(wd),
            dp.proj_wo.astype(wd), dp.proj_wc.astype(wd),
            dp.proj_b.astype(jnp.float32))
        state_in = tuple(state) if has_emt else tuple(state)[:8]
        outs = call(jnp.asarray([seed], jnp.int32),
                    keys2, mem_op, mask, band3, va_op, *ctx_ops, *emt_ops,
                    *state_in, *weights, *emt_weights)
        out = outs[0]
        if emit_alignments:
            align_raw, new_state = outs[1], outs[2:]
        else:
            align_raw, new_state = None, outs[1:]
        frames = (out[:, :, :r * mels].transpose(1, 0, 2)
                  .reshape(B, K * r, mels))
        stops = out[:, :, r * mels:].transpose(1, 0, 2).reshape(B, K * r)
        aligns = None
        if align_raw is not None:
            aligns = (align_raw[:, :, :T_in].astype(jnp.float32)
                      .transpose(1, 2, 0))                 # [B, T_in, K]
        if not has_emt:
            new_state = tuple(new_state) + (state.ctx_emt,)
        return frames, stops, aligns, DecoderKernelState(*new_state)

    return run


def block_kernel_vmem_bytes(cfg: Config, B: int, T_in: int, K_steps: int,
                            M: int) -> int:
    """Estimated VMEM residency of build_decoder_block_kernel — used by the
    synthesizer to gate eligibility (operands + weights + outputs + scratch)."""
    tc, au = cfg.tacotron, cfg.audio
    U, A, P = tc.decoder_lstm_units, tc.attention_dim, tc.prenet_layers[-1]
    r = tc.outputs_per_step
    mels = au.num_mels
    FO = r * mels + r
    Tp = ((T_in + 127) // 128) * 128
    wd = 2  # bf16 operand/weight bytes
    operands = (B * Tp * A * wd          # keys2
                + B * Tp * M * wd        # mem3
                + 384 * 128 * A * wd     # band3
                + B * Tp * 4)            # mask
    weights = ((mels * P + P * P) * wd
               + (P + M + U) * 4 * U * wd
               + (2 * U) * 4 * U * wd
               + U * A * wd
               + (U + M) * FO * wd)
    outs = K_steps * B * (FO * 4 + Tp * 2) + B * (128 * 4 + 4 * U * 4
                                                  + M * 4 + Tp * 4 + 128 * 4)
    scratch = B * (128 * 4 + 4 * U * 4 + M * 4 + 128 * 4
                   + (Tp + 256) * 4 + Tp * 4)
    return operands + weights + outs + scratch


def build_decoder_kernel(cfg: Config, B: int, T_in: int, max_steps: int,
                         M: int, *,
                         weight_dtype=jnp.bfloat16,
                         emit_alignments: bool = True,
                         early_stop_block: int = 0,
                         energy_mode: str = "vpu",
                         context_mode: str = "batched",
                         interpret: bool = False):
    """Compile a fused autoregressive decoder for fixed (B, T_in, max_steps).

    M is the memory feature width (encoder output + style concat). Returns
    fn(dp: DecoderParams, keys [B,T,A], memory [B,T,M], mask [B,T] bool,
       seed int32) -> (frames [B, steps*r, mels], stop_probs [B, steps*r],
    alignments [B, T_in, steps] | None). Semantics match
    Decoder.autoregressive (decoder.py:213-236) with apply_stop_sigmoid=True.

    early_stop_block=K > 0 restores the reference dynamic_decode's early
    stopping (custom_decoder.py:107-139, helpers.py:51-56) at block
    granularity: after each K steps, if EVERY stream has fired its stop
    condition (all r stop probs > 0.5, or any with cfg.tacotron.stop_at_any),
    the remaining blocks are skipped (pl.when on an SMEM flag — compute and
    output DMA both elided). Skipped steps carry stop prob 1.0 so host-side
    length recovery (synthesizer.get_output_lengths) is unaffected.
    """
    tc, au = cfg.tacotron, cfg.audio
    assert not cfg.gst.emt_attn, "emt_attn decoding uses the XLA scan path"
    U = tc.decoder_lstm_units
    A = tc.attention_dim
    F = tc.attention_filters
    P = tc.prenet_layers[-1]
    assert tuple(tc.prenet_layers) == (P, P), "kernel assumes 2 equal prenet FCs"
    r = tc.outputs_per_step
    mels = au.num_mels
    FO = r * mels + r
    drop = float(tc.dropout_rate)
    keep = 1.0 - drop
    zo = float(tc.zoneout_rate)
    Tp = ((T_in + 127) // 128) * 128
    steps = max_steps
    smoothing = bool(tc.smoothing)
    stop_at_any = bool(tc.stop_at_any)
    K = int(early_stop_block)
    if K <= 0 or K >= steps:
        K = 0
    constraint = bool(tc.synthesis_constraint)
    ctype = tc.synthesis_constraint_type
    win = int(tc.attention_win_size)
    fwd = win // 2 if ctype == "window" else win
    back = (win // 2 + win % 2) if ctype == "window" else 0

    assert energy_mode in ("vpu", "vmat", "dot")
    assert context_mode in ("batched", "blockdiag")
    blockdiag = context_mode == "blockdiag"

    def kernel(seed_ref, *refs):
        it = iter(refs)
        (keys_ref, mem_ref, mask_ref, band_ref,
         va_ref) = (next(it) for _ in range(5))
        smask_ref = next(it) if blockdiag else None
        (pre_w0, pre_b0, pre_w1, pre_b1,
         l1_wp, l1_wc, l1_wh, l1_b, l2_wx, l2_wh, l2_b,
         wq, proj_wo, proj_wc, proj_b) = (next(it) for _ in range(15))
        out_ref = next(it)
        rest = tuple(it)
        if emit_alignments:
            align_out, = rest[:1]
            scratch = rest[1:]
        else:
            scratch = rest
        (xprev, c1, h1, c2, h2, ctx, cum, pmax, fired, done) = scratch
        pltpu.prng_seed(seed_ref[0])
        if K:
            # skipped steps must read as "stopped" for host length recovery
            forow = jax.lax.broadcasted_iota(jnp.int32, (B, FO), 1)
            out_ref[:] = jnp.broadcast_to(
                (forow >= r * mels).astype(jnp.float32), (steps, B, FO))
            if emit_alignments:
                align_out[:] = jnp.zeros((steps, B, Tp), align_out.dtype)
            fired[:] = jnp.zeros((B, 128), jnp.float32)
            done[0, 0] = 0
        xprev[:] = jnp.zeros((B, 128), jnp.float32)
        c1[:] = jnp.zeros((B, U), jnp.float32)
        h1[:] = jnp.zeros((B, U), jnp.float32)
        c2[:] = jnp.zeros((B, U), jnp.float32)
        h2[:] = jnp.zeros((B, U), jnp.float32)
        ctx[:] = jnp.zeros((B, M), jnp.float32)
        cum[:] = jnp.zeros((B, Tp), jnp.float32)
        pmax[:] = jnp.zeros((B, 128), jnp.int32)

        idx_t = jax.lax.broadcasted_iota(jnp.int32, (B, Tp), 1)
        mask = mask_ref[:]                                   # [B, Tp] f32 1/0

        def step_body(t, _):
            # ---- prenet (dropout ALWAYS on)
            x = xprev[:, :mels]
            hpre = jnp.maximum(
                jnp.dot(x.astype(weight_dtype), pre_w0[:],
                        preferred_element_type=jnp.float32) + pre_b0[:], 0.0)
            if drop > 0:
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((2, B, P)), jnp.uint32)
                u = _uniform_from_bits(bits)
                hpre = jnp.where(u[0] < keep, hpre * (1.0 / keep), 0.0)
            hpre = jnp.maximum(
                jnp.dot(hpre.astype(weight_dtype), pre_w1[:],
                        preferred_element_type=jnp.float32) + pre_b1[:], 0.0)
            if drop > 0:
                hpre = jnp.where(u[1] < keep, hpre * (1.0 / keep), 0.0)

            # ---- LSTM1 on concat(prenet, context) via split matmuls
            ctx_now = ctx[:]
            z1 = (jnp.dot(hpre.astype(weight_dtype), l1_wp[:],
                          preferred_element_type=jnp.float32)
                  + jnp.dot(ctx_now.astype(weight_dtype), l1_wc[:],
                            preferred_element_type=jnp.float32)
                  + jnp.dot(h1[:].astype(weight_dtype), l1_wh[:],
                            preferred_element_type=jnp.float32)
                  + l1_b[:])
            i1, j1, f1, o1 = (z1[:, :U], z1[:, U:2 * U],
                              z1[:, 2 * U:3 * U], z1[:, 3 * U:])
            nc1 = jax.nn.sigmoid(f1) * c1[:] + jax.nn.sigmoid(i1) * jnp.tanh(j1)
            nh1 = jax.nn.sigmoid(o1) * jnp.tanh(nc1)
            c1[:] = (1 - zo) * nc1 + zo * c1[:]
            h1[:] = (1 - zo) * nh1 + zo * h1[:]

            z2 = (jnp.dot(h1[:].astype(weight_dtype), l2_wx[:],
                          preferred_element_type=jnp.float32)
                  + jnp.dot(h2[:].astype(weight_dtype), l2_wh[:],
                            preferred_element_type=jnp.float32)
                  + l2_b[:])
            i2, j2, f2, o2 = (z2[:, :U], z2[:, U:2 * U],
                              z2[:, 2 * U:3 * U], z2[:, 3 * U:])
            nc2 = jax.nn.sigmoid(f2) * c2[:] + jax.nn.sigmoid(i2) * jnp.tanh(j2)
            nh2 = jax.nn.sigmoid(o2) * jnp.tanh(nc2)
            c2[:] = (1 - zo) * nc2 + zo * c2[:]
            h2[:] = (1 - zo) * nh2 + zo * h2[:]
            out2 = h2[:]

            # ---- location-sensitive attention (attention.py:54-96): one
            # banded MXU matmul (conv+projection folded) + a 3-D VPU tanh /
            # v_a lane reduction. r3 reduced over A with a [Tp*A, Tp]
            # block-diagonal matmul (Tp x padding FLOPs) — the [B, Tp, A]
            # view costs only the useful work (VERDICT r3 item 5)
            q = jnp.dot(out2.astype(weight_dtype), wq[:],
                        preferred_element_type=jnp.float32)       # [B, A]
            loc = jnp.dot(cum[:].astype(weight_dtype), band_ref[:],
                          preferred_element_type=jnp.float32)     # [B, Tp*A]
            if energy_mode == "vmat":
                q_rep = pltpu.repeat(q, Tp, axis=1)               # [B, Tp*A]
                e2 = jnp.tanh(keys_ref[:] + q_rep + loc)
                energy = jnp.dot(e2.astype(weight_dtype), va_ref[:],
                                 preferred_element_type=jnp.float32)
            elif energy_mode == "dot":
                e3 = jnp.tanh(keys_ref[:] + q[:, None, :]
                              + loc.reshape(B, Tp, A))            # [B, Tp, A]
                energy = jax.lax.dot_general(
                    e3.astype(weight_dtype), va_ref[:],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[:, :, 0]  # [B, Tp]
            else:
                e3 = jnp.tanh(keys_ref[:] + q[:, None, :]
                              + loc.reshape(B, Tp, A))            # [B, Tp, A]
                energy = jnp.sum(e3 * va_ref[:].reshape(1, 1, A),
                                 axis=-1)                         # [B, Tp]

            if constraint:
                p = pmax[:, :1]
                forbidden = (idx_t < p - back) | (idx_t >= p + fwd)
                energy = jnp.where(forbidden, NEG_INF, energy)
            energy = jnp.where(mask > 0, energy, NEG_INF)
            if smoothing:
                sig = jax.nn.sigmoid(energy) * mask
                align = sig / jnp.sum(sig, axis=-1, keepdims=True)
            else:
                emax = jnp.max(energy, axis=-1, keepdims=True)
                ex = jnp.exp(energy - emax) * mask
                align = ex / jnp.sum(ex, axis=-1, keepdims=True)
            cum[:] = cum[:] + align
            if constraint:
                pmax[:, :1] = jnp.argmax(align, axis=-1,
                                         keepdims=True).astype(jnp.int32)
            # context = einsum('bt,btm->bm'): batched dot_general over the
            # 3-D memory (r4, useful FLOPs only) or the r3 block-diagonal
            # [B, B*Tp] x [B*Tp, M] dense matmul (B x padding FLOPs but the
            # same MXU pass count) — the r5 ablation measures both
            if blockdiag:
                a_rep = pltpu.repeat(align, B, axis=1)            # [B, B*Tp]
                new_ctx = jnp.dot(
                    (a_rep * smask_ref[:]).astype(weight_dtype), mem_ref[:],
                    preferred_element_type=jnp.float32)            # [B, M]
            else:
                new_ctx = jax.lax.dot_general(
                    align[:, None, :].astype(weight_dtype), mem_ref[:],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, 0, :]   # [B, M]
            ctx[:] = new_ctx

            # ---- fused frame+stop projection on concat(out2, context)
            proj = (jnp.dot(out2.astype(weight_dtype), proj_wo[:],
                            preferred_element_type=jnp.float32)
                    + jnp.dot(new_ctx.astype(weight_dtype), proj_wc[:],
                              preferred_element_type=jnp.float32)
                    + proj_b[:])                                  # [B, FO]
            frames, stops = proj[:, :r * mels], proj[:, r * mels:]
            out = jnp.concatenate(
                [frames, jax.nn.sigmoid(stops)], axis=-1)
            out_ref[t] = out
            if emit_alignments:
                align_out[t] = align.astype(align_out.dtype)
            xprev[:, :mels] = frames[:, (r - 1) * mels:]
            if K:
                # sticky per-stream stop flag: all (or any) of the r stop
                # probs above 0.5 (TacoTestHelper, helpers.py:51-56)
                sp = jax.nn.sigmoid(stops)
                fin = (jnp.max(sp, axis=-1) if stop_at_any
                       else jnp.min(sp, axis=-1)) > 0.5
                fired[:, 0] = jnp.maximum(fired[:, 0],
                                          fin.astype(jnp.float32))
            return 0

        if K:
            n_blocks = -(-steps // K)

            def blk_body(b, _):
                @pl.when(done[0, 0] == 0)
                def _():
                    jax.lax.fori_loop(b * K, jax.lax.min((b + 1) * K, steps),
                                      step_body, 0)
                    done[0, 0] = (jnp.min(fired[:, 0]) > 0.5).astype(jnp.int32)
                return 0

            jax.lax.fori_loop(0, n_blocks, blk_body, 0)
        else:
            jax.lax.fori_loop(0, steps, step_body, 0)

    n_weights = 15
    out_shapes = [jax.ShapeDtypeStruct((steps, B, FO), jnp.float32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if emit_alignments:
        out_shapes.append(
            jax.ShapeDtypeStruct((steps, B, Tp), jnp.bfloat16))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (5 + (1 if blockdiag else 0) + n_weights),
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((B, 128), jnp.float32),   # xprev
            pltpu.VMEM((B, U), jnp.float32),     # c1
            pltpu.VMEM((B, U), jnp.float32),     # h1
            pltpu.VMEM((B, U), jnp.float32),     # c2
            pltpu.VMEM((B, U), jnp.float32),     # h2
            pltpu.VMEM((B, M), jnp.float32),     # context
            pltpu.VMEM((B, Tp), jnp.float32),    # cumulative alignments
            pltpu.VMEM((B, 128), jnp.int32),     # prev max attention
            pltpu.VMEM((B, 128), jnp.float32),   # sticky stop flags
            pltpu.SMEM((1, 1), jnp.int32),       # all-streams-done flag
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )

    @jax.jit
    def run(dp: DecoderParams, keys, memory, mask, seed):
        wd = weight_dtype
        pad_t = Tp - keys.shape[1]
        keys = jnp.pad(keys, ((0, 0), (0, pad_t), (0, 0)))
        memory = jnp.pad(memory, ((0, 0), (0, pad_t), (0, 0)))
        if mask is None:
            mask = jnp.ones((B, T_in), bool)
        mask = jnp.pad(mask, ((0, 0), (0, pad_t))).astype(jnp.float32)
        band_a, va_op, keys_op = _attention_operands(dp, keys, Tp, wd,
                                                     energy_mode)
        if blockdiag:
            mem_op = memory.reshape(B * Tp, M).astype(wd)
            smask = (jnp.arange(B)[:, None]
                     == jnp.arange(B * Tp)[None, :] // Tp
                     ).astype(jnp.float32)
            ctx_ops = (smask,)
        else:
            mem_op = memory.astype(wd)                 # [B, Tp, M]
            ctx_ops = ()
        weights = (
            dp.pre_w0.astype(wd), dp.pre_b0.astype(jnp.float32),
            dp.pre_w1.astype(wd), dp.pre_b1.astype(jnp.float32),
            dp.l1_wp.astype(wd), dp.l1_wc.astype(wd), dp.l1_wh.astype(wd),
            dp.l1_b.astype(jnp.float32),
            dp.l2_wx.astype(wd), dp.l2_wh.astype(wd),
            dp.l2_b.astype(jnp.float32),
            dp.wq.astype(wd),
            dp.proj_wo.astype(wd), dp.proj_wc.astype(wd),
            dp.proj_b.astype(jnp.float32))
        outs = call(jnp.asarray([seed], jnp.int32),
                    keys_op, mem_op, mask, band_a, va_op, *ctx_ops, *weights)
        out = outs[0]
        frames = (out[:, :, :r * mels].transpose(1, 0, 2)
                  .reshape(B, steps * r, mels))
        stops = out[:, :, r * mels:].transpose(1, 0, 2).reshape(B, steps * r)
        aligns = None
        if emit_alignments:
            aligns = (outs[1][:, :, :T_in].astype(jnp.float32)
                      .transpose(1, 2, 0))                 # [B, T_in, steps]
        return frames, stops, aligns

    return run
