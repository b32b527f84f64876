"""Fused Pallas kernels for the WaveNet TRAINING gated-conv stack (fwd+bwd).

The XLA path (models/wavenet/model.py body(), reference wavenet.py:650-721)
runs the 20-layer dilated stack at ~57 TF/s fwd+bwd on v5e — each layer's
dilated conv, gate, and 1x1s are separate HLO ops with [B,T,C] activations
round-tripping HBM, and the per-layer dropout masks (threefry) alone cost
~20% of the step. This module runs the whole residual stack as streaming
Pallas kernels:

- layout: activations live as 2-D [T*B, C] with row = t*B + b, so a dilation
  shift of d samples is a row shift of d*B — conv taps become THREE static
  row-sliced matmuls on the MXU, no gathers, no layout changes;
- the time axis is tiled (grid over T/Tt tiles, sequential); each layer
  carries a [2*d*B, C] left-halo of its (post-dropout) input across grid
  steps in VMEM scratch — the training-time analog of the sampler kernel's
  delay lines (ops/wavenet_kernel.py);
- the whole stack's weights (~7 MB bf16) stay VMEM-resident; residuals stay
  in registers/VMEM between layers — HBM traffic is x0/cond in, skip out,
  plus the saved activations for backward;
- dropout (reference modules.py:480: dropout on each block input, train
  only) draws from the on-core PRNG, seeded per (tile, layer) so the
  backward pass regenerates the identical mask instead of storing it;
- backward is its own pair of kernels (custom_vjp): grid runs the tiles in
  REVERSE with per-layer right-halo carries of the conv-output gradient;
  the conv weight gradient uses the reindexed form
  dW_k = sum_t x_drop[t] * dy[t + off_k], so only tile-own rows of x_drop
  are ever needed; weight grads accumulate in f32 VMEM across all tiles.

The 20 layers are split into two halves (two fwd + two bwd kernels chained
through the layer-10 residual) to keep per-kernel VMEM (saved-activation
tiles + halos) under the v5e budget.

Saved activations per layer: x (pre-dropout block input), tanh(a), sigmoid(b)
— bf16, [T*B, 3*C] per layer — everything backward needs without recomputing
preactivations (which would require cross-tile mask/halo reconstruction).

Scope (falls back to the XLA path otherwise): scalar input, local cond on,
no global cond, kernel_size=3, residual==skip channels==128-lane friendly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config


class StackParams(NamedTuple):
    """Materialized (post weight-norm) stack weights, layer-stacked.

    L = number of layers; C = residual, G = gate (=2*half), S = skip,
    Ci = cin channels.
    """

    conv_w: jnp.ndarray   # [L*3*C, G]  rows (l, tap k, c)
    conv_b: jnp.ndarray   # [L, G]
    cin_w: jnp.ndarray    # [L*Ci, G]
    cin_b: jnp.ndarray    # [L, G]
    skip_w: jnp.ndarray   # [L*Ch, S]   Ch = G//2 gated channels
    skip_b: jnp.ndarray   # [L, S]
    out_w: jnp.ndarray    # [L*Ch, C]
    out_b: jnp.ndarray    # [L, C]


def extract_stack_params(layer_params: Sequence[dict], cfg: Config
                         ) -> StackParams:
    """Materialize per-layer flax params (weight-normed or plain) into
    matmul-ready stacked arrays. Differentiable (runs under jit/grad)."""
    from ..models.wavenet.modules import weight_normed
    wn = cfg.wavenet

    def wb(p):
        """(materialized weight, bias) for weight-normed or plain convs
        (plain nn.Conv/nn.Dense nest under Conv_0/Dense_0)."""
        if "v" in p:
            w = weight_normed(p["v"], p["g"])
            return w, p.get("bias", jnp.zeros(w.shape[-1]))
        inner = p.get("Conv_0", p.get("Dense_0", p))
        w = inner["kernel"]
        return w, inner.get("bias", jnp.zeros(w.shape[-1]))

    convs, cins, skips, outs = [], [], [], []
    conv_b, cin_b, skip_b, out_b = [], [], [], []
    for p in layer_params:
        cw, cb = wb(p["causal_conv"])                 # [3, C, G]
        convs.append(cw.reshape(-1, cw.shape[-1]))
        conv_b.append(cb)
        ci, cib = wb(p["cin_conv"])                   # [Ci, G]
        cins.append(ci)
        cin_b.append(cib)
        sk, skb = wb(p["skip_conv"])                  # [Ch, S]
        skips.append(sk)
        skip_b.append(skb)
        ow, ob = wb(p["out_conv"])                    # [Ch, C]
        outs.append(ow)
        out_b.append(ob)
    del wn
    return StackParams(
        conv_w=jnp.concatenate(convs, 0), conv_b=jnp.stack(conv_b),
        cin_w=jnp.concatenate(cins, 0), cin_b=jnp.stack(cin_b),
        skip_w=jnp.concatenate(skips, 0), skip_b=jnp.stack(skip_b),
        out_w=jnp.concatenate(outs, 0), out_b=jnp.stack(out_b))


def _skip_scales(cfg: Config):
    """Per-layer multiplier of each skip contribution in the final sum.

    model.body: skips = h_0, then skips = (skips + h_l) * sqrt(.5) per later
    layer (legacy), so s_0 scales by c^(L-1) and s_l (l>=1) by c^(L-l)."""
    L = len(cfg.wavenet.dilations)
    if not cfg.wavenet.legacy:
        return [1.0] * L
    c = float(np.sqrt(0.5))
    return [c ** (L - 1)] + [c ** (L - l) for l in range(1, L)]


def _uniform_from_bits(bits):
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return jnp.maximum(f - 1.0, 1e-20)


def _layer_seed(seed0, tile_idx, l):
    return seed0 + tile_idx * 7919 + l * 131


def _build_stack_fwd(cfg: Config, B: int, T: int, layers: Sequence[int],
                     Tt: int, *, weight_dtype=jnp.bfloat16,
                     acts_dtype=jnp.bfloat16, interpret: bool = False):
    """Forward kernel over one half of the stack.

    inputs:  x0 [T*B, C] f32 (block input of layers[0]), c2 [T*B, Ci] f32
    outputs: skip_part [T*B, S] f32, res_out [T*B, C] f32 (output of
             layers[-1]), acts [T*B, HL*3*C] bf16 (x, tanh a, sigmoid b per
             layer)
    """
    wn = cfg.wavenet
    C = wn.residual_channels
    G = wn.gate_channels
    Ch = G // 2
    S = wn.skip_out_channels
    Ci = wn.cin_channels
    drop = float(wn.dropout)
    keep = 1.0 - drop
    c_res = float(np.sqrt(0.5)) if wn.residual_legacy else 1.0
    scales = _skip_scales(cfg)
    dil = [int(cfg.wavenet.dilations[l]) for l in layers]
    HL = len(layers)
    assert T % Tt == 0
    nt = T // Tt
    Hmax = 2 * max(dil)
    rows = Tt * B

    def kernel(seed_ref, x_ref, c_ref,
               conv_w, conv_b, cin_w, cin_b, skip_w, skip_b, out_w, out_b,
               skip_out, res_out, acts_out,
               buf, cur, skip_acc, *halos):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for h in halos:
                h[:] = jnp.zeros_like(h)

        cur[:] = x_ref[:]
        cm = c_ref[:].astype(weight_dtype)
        skip_acc[:] = jnp.zeros((rows, S), jnp.float32)

        for j, l in enumerate(layers):
            d = dil[j]
            x = cur[:]
            # saved activations: x (pre-dropout input)
            acts_out[:, (3 * j) * C:(3 * j + 1) * C] = x.astype(acts_dtype)
            if drop > 0:
                pltpu.prng_seed(_layer_seed(seed_ref[0], i, l))
                bits = pltpu.bitcast(pltpu.prng_random_bits((rows, C)),
                                     jnp.uint32)
                u = _uniform_from_bits(bits)
                xd = jnp.where(u < keep, x * (1.0 / keep), 0.0)
            else:
                xd = x
            # halo buffer: [Hmax*B + rows, C]; halo rows at the bottom of the
            # halo region, tile rows after
            hb = 2 * d * B
            buf[Hmax * B - hb:Hmax * B] = halos[j][:hb]
            buf[Hmax * B:Hmax * B + rows] = xd.astype(weight_dtype)
            # next tile's halo = last 2d*B rows of (halo ++ tile)
            halos[j][:hb] = buf[Hmax * B + rows - hb:Hmax * B + rows]
            # taps: y[t] = sum_k xd[t - (2-k)d] Wk  -> row offsets k*d*B
            y = conv_b[j:j + 1, :] + cin_b[j:j + 1, :]
            for k in range(3):
                start = Hmax * B - hb + k * d * B
                y = y + jnp.dot(buf[start:start + rows],
                                conv_w[(3 * j + k) * C:(3 * j + k + 1) * C],
                                preferred_element_type=jnp.float32)
            y = y + jnp.dot(cm, cin_w[j * Ci:(j + 1) * Ci],
                            preferred_element_type=jnp.float32)
            ta = jnp.tanh(y[:, :Ch])
            sb = jax.nn.sigmoid(y[:, Ch:])
            acts_out[:, (3 * j + 1) * C:(3 * j + 2) * C] = ta.astype(acts_dtype)
            acts_out[:, (3 * j + 2) * C:(3 * j + 3) * C] = sb.astype(acts_dtype)
            h = (ta * sb).astype(weight_dtype)
            skip_acc[:] = skip_acc[:] + scales[l] * (
                jnp.dot(h, skip_w[j * Ch:(j + 1) * Ch],
                        preferred_element_type=jnp.float32)
                + skip_b[j:j + 1, :])
            cur[:] = c_res * (
                jnp.dot(h, out_w[j * Ch:(j + 1) * Ch],
                        preferred_element_type=jnp.float32)
                + out_b[j:j + 1, :] + x)

        skip_out[:] = skip_acc[:]
        res_out[:] = cur[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((rows, C), lambda g, *_: (g, 0)),       # x0
            pl.BlockSpec((rows, Ci), lambda g, *_: (g, 0)),      # c2
            pl.BlockSpec(memory_space=pltpu.VMEM),               # conv_w
            pl.BlockSpec(memory_space=pltpu.VMEM),               # conv_b
            pl.BlockSpec(memory_space=pltpu.VMEM),               # cin_w
            pl.BlockSpec(memory_space=pltpu.VMEM),               # cin_b
            pl.BlockSpec(memory_space=pltpu.VMEM),               # skip_w
            pl.BlockSpec(memory_space=pltpu.VMEM),               # skip_b
            pl.BlockSpec(memory_space=pltpu.VMEM),               # out_w
            pl.BlockSpec(memory_space=pltpu.VMEM),               # out_b
        ],
        out_specs=[
            pl.BlockSpec((rows, S), lambda g, *_: (g, 0)),       # skip
            pl.BlockSpec((rows, C), lambda g, *_: (g, 0)),       # res_out
            pl.BlockSpec((rows, HL * 3 * C), lambda g, *_: (g, 0)),  # acts
        ],
        scratch_shapes=(
            [pltpu.VMEM(((Hmax + Tt) * B, C), weight_dtype),     # buf
             pltpu.VMEM((rows, C), jnp.float32),                 # cur
             pltpu.VMEM((rows, S), jnp.float32)]                 # skip_acc
            + [pltpu.VMEM((2 * d * B, C), weight_dtype) for d in dil]),
    )
    out_shape = [
        jax.ShapeDtypeStruct((T * B, S), jnp.float32),
        jax.ShapeDtypeStruct((T * B, C), jnp.float32),
        jax.ShapeDtypeStruct((T * B, HL * 3 * C), acts_dtype),
    ]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )


def _build_stack_bwd(cfg: Config, B: int, T: int, layers: Sequence[int],
                     Tt: int, *, has_dres_in: bool,
                     weight_dtype=jnp.bfloat16, acts_dtype=jnp.bfloat16,
                     interpret: bool = False):
    """Backward kernel over one half of the stack (tiles in REVERSE).

    inputs:  dskip [T*B, S] f32, (dres_in [T*B, C] f32 if has_dres_in),
             acts [T*B, HL*3*C] bf16, c2 [T*B, Ci] f32, weights
    outputs: dx [T*B, C] f32 (grad wrt the half's input), dc2 [T*B, Ci] f32,
             and f32 weight grads (accumulated over all tiles)
    """
    wn = cfg.wavenet
    C = wn.residual_channels
    G = wn.gate_channels
    Ch = G // 2
    S = wn.skip_out_channels
    Ci = wn.cin_channels
    drop = float(wn.dropout)
    keep = 1.0 - drop
    c_res = float(np.sqrt(0.5)) if wn.residual_legacy else 1.0
    scales = _skip_scales(cfg)
    dil = [int(cfg.wavenet.dilations[l]) for l in layers]
    HL = len(layers)
    assert T % Tt == 0
    nt = T // Tt
    Hmax = 2 * max(dil)
    rows = Tt * B

    def kernel(seed_ref, *refs):
        n_in = 3 + (1 if has_dres_in else 0) + 8
        ins = refs[:n_in]
        if has_dres_in:
            (dskip_ref, dres_ref, acts_ref, c_ref) = ins[:4]
            weights = ins[4:]
        else:
            (dskip_ref, acts_ref, c_ref) = ins[:3]
            dres_ref = None
            weights = ins[3:]
        (conv_w, conv_b, cin_w, cin_b, skip_w, skip_b, out_w, out_b) = weights
        outs = refs[n_in:n_in + 10]
        (dx_out, dc_out, dconv_w, dconv_b, dcin_w, dcin_b,
         dskip_w, dskip_b, dout_w, dout_b) = outs
        scratch = refs[n_in + 10:]
        (buf2, cur_dres, dc_acc) = scratch[:3]
        halos = scratch[3:]

        g = pl.program_id(0)
        i = nt - 1 - g  # forward tile index

        @pl.when(g == 0)
        def _():
            for h in halos:
                h[:] = jnp.zeros_like(h)
            dconv_w[:] = jnp.zeros_like(dconv_w)
            dconv_b[:] = jnp.zeros_like(dconv_b)
            dcin_w[:] = jnp.zeros_like(dcin_w)
            dcin_b[:] = jnp.zeros_like(dcin_b)
            dskip_w[:] = jnp.zeros_like(dskip_w)
            dskip_b[:] = jnp.zeros_like(dskip_b)
            dout_w[:] = jnp.zeros_like(dout_w)
            dout_b[:] = jnp.zeros_like(dout_b)

        if dres_ref is not None:
            cur_dres[:] = dres_ref[:]
        else:
            cur_dres[:] = jnp.zeros((rows, C), jnp.float32)
        dskip = dskip_ref[:]
        cm = c_ref[:].astype(weight_dtype)
        dc_acc[:] = jnp.zeros((rows, Ci), jnp.float32)

        for j in reversed(range(HL)):
            l = layers[j]
            d = dil[j]
            hb = 2 * d * B
            x = acts_ref[:, (3 * j) * C:(3 * j + 1) * C].astype(jnp.float32)
            ta = acts_ref[:, (3 * j + 1) * C:(3 * j + 2) * C].astype(jnp.float32)
            sb = acts_ref[:, (3 * j + 2) * C:(3 * j + 3) * C].astype(jnp.float32)
            h = ta * sb
            hw = h.astype(weight_dtype)

            dres = cur_dres[:]                       # grad wrt layer output
            dsk = scales[l] * dskip                  # grad wrt this skip term
            # wgrads of the two 1x1s (contraction over rows on the MXU)
            dout_w[j * Ch:(j + 1) * Ch] += jnp.dot(
                hw.T, (c_res * dres).astype(weight_dtype),
                preferred_element_type=jnp.float32)
            dout_b[j:j + 1, :] += jnp.sum(c_res * dres, axis=0,
                                          keepdims=True)
            dskip_w[j * Ch:(j + 1) * Ch] += jnp.dot(
                hw.T, dsk.astype(weight_dtype),
                preferred_element_type=jnp.float32)
            dskip_b[j:j + 1, :] += jnp.sum(dsk, axis=0, keepdims=True)
            # dh, gate grads
            dh = (jnp.dot((c_res * dres).astype(weight_dtype),
                          out_w[j * Ch:(j + 1) * Ch].T,
                          preferred_element_type=jnp.float32)
                  + jnp.dot(dsk.astype(weight_dtype),
                            skip_w[j * Ch:(j + 1) * Ch].T,
                            preferred_element_type=jnp.float32))
            da = dh * sb * (1.0 - ta * ta)
            db = dh * ta * sb * (1.0 - sb)
            dyw_a = da.astype(weight_dtype)
            dyw_b = db.astype(weight_dtype)
            # bias grads (conv bias and cin bias both add to y)
            dysum_a = jnp.sum(da, axis=0, keepdims=True)
            dysum_b = jnp.sum(db, axis=0, keepdims=True)
            dconv_b[j:j + 1, :Ch] += dysum_a
            dconv_b[j:j + 1, Ch:] += dysum_b
            dcin_b[j:j + 1, :Ch] += dysum_a
            dcin_b[j:j + 1, Ch:] += dysum_b
            # cin wgrad + dcond
            dcin_w[j * Ci:(j + 1) * Ci, :Ch] += jnp.dot(
                cm.T, dyw_a, preferred_element_type=jnp.float32)
            dcin_w[j * Ci:(j + 1) * Ci, Ch:] += jnp.dot(
                cm.T, dyw_b, preferred_element_type=jnp.float32)
            dc_acc[:] = (dc_acc[:]
                         + jnp.dot(dyw_a, cin_w[j * Ci:(j + 1) * Ci, :Ch].T,
                                   preferred_element_type=jnp.float32)
                         + jnp.dot(dyw_b, cin_w[j * Ci:(j + 1) * Ci, Ch:].T,
                                   preferred_element_type=jnp.float32))

            # conv-output-grad buffer with RIGHT halo: rows [0:rows] = this
            # tile's dy, rows [rows:rows+hb] = halo from later tiles
            buf2[:rows, :Ch] = dyw_a
            buf2[:rows, Ch:] = dyw_b
            buf2[rows:rows + hb] = halos[j][:hb]
            # next (earlier) tile's halo = first 2d*B rows of (tile ++ halo)
            halos[j][:hb] = buf2[:hb]

            # regenerate this tile's dropout mask (same per-(tile,layer) seed)
            if drop > 0:
                pltpu.prng_seed(_layer_seed(seed_ref[0], i, l))
                bits = pltpu.bitcast(pltpu.prng_random_bits((rows, C)),
                                     jnp.uint32)
                u = _uniform_from_bits(bits)
                mask = (u < keep).astype(jnp.float32) * (1.0 / keep)
                xd = x * mask
            else:
                xd = x
            xdw = xd.astype(weight_dtype)

            # conv wgrad, reindexed: dW_k = sum_t xd[t] dy[t + (2-k)d]
            # and dxd[t] = sum_k dy[t + (2-k)d] Wk^T
            dxd = jnp.zeros((rows, C), jnp.float32)
            for k in range(3):
                off = (2 - k) * d * B
                dy_k = buf2[off:off + rows]
                dconv_w[(3 * j + k) * C:(3 * j + k + 1) * C, :] += jnp.dot(
                    xdw.T, dy_k, preferred_element_type=jnp.float32)
                dxd = dxd + jnp.dot(
                    dy_k, conv_w[(3 * j + k) * C:(3 * j + k + 1) * C].T,
                    preferred_element_type=jnp.float32)
            if drop > 0:
                dxd = dxd * mask
            # residual identity path + dropout/conv path
            cur_dres[:] = c_res * dres + dxd

        dx_out[:] = cur_dres[:]
        dc_out[:] = dc_acc[:]

    rev = lambda g, *_: (nt - 1 - g, 0)
    in_specs = [pl.BlockSpec((rows, S), rev)]                    # dskip
    if has_dres_in:
        in_specs.append(pl.BlockSpec((rows, C), rev))            # dres_in
    in_specs += [
        pl.BlockSpec((rows, HL * 3 * C), rev),                   # acts
        pl.BlockSpec((rows, Ci), rev),                           # c2
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8              # weights
    acc = lambda g, *_: (0, 0)
    out_specs = [
        pl.BlockSpec((rows, C), rev),                            # dx
        pl.BlockSpec((rows, Ci), rev),                           # dc2
        pl.BlockSpec((HL * 3 * C, G), acc),
        pl.BlockSpec((HL, G), acc),
        pl.BlockSpec((HL * Ci, G), acc),
        pl.BlockSpec((HL, G), acc),
        pl.BlockSpec((HL * Ch, S), acc),
        pl.BlockSpec((HL, S), acc),
        pl.BlockSpec((HL * Ch, C), acc),
        pl.BlockSpec((HL, C), acc),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T * B, C), jnp.float32),
        jax.ShapeDtypeStruct((T * B, Ci), jnp.float32),
        jax.ShapeDtypeStruct((HL * 3 * C, G), jnp.float32),
        jax.ShapeDtypeStruct((HL, G), jnp.float32),
        jax.ShapeDtypeStruct((HL * Ci, G), jnp.float32),
        jax.ShapeDtypeStruct((HL, G), jnp.float32),
        jax.ShapeDtypeStruct((HL * Ch, S), jnp.float32),
        jax.ShapeDtypeStruct((HL, S), jnp.float32),
        jax.ShapeDtypeStruct((HL * Ch, C), jnp.float32),
        jax.ShapeDtypeStruct((HL, C), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM(((Tt + Hmax) * B, G), weight_dtype),     # buf2 (dy)
             pltpu.VMEM((rows, C), jnp.float32),                 # cur_dres
             pltpu.VMEM((rows, Ci), jnp.float32)]                # dc_acc
            + [pltpu.VMEM((2 * d * B, G), weight_dtype) for d in dil]),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )


def stack_supported(cfg: Config) -> bool:
    wn = cfg.wavenet
    return (wn.kernel_size == 3 and wn.cin_channels > 0
            and wn.gin_channels <= 0
            and wn.gate_channels == 2 * (wn.gate_channels // 2)
            and len(wn.dilations) >= 2)


@functools.lru_cache(maxsize=8)
def make_fused_stack(cfg: Config, B: int, T: int, *, Tt: int = 128,
                     weight_dtype_name: str = "bfloat16",
                     acts_dtype_name: str = "bfloat16",
                     interpret: bool = False):
    """Build fused_stack(sp, x0 [T*B, C], c2 [T*B, Ci], seed) -> skip
    [T*B, S] with a custom VJP producing (d_sp, d_x0, d_c2, None).

    T must be divisible by Tt (callers pad; see fused_stack_apply)."""
    wn = cfg.wavenet
    L = len(wn.dilations)
    half = L // 2
    lo = tuple(range(half))
    hi = tuple(range(half, L))
    wd = jnp.bfloat16 if weight_dtype_name == "bfloat16" else jnp.float32
    ad = jnp.bfloat16 if acts_dtype_name == "bfloat16" else jnp.float32
    fwd_lo = _build_stack_fwd(cfg, B, T, lo, Tt, weight_dtype=wd,
                              acts_dtype=ad, interpret=interpret)
    fwd_hi = _build_stack_fwd(cfg, B, T, hi, Tt, weight_dtype=wd,
                              acts_dtype=ad, interpret=interpret)
    bwd_hi = _build_stack_bwd(cfg, B, T, hi, Tt, has_dres_in=False,
                              weight_dtype=wd, acts_dtype=ad,
                              interpret=interpret)
    bwd_lo = _build_stack_bwd(cfg, B, T, lo, Tt, has_dres_in=True,
                              weight_dtype=wd, acts_dtype=ad,
                              interpret=interpret)
    C = wn.residual_channels
    G = wn.gate_channels
    Ch = G // 2
    Ci = wn.cin_channels

    def half_params(sp: StackParams, ls):
        a, b = ls[0], ls[-1] + 1
        return (sp.conv_w[a * 3 * C:b * 3 * C].astype(wd), sp.conv_b[a:b],
                sp.cin_w[a * Ci:b * Ci].astype(wd), sp.cin_b[a:b],
                sp.skip_w[a * Ch:b * Ch].astype(wd), sp.skip_b[a:b],
                sp.out_w[a * Ch:b * Ch].astype(wd), sp.out_b[a:b])

    @jax.custom_vjp
    def fused_stack(sp: StackParams, x0, c2, seed):
        seed_arr = jnp.asarray([seed], jnp.int32)
        skip_lo, res_mid, _ = fwd_lo(seed_arr, x0, c2, *half_params(sp, lo))
        skip_hi, _, _ = fwd_hi(seed_arr, res_mid, c2, *half_params(sp, hi))
        return skip_lo + skip_hi

    def fwd(sp, x0, c2, seed):
        seed_arr = jnp.asarray([seed], jnp.int32)
        skip_lo, res_mid, acts_lo = fwd_lo(seed_arr, x0, c2,
                                           *half_params(sp, lo))
        skip_hi, _, acts_hi = fwd_hi(seed_arr, res_mid, c2,
                                     *half_params(sp, hi))
        return skip_lo + skip_hi, (sp, c2, seed, acts_lo, acts_hi)

    def bwd(residuals, dskip):
        sp, c2, seed, acts_lo, acts_hi = residuals
        seed_arr = jnp.asarray([seed], jnp.int32)
        (dres_mid, dc_hi, dcw_hi, dcb_hi, dciw_hi, dcib_hi,
         dsw_hi, dsb_hi, dow_hi, dob_hi) = bwd_hi(
            seed_arr, dskip, acts_hi, c2, *half_params(sp, hi))
        (dx0, dc_lo, dcw_lo, dcb_lo, dciw_lo, dcib_lo,
         dsw_lo, dsb_lo, dow_lo, dob_lo) = bwd_lo(
            seed_arr, dskip, dres_mid, acts_lo, c2, *half_params(sp, lo))
        d_sp = StackParams(
            conv_w=jnp.concatenate([dcw_lo, dcw_hi], 0),
            conv_b=jnp.concatenate([dcb_lo, dcb_hi], 0),
            cin_w=jnp.concatenate([dciw_lo, dciw_hi], 0),
            cin_b=jnp.concatenate([dcib_lo, dcib_hi], 0),
            skip_w=jnp.concatenate([dsw_lo, dsw_hi], 0),
            skip_b=jnp.concatenate([dsb_lo, dsb_hi], 0),
            out_w=jnp.concatenate([dow_lo, dow_hi], 0),
            out_b=jnp.concatenate([dob_lo, dob_hi], 0))
        return d_sp, dx0, dc_lo + dc_hi, None

    fused_stack.defvjp(fwd, bwd)
    return fused_stack


def fused_stack_apply(cfg: Config, sp: StackParams, x0, c_up, seed, *,
                      Tt: int = 128, acts_dtype_name: str = "bfloat16",
                      interpret: bool = False):
    """[B, T, C] interface around make_fused_stack: transposes to the
    kernel's row-interleaved [T*B, *] layout, pads T to a Tt multiple (the
    causal left-pad means appended rows never influence real rows), and
    returns skips [B, T, S]."""
    B, T, C = x0.shape
    Tp = ((T + Tt - 1) // Tt) * Tt
    wdn = ("bfloat16" if cfg.wavenet.compute_dtype == "bfloat16"
           else "float32")
    fn = make_fused_stack(cfg, B, Tp, Tt=Tt, weight_dtype_name=wdn,
                          acts_dtype_name=acts_dtype_name,
                          interpret=interpret)
    pad = Tp - T
    x0f = x0.astype(jnp.float32)
    cf = c_up.astype(jnp.float32)
    if pad:
        x0f = jnp.pad(x0f, ((0, 0), (0, pad), (0, 0)))
        cf = jnp.pad(cf, ((0, 0), (0, pad), (0, 0)))
    x2 = x0f.transpose(1, 0, 2).reshape(Tp * B, C)
    c2 = cf.transpose(1, 0, 2).reshape(Tp * B, cf.shape[-1])
    skip = fn(sp, x2, c2, seed)
    S = skip.shape[-1]
    skip = skip.reshape(Tp, B, S).transpose(1, 0, 2)
    return skip[:, :T]
