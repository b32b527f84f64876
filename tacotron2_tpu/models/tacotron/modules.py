"""Tacotron building blocks (flax.linen), TPU-first.

Functional re-designs of the blocks in reference
code/tacotron/models/modules.py — conv stacks, zoneout LSTM, prenet, postnet,
CBHG/highway, reference encoders, style classifiers. RNNs are `lax.scan`s over
time with sequence-length masking; all matmuls are batch-first and
MXU-shaped.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# TF-compatible defaults: glorot_uniform kernels, TF batch-norm epsilon.
glorot = nn.initializers.glorot_uniform()
BN_EPS = 1e-3
BN_MOMENTUM = 0.99


def vec_glorot(key, shape, dtype=jnp.float32):
    """Xavier-uniform for 1-D vectors (TF xavier_initializer on [n] shapes)."""
    limit = (6.0 / sum(shape)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -limit, limit)


class ConvBlock(nn.Module):
    """conv1d → batchnorm → activation → dropout, with before/after BN switch.

    Reference: conv1d (modules.py:485-497). 'after': activation inside conv,
    then BN; 'before': conv → BN → activation. Dropout only in training.
    """

    channels: int
    kernel_size: int
    activation: Optional[Callable] = nn.relu
    drop_rate: float = 0.5
    bnorm: str = "after"
    # compute dtype for the conv matmuls (bf16 under mixed precision);
    # BatchNorm statistics/normalization stay float32 either way
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        act = self.activation if self.activation is not None else (lambda v: v)
        h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    kernel_init=glorot, dtype=self.dtype)(x)
        # BatchNorm outputs stay f32 (measured: casting them bf16 is perf-
        # neutral at B=96x400 — XLA already fuses the normalization into the
        # conv epilogue — so keep the extra mantissa)
        if self.bnorm == "after":
            h = act(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS)(h)
        else:
            h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS)(h)
            h = act(h)
        if self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        return h


class EncoderConvStack(nn.Module):
    """3× conv1d(k=5, 512) stack (reference EncoderConvolutions, modules.py:251-280)."""

    num_layers: int = 3
    channels: int = 512
    kernel_size: int = 5
    drop_rate: float = 0.5
    bnorm: str = "after"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        for _ in range(self.num_layers):
            x = ConvBlock(self.channels, self.kernel_size, nn.relu,
                          self.drop_rate, self.bnorm,
                          dtype=self.dtype)(x, train=train)
        return x


# --------------------------------------------------------------------- LSTM


def lstm_step(params_kernel, params_bias, x, c, h, forget_bias: float = 1.0):
    """One LSTM step, TF LSTMCell gate order (i, j, f, o) with forget bias.

    x: [B, D_in], c/h: [B, U]. Returns (new_c, new_h).
    """
    z = jnp.concatenate([x, h], axis=-1) @ params_kernel + params_bias
    i, j, f, o = jnp.split(z, 4, axis=-1)
    new_c = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_c, new_h


class ZoneoutLSTMCell(nn.Module):
    """LSTM cell with zoneout on both c and h.

    Reference: ZoneoutLSTMCell (modules.py:187-248). Train: mix via a
    Bernoulli(1-z) mask on the state delta — note the reference's
    (1-z)·dropout(Δ, keep=1-z) algebraically reduces to mask·Δ (TF dropout
    rescales by 1/keep). Eval: EMA mix (1-z)·new + z·prev.
    """

    units: int
    zoneout: float = 0.1

    @nn.compact
    def __call__(self, carry, x, *, train: bool):
        c, h = carry
        in_dim = x.shape[-1] + self.units
        kernel = self.param("kernel", glorot, (in_dim, 4 * self.units))
        bias = self.param("bias", nn.initializers.zeros, (4 * self.units,))
        new_c, new_h = lstm_step(kernel, bias, x, c, h)
        z = self.zoneout
        if z > 0:
            if train:
                rng = self.make_rng("zoneout")
                kc, kh = jax.random.split(rng)
                mask_c = jax.random.bernoulli(kc, 1.0 - z, new_c.shape)
                mask_h = jax.random.bernoulli(kh, 1.0 - z, new_h.shape)
                c_out = jnp.where(mask_c, new_c, c)
                h_out = jnp.where(mask_h, new_h, h)
            else:
                c_out = (1 - z) * new_c + z * c
                h_out = (1 - z) * new_h + z * h
        else:
            c_out, h_out = new_c, new_h
        return (c_out, h_out), h_out


def _reverse_sequence(x, lengths):
    """Per-row reversal of the first `lengths` elements (TF reverse_sequence).

    x: [B, T, D], lengths: [B]. Padding stays in place.
    """
    T = x.shape[1]
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


class BiLSTMEncoder(nn.Module):
    """Bidirectional single-layer zoneout-LSTM (reference EncoderRNN, modules.py:283-323).

    Outputs [B, T, 2·units]; positions past `lengths` are zeroed, matching
    tf.nn.bidirectional_dynamic_rnn with sequence_length.
    """

    units: int = 256
    zoneout: float = 0.1

    @nn.compact
    def __call__(self, x, lengths, *, train: bool):
        B, T, _ = x.shape

        def run(cell, seq):
            # carry in ≥f32: the cell's f32 kernels promote a bf16 input
            # (e.g. from a bf16 conv stack) to f32 states, and scan requires
            # carry-in/carry-out dtypes to match
            cdt = jnp.promote_types(x.dtype, jnp.float32)
            carry0 = (jnp.zeros((B, self.units), cdt),
                      jnp.zeros((B, self.units), cdt))
            scan = nn.scan(
                lambda c, carry, xt: c(carry, xt, train=train),
                variable_broadcast="params",
                split_rngs={"params": False, "zoneout": True},
                in_axes=1, out_axes=1)
            _, ys = scan(cell, carry0, seq)
            return ys

        fw = run(ZoneoutLSTMCell(self.units, self.zoneout, name="fw"), x)
        bw_in = _reverse_sequence(x, lengths)
        bw = run(ZoneoutLSTMCell(self.units, self.zoneout, name="bw"), bw_in)
        bw = _reverse_sequence(bw, lengths)
        out = jnp.concatenate([fw, bw], axis=-1)
        mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, :, None]
        return jnp.where(mask, out, 0.0)


class GRUCell(nn.Module):
    """GRU cell with TF-compatible gate layout (r, z with bias-1 init; candidate tanh)."""

    units: int

    @nn.compact
    def __call__(self, h, x):
        in_dim = x.shape[-1] + self.units
        gate_k = self.param("gates_kernel", glorot, (in_dim, 2 * self.units))
        gate_b = self.param("gates_bias", nn.initializers.constant(1.0),
                            (2 * self.units,))
        cand_k = self.param("candidate_kernel", glorot, (in_dim, self.units))
        cand_b = self.param("candidate_bias", nn.initializers.zeros, (self.units,))
        gates = jax.nn.sigmoid(jnp.concatenate([x, h], -1) @ gate_k + gate_b)
        r, z = jnp.split(gates, 2, axis=-1)
        n = jnp.tanh(jnp.concatenate([x, r * h], -1) @ cand_k + cand_b)
        new_h = z * h + (1 - z) * n
        return new_h, new_h


class GRU(nn.Module):
    """Unidirectional GRU over [B, T, D] → (outputs [B, T, U], final [B, U])."""

    units: int

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        h0 = jnp.zeros((B, self.units), x.dtype)
        scan = nn.scan(lambda c, h, xt: c(h, xt), variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        final, ys = scan(GRUCell(self.units), h0, x)
        return ys, final


class BiGRU(nn.Module):
    """Bidirectional GRU (for CBHG / emt-ref sequence encoders)."""

    units: int

    @nn.compact
    def __call__(self, x, lengths=None):
        fw, _ = GRU(self.units, name="fw")(x)
        if lengths is None:
            bw_in = jnp.flip(x, axis=1)
            bw, _ = GRU(self.units, name="bw")(bw_in)
            bw = jnp.flip(bw, axis=1)
        else:
            bw_in = _reverse_sequence(x, lengths)
            bw, _ = GRU(self.units, name="bw")(bw_in)
            bw = _reverse_sequence(bw, lengths)
        return jnp.concatenate([fw, bw], axis=-1)


# ------------------------------------------------------------------- prenet


class Prenet(nn.Module):
    """2×FC(256)+ReLU with dropout ALWAYS on — also at inference; required for
    autoregressive diversity (reference Prenet, modules.py:326-357)."""

    layer_sizes: Sequence[int] = (256, 256)
    drop_rate: float = 0.5

    @nn.compact
    def __call__(self, x):
        for size in self.layer_sizes:
            x = nn.relu(nn.Dense(size, kernel_init=glorot)(x))
            x = nn.Dropout(self.drop_rate, deterministic=False)(x)
        return x


class Postnet(nn.Module):
    """5× conv1d(k=5, 512, tanh) — final layer linear (reference Postnet,
    modules.py:451-482)."""

    num_layers: int = 5
    channels: int = 512
    kernel_size: int = 5
    drop_rate: float = 0.5
    bnorm: str = "after"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        for _ in range(self.num_layers - 1):
            x = ConvBlock(self.channels, self.kernel_size, jnp.tanh,
                          self.drop_rate, self.bnorm,
                          dtype=self.dtype)(x, train=train)
        x = ConvBlock(self.channels, self.kernel_size, None,
                      self.drop_rate, self.bnorm,
                      dtype=self.dtype)(x, train=train)
        return x


class FrameProjection(nn.Module):
    """Dense to r·num_mels / num_mels (reference modules.py:392-418)."""

    shape: int
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.shape, kernel_init=glorot)(x)
        return self.activation(y) if self.activation else y


class StopProjection(nn.Module):
    """Dense to r logits; sigmoid applied only outside training
    (reference modules.py:421-448)."""

    shape: int = 1

    @nn.compact
    def __call__(self, x, *, apply_sigmoid: bool):
        y = nn.Dense(self.shape, kernel_init=glorot)(x)
        return jax.nn.sigmoid(y) if apply_sigmoid else y


# ------------------------------------------------------------------- CBHG


class HighwayNet(nn.Module):
    """H·T + x·(1-T) with T-bias init −1 (reference modules.py:110-122)."""

    units: int

    @nn.compact
    def __call__(self, x):
        H = nn.relu(nn.Dense(self.units, kernel_init=glorot, name="H")(x))
        T = jax.nn.sigmoid(nn.Dense(self.units, kernel_init=glorot,
                                    bias_init=nn.initializers.constant(-1.0),
                                    name="T")(x))
        return H * T + x * (1.0 - T)


class CBHG(nn.Module):
    """Conv-bank(1..K) + maxpool + projections + highway + BiGRU
    (reference modules.py:125-184); the mel→linear post-processing net."""

    K: int = 8
    conv_channels: int = 128
    pool_size: int = 2
    projections: Sequence[int] = (256, 80)
    projection_kernel_size: int = 3
    num_highway_layers: int = 4
    highway_units: int = 128
    rnn_units: int = 128
    bnorm: str = "after"

    @nn.compact
    def __call__(self, x, lengths=None, *, train: bool):
        bank = [ConvBlock(self.conv_channels, k, nn.relu, 0.0, self.bnorm)(x, train=train)
                for k in range(1, self.K + 1)]
        conv_out = jnp.concatenate(bank, axis=-1)

        # max-pool width pool_size, stride 1, SAME
        pad_l = (self.pool_size - 1) // 2
        pad_r = self.pool_size - 1 - pad_l
        padded = jnp.pad(conv_out, ((0, 0), (pad_l, pad_r), (0, 0)),
                         constant_values=-jnp.inf)
        pooled = jnp.max(
            jnp.stack([padded[:, i:i + conv_out.shape[1]] for i in range(self.pool_size)],
                      axis=0), axis=0)

        proj1 = ConvBlock(self.projections[0], self.projection_kernel_size,
                          nn.relu, 0.0, self.bnorm)(pooled, train=train)
        proj2 = ConvBlock(self.projections[1], self.projection_kernel_size,
                          None, 0.0, self.bnorm)(proj1, train=train)

        highway_input = proj2 + x
        if highway_input.shape[-1] != self.highway_units:
            highway_input = nn.Dense(self.highway_units, kernel_init=glorot)(highway_input)
        for i in range(self.num_highway_layers):
            highway_input = HighwayNet(self.highway_units, name=f"highway_{i+1}")(highway_input)
        return BiGRU(self.rnn_units)(highway_input, lengths)


# ------------------------------------------------------- reference encoders


class ReferenceEncoder(nn.Module):
    """6× conv2d(3×3, stride 2) over ref mel → GRU(128) → dense(128, tanh).

    Reference: modules.py:9-64. With `all_outputs=True` returns the full
    timestep sequence per `emt_ref_gru` mode ('gru' BiGRU concat, 'gru_multi'
    8 pooled GRU heads, 'none' raw conv features) — the Tacotron_emt_attn
    memory (tacotron_emt_attn.py).
    """

    filters: Sequence[int] = (32, 32, 64, 64, 128, 128)
    depth: int = 128
    all_outputs: bool = False
    emt_ref_gru: str = "gru"
    strides: Any = 2
    use_batch_norm: bool = True

    @nn.compact
    def __call__(self, inputs, *, train: bool):
        # inputs: [B, T, num_mels] → [B, T, mels, 1]
        x = inputs[..., None]
        for i, ch in enumerate(self.filters):
            s = self.strides[i] if isinstance(self.strides, (list, tuple)) else self.strides
            s = (s, s) if isinstance(s, int) else s
            x = nn.Conv(ch, (3, 3), strides=s, padding="SAME", kernel_init=glorot,
                        name=f"conv2d_{i}")(x)
            if self.use_batch_norm:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS)(x)
            x = nn.relu(x)
        B, T, F, C = x.shape
        x = x.reshape(B, T, F * C)

        if self.all_outputs:
            if self.emt_ref_gru == "gru":
                return BiGRU(self.depth)(x)
            if self.emt_ref_gru == "gru_multi":
                heads = []
                for i in range(8):
                    ys, _ = GRU(self.depth, name=f"gru_{i}")(x)
                    head = jnp.tanh(nn.Dense(128, kernel_init=glorot,
                                             name=f"dense_{i}")(ys[:, -1, :]))
                    heads.append(head[:, None, :])
                return jnp.concatenate(heads, axis=1)
            return x  # 'none': raw conv features

        ys, _ = GRU(self.depth)(x)
        return jnp.tanh(nn.Dense(128, kernel_init=glorot)(ys[:, -1, :]))


class ReferenceEncoderAdaIn(nn.Module):
    """AdaIN variant: speaker-ref conv features re-normalized with emotion-ref
    moments, 90/10 blend (reference modules.py:66-107)."""

    filters: Sequence[int] = (32, 32, 64, 64, 128, 128)
    depth: int = 128
    strides: Sequence[Tuple[int, int]] = ((2, 2), (2, 2), (1, 1), (1, 1), (1, 1), (1, 1))

    @nn.compact
    def __call__(self, inputs_spk, inputs_emt, *, train: bool):
        xs, xe = inputs_spk[..., None], inputs_emt[..., None]
        for i, ch in enumerate(self.filters):
            conv = nn.Conv(ch, (3, 3), strides=tuple(self.strides[i]), padding="SAME",
                           kernel_init=glorot, name=f"conv2d_{i}")
            xs, xe = nn.relu(conv(xs)), nn.relu(conv(xe))

        pre_norm = xs
        mean_s = xs.mean(axis=(1, 2), keepdims=True)
        var_s = xs.var(axis=(1, 2), keepdims=True)
        mean_e = xe.mean(axis=(1, 2), keepdims=True)
        var_e = xe.var(axis=(1, 2), keepdims=True)
        xs_norm = (xs - mean_s) * jax.lax.rsqrt(var_s + 1e-9) * var_e + mean_e
        xs = xs * 0.9 + xs_norm * 0.1

        B, T, F, C = xs.shape
        flat = xs.reshape(B, T, F * C)
        ys, _ = GRU(self.depth)(flat)
        state = jnp.tanh(nn.Dense(128, kernel_init=glorot)(ys[:, -1, :]))
        return state, pre_norm


class StyleEmbDisc(nn.Module):
    """1-dense classifier on a style embedding (reference modules.py:626-644)."""

    output_classes: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.output_classes, kernel_init=glorot)(x)


class StyleEmbDiscGRU(nn.Module):
    """GRU + dense classifier for sequence embeddings (reference modules.py:646-666)."""

    output_classes: int
    depth: int = 128

    @nn.compact
    def __call__(self, x):
        ys, _ = GRU(self.depth)(x)
        return nn.Dense(self.output_classes, kernel_init=glorot)(ys[:, -1, :])


# ------------------------------------------------------------ style attention


class MultiheadStyleAttention(nn.Module):
    """GST multi-head attention (reference multihead_attention.py:5-132).

    q = conv1d(query), k = conv1d(value), v = value (tiled per head, NOT
    projected — so each head outputs the full value dim and the combined
    context is num_heads·value_dim... combined along heads after attention).
    Scoring: 'mlp_attention' (normed-v tanh additive) or 'dot_attention'.
    """

    num_heads: int = 4
    num_units: int = 128
    attention_type: str = "mlp_attention"
    normalize: bool = True

    @nn.compact
    def __call__(self, query, value):
        # query: [B, Tq, Dq], value: [B, Tv, Dv]
        assert self.num_units % self.num_heads == 0
        q = nn.Dense(self.num_units, kernel_init=glorot, name="q_proj")(query)
        k = nn.Dense(self.num_units, kernel_init=glorot, name="k_proj")(value)
        B, Tq, _ = q.shape
        Tv = value.shape[1]
        hd = self.num_units // self.num_heads
        qs = q.reshape(B, Tq, self.num_heads, hd).transpose(0, 2, 1, 3)
        ks = k.reshape(B, Tv, self.num_heads, hd).transpose(0, 2, 1, 3)
        vs = jnp.broadcast_to(value[:, None], (B, self.num_heads, Tv, value.shape[-1]))

        if self.attention_type == "dot_attention":
            qk = jnp.einsum("bhqd,bhkd->bhqk", qs, ks)
            if self.normalize:
                qk *= hd ** -0.5
            weights = jax.nn.softmax(qk, axis=-1)
        elif self.attention_type == "mlp_attention":
            v_a = self.param("attention_v", vec_glorot, (hd,))
            if self.normalize:
                g = self.param("attention_g",
                               nn.initializers.constant((1.0 / hd) ** 0.5), ())
                b = self.param("attention_b", nn.initializers.zeros, (hd,))
                normed_v = g * v_a * jax.lax.rsqrt(jnp.sum(v_a ** 2))
                add = jnp.sum(normed_v * jnp.tanh(ks[:, :, None] + qs[:, :, :, None] + b),
                              axis=-1)  # [B, H, Tq, Tv]
            else:
                add = jnp.sum(v_a * jnp.tanh(ks[:, :, None] + qs[:, :, :, None]), axis=-1)
            weights = jax.nn.softmax(add, axis=-1)
        else:
            raise ValueError(self.attention_type)

        context = jnp.einsum("bhqk,bhkd->bhqd", weights, vs)
        context = context.transpose(0, 2, 1, 3).reshape(B, Tq, -1)
        return context
