"""WaveNet building blocks (flax), TPU-first, batch-time-channel layout.

Re-designs of reference code/wavenet_vocoder/models/modules.py:
- CausalConv / Conv1x1 (modules.py:184-389): left-padded dilated convs for
  training; the incremental path lives in sampler.py as ring-buffer taps +
  matmul (no per-step queue shifting — O(kernel) gathers instead of O(window)
  copies).
- ResidualConv1DGLU (modules.py:392-521): dilated conv → split gate →
  +local/global 1×1 → tanh·sigmoid → skip/residual 1×1 (+√0.5 scalings).
- Upsampling stack (modules.py:524-770): SubPixel (ICNR), Resize (NN+conv),
  ConvTranspose1D/2D, NearestNeighbor — all with the reference's
  checkerboard-free NN initialization and NN_scaler^(1/up_layers) scaling.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

glorot = nn.initializers.glorot_uniform()


def weight_normed(v, g):
    """Salimans-Kingma reparameterization: W = g · v/‖v‖ per output channel.

    Reference: WeightNorm wrapper (modules.py:44-182). v has the kernel's
    shape with the output channel last; g is [out].
    """
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(v ** 2, axis=axes, keepdims=True) + 1e-12)
    return v * (g / norm)


class CausalConv1D(nn.Module):
    """Dilated causal conv over [B, T, C]: left-pad (kw-1)·dilation, VALID.

    With `weight_norm`, the kernel is reparameterized W = g·v/‖v‖ and g is
    initialized so the initial W equals the glorot draw (init_scale applied),
    matching the reference's non-data-dependent init path.
    """

    filters: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    init_scale: float = 1.0
    dtype: Any = None                   # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) * self.dilation
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        if not self.weight_norm:
            return nn.Conv(self.filters, (self.kernel_size,),
                           kernel_dilation=(self.dilation,), padding="VALID",
                           use_bias=self.use_bias, kernel_init=glorot,
                           dtype=self.dtype)(x)
        in_c = x.shape[-1]
        v = self.param("v", glorot, (self.kernel_size, in_c, self.filters))
        g = self.param("g", lambda key, shape: jnp.sqrt(
            jnp.sum(v ** 2, axis=(0, 1))) * self.init_scale, (self.filters,))
        kernel = weight_normed(v, g)
        if self.dtype is not None:
            x, kernel = x.astype(self.dtype), kernel.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.filters,))
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        self.sow("intermediates", "wn_out", y)
        return y


class Conv1x1(nn.Module):
    """Pointwise conv — a Dense over the channel axis (optionally weight-normed)."""

    filters: int
    use_bias: bool = True
    weight_norm: bool = False
    init_scale: float = 1.0
    dtype: Any = None                   # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        if not self.weight_norm:
            return nn.Dense(self.filters, use_bias=self.use_bias,
                            kernel_init=glorot, dtype=self.dtype)(x)
        v = self.param("v", glorot, (x.shape[-1], self.filters))
        g = self.param("g", lambda key, shape: jnp.sqrt(
            jnp.sum(v ** 2, axis=0)) * self.init_scale, (self.filters,))
        kernel = weight_normed(v, g)
        if self.dtype is not None:
            x, kernel = x.astype(self.dtype), kernel.astype(self.dtype)
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.filters,))
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        self.sow("intermediates", "wn_out", y)
        return y


class ResidualConv1DGLU(nn.Module):
    """Gated residual block (reference modules.py:392-521).

    Returns (residual_out [B,T,R], skip [B,T,S]).
    """

    residual_channels: int
    gate_channels: int
    kernel_size: int
    skip_out_channels: int
    dilation: int = 1
    dropout: float = 0.05
    cin_channels: int = 80
    gin_channels: int = -1
    use_bias: bool = True
    residual_legacy: bool = True
    weight_norm: bool = False
    init_scale: float = 1.0
    dtype: Any = None                   # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, x, c=None, g=None, *, train: bool):
        wn, sc, dt = self.weight_norm, self.init_scale, self.dtype
        residual = x
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = CausalConv1D(self.gate_channels, self.kernel_size, self.dilation,
                         self.use_bias, wn, sc, dt, name="causal_conv")(x)
        a, b = jnp.split(x, 2, axis=-1)

        if c is not None:
            ca, cb = jnp.split(
                Conv1x1(self.gate_channels, self.use_bias, wn, sc, dt,
                        name="cin_conv")(c), 2, axis=-1)
            a, b = a + ca, b + cb
        if g is not None:
            ga, gb = jnp.split(
                Conv1x1(self.gate_channels, self.use_bias, wn, sc, dt,
                        name="gin_conv")(g), 2, axis=-1)
            a, b = a + ga, b + gb

        x = jnp.tanh(a) * jax.nn.sigmoid(b)
        s = Conv1x1(self.skip_out_channels, self.use_bias, wn, sc, dt,
                    name="skip_conv")(x)
        x = Conv1x1(self.residual_channels, self.use_bias, wn, sc, dt,
                    name="out_conv")(x)
        if self.residual_legacy:
            x = (x + residual) * np.sqrt(0.5)
        else:
            x = x + residual
        return x, s


# ------------------------------------------------------------------ upsampling
# All upsamplers map mel features [B, T_mel, M] -> [B, T_mel * prod(scales), M].
# Internally they use the reference's 'image' view [B, freq(M), time, ch].


def _nn_init_kernel_2d(kernel_size: Tuple[int, int], time_overlap: int,
                       scaler: float, in_c: int, out_c: int) -> np.ndarray:
    """Checkerboard-free init (reference SubPixel/Resize _init_kernel)."""
    kh, kw = kernel_size
    k = np.zeros((kh, kw), dtype=np.float32)
    i = kh // 2
    js = [kw // 2 - 1, kw // 2] if kw % 2 == 0 else [kw // 2]
    for j in js:
        k[i, j] = 1.0 / max(time_overlap, 1.0) if kw % 2 == 0 else 1.0
    k = k * scaler
    return np.tile(k[:, :, None, None], (1, 1, in_c, out_c))


class SubPixelUpsample(nn.Module):
    """Conv + time-axis periodic shuffle (reference SubPixelConvolution,
    modules.py:539-654). Default upsampler."""

    scale: int
    freq_kernel: int = 3
    time_kernel: int = 3
    nn_init: bool = True
    nn_scaler_pow: float = 1.0  # NN_scaler ** (1/up_layers)

    @nn.compact
    def __call__(self, img):
        # img: [B, freq, T, 1]
        conv_filters = self.scale
        if self.nn_init:
            init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _nn_init_kernel_2d((self.freq_kernel, self.time_kernel),
                                   self.time_kernel // self.scale,
                                   self.nn_scaler_pow, shape[2], shape[3]))
        else:
            init = glorot
        y = nn.Conv(conv_filters, (self.freq_kernel, self.time_kernel),
                    padding="SAME", kernel_init=init)(img)
        # periodic shuffle on time axis: [B, F, T, r] -> [B, F, T*r, 1]
        B, F, T, r = y.shape
        y = y.reshape(B, F, T * r, 1)
        return y


class ResizeUpsample(nn.Module):
    """NN time-resize then conv (reference ResizeConvolution, modules.py:657-695)."""

    scale: int
    freq_kernel: int = 3
    nn_init: bool = True
    nn_scaler_pow: float = 1.0

    @nn.compact
    def __call__(self, img):
        # [B, F, T, 1] -> repeat time
        y = jnp.repeat(img, self.scale, axis=2)
        tk = self.scale
        if self.nn_init:
            init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _nn_init_kernel_2d((self.freq_kernel, tk), tk // self.scale,
                                   self.nn_scaler_pow, shape[2], shape[3]))
        else:
            init = glorot
        return nn.Conv(1, (self.freq_kernel, tk), padding="SAME",
                       kernel_init=init)(y)


class ConvTranspose1DUpsample(nn.Module):
    """Channel-preserving 1-D transposed conv (reference ConvTranspose1D,
    modules.py:697-733): operates on [B, T, M] directly."""

    scale: int
    channels: int
    nn_init: bool = True
    nn_scaler_pow: float = 1.0

    @nn.compact
    def __call__(self, x):
        # x: [B, T, M]
        if self.nn_init:
            def init(key, shape, dtype=jnp.float32):
                # shape [kw, in, out]: identity across channels
                kw, cin, cout = shape
                eye = np.eye(cin, cout, dtype=np.float32)[None]
                k = np.tile(eye, (kw, 1, 1))
                if kw % 2 == 0:
                    k = k / max(float(kw // self.scale), 1.0)
                return jnp.asarray(k * self.nn_scaler_pow)
        else:
            init = glorot
        return nn.ConvTranspose(self.channels, (self.scale,),
                                strides=(self.scale,), padding="SAME",
                                kernel_init=init)(x)


class ConvTranspose2DUpsample(nn.Module):
    """1-channel 2-D transposed conv over the mel 'image' (reference
    ConvTranspose2D, modules.py:736-770)."""

    scale: int
    freq_kernel: int = 3
    nn_init: bool = True
    nn_scaler_pow: float = 1.0

    @nn.compact
    def __call__(self, img):
        kh, kw = self.freq_kernel, self.scale
        if self.nn_init:
            def init(key, shape, dtype=jnp.float32):
                k = np.zeros((kh, kw), np.float32)
                overlap = kw // self.scale
                i = kh // 2
                k[i, :] = 1.0 / max(overlap, 1.0) if kw % 2 == 0 else 1.0
                k = np.tile(k[:, :, None, None], (1, 1, shape[2], shape[3]))
                return jnp.asarray(k * self.nn_scaler_pow)
        else:
            init = glorot
        return nn.ConvTranspose(1, (kh, kw), strides=(1, self.scale),
                                padding="SAME", kernel_init=init)(img)


class UpsampleNetwork(nn.Module):
    """Chain of upsampling layers: mel [B, T_mel, M] → [B, T_mel·hop, M].

    Reference: WaveNet.__init__ upsample_conv assembly (wavenet.py:162-205).
    """

    upsample_type: str = "SubPixel"
    scales: Sequence[int] = (11, 25)
    freq_kernel: int = 3
    cin_channels: int = 80
    activation: Optional[str] = "Relu"
    leaky_alpha: float = 0.4
    nn_init: bool = True
    nn_scaler: float = 0.3

    @nn.compact
    def __call__(self, c):
        # c: [B, T_mel, M]
        up_layers = len(self.scales)
        pow_scaler = self.nn_scaler ** (1.0 / up_layers)

        def act(x):
            if self.activation == "Relu":
                return nn.relu(x)
            if self.activation == "LeakyRelu":
                return nn.leaky_relu(x, self.leaky_alpha)
            return x

        if self.upsample_type == "NearestNeighbor":
            hop = int(np.prod(self.scales))
            return jnp.repeat(c, hop, axis=1)

        if self.upsample_type == "1D":
            x = c
            for i, s in enumerate(self.scales):
                x = act(ConvTranspose1DUpsample(
                    s, self.cin_channels, self.nn_init, pow_scaler,
                    name=f"up_{i}")(x))
            return x

        # image view [B, freq, T, 1]
        img = jnp.transpose(c, (0, 2, 1))[..., None]
        for i, s in enumerate(self.scales):
            if self.upsample_type == "SubPixel":
                img = SubPixelUpsample(s, self.freq_kernel, 3, self.nn_init,
                                       pow_scaler, name=f"up_{i}")(img)
            elif self.upsample_type == "Resize":
                img = ResizeUpsample(s, self.freq_kernel, self.nn_init,
                                     pow_scaler, name=f"up_{i}")(img)
            elif self.upsample_type == "2D":
                img = ConvTranspose2DUpsample(s, self.freq_kernel, self.nn_init,
                                              pow_scaler, name=f"up_{i}")(img)
            else:
                raise ValueError(self.upsample_type)
            img = act(img)
        # [B, freq, T_up, 1] -> [B, T_up, freq]
        return jnp.transpose(jnp.squeeze(img, -1), (0, 2, 1))
