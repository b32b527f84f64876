"""Fast autoregressive WaveNet synthesis: ring-buffer caches in a lax.scan.

TPU re-design of the reference's incremental path (wavenet.py:724-911 +
CausalConv1D.incremental_step, modules.py:270-333). The reference shifts a
[B, window, C] "convolution queue" by one sample per layer per step (O(window)
copies); here each layer keeps a fixed ring buffer of width
(kw-1)·dilation + 1 and the dilated conv reads exactly `kw` taps via modular
indexing — O(kw) gathers + one [B, kw·C]×[kw·C, gate] matmul per layer per
step. The whole sample loop is one `lax.scan`, batch-parallel, jit-compiled
once per (batch, length) bucket.

Works on the raw param pytree of the trained flax WaveNet (model.py) so the
same weights serve training and synthesis; structure assumptions are
documented in `extract_sampler_params`.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config
from ...ops.mulaw import is_mulaw_quantize, is_scalar_input
from . import distributions as D


class LayerParams(NamedTuple):
    conv_w: jnp.ndarray        # [kw·R, gate] linearized causal-conv weight
    conv_b: Optional[jnp.ndarray]
    cin_w: Optional[jnp.ndarray]   # [cin, gate]
    cin_b: Optional[jnp.ndarray]
    gin_w: Optional[jnp.ndarray]
    gin_b: Optional[jnp.ndarray]
    skip_w: jnp.ndarray
    skip_b: Optional[jnp.ndarray]
    out_w: jnp.ndarray
    out_b: Optional[jnp.ndarray]


class SamplerParams(NamedTuple):
    first_w: jnp.ndarray
    first_b: jnp.ndarray
    layers: Tuple[LayerParams, ...]
    final1_w: jnp.ndarray
    final1_b: jnp.ndarray
    final2_w: jnp.ndarray
    final2_b: jnp.ndarray


def _effective_kernel(p):
    """Resolve plain or weight-normed params to the effective kernel.

    Weight norm (modules.weight_normed): W = g·v/‖v‖ per output channel.
    """
    if "kernel" in p:
        return p["kernel"]
    v, g = p["v"], p["g"]
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(v ** 2, axis=axes, keepdims=True) + 1e-12)
    return v * (g / norm)


def _dense(p):
    if "Dense_0" in p:
        p = p["Dense_0"]
    return _effective_kernel(p), p.get("bias")


def extract_sampler_params(params, cfg: Config) -> SamplerParams:
    """Flatten the flax WaveNet param tree into matmul-ready arrays.

    Param layout produced by model.WaveNet: Conv1x1 → Dense_0; CausalConv1D →
    Conv_0 with kernel [kw, in, out] (flax Conv convention; tap j multiplies
    x_{t-(kw-1-j)·d}, so flattening in j order matches oldest→newest taps).
    """
    wn = cfg.wavenet
    layers = []
    for i in range(wn.layers):
        p = params[f"residual_block_{i}"]
        cc = p["causal_conv"]
        if "Conv_0" in cc:
            ck, conv_b = cc["Conv_0"]["kernel"], cc["Conv_0"].get("bias")
        else:  # weight-normed causal conv (v/g at module level)
            ck, conv_b = _effective_kernel(cc), cc.get("bias")
        kw, R, gate = ck.shape                             # [kw, R, gate]
        conv_w = ck.reshape(kw * R, gate)
        cin_w = cin_b = gin_w = gin_b = None
        if "cin_conv" in p:
            cin_w, cin_b = _dense(p["cin_conv"])
        if "gin_conv" in p:
            gin_w, gin_b = _dense(p["gin_conv"])
        skip_w, skip_b = _dense(p["skip_conv"])
        out_w, out_b = _dense(p["out_conv"])
        layers.append(LayerParams(conv_w, conv_b, cin_w, cin_b, gin_w, gin_b,
                                  skip_w, skip_b, out_w, out_b))
    fw, fb = _dense(params["input_convolution"])
    f1w, f1b = _dense(params["final_convolution_1"])
    f2w, f2b = _dense(params["final_convolution_2"])
    return SamplerParams(fw, fb, tuple(layers), f1w, f1b, f2w, f2b)


def _ring_widths(cfg: Config):
    wn = cfg.wavenet
    return [(wn.kernel_size - 1) * d + 1 for d in wn.dilations]


def incremental_sample(params, cfg: Config, c_up: jnp.ndarray, key,
                       g_vec: Optional[jnp.ndarray] = None,
                       initial_input: Optional[jnp.ndarray] = None,
                       test_inputs: Optional[jnp.ndarray] = None):
    """Generate waveform samples autoregressively.

    params: flax 'params' tree of model.WaveNet;
    c_up: [B, T, cin] upsampled local conditioning (call model.upsample first);
    g_vec: [B, gin] global features or None; test_inputs: [B, T, in_dim]
    ground-truth override (debug/eval teacher forcing, wavenet.py:745-760).

    Returns (samples [B, T], y_hat [B, T, out_channels]).
    """
    wn = cfg.wavenet
    sp = extract_sampler_params(params, cfg)
    B, T, _ = c_up.shape
    kw = wn.kernel_size
    R = wn.residual_channels
    dilations = wn.dilations
    widths = _ring_widths(cfg)
    scalar = is_scalar_input(wn.input_type)
    in_dim = 1 if scalar else wn.quantize_channels
    legacy_scale = np.sqrt(0.5).astype(np.float32)

    if initial_input is None:
        x0 = jnp.zeros((B, in_dim), jnp.float32)
        if not scalar:
            x0 = x0.at[:, 127].set(1.0)  # mulaw zero
    else:
        x0 = initial_input

    queues = tuple(jnp.zeros((B, w, R), jnp.float32) for w in widths)
    c_tm = jnp.swapaxes(c_up, 0, 1)  # [T, B, cin]
    tests_tm = None if test_inputs is None else jnp.swapaxes(test_inputs, 0, 1)

    def step(carry, xs):
        queues, x_in = carry
        t, ct = xs[0], xs[1]
        test_t = xs[2] if len(xs) > 2 else None

        x = x_in @ sp.first_w + sp.first_b   # [B, R]

        skips = None
        new_queues = []
        for l, (lp, q, d, w) in enumerate(zip(sp.layers, queues, dilations,
                                              widths)):
            # write current residual input into the ring
            pos = jnp.mod(t, w)
            q = jax.lax.dynamic_update_slice(q, x[:, None, :], (0, pos, 0))
            # gather kw taps: kernel index j reads x_{t-(kw-1-j)·d}
            tap_pos = [jnp.mod(t - (kw - 1 - j) * d, w) for j in range(kw)]
            taps = jnp.concatenate(
                [jax.lax.dynamic_slice(q, (0, p, 0), (B, 1, R))[:, 0, :]
                 for p in tap_pos], axis=-1)                       # [B, kw·R]
            conv = taps @ lp.conv_w
            if lp.conv_b is not None:
                conv = conv + lp.conv_b
            a, b = jnp.split(conv, 2, axis=-1)
            if lp.cin_w is not None:
                cc = ct @ lp.cin_w
                if lp.cin_b is not None:
                    cc = cc + lp.cin_b
                ca, cb = jnp.split(cc, 2, axis=-1)
                a, b = a + ca, b + cb
            if lp.gin_w is not None and g_vec is not None:
                gg = g_vec @ lp.gin_w
                if lp.gin_b is not None:
                    gg = gg + lp.gin_b
                ga, gb = jnp.split(gg, 2, axis=-1)
                a, b = a + ga, b + gb
            h = jnp.tanh(a) * jax.nn.sigmoid(b)
            s = h @ lp.skip_w
            if lp.skip_b is not None:
                s = s + lp.skip_b
            o = h @ lp.out_w
            if lp.out_b is not None:
                o = o + lp.out_b
            x = (o + x) * legacy_scale if wn.residual_legacy else o + x
            if skips is None:
                skips = s
            elif wn.legacy:
                skips = (skips + s) * legacy_scale
            else:
                skips = skips + s
            new_queues.append(q)

        y = jax.nn.relu(skips)
        y = jax.nn.relu(y @ sp.final1_w + sp.final1_b)
        y_hat = y @ sp.final2_w + sp.final2_b         # [B, out_channels]

        # sample next input (wavenet.py:855-880)
        step_key = jax.random.fold_in(key, t)
        if scalar:
            if wn.out_channels == 2:
                sample = D.sample_from_gaussian(
                    step_key, y_hat[:, None, :],
                    log_scale_min_gauss=wn.log_scale_min_gauss)[:, 0]
            else:
                sample = D.sample_from_discretized_mix_logistic(
                    step_key, y_hat[:, None, :],
                    log_scale_min=wn.log_scale_min)[:, 0]
            next_input = sample[:, None]
        else:
            idx = jax.random.categorical(step_key, y_hat, axis=-1)
            sample = idx.astype(jnp.float32)
            next_input = jax.nn.one_hot(idx, wn.quantize_channels)

        if test_t is not None:
            next_input = test_t
        return (tuple(new_queues), next_input), (sample, y_hat)

    xs = (jnp.arange(T), c_tm) if tests_tm is None \
        else (jnp.arange(T), c_tm, tests_tm)
    (_, _), (samples, y_hats) = jax.lax.scan(step, (queues, x0), xs)
    return jnp.swapaxes(samples, 0, 1), jnp.swapaxes(y_hats, 0, 1)
