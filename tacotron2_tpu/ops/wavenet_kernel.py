"""Fused Pallas TPU kernel: the entire WaveNet sampling loop in one kernel.

The speed-of-light design for the BASELINE north-star 'dilated-conv vocoder
step with activation caching':

- ALL weights live in VMEM for the whole generation (no per-step HBM reads).
- Per-layer activation caches are a single VMEM delay-line buffer holding
  exactly the (kw-1)=2 delayed activations per dilation slot: slot
  offs[l] + (t mod d_l) stores (x_{t-d}, x_{t-2d}) — one row read + one row
  write per layer per step (the XLA scan version pays ~35 µs/step in op
  dispatch alone; in-kernel these are register-speed).
- Local conditioning is DMA'd from HBM in chunks and double-buffered.
- Gaussian sampling runs in-kernel via the TPU PRNG (Box-Muller).

Falls back to the XLA scan sampler (models/wavenet/sampler.py) for MoL /
mulaw-quantize heads; the Gaussian scalar-input head is the reference's
default (hparams.py:222 out_channels=2).

Reference behavior being fused: wavenet.py:724-911 (incremental loop),
modules.py:270-333 (convolution queues), gaussian.py:39-52 (sampling).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config
from ..models.wavenet.sampler import SamplerParams, extract_sampler_params


def _delay_layout(cfg: Config) -> Tuple[np.ndarray, int]:
    """Per-layer slot offsets into the flat delay-line buffer."""
    dil = np.asarray(cfg.wavenet.dilations, np.int32)
    offs = np.concatenate([[0], np.cumsum(dil)]).astype(np.int32)
    return offs, int(offs[-1])


def _uniform_from_bits(bits):
    """uint32 → (0, 1) floats (24-bit mantissa path).

    Mosaic can't cast uint32→f32 directly; shift down to 24 bits first so the
    value fits a non-negative int32, then convert.
    """
    b24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return b24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def build_sampler_kernel(cfg: Config, B: int, T: int, chunk: int = 512,
                         interpret: bool = False,
                         cache_dtype=jnp.float32,
                         weight_dtype=jnp.float32):
    """Compile a fused sampler for fixed (batch B, length T) buckets.

    Returns fn(params_tuple, c_up [B,T,C], seed int32) → samples [B, T].

    cache_dtype=bfloat16 halves the delay-line VMEM (the dominant buffer:
    sum(dilations)·B·2R floats), unlocking B=64 on one chip; activations are
    quantized to bf16 between layers only at the delay-line boundary while
    all matmuls still accumulate in f32.

    weight_dtype=bfloat16 additionally stores the per-layer matmul weights in
    bf16 and feeds the MXU bf16×bf16 (f32 accumulation) — both halves weight
    VMEM and engages the MXU's native bf16 rate. Residual/skip accumulators
    and biases stay f32.
    """
    wn = cfg.wavenet
    assert wn.out_channels == 2 and wn.input_type in ("raw", "mulaw"), \
        "fused kernel supports the scalar-input Gaussian head; use the XLA " \
        "sampler for MoL/mulaw-quantize"
    assert T % chunk == 0, f"T={T} must be a multiple of chunk={chunk}"
    L, R, G = wn.layers, wn.residual_channels, wn.gate_channels
    S = wn.skip_out_channels
    # conditioning channels padded to the 128-lane tile for aligned DMA
    C = ((wn.cin_channels + 127) // 128) * 128
    kw = wn.kernel_size
    assert kw == 3, "delay-line layout assumes kernel_size=3"
    offs, dtot = _delay_layout(cfg)
    dilations = tuple(int(d) for d in wn.dilations)
    legacy_scale = np.float32(np.sqrt(0.5))
    n_chunks = T // chunk
    log_scale_min = np.float32(wn.log_scale_min_gauss)

    def kernel(seed_ref, cup_hbm,                      # inputs
               conv_w, conv_b, cin_w, cin_b, skip_w, skip_b,
               out_w, out_b, first_w, first_b, f1_w, f1_b, f2_w, f2_b,
               samples_out,                            # output [T, B]
               buf, cbuf, xprev, sem):                 # scratch
        pltpu.prng_seed(seed_ref[0])
        buf[:] = jnp.zeros((dtot, B, 2 * R), cache_dtype)
        xprev[:] = jnp.zeros((B, 128), jnp.float32)

        def chunk_body(ci, _):
            # DMA this chunk of upsampled conditioning into VMEM
            dma = pltpu.make_async_copy(
                cup_hbm.at[pl.ds(ci * chunk, chunk)], cbuf, sem)
            dma.start()
            dma.wait()

            def step_body(i, _):
                t = ci * chunk + i
                ct = cbuf[i].astype(weight_dtype)              # [B, C]
                x_in = xprev[:, :1]                            # [B, 1]
                x = jnp.dot(x_in, first_w[:],
                            preferred_element_type=jnp.float32) + first_b[:]

                skips = jnp.zeros((B, S), jnp.float32)
                for l in range(L):
                    idx = offs[l] + jax.lax.rem(t, dilations[l])
                    old = buf[idx]                             # [B, 2R]
                    taps = jnp.concatenate(
                        [old[:, R:], old[:, :R],
                         x.astype(cache_dtype)], axis=-1)      # [B, 3R]
                    buf[idx] = jnp.concatenate(
                        [x.astype(cache_dtype), old[:, :R]], axis=-1)
                    z = jnp.dot(taps.astype(weight_dtype), conv_w[l],
                                preferred_element_type=jnp.float32) + conv_b[l]
                    z = z + jnp.dot(ct, cin_w[l],
                                    preferred_element_type=jnp.float32) + cin_b[l]
                    a, g = z[:, :G // 2], z[:, G // 2:]
                    h = jnp.tanh(a) * jax.nn.sigmoid(g)
                    hw = h.astype(weight_dtype)
                    s = jnp.dot(hw, skip_w[l],
                                preferred_element_type=jnp.float32) + skip_b[l]
                    o = jnp.dot(hw, out_w[l],
                                preferred_element_type=jnp.float32) + out_b[l]
                    if wn.residual_legacy:
                        x = (x + o) * legacy_scale
                    else:
                        x = x + o
                    if l == 0:
                        skips = s
                    elif wn.legacy:
                        skips = (skips + s) * legacy_scale
                    else:
                        skips = skips + s

                y = jnp.maximum(skips, 0.0)
                y = jnp.maximum(
                    jnp.dot(y, f1_w[:], preferred_element_type=jnp.float32)
                    + f1_b[:], 0.0)
                yh = jnp.dot(y, f2_w[:],
                             preferred_element_type=jnp.float32) + f2_b[:]
                mean, log_scale = yh[:, 0], jnp.maximum(yh[:, 1], log_scale_min)

                bits = pltpu.prng_random_bits((2, B, 128))
                u = _uniform_from_bits(pltpu.bitcast(bits, jnp.uint32))
                z_norm = (jnp.sqrt(-2.0 * jnp.log(u[0, :, 0])) *
                          jnp.cos(2.0 * math.pi * u[1, :, 0]))
                sample = jnp.clip(mean + jnp.exp(log_scale) * z_norm, -1.0, 1.0)
                samples_out[t] = sample
                xprev[:, 0] = sample
                return 0

            jax.lax.fori_loop(0, chunk, step_body, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +       # cup in HBM
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,  # weights
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((dtot, B, 2 * R), cache_dtype),   # delay lines
            pltpu.VMEM((chunk, B, C), jnp.float32),      # conditioning chunk
            pltpu.VMEM((B, 128), jnp.float32),           # previous sample
            pltpu.SemaphoreType.DMA,
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )

    @jax.jit
    def run(weights: SamplerParams, c_up, seed):
        # [B, T, Cin] → time-major, lane-padded [T, B, C] for aligned DMA
        cup_tm = jnp.swapaxes(c_up, 0, 1)
        if cup_tm.shape[-1] != C:
            cup_tm = jnp.pad(cup_tm,
                             ((0, 0), (0, 0), (0, C - cup_tm.shape[-1])))
        lw = _stack_weights(weights, cfg, cin_pad=C,
                            weight_dtype=weight_dtype)
        samples = call(jnp.asarray([seed], jnp.int32), cup_tm, *lw)
        return jnp.swapaxes(samples, 0, 1)    # [B, T]

    return run


def _stack_weights(sp: SamplerParams, cfg: Config, cin_pad: int = None,
                   weight_dtype=jnp.float32):
    """SamplerParams → stacked [L, ...] arrays the kernel indexes statically."""
    wn = cfg.wavenet
    cin_pad = cin_pad or wn.cin_channels
    z = lambda *s: jnp.zeros(s, jnp.float32)
    conv_w = jnp.stack([lp.conv_w for lp in sp.layers])
    conv_b = jnp.stack([lp.conv_b if lp.conv_b is not None
                        else z(wn.gate_channels) for lp in sp.layers])
    cin_w = jnp.stack([
        jnp.pad(lp.cin_w, ((0, cin_pad - lp.cin_w.shape[0]), (0, 0)))
        if lp.cin_w is not None else z(cin_pad, wn.gate_channels)
        for lp in sp.layers])
    cin_b = jnp.stack([lp.cin_b if lp.cin_b is not None
                       else z(wn.gate_channels) for lp in sp.layers])
    skip_w = jnp.stack([lp.skip_w for lp in sp.layers])
    skip_b = jnp.stack([lp.skip_b if lp.skip_b is not None
                        else z(wn.skip_out_channels) for lp in sp.layers])
    out_w = jnp.stack([lp.out_w for lp in sp.layers])
    out_b = jnp.stack([lp.out_b if lp.out_b is not None
                       else z(wn.residual_channels) for lp in sp.layers])
    fb = sp.first_b if sp.first_b is not None else z(wn.residual_channels)
    f1b = sp.final1_b if sp.final1_b is not None else z(wn.skip_out_channels)
    f2b = sp.final2_b if sp.final2_b is not None else z(wn.out_channels)
    conv_w = conv_w.astype(weight_dtype)
    cin_w = cin_w.astype(weight_dtype)
    skip_w = skip_w.astype(weight_dtype)
    out_w = out_w.astype(weight_dtype)
    return (conv_w, conv_b, cin_w, cin_b, skip_w, skip_b, out_w, out_b,
            sp.first_w, fb, sp.final1_w, f1b, sp.final2_w, f2b)


def sharded_incremental_sample(params, cfg: Config, c_up, seed: int, mesh,
                               chunk: int = 512, interpret: bool = False,
                               cache_dtype=jnp.float32):
    """Multi-chip synthesis: batch axis sharded over the mesh's 'data' axis.

    Each chip runs the full fused sampler on its local B/n_data streams —
    the right decomposition for autoregressive vocoding (model-sharding the
    stack would put a psum on the ICI inside every 62.5 µs sample step;
    batch-sharding needs zero per-step communication). Weights are
    replicated; conditioning is sharded on entry.

    Reference-equivalent: the tower loop over wavenet_num_gpus
    (wavenet.py:227-239), rebuilt as shard_map over a jax Mesh.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_axis = mesh.axis_names[0]
    n_data = mesh.shape[data_axis]
    B, T, _ = c_up.shape
    assert B % n_data == 0, f"batch {B} not divisible by data axis {n_data}"
    sp = extract_sampler_params(params, cfg)
    T_pad = ((T + chunk - 1) // chunk) * chunk
    if T_pad != T:
        c_up = jnp.pad(c_up, ((0, 0), (0, T_pad - T), (0, 0)))
    run = build_sampler_kernel(cfg, B // n_data, T_pad, chunk,
                               interpret=interpret, cache_dtype=cache_dtype)

    def local(sp_local, c_local, seed_arr):
        return run(sp_local, c_local, seed_arr[0])

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), sp),
                  P(data_axis, None, None), P(data_axis)),
        out_specs=P(data_axis, None), check_rep=False)
    # distinct per-shard seeds so parallel streams draw independent noise
    seeds = jnp.arange(n_data, dtype=jnp.int32) * 9973 + seed
    c_up = jax.device_put(c_up, NamedSharding(mesh, P(data_axis, None, None)))
    samples = fn(sp, c_up, seeds)
    return samples[:, :T]


def fused_incremental_sample(params, cfg: Config, c_up, seed: int,
                             chunk: int = 512, interpret: bool = False,
                             cache_dtype=jnp.float32,
                             weight_dtype=jnp.float32):
    """Drop-in fast path for sampler.incremental_sample (Gaussian head).

    c_up: [B, T, C]; T is padded to a chunk multiple internally and trimmed.
    Returns samples [B, T].
    """
    sp = extract_sampler_params(params, cfg)
    B, T, _ = c_up.shape
    T_pad = ((T + chunk - 1) // chunk) * chunk
    if T_pad != T:
        c_up = jnp.pad(c_up, ((0, 0), (0, T_pad - T), (0, 0)))
    run = build_sampler_kernel(cfg, B, T_pad, chunk, interpret=interpret,
                               cache_dtype=cache_dtype,
                               weight_dtype=weight_dtype)
    samples = run(sp, c_up, seed)
    return samples[:, :T]
