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
- Sampling runs in-kernel via the TPU PRNG for ALL THREE reference output
  heads (_HeadPlan): Gaussian (hparams.py default, Box-Muller), discretized
  mixture-of-logistics (paper_hparams default), and mulaw-quantize
  categorical (inverse-CDF pick + one-hot feedback).

Reference behavior being fused: wavenet.py:724-911 (incremental loop),
modules.py:270-333 (convolution queues), gaussian.py:39-52 /
mixture.py:76-107 / wavenet.py:872-880 (sampling).
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


class _HeadPlan:
    """Head-specific pieces of the fused sampler: noise plan, first-conv
    input path, and the in-kernel sampling step.

    All three reference output heads are fused:
    - gaussian (out_channels=2, hparams.py default): Box-Muller normal,
      sample = clip(mean + exp(log_s)·z)  (gaussian.py:39-52);
    - mol (out_channels=3·nr_mix, paper_hparams default): mixture pick by
      inverse-CDF on the softmaxed logits (statistically equivalent to the
      reference's Gumbel-max, mixture.py:79-88 — the PRNG stream differs
      anyway), then a logistic sample from the picked component
      (mixture.py:99-107);
    - categorical (mulaw-quantize, out_channels=quantize_channels):
      inverse-CDF class pick over the softmax (tf.multinomial semantics,
      wavenet.py:872-880); the sample value is the class index (float) and
      the feedback is its one-hot — which the inverse-CDF already produced.

    The categorical cumulative sum rides the MXU as [B,Q]@[Q,Q] against an
    upper-triangular ones matrix built from 2-D iota in-register.
    """

    def __init__(self, cfg: Config, chunk: int, B: int, weight_dtype):
        wn = cfg.wavenet
        self.B, self.chunk, self.weight_dtype = B, chunk, weight_dtype
        scalar = wn.input_type in ("raw", "mulaw")
        if scalar and wn.out_channels == 2:
            self.kind, self.planes = "gaussian", 1
            self.log_scale_min = np.float32(wn.log_scale_min_gauss)
        elif scalar:
            assert wn.out_channels % 3 == 0, wn.out_channels
            self.kind, self.planes = "mol", 2
            self.nr = wn.out_channels // 3
            self.log_scale_min = np.float32(wn.log_scale_min)
        else:
            assert wn.input_type == "mulaw-quantize", wn.input_type
            assert wn.out_channels == wn.quantize_channels, \
                (wn.out_channels, wn.quantize_channels)
            self.kind, self.planes = "categorical", 1
            self.q = wn.quantize_channels
        self.xprev_width = 128 if scalar else self.q

    # ---- kernel-side pieces (operate on refs / in-register values) ----

    def init_xprev(self, xprev):
        xprev[:] = jnp.zeros((self.B, self.xprev_width), jnp.float32)
        if self.kind == "categorical":
            # initial input = one-hot of the mulaw zero point (sampler.py:137)
            col = jax.lax.broadcasted_iota(
                jnp.int32, (self.B, self.xprev_width), 1)
            xprev[:] = (col == 127).astype(jnp.float32)

    def fill_noise(self, zmat):
        """Per-chunk noise planes [planes, chunk, B] (amortized PRNG).

        NOTE: the interpret-mode (CPU) TPU PRNG returns all-zero bits, so
        uniforms collapse to the 2^-25 floor there; parity tests therefore
        use PRNG-independent oracles (tests/test_pallas_kernels.py), and
        distributional behavior is checked with real noise on hardware
        (scripts/check_sampler_noise.py)."""
        if self.kind == "gaussian":
            bits = pltpu.prng_random_bits((2, self.chunk, self.B))
            u = _uniform_from_bits(pltpu.bitcast(bits, jnp.uint32))
            zmat[:] = (jnp.sqrt(-2.0 * jnp.log(u[0])) *
                       jnp.cos(2.0 * math.pi * u[1]))[None]
        else:
            bits = pltpu.prng_random_bits((self.planes, self.chunk, self.B))
            zmat[:] = _uniform_from_bits(pltpu.bitcast(bits, jnp.uint32))

    def first_x(self, xprev, first_w, first_b):
        if self.kind == "categorical":
            return (jnp.dot(xprev[:].astype(self.weight_dtype),
                            first_w[:].astype(self.weight_dtype),
                            preferred_element_type=jnp.float32) + first_b[:])
        # scalar input: an outer product on the VPU
        return xprev[:, :1] * first_w[:] + first_b[:]

    @staticmethod
    def _inverse_cdf_onehot(logits, u):
        """[B, Q] logits + [B] uniform → one-hot [B, Q] of the picked class."""
        Bq, Q = logits.shape
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        r = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
        tri = (r <= c).astype(jnp.float32)
        cum = jnp.dot(e, tri, preferred_element_type=jnp.float32)   # [B, Q]
        tot = cum[:, Q - 1:Q]
        # last-class fallback: u*tot can round UP to tot in f32 (u_max =
        # 1-2^-25), which would make every comparison False and emit an
        # all-zero "one-hot" (~2^-24 per draw — an audible click at B=256)
        last = jax.lax.broadcasted_iota(jnp.int32, (Bq, Q), 1) == Q - 1
        pick = ((u[:, None] * tot < cum) | last).astype(jnp.float32)
        return pick - jnp.concatenate(
            [jnp.zeros((Bq, 1), jnp.float32), pick[:, :Q - 1]], axis=-1)

    def emit(self, yh, zmat, i, xprev, samples_ref, t):
        """Sample from yh [B, out], write samples_ref[t] and the feedback."""
        if self.kind == "gaussian":
            mean = yh[:, 0]
            log_s = jnp.maximum(yh[:, 1], self.log_scale_min)
            sample = jnp.clip(mean + jnp.exp(log_s) * zmat[0, i], -1.0, 1.0)
            samples_ref[t] = sample
            xprev[:, 0] = sample
        elif self.kind == "mol":
            nr = self.nr
            onehot = self._inverse_cdf_onehot(yh[:, :nr], zmat[0, i])
            mean = jnp.sum(yh[:, nr:2 * nr] * onehot, axis=-1)
            log_s = jnp.maximum(
                jnp.sum(yh[:, 2 * nr:3 * nr] * onehot, axis=-1),
                self.log_scale_min)
            u = jnp.clip(zmat[1, i], 1e-5, 1.0 - 1e-5)  # mixture.py:99-101
            sample = jnp.clip(
                mean + jnp.exp(log_s) * (jnp.log(u) - jnp.log(1.0 - u)),
                -1.0, 1.0)
            samples_ref[t] = sample
            xprev[:, 0] = sample
        else:
            onehot = self._inverse_cdf_onehot(yh[:, :self.q], zmat[0, i])
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (self.B, self.q), 1).astype(jnp.float32)
            samples_ref[t] = jnp.sum(onehot * iota, axis=-1)  # class index
            xprev[:] = onehot


def build_sampler_kernel(cfg: Config, B: int, T: int, chunk: int = 512,
                         interpret: bool = False,
                         cache_dtype=jnp.float32,
                         weight_dtype=jnp.float32,
                         hbm_delay_threshold: int | None = None,
                         window: int = 16):
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

    hbm_delay_threshold keeps the delay lines of layers with dilation above
    the threshold in HBM instead of VMEM (see build_sampler_kernel_hbm) —
    for the default 20L/512-max-dilation net, threshold 64 moves 88% of the
    cache off-chip and unlocks B=128 (a full MXU of batch rows).
    """
    if hbm_delay_threshold is not None and any(
            d > hbm_delay_threshold for d in cfg.wavenet.dilations):
        return build_sampler_kernel_hbm(cfg, B, T, chunk, interpret=interpret,
                                        cache_dtype=cache_dtype,
                                        weight_dtype=weight_dtype,
                                        threshold=hbm_delay_threshold,
                                        window=window)
    wn = cfg.wavenet
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
    head = _HeadPlan(cfg, chunk, B, weight_dtype)

    def kernel(seed_ref, cup_hbm,                      # inputs
               czw, czb, sow, sob,
               first_w, first_b, f1_w, f1_b, f2_w, f2_b,
               samples_out,                            # output [T, B]
               buf, cbuf, xprev, zmat, sem):           # scratch
        pltpu.prng_seed(seed_ref[0])
        buf[:] = jnp.zeros((dtot, B, 2 * R), cache_dtype)
        head.init_xprev(xprev)

        def chunk_body(ci, _):
            # DMA this chunk of upsampled conditioning into VMEM
            dma = pltpu.make_async_copy(
                cup_hbm.at[pl.ds(ci * chunk, chunk)], cbuf, sem)
            dma.start()
            # amortize PRNG (+ Box-Muller for the Gaussian head) over the
            # chunk: per-step transcendentals on (2, B, 128) tiles cost more
            # than the sample matmuls
            head.fill_noise(zmat)
            dma.wait()

            def step_body(i, _):
                t = ci * chunk + i
                ct = cbuf[i].astype(weight_dtype)              # [B, C]
                x = head.first_x(xprev, first_w, first_b)      # [B, R]

                skips = jnp.zeros((B, S), jnp.float32)
                for l in range(L):
                    idx = offs[l] + jax.lax.rem(t, dilations[l])
                    # rows stored tap-ordered (x_{t-2d}, x_{t-d}): both taps
                    # feed ONE [B,2R]@[2R,G] matmul (halves tap weight loads)
                    old = buf[idx]                             # [B, 2R]
                    buf[idx] = jnp.concatenate(
                        [old[:, R:], x.astype(cache_dtype)], axis=-1)
                    z = (jnp.dot(old.astype(weight_dtype), czw[l, :2 * R],
                                 preferred_element_type=jnp.float32)
                         + jnp.dot(x.astype(weight_dtype), czw[l, 2 * R:3 * R],
                                   preferred_element_type=jnp.float32)
                         + jnp.dot(ct, czw[l, 3 * R:],
                                   preferred_element_type=jnp.float32)
                         + czb[l])
                    a, g = z[:, :G // 2], z[:, G // 2:]
                    h = jnp.tanh(a) * jax.nn.sigmoid(g)
                    hw = h.astype(weight_dtype)
                    # one fused matmul: h @ [skip | out]
                    so = jnp.dot(hw, sow[l],
                                 preferred_element_type=jnp.float32) + sob[l]
                    s, o = so[:, :S], so[:, S:]
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
                head.emit(yh, zmat, i, xprev, samples_out, t)
                return 0

            jax.lax.fori_loop(0, chunk, step_body, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +       # cup in HBM
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,  # weights
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((dtot, B, 2 * R), cache_dtype),   # delay lines
            pltpu.VMEM((chunk, B, C), jnp.float32),      # conditioning chunk
            pltpu.VMEM((B, head.xprev_width), jnp.float32),  # feedback input
            pltpu.VMEM((head.planes, chunk, B), jnp.float32),  # chunk noise
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


def build_sampler_kernel_hbm(cfg: Config, B: int, T: int, chunk: int = 512,
                             interpret: bool = False,
                             cache_dtype=jnp.float32,
                             weight_dtype=jnp.float32,
                             threshold: int = 64,
                             window: int = 16):
    """Fused sampler with large-dilation delay lines resident in HBM.

    The pure-VMEM kernel's batch ceiling is the delay-line buffer
    (sum(dilations)·B·2R): for the default net, dilations {128, 256, 512}
    hold 88% of the slots but each layer touches exactly ONE row ([B, 2R])
    per step, at slot (t mod d) — sequential in t. Because the window size W
    divides every resident dilation, the W rows a layer needs over W
    consecutive steps are CONTIGUOUS in the delay buffer and never wrap, so
    the kernel streams them in window-sized super-rows:

    - per window of W steps, each big layer gets ONE prefetch DMA into a
      double-buffered VMEM landing pad (issued a window ahead, fully hidden
      behind compute) and ONE write-back flush from a staging pad — ~12 DMAs
      per W steps instead of per step (per-step DMA wait overhead was
      measured to double the step time at B=128);
    - flush(w) is waited at window w+2; a prefetch at window w covers rows
      written in window w+1-d/W ≤ w-3, so with d/W ≥ 4 every read sees
      retired data — races are structurally impossible.

    Per-step HBM traffic at B=128 is 6 rows × 64 KB × 2 directions ≈ 0.8 MB
    (~1 µs of HBM bandwidth), while VMEM drops from ~134 MB (impossible) to
    ~75 MB — trading free bandwidth for the scarce resource.

    Reference behavior fused: wavenet.py:724-911 + modules.py:270-333, as in
    build_sampler_kernel.
    """
    wn = cfg.wavenet
    assert T % chunk == 0, f"T={T} must be a multiple of chunk={chunk}"
    L, R, G = wn.layers, wn.residual_channels, wn.gate_channels
    S = wn.skip_out_channels
    C = ((wn.cin_channels + 127) // 128) * 128
    assert wn.kernel_size == 3, "delay-line layout assumes kernel_size=3"
    dilations = tuple(int(d) for d in wn.dilations)
    small = [l for l in range(L) if dilations[l] <= threshold]
    big = [l for l in range(L) if dilations[l] > threshold]
    assert big, "no dilation above threshold; use build_sampler_kernel"
    W = window
    while W > 1 and any(dilations[l] % W or dilations[l] // W < 4
                        for l in big):
        W //= 2  # shrink until W divides every big dilation with d/W >= 4
    assert W >= 1 and chunk % W == 0, (W, chunk)
    assert all(dilations[l] % W == 0 and dilations[l] // W >= 4 for l in big), \
        "hbm_delay_threshold leaves a dilation too small for safe windowing"
    hidx = {l: j for j, l in enumerate(big)}
    offs_v = np.concatenate(
        [[0], np.cumsum([dilations[l] for l in small])]).astype(np.int32)
    voff = {l: int(offs_v[i]) for i, l in enumerate(small)}
    offs_h = np.concatenate(
        [[0], np.cumsum([dilations[l] for l in big])]).astype(np.int32)
    hoff = {l: int(offs_h[hidx[l]]) for l in big}
    dtot_v, dtot_h = int(offs_v[-1]), int(offs_h[-1])
    n_h = len(big)
    ZBLK = max(z for z in range(1, 65) if dtot_h % z == 0)
    legacy_scale = np.float32(np.sqrt(0.5))
    n_chunks = T // chunk
    wins_per_chunk = chunk // W
    n_windows = T // W
    head = _HeadPlan(cfg, chunk, B, weight_dtype)

    def kernel(seed_ref, cup_hbm,                      # inputs
               czw, czb, sow, sob,
               first_w, first_b, f1_w, f1_b, f2_w, f2_b,
               samples_hbm, hbuf,                      # outputs (ANY)
               vbuf, cbuf, xprev, sbuf, pf, st, zblk, zmat,  # scratch
               csem, ssem, zsem, rsem, wsem):
        pltpu.prng_seed(seed_ref[0])
        vbuf[:] = jnp.zeros((dtot_v, B, 2 * R), cache_dtype)
        head.init_xprev(xprev)

        # zero the HBM delay lines (block copies of a zeroed VMEM tile)
        zblk[:] = jnp.zeros((ZBLK, B, 2 * R), cache_dtype)
        for blk in range(dtot_h // ZBLK):
            pltpu.make_async_copy(
                zblk, hbuf.at[pl.ds(blk * ZBLK, ZBLK)], zsem).start()
        for blk in range(dtot_h // ZBLK):
            pltpu.make_async_copy(
                zblk, hbuf.at[pl.ds(blk * ZBLK, ZBLK)], zsem).wait()

        def read_dma(l, t0, slot):
            """hbuf rows [t0 mod d, +W) → landing pad pf[slot, hidx[l]]."""
            row = hoff[l] + jax.lax.rem(t0, dilations[l])
            return pltpu.make_async_copy(
                hbuf.at[pl.ds(row, W)],
                pf.at[slot, hidx[l]],
                rsem.at[slot, hidx[l]])

        def write_dma(l, t0, slot):
            """staging st[slot, hidx[l]] → hbuf rows [t0 mod d, +W)."""
            row = hoff[l] + jax.lax.rem(t0, dilations[l])
            return pltpu.make_async_copy(
                st.at[slot, hidx[l]],
                hbuf.at[pl.ds(row, W)],
                wsem.at[slot, hidx[l]])

        # warm-up: prefetch window 0 (all zeros, but keeps the loop uniform)
        for l in big:
            read_dma(l, 0, 0).start()

        def window_body(w, _):
            t0 = w * W
            wslot = jax.lax.rem(w, 2)
            nslot = jax.lax.rem(w + 1, 2)
            # retire this parity slot's flush from window w-2 before reusing
            # the staging pad, then prefetch window w+1 into the other pad
            for l in big:
                @pl.when(w >= 2)
                def _(l=l, t0=t0, wslot=wslot):
                    write_dma(l, t0 - 2 * W, wslot).wait()

                @pl.when(w + 1 < n_windows)
                def _(l=l, t0=t0, nslot=nslot):
                    read_dma(l, t0 + W, nslot).start()
                read_dma(l, t0, wslot).wait()

            def step_body(i, _):
                t = t0 + i
                ci = t // chunk  # only used for the cbuf-relative index
                ct = cbuf[t - ci * chunk].astype(weight_dtype)  # [B, C]
                x = head.first_x(xprev, first_w, first_b)       # [B, R]

                skips = jnp.zeros((B, S), jnp.float32)
                for l in range(L):
                    xc = x.astype(cache_dtype)
                    # rows stored tap-ordered: (x_{t-2d}, x_{t-d}) — the
                    # read needs no lane shuffle, only the write does
                    if l in hidx:
                        j = hidx[l]
                        old = pf[wslot, j, i]                  # [B, 2R]
                        st[wslot, j, i] = jnp.concatenate(
                            [old[:, R:], xc], axis=-1)
                    else:
                        idx = voff[l] + jax.lax.rem(t, dilations[l])
                        old = vbuf[idx]                        # [B, 2R]
                        vbuf[idx] = jnp.concatenate(
                            [old[:, R:], xc], axis=-1)
                    z = (jnp.dot(old.astype(weight_dtype), czw[l, :2 * R],
                                 preferred_element_type=jnp.float32)
                         + jnp.dot(x.astype(weight_dtype), czw[l, 2 * R:3 * R],
                                   preferred_element_type=jnp.float32)
                         + jnp.dot(ct, czw[l, 3 * R:],
                                   preferred_element_type=jnp.float32)
                         + czb[l])
                    a, g = z[:, :G // 2], z[:, G // 2:]
                    h = jnp.tanh(a) * jax.nn.sigmoid(g)
                    hw = h.astype(weight_dtype)
                    # one fused matmul: h @ [skip | out]
                    so = jnp.dot(hw, sow[l],
                                 preferred_element_type=jnp.float32) + sob[l]
                    s, o = so[:, :S], so[:, S:]
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
                head.emit(yh, zmat, t - ci * chunk, xprev, sbuf,
                          t - ci * chunk)
                return 0

            jax.lax.fori_loop(0, W, step_body, 0)
            # flush this window's new rows back to HBM (waited at w+2)
            for l in big:
                write_dma(l, t0, wslot).start()
            return 0

        def chunk_body(ci, _):
            dma = pltpu.make_async_copy(
                cup_hbm.at[pl.ds(ci * chunk, chunk)], cbuf, csem)
            dma.start()
            # amortize PRNG (+ Box-Muller) over the chunk
            head.fill_noise(zmat)
            dma.wait()
            jax.lax.fori_loop(ci * wins_per_chunk, (ci + 1) * wins_per_chunk,
                              window_body, 0)
            out = pltpu.make_async_copy(
                sbuf, samples_hbm.at[pl.ds(ci * chunk, chunk)], ssem)
            out.start()
            out.wait()
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        # drain the final two windows' flushes (static indices: T is fixed)
        for back in (2, 1):
            if n_windows - back >= 0:
                t0 = (n_windows - back) * W
                for l in big:
                    write_dma(l, t0, (n_windows - back) % 2).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +       # cup in HBM
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,  # weights
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),        # samples
                   pl.BlockSpec(memory_space=pltpu.ANY)],       # HBM cache
        scratch_shapes=[
            pltpu.VMEM((dtot_v, B, 2 * R), cache_dtype),  # small delay lines
            pltpu.VMEM((chunk, B, C), weight_dtype),      # conditioning chunk
            pltpu.VMEM((B, head.xprev_width), jnp.float32),  # feedback
            pltpu.VMEM((chunk, B), jnp.float32),          # sample staging
            pltpu.VMEM((2, n_h, W, B, 2 * R), cache_dtype),  # landing pads
            pltpu.VMEM((2, n_h, W, B, 2 * R), cache_dtype),  # write staging
            pltpu.VMEM((ZBLK, B, 2 * R), cache_dtype),    # zero tile
            pltpu.VMEM((head.planes, chunk, B), jnp.float32),  # chunk noise
            pltpu.SemaphoreType.DMA,                      # conditioning
            pltpu.SemaphoreType.DMA,                      # samples out
            pltpu.SemaphoreType.DMA,                      # zero-init
            pltpu.SemaphoreType.DMA((2, n_h)),            # reads
            pltpu.SemaphoreType.DMA((2, n_h)),            # writes
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, B), jnp.float32),
                   jax.ShapeDtypeStruct((dtot_h, B, 2 * R), cache_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )

    @jax.jit
    def run(weights: SamplerParams, c_up, seed):
        cup_tm = jnp.swapaxes(c_up, 0, 1)
        if cup_tm.shape[-1] != C:
            cup_tm = jnp.pad(cup_tm,
                             ((0, 0), (0, 0), (0, C - cup_tm.shape[-1])))
        cup_tm = cup_tm.astype(weight_dtype)
        lw = _stack_weights(weights, cfg, cin_pad=C,
                            weight_dtype=weight_dtype)
        samples, _ = call(jnp.asarray([seed], jnp.int32), cup_tm, *lw)
        return jnp.swapaxes(samples, 0, 1)    # [B, T]

    return run


def _stack_weights(sp: SamplerParams, cfg: Config, cin_pad: int = None,
                   weight_dtype=jnp.float32):
    """SamplerParams → stacked, matmul-fused [L, ...] kernel weights.

    Two MXU-economy fusions (halve the per-layer matmul count):
    - czw [L, 3R+C, G] = vstack(tap weights, cin_w) with czb = conv_b +
      cin_b, consumed as per-tap row matmuls against static slices;
    - sow [L, G/2, S+R] = hstack(skip_w, out_w), consumed as `h @ sow`.
    """
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
    czw = jnp.concatenate([conv_w, cin_w], axis=1).astype(weight_dtype)
    czb = conv_b + cin_b
    sow = jnp.concatenate([skip_w, out_w], axis=2).astype(weight_dtype)
    sob = jnp.concatenate([skip_b, out_b], axis=1)
    return (czw, czb, sow, sob,
            sp.first_w, fb, sp.final1_w, f1b, sp.final2_w, f2b)


def sharded_incremental_sample(params, cfg: Config, c_up, seed: int, mesh,
                               chunk: int = 512, interpret: bool = False,
                               cache_dtype=jnp.float32,
                               weight_dtype=jnp.float32,
                               hbm_delay_threshold: int | None = None,
                               window: int = 16):
    """Multi-chip synthesis: batch axis sharded over the mesh's 'data' axis.

    Each chip runs the full fused sampler on its local B/n_data streams —
    the right decomposition for autoregressive vocoding (model-sharding the
    stack would put a psum on the ICI inside every 62.5 µs sample step;
    batch-sharding needs zero per-step communication). Weights are
    replicated; conditioning is sharded on entry.

    Reference-equivalent: the tower loop over wavenet_num_gpus
    (wavenet.py:227-239), rebuilt as shard_map over a jax Mesh.
    """
    from jax import shard_map
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
                               interpret=interpret, cache_dtype=cache_dtype,
                               weight_dtype=weight_dtype,
                               hbm_delay_threshold=hbm_delay_threshold,
                               window=window)

    def local(sp_local, c_local, seed_arr):
        return run(sp_local, c_local, seed_arr[0])

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), sp),
                  P(data_axis, None, None), P(data_axis)),
        out_specs=P(data_axis, None), check_vma=False)
    # distinct per-shard seeds so parallel streams draw independent noise
    seeds = jnp.arange(n_data, dtype=jnp.int32) * 9973 + seed
    c_up = jax.device_put(c_up, NamedSharding(mesh, P(data_axis, None, None)))
    samples = fn(sp, c_up, seeds)
    return samples[:, :T]


def fused_incremental_sample(params, cfg: Config, c_up, seed: int,
                             chunk: int = 512, interpret: bool = False,
                             cache_dtype=jnp.float32,
                             weight_dtype=jnp.float32,
                             hbm_delay_threshold: int | None = None,
                             window: int = 16):
    """Drop-in fast path for sampler.incremental_sample (all output heads).

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
                               weight_dtype=weight_dtype,
                               hbm_delay_threshold=hbm_delay_threshold,
                               window=window)
    samples = run(sp, c_up, seed)
    return samples[:, :T]
