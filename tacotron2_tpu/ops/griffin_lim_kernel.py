"""Fully-fused Pallas TPU Griffin-Lim: all iterations in one kernel, VMEM-resident.

The XLA path (ops/griffin_lim.py) round-trips the [F, n_fft] frame matrix and
[F, K] spectra through HBM every iteration (fori_loop body boundaries defeat
fusion across the iSTFT→STFT pair). This kernel keeps the entire phase-
retrieval state in VMEM for all `iters` iterations — HBM touches only the
input magnitude and output waveform once.

Per-iteration structure (reference audio.py:163-176, the in-graph TF G-L):
  y    = overlap-add(iSTFT frames) · mask/wss    # synthesis
  est  = DFT(window · reframe(y))                # analysis
  re,im = S · est / max(|est|, 1e-8)             # magnitude projection

TPU formulation: overlap-add and re-framing are *linear* maps, so both are
folded into matmuls — per hop-plane s ∈ [0, k), with k = ceil(n_fft/hop):

  iSTFT+OLA : y[rows,hop]  = Σ_s Dn_s[rows,F] @ (re @ Ciw_s - im @ Siw_s)
  reframe+DFT: est[F,Kp]   = Σ_s (Up_s[F,rows] @ y) @ {Cw_s | Sw_s}

where Ciw/Siw fold window·inverse-DFT columns for plane s, Cw/Sw fold
window·forward-DFT rows, and Dn/Up are 0/1 shift matrices. Everything is an
MXU matmul — no gathers, scatters, pads, concats, or offset slices exist in
the kernel (Mosaic rejects row-offset slice/concat layouts). The extra
shift-matmul FLOPs are ~15% of the DFT FLOPs.

Shapes are padded host-side: K → multiple of 128 lanes (extra bins carry S=0
so they project to zero). librosa center trimming between iterations is
folded into the wss normalization mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import AudioConfig
from . import stft as _stft


def _round_up(x: int, m: int) -> int:
    return x if x % m == 0 else x + m - x % m


@functools.lru_cache(maxsize=8)
def _gl_constants(n_fft: int, hop: int, win_size: int, F: int):
    """Precompute per-plane folded bases + shift matrices for fixed shapes."""
    k = -(-n_fft // hop)
    L = k * hop
    K = n_fft // 2 + 1
    Kp = _round_up(K, 128)
    rows = F + k - 1
    total = n_fft + hop * (F - 1)

    cos_b, sin_b = _stft._dft_bases(n_fft)        # [n_fft, K]
    ci, si = _stft._idft_bases(n_fft)             # [K, n_fft]
    win = _stft.padded_window(win_size, n_fft)    # [n_fft]

    # windowed bases padded to plane grid [L] then split per plane
    def pad_cols(b):  # [K, n_fft] -> [Kp, L]
        out = np.zeros((Kp, L), np.float32)
        out[:K, :n_fft] = b
        return out

    def pad_rows(b):  # [n_fft, K] -> [L, Kp]
        out = np.zeros((L, Kp), np.float32)
        out[:n_fft, :K] = b
        return out

    win_L = np.zeros(L, np.float32)
    win_L[:n_fft] = win
    ciw = pad_cols(ci) * win_L[None, :]
    siw = pad_cols(si) * win_L[None, :]
    cw = pad_rows(cos_b) * win_L[:, None]
    sw = pad_rows(sin_b) * win_L[:, None]
    # per-plane splits: Ciw[s] = ciw[:, s·hop:(s+1)·hop]  ([k, Kp, hop])
    Ciw = np.stack([ciw[:, s * hop:(s + 1) * hop] for s in range(k)])
    Siw = np.stack([siw[:, s * hop:(s + 1) * hop] for s in range(k)])
    Cw = np.stack([cw[s * hop:(s + 1) * hop, :] for s in range(k)])
    Sw = np.stack([sw[s * hop:(s + 1) * hop, :] for s in range(k)])

    # shift matrices: Dn[s][i+s, i] = 1 (OLA down-shift),
    # Up[s] = Dn[s]^T (reframe up-shift)
    Dn = np.zeros((k, rows, F), np.float32)
    for s in range(k):
        Dn[s, np.arange(F) + s, np.arange(F)] = 1.0
    Up = np.transpose(Dn, (0, 2, 1)).copy()

    win_sq = win.astype(np.float64) ** 2
    wss = np.zeros(rows * hop, np.float64)
    for i in range(F):
        wss[i * hop: i * hop + n_fft] += win_sq
    wss_inv = (1.0 / np.where(wss > 1e-10, wss, 1.0)).astype(np.float32)
    # librosa center semantics: istft trims n_fft//2 each side, stft re-pads
    # with zeros — equivalent to zeroing those regions between iterations.
    pad = n_fft // 2
    mask = np.zeros(rows * hop, np.float32)
    mask[pad: total - pad] = 1.0
    return dict(k=k, L=L, K=K, Kp=Kp, rows=rows, total=total,
                Ciw=Ciw, Siw=Siw, Cw=Cw, Sw=Sw, Dn=Dn, Up=Up,
                wss_inv=(wss_inv * mask).reshape(rows, hop))


def build_griffin_lim_kernel(n_fft: int, hop: int, win_size: int, F: int,
                             iters: int = 60, interpret: bool = False):
    """Compile the fused G-L for a fixed frame count F.

    Returns fn(S [B, F, K]) → y [B, hop·(F-1)] (librosa-trimmed length).
    """
    c = _gl_constants(n_fft, hop, win_size, F)
    k, Kp, rows = c["k"], c["Kp"], c["rows"]

    def kernel(S_ref, ciw_ref, siw_ref, cw_ref, sw_ref, dn_ref, up_ref,
               wssinv_ref, out_ref):
        S = S_ref[0]                               # [F, Kp]

        # plane loops are rolled fori_loops with dynamic leading-dim VMEM
        # indexing — unrolling k=11 planes × 4 matmuls × 60 iterations makes
        # Mosaic compile time explode through the remote-compile tunnel
        def istft_ola(re, im):
            def plane(s, y):
                fr_s = (jnp.dot(re, ciw_ref[s],
                                preferred_element_type=jnp.float32)
                        - jnp.dot(im, siw_ref[s],
                                  preferred_element_type=jnp.float32))
                return y + jnp.dot(dn_ref[s], fr_s,
                                   preferred_element_type=jnp.float32)
            y = jax.lax.fori_loop(0, k, plane,
                                  jnp.zeros((rows, hop), jnp.float32))
            return y * wssinv_ref[:]

        def body(_, carry):
            re, im = carry
            y = istft_ola(re, im)

            def plane(s, acc):
                est_re, est_im = acc
                ys = jnp.dot(up_ref[s], y, preferred_element_type=jnp.float32)
                return (est_re + jnp.dot(ys, cw_ref[s],
                                         preferred_element_type=jnp.float32),
                        est_im - jnp.dot(ys, sw_ref[s],
                                         preferred_element_type=jnp.float32))
            est_re, est_im = jax.lax.fori_loop(
                0, k, plane, (jnp.zeros((F, Kp), jnp.float32),
                              jnp.zeros((F, Kp), jnp.float32)))
            mag = jnp.maximum(1e-8, jnp.sqrt(est_re * est_re + est_im * est_im))
            return (S * est_re / mag, S * est_im / mag)

        re, im = jax.lax.fori_loop(
            0, iters, body, (S, jnp.zeros((F, Kp), jnp.float32)))
        out_ref[0] = istft_ola(re, im)

    def make_call(B):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, F, Kp), lambda b: (b, 0, 0)),
                pl.BlockSpec((k, Kp, hop), lambda b: (0, 0, 0)),
                pl.BlockSpec((k, Kp, hop), lambda b: (0, 0, 0)),
                pl.BlockSpec((k, hop, Kp), lambda b: (0, 0, 0)),
                pl.BlockSpec((k, hop, Kp), lambda b: (0, 0, 0)),
                pl.BlockSpec((k, rows, F), lambda b: (0, 0, 0)),
                pl.BlockSpec((k, F, rows), lambda b: (0, 0, 0)),
                pl.BlockSpec((rows, hop), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, hop), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, rows, hop), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )

    @jax.jit
    def run(S):
        B = S.shape[0]
        S_p = jnp.pad(S, ((0, 0), (0, 0), (0, Kp - S.shape[-1])))
        y2d = make_call(B)(
            S_p, jnp.asarray(c["Ciw"]), jnp.asarray(c["Siw"]),
            jnp.asarray(c["Cw"]), jnp.asarray(c["Sw"]),
            jnp.asarray(c["Dn"]), jnp.asarray(c["Up"]),
            jnp.asarray(c["wss_inv"]))
        pad = n_fft // 2
        T = hop * (F - 1)
        return y2d.reshape(B, rows * hop)[:, pad: pad + T]

    return run


def fused_griffin_lim(S: jnp.ndarray, n_fft: int, hop: int, win_size: int,
                      iters: int = 60, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.griffin_lim.griffin_lim (zero-phase init path).

    S: [B, F, K] magnitude. Returns [B, hop·(F-1)].
    """
    B, F, K = S.shape
    run = build_griffin_lim_kernel(n_fft, hop, win_size, F, iters, interpret)
    return run(S)
