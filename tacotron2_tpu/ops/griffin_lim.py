"""Griffin-Lim phase reconstruction, jit-able and batched.

TPU-native equivalent of the reference's two G-L paths:
- numpy `_griffin_lim` (audio.py:151-161): random phase init, 60 iterations.
- in-graph `_griffin_lim_tensorflow` (audio.py:163-176): phase from unit-
  normalized STFT estimate (used when `GL_on_GPU=True`).

The device implementation follows the in-graph variant (iteration via
`lax.fori_loop`, phase = est / max(|est|, 1e-8)) and works on real (re, im)
pairs — complex dtypes are avoided entirely so the whole loop lowers to MXU
matmuls + VPU elementwise ops. Spectrograms are `[..., frames, bins]`
magnitude (already raised to `power`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import AudioConfig
from . import stft as _stft


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_size",
                                             "iters", "compute_dtype"))
def griffin_lim(S: jnp.ndarray, n_fft: int, hop: int, win_size: int,
                iters: int = 60, key: jax.Array | None = None,
                compute_dtype: str | None = None) -> jnp.ndarray:
    """Magnitude spectrogram [..., frames, bins] → waveform [..., T].

    If `key` is given, phases are initialized uniformly at random (numpy-path
    parity, audio.py:155); otherwise zero phase (deterministic).

    compute_dtype="bfloat16" runs the DFT matmuls of all iterations in bf16
    (~2x MXU throughput on TPU) — the magnitude projection re-imposes the
    f32 target spectrum every iteration, so quantization error does not
    accumulate; output is cast back to f32. Default f32 (reference parity).
    """
    S = jnp.asarray(S)
    if key is not None:
        phase = jax.random.uniform(key, S.shape, minval=0.0, maxval=2 * jnp.pi)
        re, im = S * jnp.cos(phase), S * jnp.sin(phase)
    else:
        re, im = S, jnp.zeros_like(S)

    dt = jnp.dtype(compute_dtype) if compute_dtype else S.dtype
    y = _stft.istft(re.astype(dt), im.astype(dt), n_fft, hop, win_size)

    def body(_, y):
        est_re, est_im = _stft.stft(y, n_fft, hop, win_size)
        est_re, est_im = est_re.astype(jnp.float32), est_im.astype(jnp.float32)
        mag = jnp.maximum(1e-8, jnp.sqrt(est_re * est_re + est_im * est_im))
        return _stft.istft((S * est_re / mag).astype(dt),
                           (S * est_im / mag).astype(dt),
                           n_fft, hop, win_size)

    return jax.lax.fori_loop(0, iters, body, y).astype(S.dtype)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_size",
                                             "iters"))
def griffin_lim_tf(S: jnp.ndarray, n_fft: int, hop: int, win_size: int,
                   iters: int = 60) -> jnp.ndarray:
    """Bit-faithful twin of the reference's in-graph Griffin-Lim
    (_griffin_lim_tensorflow, audio.py:163-176): tf.signal framing
    (uncentered win_size frames, raw hann OLA inverse), zero initial phase,
    angle = est / max(1e-8, |est|).

    S: magnitude [..., frames, bins] already raised to `power`.
    Deterministic; validated allclose against TF-generated golden fixtures
    in tests/test_reference_parity.py.
    """
    S = jnp.asarray(S)
    y = _stft.istft_tf(S, jnp.zeros_like(S), n_fft, hop, win_size)

    def body(_, y):
        est_re, est_im = _stft.stft_tf(y, n_fft, hop, win_size)
        mag = jnp.maximum(1e-8, jnp.sqrt(est_re * est_re + est_im * est_im))
        return _stft.istft_tf(S * est_re / mag, S * est_im / mag,
                              n_fft, hop, win_size)

    return jax.lax.fori_loop(0, iters, body, y) if iters else y


def inv_mel_spectrogram_tfgl(mel: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """GL_on_GPU path: inv_mel_spectrogram_tensorflow (audio.py:131-143).

    Like inv_mel_spectrogram but through the TF-semantics G-L; does NOT
    invert preemphasis (neither does the reference's TF path — callers apply
    inv_preemphasis on the host, tacotron/train.py:660)."""
    D = _stft.denormalize_db(mel, cfg) if cfg.signal_normalization else mel
    S = _stft.db_to_amp(D + cfg.ref_level_db) ** (1.0 / cfg.magnitude_power)
    lin = _stft.mel_to_linear(S, cfg)
    return griffin_lim_tf(lin ** cfg.power, cfg.n_fft, cfg.effective_hop,
                          cfg.win_size, cfg.griffin_lim_iters)


def inv_linear_spectrogram_tfgl(linear: jnp.ndarray,
                                cfg: AudioConfig) -> jnp.ndarray:
    """GL_on_GPU path: inv_linear_spectrogram_tensorflow (audio.py:118-129)."""
    D = (_stft.denormalize_db(linear, cfg) if cfg.signal_normalization
         else linear)
    S = _stft.db_to_amp(D + cfg.ref_level_db) ** (1.0 / cfg.magnitude_power)
    return griffin_lim_tf(S ** cfg.power, cfg.n_fft, cfg.effective_hop,
                          cfg.win_size, cfg.griffin_lim_iters)


def _kernel_eligible(S: jnp.ndarray, n_fft: int, hop: int,
                     key: jax.Array | None, use_kernel: bool | None) -> bool:
    """Dispatch policy for the fused Pallas G-L kernel (opt-in only).

    Measured on TPU v5e: the kernel's rolled per-plane fori_loop with
    dynamic leading-dim VMEM indexing lowers to VPU-speed matmuls — 2.8
    audio-s/s vs 395 for the XLA path at the production config. Until the
    kernel formulation beats XLA, auto (None) always takes the XLA path;
    the kernel runs only when forced with use_kernel=True (it remains
    correct, covered by tests/test_pallas_kernels.py).

    The kernel handles the zero-phase-init path on batched [B, F, K]
    magnitudes; the VMEM estimate gates out frame counts whose folded DFT
    bases + state no longer fit on-chip."""
    if use_kernel is not True:
        return False
    if key is not None or S.ndim != 3:
        return False
    F = S.shape[-2]
    k = -(-n_fft // hop)
    Kp = (S.shape[-1] + 127) // 128 * 128
    rows = F + k - 1
    vmem = 4 * (4 * k * Kp * hop + 2 * k * rows * F
                + 3 * rows * hop + 6 * F * Kp)
    return vmem < 100 * 1024 * 1024


def _griffin_lim_dispatch(S: jnp.ndarray, n_fft: int, hop: int, win_size: int,
                          iters: int, key: jax.Array | None,
                          use_kernel: bool | None,
                          compute_dtype: str | None = None) -> jnp.ndarray:
    if _kernel_eligible(S, n_fft, hop, key, use_kernel):
        from .griffin_lim_kernel import fused_griffin_lim
        return fused_griffin_lim(S, n_fft, hop, win_size, iters)
    return griffin_lim(S, n_fft, hop, win_size, iters, key,
                       compute_dtype=compute_dtype)


def inv_linear_spectrogram(linear: jnp.ndarray, cfg: AudioConfig,
                           key: jax.Array | None = None,
                           use_kernel: bool | None = None) -> jnp.ndarray:
    """Normalized linear spectrogram [..., frames, bins] → waveform.

    Reference: inv_linear_spectrogram (audio.py:79-94) minus host-side inverse
    preemphasis (apply `data.audio.inv_preemphasis` on the host after).

    use_kernel: None (default) and False take the XLA path — the measured-
    faster production route on TPU v5e; True forces the fused Pallas kernel
    (batched zero-phase inputs that fit VMEM only, see _kernel_eligible).
    """
    D = _stft.denormalize_db(linear, cfg) if cfg.signal_normalization else linear
    S = _stft.db_to_amp(D + cfg.ref_level_db) ** (1.0 / cfg.magnitude_power)
    return _griffin_lim_dispatch(S ** cfg.power, cfg.n_fft, cfg.effective_hop,
                                 cfg.win_size, cfg.griffin_lim_iters, key,
                                 use_kernel, cfg.gl_compute_dtype)


def inv_mel_spectrogram(mel: jnp.ndarray, cfg: AudioConfig,
                        key: jax.Array | None = None,
                        use_kernel: bool | None = None) -> jnp.ndarray:
    """Normalized mel spectrogram [..., frames, mels] → waveform.

    Reference: inv_mel_spectrogram (audio.py:97-112): denormalize → dB→amp →
    mel→linear via pinv basis → G-L.

    use_kernel: see inv_linear_spectrogram.
    """
    D = _stft.denormalize_db(mel, cfg) if cfg.signal_normalization else mel
    S = _stft.db_to_amp(D + cfg.ref_level_db) ** (1.0 / cfg.magnitude_power)
    lin = _stft.mel_to_linear(S, cfg)
    return _griffin_lim_dispatch(lin ** cfg.power, cfg.n_fft,
                                 cfg.effective_hop, cfg.win_size,
                                 cfg.griffin_lim_iters, key, use_kernel,
                                 cfg.gl_compute_dtype)
