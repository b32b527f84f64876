"""STFT / mel-spectrogram ops, TPU-native (JAX/XLA) with numpy host twins.

Re-implements the DSP surface of reference code/datasets/audio.py:61-298 —
librosa-compatible semantics (center padding with zeros, periodic Hann window
padded to n_fft, slaney-normalized mel filterbank) — as jit-able JAX functions
plus numpy equivalents for host-side preprocessing. librosa itself is not a
dependency.

TPU-first design notes:
- The device STFT/iSTFT are **real-valued DFT matmuls** against precomputed
  cos/sin bases, not FFTs: complex dtypes and FFT lowering are second-class on
  TPU, while a [frames, n_fft] x [n_fft, bins] matmul rides the MXU at full
  throughput (~0.7 GFLOP per audio-second at 16 kHz — negligible).
- Spectrograms are batch-first `[..., frames, bins]` (the reference keeps
  `[bins, frames]`; we transpose at serialization boundaries) so the mel
  projection is one more MXU matmul.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig

# ----------------------------------------------------------------- windows


def hann_window(win_size: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (scipy get_window('hann', n, fftbins=True))."""
    n = np.arange(win_size)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)).astype(dtype)


def padded_window(win_size: int, n_fft: int, dtype=np.float32) -> np.ndarray:
    """Hann window centered in an n_fft-length buffer (librosa util.pad_center)."""
    w = hann_window(win_size, dtype)
    lpad = (n_fft - win_size) // 2
    return np.pad(w, (lpad, n_fft - win_size - lpad))


# ------------------------------------------------------------- DFT matrices


@functools.lru_cache(maxsize=4)
def _dft_bases(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin bases [n_fft, K] with K = n_fft//2+1 for the forward rDFT."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _idft_bases(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse bases [K, n_fft]: x = re @ Ci - im @ Si (hermitian weights)."""
    K = n_fft // 2 + 1
    k = np.arange(K)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft
    w = np.full((K, 1), 2.0, dtype=np.float64)
    w[0, 0] = 1.0
    if n_fft % 2 == 0:
        w[-1, 0] = 1.0
    ci = (w * np.cos(ang) / n_fft).astype(np.float32)
    si = (w * np.sin(ang) / n_fft).astype(np.float32)
    return ci, si


# ----------------------------------------------------------------- mel basis


def _hz_to_mel(freqs: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freqs = np.asanyarray(freqs, dtype=np.float64)
    return np.where(freqs >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freqs, 1e-10) / min_log_hz) / logstep,
                    freqs / f_sp)


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mels = np.asanyarray(mels, dtype=np.float64)
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    f_sp * mels)


@functools.lru_cache(maxsize=8)
def mel_basis(sample_rate: int, n_fft: int, num_mels: int, fmin: float,
              fmax: float) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank `[num_mels, n_fft//2+1]`.

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) as used by the
    reference's _build_mel_basis (audio.py:243-246).
    """
    assert fmax <= sample_rate // 2, "fmax above Nyquist"
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), num_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2: num_mels + 2] - mel_f[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def inv_mel_basis(sample_rate: int, n_fft: int, num_mels: int, fmin: float,
                  fmax: float) -> np.ndarray:
    """Pseudo-inverse of the mel basis `[n_fft//2+1, num_mels]` (audio.py:231-235)."""
    return np.linalg.pinv(
        mel_basis(sample_rate, n_fft, num_mels, fmin, fmax)).astype(np.float32)


def config_mel_basis(cfg: AudioConfig) -> np.ndarray:
    return mel_basis(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax)


def config_inv_mel_basis(cfg: AudioConfig) -> np.ndarray:
    return inv_mel_basis(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax)


# ----------------------------------------------------------------- framing


def n_frames(signal_len: int, n_fft: int, hop: int) -> int:
    """Number of centered STFT frames for a signal of given length."""
    return 1 + (signal_len + 2 * (n_fft // 2) - n_fft) // hop


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int,
                 win_size: int | None = None) -> jnp.ndarray:
    """Center-pad with zeros and slice into overlapping frames.

    y: [..., T] → [..., frames, extent]. Matches librosa.stft framing with
    center=True, pad_mode='constant' (reference audio.py:182).

    If `win_size` is given and smaller than n_fft, only the window-support
    extent [lpad, lpad+win_size) of each frame is materialized (extent =
    win_size): librosa pads the hann window to n_fft with zeros, so the
    out-of-support samples are multiplied by zero in the windowed matmul and
    dropping them is exact — it cuts the DFT matmul FLOPs by n_fft/win_size
    (2.56x at the production 2048/800 config).

    TPU note: built from k = ceil(extent/hop) static hop-plane slices of a
    [rows, hop] reshape instead of a [frames, extent] gather — XLA gathers
    with large index matrices are orders slower on TPU than sliced reshapes.
    """
    pad = n_fft // 2
    if win_size is None or win_size >= n_fft:
        extent, lpad = n_fft, 0
    else:
        extent, lpad = win_size, (n_fft - win_size) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)])
    num = 1 + (y.shape[-1] - n_fft) // hop
    off_planes, off_rem = divmod(lpad, hop)
    z = y[..., off_rem:]
    k = -(-extent // hop)
    need = (num - 1 + off_planes + k) * hop
    z = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(0, max(0, need - z.shape[-1]))])
    z = z[..., :need]
    z2d = z.reshape(z.shape[:-1] + (-1, hop))            # [..., rows, hop]
    planes = [z2d[..., off_planes + s: off_planes + s + num, :]
              for s in range(k)]                          # each [..., num, hop]
    frames = jnp.concatenate(planes, axis=-1)             # [..., num, k·hop]
    return frames[..., :extent]


def stft(y: jnp.ndarray, n_fft: int, hop: int, win_size: int
         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real STFT via DFT matmul. y: [..., T] → (re, im) each [..., frames, K].

    Sign convention matches np.fft.rfft: X[k] = Σ x[n]·e^{-2πikn/N}.
    The frame/basis product is restricted to the window support (see
    frame_signal) — exact, since the padded window is zero outside it.
    """
    lpad = (n_fft - win_size) // 2 if win_size < n_fft else 0
    cos_b, sin_b = _dft_bases(n_fft)
    window = hann_window(win_size) if win_size < n_fft else padded_window(
        win_size, n_fft)
    frames = frame_signal(y, n_fft, hop, win_size) * jnp.asarray(
        window, dtype=y.dtype)
    ext = frames.shape[-1]
    re = frames @ jnp.asarray(cos_b[lpad: lpad + ext], dtype=frames.dtype)
    im = -(frames @ jnp.asarray(sin_b[lpad: lpad + ext], dtype=frames.dtype))
    return re, im


def stft_mag(y: jnp.ndarray, n_fft: int, hop: int, win_size: int) -> jnp.ndarray:
    """|STFT| — [..., frames, K]."""
    re, im = stft(y, n_fft, hop, win_size)
    return jnp.sqrt(re * re + im * im)


def istft(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop: int,
          win_size: int) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add with window-sum-square norm.

    (re, im): [..., frames, K] → [..., T] with T = hop·(frames-1)
    (librosa.istft center=True semantics, reference audio.py:184-185).
    """
    ci, si = _idft_bases(n_fft)
    if win_size < n_fft:
        lpad = (n_fft - win_size) // 2
        window = hann_window(win_size)
    else:
        lpad = 0
        window = padded_window(win_size, n_fft)
    ext = window.shape[0]
    # irfft with rfft sign convention: x = re @ ci - (-im) @ si = re@ci + im@si
    # restricted to the window support [lpad, lpad+ext) — exact (see stft)
    frames = ((re @ jnp.asarray(ci[:, lpad: lpad + ext], dtype=re.dtype)
               - im @ jnp.asarray(si[:, lpad: lpad + ext], dtype=re.dtype))
              * jnp.asarray(window, dtype=re.dtype))

    num = frames.shape[-2]
    total = n_fft + hop * (num - 1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, num, ext))

    # overlap-add as shifted hop-plane additions — no scatter (XLA
    # scatter-add is the slow path on TPU). Support sample j of frame i
    # lives at output position i·hop + lpad + j; with lpad = off_planes·hop
    # + off_rem, left-padding the frames by off_rem makes plane s of frame i
    # land at row i + off_planes + s of the [num+k_full-1, hop] grid.
    k_full = -(-n_fft // hop)
    off_planes, off_rem = divmod(lpad, hop)
    ext2 = off_rem + ext
    k = -(-ext2 // hop)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (off_rem, k * hop - ext2)))
    planes = flat.reshape(flat.shape[0], num, k, hop)
    rows = num + k_full - 1
    acc = jnp.zeros((flat.shape[0], rows, hop), dtype=flat.dtype)
    for s in range(k):
        r = off_planes + s
        acc = acc + jnp.pad(planes[:, :, s, :],
                            ((0, 0), (r, rows - num - r), (0, 0)))
    y = acc.reshape(flat.shape[0], -1)[:, :total]

    # window-sum-square normalization (static, precomputed on host)
    win_sq = (padded_window(win_size, n_fft).astype(np.float64) ** 2)
    wss = np.zeros(total, dtype=np.float64)
    for i in range(num):
        wss[i * hop: i * hop + n_fft] += win_sq
    y = y / jnp.asarray(np.where(wss > 1e-10, wss, 1.0).astype(np.float32),
                        dtype=y.dtype)

    pad = n_fft // 2
    y = y[:, pad: total - pad]
    return y.reshape(batch_shape + (y.shape[-1],))


# --------------------------------------------- TF-semantics STFT (GL_on_GPU)
#
# The reference's in-graph Griffin-Lim (audio.py:163-176) uses
# tf.contrib.signal.{stft,inverse_stft} with frame_length=win_size, NO
# centering, a hann(win_size) analysis window, rfft zero-padded to n_fft,
# and raw hann-windowed overlap-add on the inverse (no window-sum-square
# normalization — the resulting constant gain cancels in G-L's angle
# extraction and in save_wav's peak normalization). These variants replicate
# that bit-for-bit so the GL_on_GPU output waveform is reference-checkable
# (tests/test_reference_parity.py vs TF-generated golden fixtures).


def frame_uncentered(y: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """[..., T] → [..., frames, frame_len] with no padding (TF framing)."""
    num = 1 + (y.shape[-1] - frame_len) // hop
    k = -(-frame_len // hop)
    need = (num - 1 + k) * hop
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, max(0, need - y.shape[-1]))])
    # trim to the hop multiple actually read: without this the reshape
    # fails whenever the input length is not a hop multiple (e.g. the
    # istft_tf output hop·(frames-1)+win with win % hop != 0)
    y = y[..., :need]
    y2d = y.reshape(y.shape[:-1] + (-1, hop))
    planes = [y2d[..., s: s + num, :] for s in range(k)]
    return jnp.concatenate(planes, axis=-1)[..., :frame_len]


def stft_tf(y: jnp.ndarray, n_fft: int, hop: int, win_size: int
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tf.signal.stft semantics: uncentered hann(win) frames, rfft @ n_fft."""
    cos_b, sin_b = _dft_bases(n_fft)
    frames = frame_uncentered(y, win_size, hop) * jnp.asarray(
        hann_window(win_size))
    re = frames @ jnp.asarray(cos_b[:win_size])
    im = -(frames @ jnp.asarray(sin_b[:win_size]))
    return re, im


def istft_tf(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop: int,
             win_size: int) -> jnp.ndarray:
    """tf.signal.inverse_stft semantics (default window_fn=hann): irfft at
    n_fft truncated to win_size, hann-windowed, raw overlap-add.

    [..., frames, K] → [..., hop·(frames-1) + win_size]."""
    ci, si = _idft_bases(n_fft)
    frames = ((re @ jnp.asarray(ci[:, :win_size])
               - im @ jnp.asarray(si[:, :win_size]))
              * jnp.asarray(hann_window(win_size)))

    num = frames.shape[-2]
    total = win_size + hop * (num - 1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, num, win_size))
    k = -(-win_size // hop)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, k * hop - win_size)))
    planes = flat.reshape(flat.shape[0], num, k, hop)
    acc = jnp.zeros((flat.shape[0], num + k - 1, hop), dtype=flat.dtype)
    for s in range(k):
        acc = acc + jnp.pad(planes[:, :, s, :],
                            ((0, 0), (s, k - 1 - s), (0, 0)))
    y = acc.reshape(flat.shape[0], -1)[:, :total]
    return y.reshape(batch_shape + (total,))


# ----------------------------------------------------------- db / normalize


def amp_to_db(x: jnp.ndarray, min_level_db: float) -> jnp.ndarray:
    """20·log10(max(min_level, x)) with min_level = 10^(min_level_db/20)."""
    min_level = np.exp(min_level_db / 20.0 * np.log(10.0)).astype(np.float32)
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize_db(S: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """dB spectrogram → model range (reference _normalize, audio.py:258-270)."""
    m = cfg.max_abs_value
    scaled = (S - cfg.min_level_db) / (-cfg.min_level_db)
    if cfg.symmetric_mels:
        out = 2.0 * m * scaled - m
        lo, hi = -m, m
    else:
        out = m * scaled
        lo, hi = 0.0, m
    if cfg.allow_clipping_in_normalization:
        out = jnp.clip(out, lo, hi)
    return out


def denormalize_db(D: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Model range → dB (reference _denormalize, audio.py:272-284)."""
    m = cfg.max_abs_value
    if cfg.allow_clipping_in_normalization:
        D = jnp.clip(D, -m if cfg.symmetric_mels else 0.0, m)
    if cfg.symmetric_mels:
        return (D + m) * -cfg.min_level_db / (2.0 * m) + cfg.min_level_db
    return D * -cfg.min_level_db / m + cfg.min_level_db


# ----------------------------------------------------------- spectrograms


def linear_spectrogram(y: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Waveform [..., T] → normalized linear spectrogram [..., frames, num_freq].

    Reference: linearspectrogram (audio.py:61-68). No in-graph preemphasis —
    the reference applies preemphasis on the host before calling.
    """
    mag = stft_mag(y, cfg.n_fft, cfg.effective_hop, cfg.win_size)
    S = amp_to_db(mag ** cfg.magnitude_power, cfg.min_level_db) - cfg.ref_level_db
    return normalize_db(S, cfg) if cfg.signal_normalization else S


def mel_spectrogram(y: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Waveform [..., T] → normalized mel spectrogram [..., frames, num_mels].

    Reference: melspectrogram (audio.py:70-77). The mel projection rides the
    MXU as a [frames, bins] × [bins, mels] matmul.
    """
    mag = stft_mag(y, cfg.n_fft, cfg.effective_hop, cfg.win_size) ** cfg.magnitude_power
    mel = mag @ jnp.asarray(config_mel_basis(cfg)).T
    S = amp_to_db(mel, cfg.min_level_db) - cfg.ref_level_db
    return normalize_db(S, cfg) if cfg.signal_normalization else S


def mel_to_linear(mel_mag: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Magnitude mel [..., frames, mels] → linear [..., frames, bins] via pinv."""
    inv = jnp.asarray(config_inv_mel_basis(cfg))
    return jnp.maximum(1e-10, mel_mag @ inv.T)
