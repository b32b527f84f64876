"""Host-side (numpy) audio DSP for preprocessing and file IO.

Numpy twin of reference code/datasets/audio.py (librosa-free): wav load/save
with resampling, silence trimming, preemphasis, mel/linear spectrograms and
Griffin-Lim inversion. The device (JAX) versions live in
`tacotron2_tpu.ops.{stft,griffin_lim}`; both share the same filterbank and
normalization code so host features and device features agree bit-for-bit in
float32.
"""

from __future__ import annotations

import numpy as np
from scipy import signal
from scipy.io import wavfile

from ..config import AudioConfig
from ..ops import stft as _stft

# ------------------------------------------------------------------- file IO


def load_wav(path: str, sr: int) -> np.ndarray:
    """Load a wav as float32 in [-1, 1], resampled to `sr`.

    Drop-in for librosa.core.load (reference audio.py:9-10).
    """
    file_sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wav = data.astype(np.float32)
    if wav.ndim == 2:
        wav = wav.mean(axis=1)
    if file_sr != sr:
        g = np.gcd(int(file_sr), int(sr))
        wav = signal.resample_poly(wav, sr // g, file_sr // g).astype(np.float32)
    return wav


def save_wav(wav: np.ndarray, path: str, sr: int) -> None:
    """Peak-normalize to int16 and write (reference audio.py:12-15)."""
    wav = np.asarray(wav, dtype=np.float32)
    if wav.size == 0:  # degenerate synthesis (e.g. stop token at step 0)
        wav = np.zeros(1, np.float32)
    wav = wav * (32767 / max(0.01, np.max(np.abs(wav))))
    wavfile.write(path, sr, wav.astype(np.int16))


def save_wavenet_wav(wav: np.ndarray, path: str, sr: int) -> None:
    save_wav(wav, path, sr)


# -------------------------------------------------------------- preemphasis


def preemphasis(wav: np.ndarray, k: float, preemphasize: bool = True) -> np.ndarray:
    """y[n] = x[n] - k·x[n-1] (reference audio.py:22-25)."""
    if preemphasize:
        return signal.lfilter([1, -k], [1], wav).astype(np.float32)
    return wav


def inv_preemphasis(wav: np.ndarray, k: float, inv_preemphasize: bool = True) -> np.ndarray:
    """y[n] = x[n] + k·y[n-1] (reference audio.py:27-30)."""
    if inv_preemphasize:
        return signal.lfilter([1], [1, -k], wav).astype(np.float32)
    return wav


# ----------------------------------------------------------------- trimming


def trim_silence(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Trim leading/trailing silence below `trim_top_db` relative to peak RMS.

    Behavioral twin of librosa.effects.trim (reference audio.py:46-52):
    frame-wise RMS (centered frames, zero padding), dB relative to max, keep
    [first, last] non-silent frames.
    """
    frame, hop = cfg.trim_fft_size, cfg.trim_hop_size
    if len(wav) == 0:
        return wav
    padded = np.pad(wav, (frame // 2, frame // 2))
    num = 1 + (len(padded) - frame) // hop
    idx = np.arange(num)[:, None] * hop + np.arange(frame)[None, :]
    rms = np.sqrt(np.mean(padded[idx] ** 2, axis=1))
    ref = np.max(rms)
    if ref <= 0:
        return wav
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref)
    nonsilent = np.flatnonzero(db > -cfg.trim_top_db)
    if len(nonsilent) == 0:
        return wav[:0]
    start = int(nonsilent[0]) * hop
    end = min(len(wav), (int(nonsilent[-1]) + 1) * hop)
    return wav[start:end]


def split_silence(wav: np.ndarray, top_db: float = 20.0,
                  frame_length: int = 2048, hop_length: int = 512) -> np.ndarray:
    """Non-silent intervals `[[start, end), ...]` in samples.

    Behavioral twin of librosa.effects.split (used as voice-activity
    detection by the reference's TI-SV discriminator preprocessing,
    spk_disc/data_preprocess.py:118,175): frame-wise RMS in dB relative to
    the peak frame, contiguous runs above `-top_db` become intervals.
    """
    wav = np.asarray(wav)
    if len(wav) == 0:
        return np.zeros((0, 2), np.int64)
    padded = np.pad(wav, (frame_length // 2, frame_length // 2))
    num = 1 + (len(padded) - frame_length) // hop_length
    idx = (np.arange(num)[:, None] * hop_length
           + np.arange(frame_length)[None, :])
    rms = np.sqrt(np.mean(padded[idx] ** 2, axis=1))
    ref = np.max(rms)
    if ref <= 0:
        return np.zeros((0, 2), np.int64)
    nonsilent = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref) > -top_db
    edges = np.diff(nonsilent.astype(np.int8), prepend=0, append=0)
    starts = np.flatnonzero(edges == 1) * hop_length
    ends = np.flatnonzero(edges == -1) * hop_length
    return np.stack([np.minimum(starts, len(wav)),
                     np.minimum(ends, len(wav))], axis=1).astype(np.int64)


def start_and_end_indices(quantized: np.ndarray, silence_threshold: int = 2):
    """First/last sample outside mulaw silence (reference audio.py:33-44)."""
    nonsilent = np.flatnonzero(np.abs(quantized.astype(np.int64) - 127) > silence_threshold)
    if len(nonsilent) == 0:
        return 0, len(quantized)
    return int(nonsilent[0]), int(nonsilent[-1])


# ------------------------------------------------------------- spectrograms


def _stft_np(y: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Centered STFT → [frames, bins] (numpy)."""
    n_fft, hop = cfg.n_fft, cfg.effective_hop
    pad = n_fft // 2
    y = np.pad(y, (pad, pad))
    num = 1 + (len(y) - n_fft) // hop
    idx = np.arange(num)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[idx] * _stft.padded_window(cfg.win_size, n_fft)
    return np.fft.rfft(frames, n=n_fft, axis=-1)


def _istft_np(spec: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """[frames, bins] complex → waveform (numpy overlap-add)."""
    n_fft, hop = cfg.n_fft, cfg.effective_hop
    window = _stft.padded_window(cfg.win_size, n_fft)
    frames = np.fft.irfft(spec, n=n_fft, axis=-1) * window
    num = frames.shape[0]
    total = n_fft + hop * (num - 1)
    y = np.zeros(total, dtype=np.float64)
    wss = np.zeros(total, dtype=np.float64)
    win_sq = window.astype(np.float64) ** 2
    for i in range(num):
        y[i * hop: i * hop + n_fft] += frames[i]
        wss[i * hop: i * hop + n_fft] += win_sq
    y /= np.where(wss > 1e-10, wss, 1.0)
    pad = n_fft // 2
    return y[pad: total - pad].astype(np.float32)


def _amp_to_db(x: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    min_level = np.exp(cfg.min_level_db / 20 * np.log(10))
    return 20 * np.log10(np.maximum(min_level, x))


def _db_to_amp(x: np.ndarray) -> np.ndarray:
    return np.power(10.0, x * 0.05)


def _normalize(S: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    m = cfg.max_abs_value
    scaled = (S - cfg.min_level_db) / (-cfg.min_level_db)
    if cfg.symmetric_mels:
        out, lo, hi = 2 * m * scaled - m, -m, m
    else:
        out, lo, hi = m * scaled, 0.0, m
    if cfg.allow_clipping_in_normalization:
        out = np.clip(out, lo, hi)
    else:
        assert S.max() <= 0 and S.min() - cfg.min_level_db >= 0
    return out


def _denormalize(D: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    m = cfg.max_abs_value
    if cfg.allow_clipping_in_normalization:
        D = np.clip(D, -m if cfg.symmetric_mels else 0.0, m)
    if cfg.symmetric_mels:
        return (D + m) * -cfg.min_level_db / (2 * m) + cfg.min_level_db
    return D * -cfg.min_level_db / m + cfg.min_level_db


def linear_spectrogram(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """[T] waveform → [frames, num_freq] normalized linear spectrogram."""
    D = _stft_np(wav, cfg)
    S = _amp_to_db(np.abs(D) ** cfg.magnitude_power, cfg) - cfg.ref_level_db
    return _normalize(S, cfg).astype(np.float32) if cfg.signal_normalization else S.astype(np.float32)


def mel_spectrogram(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """[T] waveform → [frames, num_mels] normalized mel spectrogram.

    Reference melspectrogram (audio.py:70-77), transposed to frames-major.
    """
    D = _stft_np(wav, cfg)
    mag = np.abs(D) ** cfg.magnitude_power
    mel = mag @ _stft.config_mel_basis(cfg).T
    S = _amp_to_db(mel, cfg) - cfg.ref_level_db
    return _normalize(S, cfg).astype(np.float32) if cfg.signal_normalization else S.astype(np.float32)


# -------------------------------------------------------------- inversion


def _griffin_lim_np(S: np.ndarray, cfg: AudioConfig,
                    rng: np.random.Generator | None = None,
                    init_angles: np.ndarray | None = None) -> np.ndarray:
    """Numpy Griffin-Lim (reference _griffin_lim, audio.py:151-161).

    `init_angles` (uniform [0,1) phases/2π) overrides the RNG — used by the
    reference-parity tests to compare bitwise against golden fixtures."""
    if init_angles is None:
        rng = rng or np.random.default_rng(0)
        init_angles = rng.random(S.shape)
    angles = np.exp(2j * np.pi * init_angles)
    S_complex = np.abs(S).astype(np.complex128)
    y = _istft_np(S_complex * angles, cfg)
    for _ in range(cfg.griffin_lim_iters):
        angles = np.exp(1j * np.angle(_stft_np(y, cfg)))
        y = _istft_np(S_complex * angles, cfg)
    return y


def inv_linear_spectrogram(linear: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Normalized linear [frames, bins] → waveform (audio.py:79-94)."""
    D = _denormalize(linear, cfg) if cfg.signal_normalization else linear
    S = _db_to_amp(D + cfg.ref_level_db) ** (1 / cfg.magnitude_power)
    return inv_preemphasis(_griffin_lim_np(S ** cfg.power, cfg),
                           cfg.preemphasis, cfg.preemphasize)


def inv_mel_spectrogram(mel: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Normalized mel [frames, mels] → waveform (audio.py:97-112)."""
    D = _denormalize(mel, cfg) if cfg.signal_normalization else mel
    S = _db_to_amp(D + cfg.ref_level_db) ** (1 / cfg.magnitude_power)
    lin = np.maximum(1e-10, S @ _stft.config_inv_mel_basis(cfg).T)
    return inv_preemphasis(_griffin_lim_np(lin ** cfg.power, cfg),
                           cfg.preemphasis, cfg.preemphasize)


def pad_lr(x: np.ndarray, cfg: AudioConfig):
    """Right (or both-sides) padding to a whole number of hops.

    Reference librosa_pad_lr (audio.py:210-219) — the hop-alignment invariant
    WaveNet training depends on.
    """
    fshift = cfg.effective_hop
    pad = (x.shape[0] // fshift + 1) * fshift - x.shape[0]
    if cfg.wavenet_pad_sides == 1:
        return 0, pad
    return pad // 2, pad // 2 + pad % 2
