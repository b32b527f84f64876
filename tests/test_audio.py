"""DSP parity + invariant tests: STFT, mel basis, normalize, Griffin-Lim.

Covers the invariants the reference relies on (SURVEY.md §4): hop alignment,
[-4, 4] normalization range, mel/linear inversion fidelity, and host (numpy) ↔
device (JAX) agreement.
"""

import numpy as np
import pytest

from tacotron2_tpu.config import AudioConfig
from tacotron2_tpu.data import audio as host_audio
from tacotron2_tpu.ops import griffin_lim as gl
from tacotron2_tpu.ops import mulaw
from tacotron2_tpu.ops import stft as dsp

CFG = AudioConfig()


def _chirp(sr=16000, dur=0.5):
    t = np.linspace(0, dur, int(sr * dur), endpoint=False)
    return (0.5 * np.sin(2 * np.pi * (200 + 400 * t) * t)).astype(np.float32)


# ------------------------------------------------------------------ mel basis

def test_mel_basis_shape_and_norm():
    basis = dsp.config_mel_basis(CFG)
    assert basis.shape == (80, 1025)
    # every filter has positive area; slaney norm keeps peaks < 0.05 generally
    assert (basis.sum(axis=1) > 0).all()
    # filters tile the [fmin, fmax] band: column sums nonzero inside the band
    freqs = np.linspace(0, CFG.sample_rate / 2, CFG.n_fft // 2 + 1)
    band = (freqs > 100) & (freqs < 7000)
    assert (basis.sum(axis=0)[band] > 0).all()


def test_mel_basis_slaney_values():
    # Golden values computed from the slaney formula (librosa htk=False):
    # mel(1000 Hz) = 15.0, hz(15) = 1000
    assert np.isclose(dsp._hz_to_mel(np.array(1000.0)), 15.0)
    assert np.isclose(dsp._mel_to_hz(np.array(15.0)), 1000.0)
    assert np.isclose(dsp._hz_to_mel(np.array(6400.0)), 15.0 + 27.0, atol=1e-6)


# ---------------------------------------------------------------------- STFT

def test_stft_matches_numpy():
    y = _chirp()
    D_np = host_audio._stft_np(y, CFG)
    re, im = dsp.stft(np.asarray(y), CFG.n_fft, CFG.hop_size, CFG.win_size)
    re, im = np.asarray(re), np.asarray(im)
    assert re.shape == D_np.shape
    np.testing.assert_allclose(re, D_np.real, atol=2e-2)
    np.testing.assert_allclose(im, D_np.imag, atol=2e-2)
    np.testing.assert_allclose(np.hypot(re, im), np.abs(D_np), atol=2e-2)


def test_stft_frame_count():
    y = _chirp()
    T = dsp.n_frames(len(y), CFG.n_fft, CFG.hop_size)
    D = host_audio._stft_np(y, CFG)
    assert D.shape[0] == T == 1 + (len(y) + 2 * 1024 - 2048) // 200


def test_istft_roundtrip():
    y = _chirp()
    re, im = dsp.stft(np.asarray(y), CFG.n_fft, CFG.hop_size, CFG.win_size)
    y2 = np.asarray(dsp.istft(re, im, CFG.n_fft, CFG.hop_size, CFG.win_size))
    n = min(len(y), len(y2))
    # interior samples reconstruct to high accuracy (COLA)
    np.testing.assert_allclose(y2[1024:n - 1024], y[1024:n - 1024], atol=1e-3)


# --------------------------------------------------------------- mel features

def test_mel_range_and_shape():
    y = _chirp()
    mel = host_audio.mel_spectrogram(host_audio.preemphasis(y, CFG.preemphasis), CFG)
    assert mel.shape[1] == 80
    assert mel.min() >= -CFG.max_abs_value - 1e-6
    assert mel.max() <= CFG.max_abs_value + 1e-6


def test_host_device_mel_agree():
    y = host_audio.preemphasis(_chirp(), CFG.preemphasis)
    mel_host = host_audio.mel_spectrogram(y, CFG)
    mel_dev = np.asarray(dsp.mel_spectrogram(np.asarray(y), CFG))
    np.testing.assert_allclose(mel_dev, mel_host, atol=2e-2)


def test_normalize_denormalize_inverse():
    S = np.random.default_rng(0).uniform(-100, 0, (13, 80)).astype(np.float32)
    N = host_audio._normalize(S, CFG)
    D = host_audio._denormalize(N, CFG)
    np.testing.assert_allclose(D, S, atol=1e-4)


# -------------------------------------------------------------- Griffin-Lim

def test_griffin_lim_recovers_signal_spectrum():
    y = _chirp()
    mel = host_audio.mel_spectrogram(host_audio.preemphasis(y, CFG.preemphasis), CFG)
    wav = np.asarray(gl.inv_mel_spectrogram(np.asarray(mel), CFG))
    wav = host_audio.inv_preemphasis(wav, CFG.preemphasis)
    # inverted audio must re-analyze to a close mel spectrogram
    mel2 = host_audio.mel_spectrogram(host_audio.preemphasis(wav, CFG.preemphasis), CFG)
    n = min(len(mel), len(mel2))
    mae = np.abs(mel[:n] - mel2[:n]).mean()
    assert mae < 0.6, f"mel MAE after G-L roundtrip too high: {mae}"


def test_griffin_lim_host_matches_device_path():
    y = host_audio.preemphasis(_chirp(dur=0.3), CFG.preemphasis)
    mel = host_audio.mel_spectrogram(y, CFG)
    host_wav = host_audio.inv_mel_spectrogram(mel, CFG)
    dev_wav = host_audio.inv_preemphasis(
        np.asarray(gl.inv_mel_spectrogram(np.asarray(mel), CFG)), CFG.preemphasis)
    # G-L phase init differs; compare reconstructed mel error instead
    m1 = host_audio.mel_spectrogram(host_audio.preemphasis(host_wav, CFG.preemphasis), CFG)
    m2 = host_audio.mel_spectrogram(host_audio.preemphasis(dev_wav, CFG.preemphasis), CFG)
    n = min(len(m1), len(m2), len(mel))
    assert np.abs(m1[:n] - mel[:n]).mean() < 0.75
    assert np.abs(m2[:n] - mel[:n]).mean() < 0.75


# -------------------------------------------------------------------- mulaw

def test_mulaw_roundtrip():
    x = np.linspace(-0.99, 0.99, 101).astype(np.float32)
    np.testing.assert_allclose(mulaw.inv_mulaw(mulaw.mulaw(x)), x, atol=1e-5)
    q = mulaw.mulaw_quantize(x)
    assert q.min() >= 0 and q.max() <= 255
    xr = mulaw.inv_mulaw_quantize(q)
    # quantize TRUNCATES (reference _asint semantics, util.py:98-103): up to
    # a full LSB of companded-domain error, ~0.045 after expansion at |x|~1
    assert np.abs(xr - x).max() < 0.05
    # silence centers on 127, the value start_and_end_indices assumes
    assert int(mulaw.mulaw_quantize(np.zeros(1))[0]) == 127


def test_trim_silence():
    y = np.concatenate([np.zeros(8000), _chirp(), np.zeros(8000)]).astype(np.float32)
    trimmed = host_audio.trim_silence(y, CFG)
    assert len(trimmed) < len(y)
    assert len(trimmed) >= len(_chirp()) - 2 * CFG.trim_hop_size


def test_preemphasis_roundtrip():
    y = _chirp()
    np.testing.assert_allclose(
        host_audio.inv_preemphasis(host_audio.preemphasis(y, 0.97), 0.97), y,
        atol=1e-4)


def test_pad_lr_hop_alignment():
    y = np.zeros(12345, dtype=np.float32)
    l, r = host_audio.pad_lr(y, CFG)
    assert (len(y) + l + r) % CFG.hop_size == 0


def test_wav_io_roundtrip(tmp_path):
    y = _chirp()
    p = str(tmp_path / "t.wav")
    host_audio.save_wav(y, p, CFG.sample_rate)
    y2 = host_audio.load_wav(p, CFG.sample_rate)
    assert len(y2) == len(y)
    corr = np.corrcoef(y, y2)[0, 1]
    assert corr > 0.99


def test_wav_resample(tmp_path):
    t = np.linspace(0, 0.5, 11025, endpoint=False)
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "r.wav")
    from scipy.io import wavfile
    wavfile.write(p, 22050, (y * 32767).astype(np.int16))
    y16 = host_audio.load_wav(p, 16000)
    assert abs(len(y16) - 8000) <= 2


def test_gl_kernel_dispatch_policy():
    """Auto-dispatch gates for the fused Pallas G-L (ops/griffin_lim.py)."""
    import jax
    import jax.numpy as jnp

    S3 = jnp.zeros((2, 16, 129))
    # explicit off always wins
    assert not gl._kernel_eligible(S3, 256, 64, None, False)
    # random-phase init (numpy-path parity) is scan-only
    assert not gl._kernel_eligible(S3, 256, 64, jax.random.PRNGKey(0), True)
    # unbatched inputs take the XLA path
    assert not gl._kernel_eligible(jnp.zeros((16, 129)), 256, 64, None, True)
    # forced on: batched zero-phase within VMEM budget
    assert gl._kernel_eligible(S3, 256, 64, None, True)
    # frame counts whose folded bases + state overflow VMEM fall back
    huge = jnp.zeros((1, 20000, 1025))
    assert not gl._kernel_eligible(huge, 2048, 200, None, True)
    # auto (None) always takes the XLA path (measured faster on TPU v5e)
    assert not gl._kernel_eligible(S3, 256, 64, None, None)


def test_gl_dispatch_xla_fallback_shapes():
    """use_kernel=False batched inversion matches the unbatched path."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    cfg = AudioConfig(n_fft=512, win_size=512, hop_size=128,
                      griffin_lim_iters=2, preemphasize=False,
                      trim_silence=False)
    mel = rng.uniform(-4, 4, (2, 12, 80)).astype(np.float32)
    y_b = np.asarray(gl.inv_mel_spectrogram(jnp.asarray(mel), cfg,
                                            use_kernel=False))
    y_0 = np.asarray(gl.inv_mel_spectrogram(jnp.asarray(mel[0]), cfg,
                                            use_kernel=False))
    assert y_b.shape == (2, 128 * 11)
    np.testing.assert_allclose(y_b[0], y_0, atol=1e-5)


def test_griffin_lim_bf16_quality():
    """gl_compute_dtype='bfloat16' keeps spectral consistency within 10% of
    the f32 path: the f32 magnitude projection re-anchors every iteration so
    bf16 matmul quantization does not accumulate."""
    import dataclasses

    import jax.numpy as jnp

    cfg = dataclasses.replace(CFG, n_fft=512, win_size=400, hop_size=128,
                              griffin_lim_iters=8, preemphasize=False,
                              trim_silence=False)
    y = _chirp(dur=0.3)
    mel = dsp.mel_spectrogram(jnp.asarray(y), cfg)

    def consistency(w):
        mag = np.asarray(dsp.stft_mag(jnp.asarray(w), cfg.n_fft,
                                      cfg.effective_hop, cfg.win_size))
        tgt = np.asarray(dsp.stft_mag(jnp.asarray(y[: w.shape[-1]]),
                                      cfg.n_fft, cfg.effective_hop,
                                      cfg.win_size))
        return float(np.mean(np.abs(mag - tgt)))

    w32 = np.asarray(gl.inv_mel_spectrogram(mel, cfg))
    w16 = np.asarray(gl.inv_mel_spectrogram(
        mel, dataclasses.replace(cfg, gl_compute_dtype="bfloat16")))
    assert w16.dtype == np.float32
    c32, c16 = consistency(w32), consistency(w16)
    assert c16 < c32 * 1.1 + 1e-4, (c16, c32)


@pytest.mark.parametrize("n_fft,win,hop", [(256, 96, 64), (256, 100, 48),
                                           (512, 512, 128), (128, 120, 32)])
def test_stft_support_trim_matches_full_frame(n_fft, win, hop):
    """The window-support-trimmed STFT equals the full n_fft-frame windowed
    DFT for arbitrary (lpad % hop) offsets, including win == n_fft."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    y = rng.standard_normal((2, 777)).astype(np.float32)

    re, im = dsp.stft(jnp.asarray(y), n_fft, hop, win)

    # oracle: full-extent frames x zero-padded window (the pre-trim math)
    frames = np.asarray(dsp.frame_signal(jnp.asarray(y), n_fft, hop))
    w = dsp.padded_window(win, n_fft)
    cos_b, sin_b = dsp._dft_bases(n_fft)
    fw = frames * w
    np.testing.assert_allclose(np.asarray(re), fw @ cos_b, atol=2e-4)
    np.testing.assert_allclose(np.asarray(im), -(fw @ sin_b), atol=2e-4)

    # istft of the result has the canonical length and round-trips interior
    y2 = np.asarray(dsp.istft(re, im, n_fft, hop, win))
    assert y2.shape == (2, hop * (re.shape[-2] - 1))
    lo = n_fft
    if y2.shape[-1] > 2 * lo:
        np.testing.assert_allclose(y2[:, lo:-lo], y[:, lo:y2.shape[-1] - lo],
                                   atol=5e-3)
