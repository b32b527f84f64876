"""Generate reference-parity golden fixtures for the DSP pipeline.

The BASELINE gate asks for allclose parity against the *reference* pipeline
(reference code/datasets/audio.py:61-176: librosa STFT/mel + in-graph TF
Griffin-Lim). librosa is not installed in this environment, so the oracle
here is built from two sources that are independent of the package's own DSP
code (tacotron2_tpu/ops/stft.py and data/audio.py):

- **TensorFlow 2.x `tf.signal`** supplies every FFT: librosa's
  `stft(center=True, pad_mode='constant')` is exactly `tf.signal.stft` on a
  signal pre-padded with n_fft//2 zeros, using frame_length=n_fft and a Hann
  window of win_size centered in the n_fft buffer. `tf.contrib.signal.stft /
  inverse_stft` in the reference's in-graph Griffin-Lim
  (audio.py:163-176) *are* `tf.signal.stft / inverse_stft` — the TF G-L
  fixture below runs the reference's graph, line for line, deterministically
  (it has no random phase init).
- **The Slaney mel formula** (librosa.filters.mel defaults: htk=False,
  norm='slaney') is implemented here from the published formula, written
  independently of ops/stft.py's implementation.

Outputs tests/fixtures/golden_dsp.npz consumed by
tests/test_reference_parity.py. Regenerate with:

    python scripts/make_golden_fixtures.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
import tensorflow as tf  # noqa: E402

tf.config.set_visible_devices([], "GPU")

FIXTURE_PATH = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "golden_dsp.npz")


# ----------------------------------------------------------------- signals


def make_signal(sr: int, seconds: float, seed: int) -> np.ndarray:
    """Deterministic speech-like test signal: chirps + AM filtered noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    y = (0.4 * np.sin(2 * np.pi * (110 + 80 * t) * t)
         + 0.2 * np.sin(2 * np.pi * (440 + 200 * np.sin(2 * np.pi * 1.3 * t)) * t)
         + 0.15 * np.sin(2 * np.pi * 2500 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)))
    noise = rng.standard_normal(len(t))
    # crude band-limit: first-order smoothing, applied twice
    for _ in range(2):
        noise = 0.5 * noise + 0.5 * np.concatenate([[0.0], noise[:-1]])
    y = y + 0.05 * noise
    env = np.minimum(1.0, np.minimum(t / 0.05, (seconds - t) / 0.05))
    return (y * env * 0.8).astype(np.float32)


# ------------------------------------------------- Slaney mel (independent)


def slaney_mel_filterbank(sr: int, n_fft: int, n_mels: int,
                          fmin: float, fmax: float) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') from the formula.

    Slaney scale: linear below 1 kHz at 200/3 Hz per mel, logarithmic above
    with step log(6.4)/27 per mel. Triangles normalized to unit area
    (2 / bandwidth).
    """
    def hz2mel(f):
        f = np.asanyarray(f, dtype=np.float64)
        mel = f / (200.0 / 3.0)
        log_region = f >= 1000.0
        mel = np.where(log_region,
                       15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                       / (np.log(6.4) / 27.0),
                       mel)
        return mel

    def mel2hz(m):
        m = np.asanyarray(m, dtype=np.float64)
        f = m * (200.0 / 3.0)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0)
                                                 * (m - 15.0)), f)
        return f

    # n_mels+2 band edges, uniformly spaced on the mel scale
    edges_hz = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    fft_hz = np.arange(1 + n_fft // 2) * (sr / n_fft)

    weights = np.zeros((n_mels, len(fft_hz)))
    for m in range(n_mels):
        lo, ctr, hi = edges_hz[m], edges_hz[m + 1], edges_hz[m + 2]
        up = (fft_hz - lo) / (ctr - lo)
        down = (hi - fft_hz) / (hi - ctr)
        weights[m] = np.maximum(0.0, np.minimum(up, down))
        weights[m] *= 2.0 / (hi - lo)  # slaney area normalization
    return weights.astype(np.float32)


# ------------------------------------------- librosa-semantics STFT via TF


def hann_periodic(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(
        np.float32)


def stft_librosa_via_tf(y: np.ndarray, n_fft: int, hop: int,
                        win: int) -> np.ndarray:
    """librosa.stft(center=True, pad_mode='constant') with TF's FFT.

    Returns complex [frames, bins]. The window is hann(win) centered in an
    n_fft buffer (librosa util.pad_center); centering = n_fft//2 zero pad.
    """
    w = hann_periodic(win)
    lpad = (n_fft - win) // 2
    w_padded = np.pad(w, (lpad, n_fft - win - lpad))
    y_padded = np.pad(y, (n_fft // 2, n_fft // 2))
    spec = tf.signal.stft(
        tf.constant(y_padded[None], tf.float32),
        frame_length=n_fft, frame_step=hop, fft_length=n_fft,
        window_fn=lambda length, dtype: tf.constant(w_padded, dtype))
    return spec.numpy()[0]


# ------------------------------------ reference in-graph Griffin-Lim (TF)


def griffin_lim_tf_reference(S: np.ndarray, win: int, hop: int, n_fft: int,
                             iters: int) -> np.ndarray:
    """Reference _griffin_lim_tensorflow (audio.py:163-176), run in TF2.

    S is magnitude [bins, frames] (reference layout). Deterministic: the
    first inverse_stft uses zero phase. tf.contrib.signal.{stft,inverse_stft}
    are tf.signal.{stft,inverse_stft}; default window_fn = hann.
    """
    S = tf.constant(S.T[None], tf.complex64)  # [1, frames, bins]
    y = tf.signal.inverse_stft(S, win, hop, n_fft)
    for _ in range(iters):
        est = tf.signal.stft(y, win, hop, n_fft)
        angles = est / tf.cast(tf.maximum(1e-8, tf.abs(est)), tf.complex64)
        y = tf.signal.inverse_stft(S * angles, win, hop, n_fft)
    return y.numpy()[0]


# ----------------------------------------------- reference dB / normalize


def amp_to_db(x, min_level_db):
    min_level = np.exp(min_level_db / 20 * np.log(10))
    return 20 * np.log10(np.maximum(min_level, x))


def normalize(S, min_level_db, max_abs):
    # symmetric, clipping variant (the defaults; audio.py:258-262)
    return np.clip((2 * max_abs) * ((S - min_level_db) / (-min_level_db))
                   - max_abs, -max_abs, max_abs)


def denormalize(D, min_level_db, max_abs):
    return (((np.clip(D, -max_abs, max_abs) + max_abs) * -min_level_db
             / (2 * max_abs)) + min_level_db)


# ------------------------------- librosa istft / numpy Griffin-Lim via TF


def istft_librosa_via_tf(spec: np.ndarray, n_fft: int, hop: int,
                         win: int) -> np.ndarray:
    """librosa.istft(center=True) from its spec, with TF's inverse FFT.

    Windowed overlap-add with window-sum-square normalization, then trim
    n_fft//2 from both ends. spec: complex [frames, bins]."""
    w = hann_periodic(win)
    lpad = (n_fft - win) // 2
    w_padded = np.pad(w, (lpad, n_fft - win - lpad)).astype(np.float64)
    frames = tf.signal.irfft(tf.constant(spec, tf.complex128)).numpy()
    assert frames.shape[-1] == n_fft
    num = frames.shape[0]
    total = n_fft + hop * (num - 1)
    y = np.zeros(total)
    wss = np.zeros(total)
    for i in range(num):
        y[i * hop: i * hop + n_fft] += frames[i] * w_padded
        wss[i * hop: i * hop + n_fft] += w_padded ** 2
    y /= np.where(wss > 1e-10, wss, 1.0)
    return y[n_fft // 2: total - n_fft // 2]


def griffin_lim_librosa_reference(S: np.ndarray, angles0: np.ndarray,
                                  n_fft: int, hop: int, win: int,
                                  iters: int) -> np.ndarray:
    """Reference _griffin_lim (audio.py:151-161) with explicit phase init.

    S: magnitude [frames, bins] (already **power). The reference seeds
    phases from global np.random.rand; we pass them in so the package's
    host implementation can be compared bitwise."""
    S_complex = np.abs(S).astype(np.complex128)
    y = istft_librosa_via_tf(S_complex * np.exp(2j * np.pi * angles0),
                             n_fft, hop, win)
    for _ in range(iters):
        D = stft_librosa_via_tf(y.astype(np.float32), n_fft, hop, win)
        m = min(len(D), len(S_complex))
        angles = np.exp(1j * np.angle(D[:m]))
        y = istft_librosa_via_tf(S_complex[:m] * angles, n_fft, hop, win)
    return y


# --------------------------------------- preprocessing-chain oracle (r3)
# Reproduces the reference's FULL _process_utterance recipe
# (datasets/preprocessor.py:78-199) independently of
# tacotron2_tpu/data/{audio,preprocess}.py: librosa.effects.trim from its
# published formula (loop implementation), scipy.signal.lfilter preemphasis,
# the exact rescale ordering, librosa_pad_lr (audio.py:210-219), and the
# final hop clipping + train.txt row values.


def librosa_trim_oracle(y, top_db, frame_length, hop_length):
    """librosa.effects.trim from the formula: centered zero-padded frames,
    power dB relative to the peak frame, keep [first, last] non-silent."""
    from scipy.signal import lfilter  # noqa: F401 (documents independence)
    ypad = np.pad(y.astype(np.float64), (frame_length // 2, frame_length // 2))
    n = 1 + (len(ypad) - frame_length) // hop_length
    power = np.array([np.mean(ypad[i * hop_length:i * hop_length
                                   + frame_length] ** 2) for i in range(n)])
    ref = power.max()
    db = 10.0 * np.log10(np.maximum(power, 1e-20) / max(ref, 1e-20))
    nz = np.flatnonzero(db > -top_db)
    if len(nz) == 0:
        return y[:0]
    start = int(nz[0]) * hop_length
    end = min(len(y), (int(nz[-1]) + 1) * hop_length)
    return y[start:end]


def mulaw_ref(x, mu=255):
    """Reference fork's mulaw (wavenet_vocoder/util.py:30-49). NOTE: the
    fork HARDCODES mu=255 no matter what quantize_channels is passed
    (util.py:49) — parity is only well-defined at quantize_channels=256."""
    return np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)


def mulaw_quantize_ref(x, mu=255):
    return ((mulaw_ref(x, mu) + 1) / 2 * mu).astype(np.int64)


def preprocess_chain_oracle(y, c, input_type="raw", trim=True):
    """The reference _process_utterance dataflow, start to train.txt row."""
    aud = y.astype(np.float64)
    if trim:
        aud = librosa_trim_oracle(aud, c["trim_top_db"], c["trim_fft"],
                                  c["trim_hop"])
    trimmed = aud.copy()
    from scipy.signal import lfilter
    preem = lfilter([1.0, -c["preemphasis"]], [1.0], aud)
    # rescale: aud first, then preem, each by its OWN max
    aud = aud / np.abs(aud).max() * c["rescaling_max"]
    preem = preem / np.abs(preem).max() * c["rescaling_max"]

    res = {}
    if input_type == "mulaw-quantize":
        out = mulaw_quantize_ref(aud)
        nz = np.flatnonzero(np.abs(out - 127) > c["silence_threshold"])
        start, end = (int(nz[0]), int(nz[-1])) if len(nz) else (0, len(out))
        aud, preem, out = aud[start:end], preem[start:end], out[start:end]
        constant = int(mulaw_quantize_ref(np.zeros(1))[0])
    else:
        out, constant = aud, 0.0

    mag = np.abs(stft_librosa_via_tf(preem.astype(np.float32), c["n_fft"],
                                     c["hop"], c["win"]))
    mp = mag.astype(np.float64) ** c["magnitude_power"]
    mel_fb = slaney_mel_filterbank(c["sr"], c["n_fft"], c["n_mels"],
                                   c["fmin"], c["fmax"])
    mel_db = amp_to_db(mp @ mel_fb.astype(np.float64).T,
                       c["min_level_db"]) - c["ref_level_db"]
    mel = normalize(mel_db, c["min_level_db"], c["max_abs"]).astype(np.float32)
    mel_frames = mel.shape[0]

    # librosa_pad_lr (audio.py:210-219), pad_sides=1: right pad to the next
    # whole hop, then clip to mel_frames*hop
    pad = (len(aud) // c["hop"] + 1) * c["hop"] - len(aud)
    out = np.pad(out, (0, pad), mode="constant", constant_values=constant)
    assert len(out) >= mel_frames * c["hop"]
    out = out[: mel_frames * c["hop"]]
    res.update(trimmed=trimmed.astype(np.float32),
               aud=aud.astype(np.float32), preem=preem.astype(np.float32),
               mel=mel, out=out, time_steps=len(out), mel_frames=mel_frames)
    return res


# ------------------------------------------------------------------- main


CONFIGS = {
    # name: (sr, n_fft, hop, win, n_mels, fmin, fmax, seconds)
    # "default" matches tacotron2_tpu.config presets "default" (=reference
    # hparams.py) and "paper" (=reference paper_hparams.py).
    "default": dict(sr=16000, n_fft=2048, hop=200, win=800, n_mels=80,
                    fmin=55.0, fmax=7600.0, seconds=1.4,
                    min_level_db=-100.0, ref_level_db=20.0,
                    magnitude_power=2.0, max_abs=4.0, power=1.5),
    "paper": dict(sr=22050, n_fft=2048, hop=275, win=1100, n_mels=80,
                  fmin=125.0, fmax=7600.0, seconds=1.1,
                  min_level_db=-100.0, ref_level_db=20.0,
                  magnitude_power=2.0, max_abs=4.0, power=1.5),
}


def main():
    out = {}
    meta = {"tf_version": tf.__version__, "configs": CONFIGS}
    for name, c in CONFIGS.items():
        y = make_signal(c["sr"], c["seconds"], seed=hash(name) % 2**31)
        out[f"{name}/wav"] = y

        D = stft_librosa_via_tf(y, c["n_fft"], c["hop"], c["win"])
        mag = np.abs(D).astype(np.float32)
        out[f"{name}/stft_mag"] = mag  # [frames, bins]

        mel_fb = slaney_mel_filterbank(c["sr"], c["n_fft"], c["n_mels"],
                                       c["fmin"], c["fmax"])
        out[f"{name}/mel_basis"] = mel_fb

        # melspectrogram (audio.py:70-77): stft -> |.|^mag_power -> mel ->
        # amp_to_db - ref_level -> normalize
        mp = mag.astype(np.float64) ** c["magnitude_power"]
        mel_lin = mp @ mel_fb.astype(np.float64).T
        mel_db = amp_to_db(mel_lin, c["min_level_db"]) - c["ref_level_db"]
        mel_norm = normalize(mel_db, c["min_level_db"], c["max_abs"])
        out[f"{name}/mel"] = mel_norm.astype(np.float32)  # [frames, mels]

        lin_db = amp_to_db(mp, c["min_level_db"]) - c["ref_level_db"]
        lin_norm = normalize(lin_db, c["min_level_db"], c["max_abs"])
        out[f"{name}/linear"] = lin_norm.astype(np.float32)

        # In-graph Griffin-Lim fixture: inv_mel_spectrogram_tensorflow
        # (audio.py:131-143) on the mel above. Deterministic.
        inv_fb = np.linalg.pinv(mel_fb.astype(np.float64))
        S_amp = (10.0 ** ((denormalize(mel_norm, c["min_level_db"],
                                       c["max_abs"])
                           + c["ref_level_db"]) * 0.05)
                 ) ** (1.0 / c["magnitude_power"])
        S_lin = np.maximum(1e-10, S_amp @ inv_fb.T)  # [frames, bins]
        S_pow = (S_lin ** c["power"]).astype(np.float32)
        for iters in (0, 2, 60):
            wav_gl = griffin_lim_tf_reference(
                S_pow.T, c["win"], c["hop"], c["n_fft"], iters)
            out[f"{name}/gl_tf_iters{iters}"] = wav_gl.astype(np.float32)
        out[f"{name}/gl_input_pow"] = S_pow

        # numpy/librosa-path Griffin-Lim fixture (audio.py:151-161) with a
        # deterministic phase-init matrix saved alongside
        rng = np.random.default_rng(12345)
        angles0 = rng.random(S_pow.shape)
        out[f"{name}/gl_np_angles0"] = angles0.astype(np.float64)
        for iters in (2, 30):
            wav_np_gl = griffin_lim_librosa_reference(
                S_pow, angles0, c["n_fft"], c["hop"], c["win"], iters)
            out[f"{name}/gl_np_iters{iters}"] = wav_np_gl.astype(np.float32)

    # ---- full preprocessing-chain fixtures (default preset) -------------
    c = dict(CONFIGS["default"])
    c.update(trim_top_db=40.0, trim_fft=2048, trim_hop=512,
             preemphasis=0.97, rescaling_max=0.999, silence_threshold=2)
    sr = c["sr"]
    sig = make_signal(sr, 1.2, seed=777)
    y = np.concatenate([np.zeros(int(0.25 * sr), np.float32), 0.7 * sig,
                        np.zeros(int(0.35 * sr), np.float32)])
    # int16 round trip: the float array the loader produces from the wav file
    yq = np.round(np.clip(y, -1, 1) * 32767).astype(np.int16)
    out["pre/wav_int16"] = yq
    yf = yq.astype(np.float32) / 32768.0
    for it, tag in (("raw", "raw"), ("mulaw-quantize", "mulawq")):
        res = preprocess_chain_oracle(yf, c, input_type=it)
        for k, v in res.items():
            out[f"pre/{tag}/{k}"] = np.asarray(v)

    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    np.savez_compressed(FIXTURE_PATH, **out)
    with open(FIXTURE_PATH.replace(".npz", ".json"), "w") as f:
        json.dump(meta, f, indent=1)
    total = sum(v.nbytes for v in out.values())
    print(f"wrote {FIXTURE_PATH}: {len(out)} arrays, {total/1e6:.1f} MB raw")


if __name__ == "__main__":
    main()
