"""Benchmark driver: prints ONE JSON line for the round's headline metric.

Round-1 metric (BASELINE config[0]): Griffin-Lim inversion of mel
spectrograms — audio-seconds per wall-second on one TPU chip, versus the
reference's numpy/librosa-equivalent host path as baseline. The device path is
the jit-compiled DFT-matmul Griffin-Lim (ops/griffin_lim.py), batched over
utterances — the reference's GL_on_GPU graph (audio.py:163-176) equivalent.
"""

import json
import time

import numpy as np


def main():
    import jax

    from tacotron2_tpu.config import AudioConfig
    from tacotron2_tpu.data import audio as host_audio
    from tacotron2_tpu.ops import griffin_lim as gl

    cfg = AudioConfig()
    sr, hop = cfg.sample_rate, cfg.hop_size
    rng = np.random.default_rng(0)

    # batch of 8 synthetic 4-second utterances -> mels (what Tacotron emits)
    batch, dur = 8, 4.0
    n = int(sr * dur)
    t = np.linspace(0, dur, n, endpoint=False)
    wavs = np.stack([
        (0.5 * np.sin(2 * np.pi * (120 + 30 * k + 50 * t) * t) +
         0.2 * np.sin(2 * np.pi * (440 + 40 * k) * t)).astype(np.float32)
        for k in range(batch)])
    mels = np.stack([host_audio.mel_spectrogram(
        host_audio.preemphasis(w, cfg.preemphasis), cfg) for w in wavs])

    audio_seconds = batch * dur

    # --- device path (batched, jitted) ---
    mels_j = jax.numpy.asarray(mels)
    wav_out = gl.inv_mel_spectrogram(mels_j, cfg)  # compile
    wav_out.block_until_ready()
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        gl.inv_mel_spectrogram(mels_j, cfg).block_until_ready()
    device_time = (time.perf_counter() - t0) / iters
    device_throughput = audio_seconds / device_time

    # --- reference-equivalent host path (numpy, per-utterance loop) ---
    t0 = time.perf_counter()
    for m in mels[:2]:
        host_audio.inv_mel_spectrogram(m, cfg)
    host_time = (time.perf_counter() - t0) / 2 * batch
    host_throughput = audio_seconds / host_time

    print(json.dumps({
        "metric": "griffin_lim_inversion_throughput",
        "value": round(device_throughput, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(device_throughput / host_throughput, 2),
        "detail": {
            "backend": jax.default_backend(),
            "batch": batch, "utterance_seconds": dur,
            "gl_iters": cfg.griffin_lim_iters,
            "host_numpy_throughput": round(host_throughput, 2),
        },
    }))


if __name__ == "__main__":
    main()
