"""Generate a synthetic multi-speaker/multi-emotion corpus for smoke tests.

Creates wavs (tones whose pitch encodes speaker and envelope encodes
'emotion'), a reference-style metadata file (path|text|emt|spk|sex), runs the
preprocessing pipeline, and writes train.txt — a stand-in for LJSpeech/emt4
when no real corpus is available (zero-egress environment).

Usage: python scripts/make_tiny_dataset.py [out_dir] [n_utts]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tacotron2_tpu.config import get_config
from tacotron2_tpu.data import audio
from tacotron2_tpu.data.preprocess import build_from_path, write_metadata

SENTENCES = [
    "The birch canoe slid on the smooth planks.",
    "Glue the sheet to the dark blue background.",
    "It's easy to tell the depth of a well.",
    "These days a chicken leg is a rare dish.",
    "Rice is often served in round bowls.",
    "The juice of lemons makes fine punch.",
    "The box was thrown beside the parked truck.",
    "The hogs were fed chopped corn and garbage.",
    "Four hours of steady work faced us.",
    "A large size in stockings is hard to sell.",
]


def synth_wav(rng, sr, spk: int, emt: int, dur: float) -> np.ndarray:
    t = np.linspace(0, dur, int(sr * dur), endpoint=False)
    f0 = 110 * (1 + 0.3 * spk)
    env_rate = 2.0 + emt * 1.5
    env = 0.5 + 0.45 * np.sin(2 * np.pi * env_rate * t)
    wav = env * (np.sin(2 * np.pi * f0 * t) +
                 0.4 * np.sin(2 * np.pi * 2 * f0 * t) +
                 0.1 * rng.standard_normal(len(t)))
    fade = int(0.02 * sr)
    wav[:fade] *= np.linspace(0, 1, fade)
    wav[-fade:] *= np.linspace(1, 0, fade)
    return (0.7 * wav / np.abs(wav).max()).astype(np.float32)


ALIGN_CHARS = "abcdefghij"


def make_alignable_corpus(out_dir, n=8, chars=12, seed=0, char_dur=0.11,
                          write_audio=False):
    """Corpus where the TEXT determines the AUDIO: each character renders as
    a distinct tone segment (char i -> 220*2^(i/6) Hz), so a correctly
    trained attention must form a monotonic text-to-frame diagonal. Wavs go
    through the REAL preprocessing path (preemphasis/rescale/mel/normalize;
    trim disabled so the char->frame map stays exact). `chars` is either a
    fixed per-utterance length or a (lo, hi) range sampled per utterance
    (sentence-length texts, reference eval sentences are 60-120 chars,
    code/hparams.py:370-395). Returns (rows, audio_cfg) — rows are real
    train.txt tuples. write_audio also emits hop-aligned waveform targets
    (audio-N.npy) for vocoder training."""
    import dataclasses

    from scipy.io import wavfile

    from tacotron2_tpu.data.preprocess import UtteranceSpec, process_utterance

    cfg = get_config("default")
    acfg = dataclasses.replace(cfg.audio, trim_silence=False)
    sr = acfg.sample_rate
    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(out_dir, "wavs")
    mel_dir = os.path.join(out_dir, "mels")
    aud_dir = os.path.join(out_dir, "audio") if write_audio else None
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(mel_dir, exist_ok=True)
    if aud_dir:
        os.makedirs(aud_dir, exist_ok=True)

    rows = []
    for i in range(n):
        n_chars = (int(rng.integers(chars[0], chars[1] + 1))
                   if isinstance(chars, (tuple, list)) else chars)
        idx = rng.integers(0, len(ALIGN_CHARS), n_chars)
        text = "".join(ALIGN_CHARS[j] for j in idx)
        segs = []
        t = np.arange(int(sr * char_dur)) / sr
        for j in idx:
            f0 = 220.0 * 2.0 ** (j / 6.0)
            env = np.minimum(1.0, np.minimum(t / 0.01, (char_dur - t) / 0.01))
            segs.append((0.6 * env * np.sin(2 * np.pi * f0 * t)
                         ).astype(np.float32))
        wav = np.concatenate(segs)
        path = os.path.join(wav_dir, f"a{i:03d}.wav")
        wavfile.write(path, sr, np.round(wav * 32767).astype(np.int16))
        spec = UtteranceSpec(audio_path=path, text=text, emt_label=0,
                             spk_label=0, sex="f", dataset="emt4", index=i)
        row = process_utterance(spec, acfg, mel_dir, audio_dir=aud_dir)
        assert row is not None
        rows.append(row)
    return rows, acfg, mel_dir


def main(out_dir="data/tiny", n=32, dataset="emt4", sr=None, seed=1234):
    cfg = get_config("default")
    sr = sr or cfg.audio.sample_rate
    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(out_dir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)

    meta_lines = []
    for i in range(n):
        spk = i % 2
        emt = (i // 2) % 4
        dur = float(rng.uniform(0.8, 1.6))
        wav = synth_wav(rng, sr, spk, emt, dur)
        name = f"utt{i:04d}.wav"
        audio.save_wav(wav, os.path.join(wav_dir, name), sr)
        text = SENTENCES[i % len(SENTENCES)]
        meta_lines.append(f"wavs/{name}|{text}|{emt}|spk{spk}|F")

    meta_path = os.path.join(out_dir, f"metadata_{dataset}.txt")
    with open(meta_path, "w", encoding="utf-8") as f:
        f.write("\n".join(meta_lines) + "\n")

    # write_audio so the GTA -> WaveNet stage has waveform targets
    rows = build_from_path(cfg, meta_path, out_dir, out_dir, dataset,
                           serial=True, write_audio=True)
    write_metadata(rows, out_dir, cfg)
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "data/tiny"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    main(out, n)
