"""Offline preprocessing: corpus wavs → mel .npy + train.txt manifest.

Parity with reference code/datasets/preprocessor.py:15-199 and
wavenet_preprocessor.py: per utterance load → trim → preemphasize → rescale →
mel (+ optional linear / mulaw audio), hop-aligned audio padding, and the
12-field train.txt row
  dataset|audio|mel|linear|spkemb|time_steps|mel_frames|text|emt|spk|basename|sex
(preprocessor.py:199). Parallelized with ProcessPoolExecutor
(preprocessor.py:35) with a `serial` fallback (the reference's --philly mode).

Mels are saved frames-major [frames, num_mels] — same layout as the
reference's `mel_spectrogram.T` save (preprocessor.py:192).
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import AudioConfig, Config
from ..ops import mulaw as mulaw_ops
from . import audio


@dataclass
class UtteranceSpec:
    """One metadata row: path|text|emt_label|spk_id|sex (datasets/metadata.py)."""

    audio_path: str
    text: str
    emt_label: int
    spk_label: int
    sex: str
    dataset: str
    index: int


def assign_speaker_labels(rows: List[List[str]], dataset: str) -> List[int]:
    """Reference speaker-id policy (preprocessor.py:53-58): emt4→0, emth→1,
    other datasets offset by 1 over sorted unique speaker strings."""
    if dataset == "emt4":
        return [0] * len(rows)
    if dataset == "emth":
        return [1] * len(rows)
    spk_ids = sorted(frozenset(r[3] for r in rows))
    return [spk_ids.index(r[3]) + 1 for r in rows]


def process_utterance(spec: UtteranceSpec, cfg: AudioConfig, mel_dir: str,
                      audio_dir: Optional[str] = None,
                      linear_dir: Optional[str] = None,
                      input_type: str = "raw",
                      quantize_channels: int = 2 ** 16
                      ) -> Optional[Tuple]:
    """One wav → mel .npy (+ optional audio/linear) → train.txt row.

    Reference: _process_utterance (preprocessor.py:78-199).
    """
    try:
        aud = audio.load_wav(spec.audio_path, cfg.sample_rate)
    except (FileNotFoundError, OSError):
        print(f"missing wav {spec.audio_path}; skipping")
        return None
    if cfg.trim_silence:
        aud = audio.trim_silence(aud, cfg)
    if len(aud) < cfg.effective_hop * 3:
        return None

    preem = audio.preemphasis(aud, cfg.preemphasis, cfg.preemphasize)
    if cfg.rescale:
        aud = aud / np.abs(aud).max() * cfg.rescaling_max
        preem = preem / np.abs(preem).max() * cfg.rescaling_max
        if (np.abs(aud) > 1).any() or (np.abs(preem) > 1).any():
            raise RuntimeError(f"audio has invalid value: {spec.audio_path}")

    # waveform target for wavenet (preprocessor.py:120-144)
    if mulaw_ops.is_mulaw_quantize(input_type):
        out = np.asarray(mulaw_ops.mulaw_quantize(aud, quantize_channels - 1))
        start, end = audio.start_and_end_indices(out, cfg.silence_threshold)
        aud, preem, out = aud[start:end], preem[start:end], out[start:end]
        constant = int(mulaw_ops.mulaw_quantize(np.zeros(1), quantize_channels - 1)[0])
        out_dtype = np.int16
    elif mulaw_ops.is_mulaw(input_type):
        out = np.asarray(mulaw_ops.mulaw(aud, quantize_channels - 1))
        constant = float(mulaw_ops.mulaw(np.zeros(1), quantize_channels - 1)[0])
        out_dtype = np.float32
    else:
        out, constant, out_dtype = aud, 0.0, np.float32

    mel = audio.mel_spectrogram(preem, cfg).astype(np.float32)  # [frames, mels]
    mel_frames = mel.shape[0]
    if cfg.clip_mels_length and mel_frames > cfg.max_mel_frames:
        return None

    # hop alignment: audio padded right to a whole number of hops then clipped
    # to mel_frames·hop — the upsampling invariant (preprocessor.py:160-182)
    l_pad, r_pad = audio.pad_lr(aud, cfg)
    out = np.pad(out, (l_pad, r_pad), mode="constant", constant_values=constant)
    assert len(out) >= mel_frames * cfg.effective_hop
    out = out[: mel_frames * cfg.effective_hop]
    assert len(out) % cfg.effective_hop == 0
    time_steps = len(out)

    mel_filename = f"mel-{spec.index}.npy"
    audio_filename = f"audio-{spec.index}.npy"
    linear_filename = f"linear-{spec.index}.npy"
    np.save(os.path.join(mel_dir, mel_filename), mel, allow_pickle=False)
    if audio_dir is not None:
        np.save(os.path.join(audio_dir, audio_filename),
                out.astype(out_dtype), allow_pickle=False)
    if linear_dir is not None:
        lin = audio.linear_spectrogram(preem, cfg).astype(np.float32)
        np.save(os.path.join(linear_dir, linear_filename), lin, allow_pickle=False)

    basename = os.path.basename(spec.audio_path)
    return (spec.dataset, audio_filename, mel_filename, linear_filename,
            "spkemb-none.npy", time_steps, mel_frames, spec.text,
            spec.emt_label, spec.spk_label, basename, spec.sex)


def build_from_path(cfg: Config, metadata_path: str, in_dir: str, out_dir: str,
                    dataset: str, n_jobs: int = os.cpu_count() or 4,
                    serial: bool = False, write_audio: bool = False,
                    write_linear: bool = False, limit: Optional[int] = None
                    ) -> List[Tuple]:
    """Process a whole corpus; returns train.txt rows (reference build_from_path)."""
    mel_dir = os.path.join(out_dir, dataset, "mels")
    os.makedirs(mel_dir, exist_ok=True)
    audio_dir = linear_dir = None
    if write_audio:
        audio_dir = os.path.join(out_dir, dataset, "audio")
        os.makedirs(audio_dir, exist_ok=True)
    if write_linear:
        linear_dir = os.path.join(out_dir, dataset, "linear")
        os.makedirs(linear_dir, exist_ok=True)

    with open(metadata_path, encoding="utf-8") as f:
        rows = [line.strip().split("|") for line in f if line.strip()]
    if limit:
        rows = rows[:limit]
    spk_labels = assign_speaker_labels(rows, dataset)

    specs = []
    for i, (row, spk) in enumerate(zip(rows, spk_labels)):
        path = row[0] + ".wav" if dataset == "emt4" and not row[0].endswith(".wav") \
            else row[0]
        specs.append(UtteranceSpec(
            audio_path=os.path.join(in_dir, path), text=row[1],
            emt_label=int(row[2]) if len(row) > 2 and row[2] else 0,
            spk_label=spk, sex=row[4] if len(row) > 4 else "U",
            dataset=dataset, index=i))

    fn = partial(process_utterance, cfg=cfg.audio, mel_dir=mel_dir,
                 audio_dir=audio_dir, linear_dir=linear_dir,
                 input_type=cfg.wavenet.input_type,
                 quantize_channels=cfg.wavenet.quantize_channels)
    if serial:
        results = [fn(s) for s in specs]
    else:
        with ProcessPoolExecutor(max_workers=n_jobs) as ex:
            results = list(ex.map(fn, specs))
    return [r for r in results if r is not None]


def wavenet_process_utterance(wav_path: str, index: str, cfg: AudioConfig,
                              mel_dir: str, wav_dir: str,
                              input_type: str = "raw",
                              quantize_channels: int = 2 ** 16
                              ) -> Optional[Tuple]:
    """One wav → (audio.npy, mel.npy) pair for standalone (non-GTA) vocoder
    training. Reference: wavenet_preprocessor._process_utterance
    (datasets/wavenet_preprocessor.py:39-156)."""
    try:
        aud = audio.load_wav(wav_path, cfg.sample_rate)
    except (FileNotFoundError, OSError):
        print(f"missing wav {wav_path}; skipping")
        return None
    if cfg.trim_silence:
        aud = audio.trim_silence(aud, cfg)
    preem = audio.preemphasis(aud, cfg.preemphasis, cfg.preemphasize)
    if cfg.rescale:
        aud = aud / np.abs(aud).max() * cfg.rescaling_max
        preem = preem / np.abs(preem).max() * cfg.rescaling_max

    if mulaw_ops.is_mulaw_quantize(input_type):
        out = np.asarray(mulaw_ops.mulaw_quantize(aud, quantize_channels - 1))
        start, end = audio.start_and_end_indices(out, cfg.silence_threshold)
        aud, preem, out = aud[start:end], preem[start:end], out[start:end]
        constant = int(mulaw_ops.mulaw_quantize(np.zeros(1),
                                                quantize_channels - 1)[0])
        out_dtype = np.int16
    elif mulaw_ops.is_mulaw(input_type):
        out = np.asarray(mulaw_ops.mulaw(aud, quantize_channels - 1))
        constant = float(mulaw_ops.mulaw(np.zeros(1), quantize_channels - 1)[0])
        out_dtype = np.float32
    else:
        out, constant, out_dtype = aud, 0.0, np.float32

    mel = audio.mel_spectrogram(preem, cfg).astype(np.float32)
    mel_frames = mel.shape[0]
    if cfg.clip_mels_length and mel_frames > cfg.max_mel_frames:
        return None
    l_pad, r_pad = audio.pad_lr(aud, cfg)
    out = np.pad(out, (l_pad, r_pad), mode="constant", constant_values=constant)
    out = out[: mel_frames * cfg.effective_hop]
    assert len(out) % cfg.effective_hop == 0
    time_steps = len(out)

    audio_filename = os.path.join(wav_dir, f"audio-{index}.npy")
    mel_filename = os.path.join(mel_dir, f"mel-{index}.npy")
    np.save(audio_filename, out.astype(out_dtype), allow_pickle=False)
    np.save(mel_filename, mel, allow_pickle=False)
    # 6-field map row: audio|mel|mel|speaker_id|time_steps|mel_frames
    # (wavenet_preprocessor.py:149-156)
    return (audio_filename, mel_filename, mel_filename, "<no_g>",
            time_steps, mel_frames)


def wavenet_build_from_path(cfg: Config, input_dir: str, out_dir: str,
                            n_jobs: int = os.cpu_count() or 4,
                            serial: bool = False,
                            limit: Optional[int] = None) -> List[Tuple]:
    """Whole wav folder → audio/mel npy pairs + map rows for non-GTA vocoder
    training. Reference: wavenet_preprocess.preprocess
    (code/wavenet_preprocess.py:10-16)."""
    # absolute paths so the map rows resolve regardless of the training cwd
    # (the feeder joins relative rows against the map's own directory)
    out_dir = os.path.abspath(out_dir)
    mel_dir = os.path.join(out_dir, "mels")
    wav_dir = os.path.join(out_dir, "audio")
    os.makedirs(mel_dir, exist_ok=True)
    os.makedirs(wav_dir, exist_ok=True)
    wavs = sorted(f for f in os.listdir(input_dir) if f.endswith(".wav"))
    if limit:
        wavs = wavs[:limit]
    jobs = [(os.path.join(input_dir, f), os.path.splitext(f)[0])
            for f in wavs]
    fn = partial(_wavenet_job, cfg=cfg, mel_dir=mel_dir, wav_dir=wav_dir)
    if serial:
        results = [fn(j) for j in jobs]
    else:
        with ProcessPoolExecutor(max_workers=n_jobs) as ex:
            results = list(ex.map(fn, jobs))
    return [r for r in results if r is not None]


def _wavenet_job(job, cfg: Config, mel_dir: str, wav_dir: str):
    wav_path, index = job
    return wavenet_process_utterance(
        wav_path, index, cfg.audio, mel_dir, wav_dir,
        input_type=cfg.wavenet.input_type,
        quantize_channels=cfg.wavenet.quantize_channels)


def write_wavenet_metadata(rows: Sequence[Tuple], out_dir: str,
                           cfg: Config) -> str:
    """Write map.txt + stats (reference wavenet_preprocess.py:18-29)."""
    path = os.path.join(out_dir, "map.txt")
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write("|".join(str(x) for x in r) + "\n")
    steps = sum(int(r[4]) for r in rows)
    hours = steps / cfg.audio.sample_rate / 3600
    print(f"Wrote {len(rows)} utterances, {steps} audio timesteps "
          f"({hours:.2f} hours) -> {path}")
    return path


def create_metadata(in_dir: str, out_path: str, layout: str = "ljspeech",
                    emt_label: int = 0, sex: str = "U") -> str:
    """Generic corpus-manifest builder replacing the reference's per-corpus
    `create_metadata_*` one-offs (datasets/metadata.py:12-261). Emits
    `path|text|emt_label|spk_id|sex` rows consumable by `build_from_path`.

    Layouts:
    - ljspeech: `metadata.csv` rows `id|raw_text|normalized_text`, wavs under
      `wavs/` — single speaker, neutral emotion.
    - folders: one subdirectory per speaker, each with `*.wav` + matching
      `*.txt` transcripts (vctk/librispeech-style flattened).
    """
    rows = []
    if layout == "ljspeech":
        with open(os.path.join(in_dir, "metadata.csv"), encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split("|")
                if len(parts) < 2:
                    continue
                text = parts[2] if len(parts) > 2 else parts[1]
                rows.append(f"wavs/{parts[0]}.wav|{text}|{emt_label}|0|{sex}")
    elif layout == "folders":
        for spk in sorted(os.listdir(in_dir)):
            spk_dir = os.path.join(in_dir, spk)
            if not os.path.isdir(spk_dir):
                continue
            for f in sorted(os.listdir(spk_dir)):
                if not f.endswith(".wav"):
                    continue
                txt = os.path.join(spk_dir, f[:-4] + ".txt")
                if not os.path.exists(txt):
                    continue
                with open(txt, encoding="utf-8") as tf:
                    text = tf.read().strip()
                rows.append(f"{spk}/{f}|{text}|{emt_label}|{spk}|{sex}")
    else:
        raise ValueError(f"unknown layout {layout}")
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")
    print(f"Wrote {len(rows)} metadata rows -> {out_path}")
    return out_path


def write_metadata(rows: Sequence[Tuple], out_dir: str, cfg: Config,
                   filename: str = "train.txt") -> str:
    """Write train.txt + summary stats (reference preprocess.py:54-76)."""
    path = os.path.join(out_dir, filename)
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write("|".join(str(x) for x in r) + "\n")
    frames = sum(int(r[6]) for r in rows)
    steps = sum(int(r[5]) for r in rows)
    hours = steps / cfg.audio.sample_rate / 3600
    print(f"Wrote {len(rows)} utterances, {frames} mel frames, "
          f"{steps} audio timesteps ({hours:.2f} hours) -> {path}")
    return path
