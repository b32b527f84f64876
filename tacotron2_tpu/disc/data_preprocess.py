"""TI-SV utterance extraction for discriminator training corpora.

TPU-native equivalent of reference code/spk_disc/data_preprocess.py
(save_spectrogram_tisv / save_spectrogram_tisv_voxceleb, :93-197): walk a
corpus laid out as one directory per speaker (VoxCeleb/VCTK style, wavs at
any depth), voice-activity-split each utterance, compute log10 mel
spectrograms of the voiced parts, slice them into fixed `tisv_frame`
windows, and save one `[n_windows, n_mels, tisv_frame]` .npy stack per
speaker plus a `metadata.csv` mapping speaker directory names to stack
files. The stacks feed `DiscStackFeeder` (GE2E N x M batches, the
reference's utils.py random_batch path).

Differences from the reference (deliberate): the mel geometry defaults to
the framework AudioConfig instead of a second argparse config module; the
train/test split is a parameter rather than two hard-coded corpus globs; and
extraction runs in a process pool like the main preprocessor.
"""

from __future__ import annotations

import csv
import glob
import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import AudioConfig
from ..data import audio
from ..ops import stft as _stft
from ..utils import log


def log_mel_windows(wav: np.ndarray, cfg: AudioConfig, *,
                    n_mels: int = 40, tisv_frame: int = 140,
                    top_db: float = 20.0, edges_only: bool = False
                    ) -> List[np.ndarray]:
    """VAD-split a waveform and return `[n_mels, tisv_frame]` log-mel windows.

    Reference semantics (data_preprocess.py:118-129,175-187): only voiced
    intervals long enough for one full window are kept; the spectrogram is
    `log10(mel @ |STFT|^2 + 1e-6)` (power, unnormalized — NOT the Tacotron
    dB/[-4,4] features). `edges_only=True` reproduces the VCTK variant that
    keeps just the first and last window of each interval
    (data_preprocess.py:128-129); the default keeps every consecutive
    window (the VoxCeleb variant, :184-187).
    """
    hop = cfg.effective_hop
    min_len = int(tisv_frame * hop + cfg.win_size)
    basis = _stft.mel_basis(cfg.sample_rate, cfg.n_fft, n_mels,
                            cfg.fmin, cfg.fmax).T  # [bins, n_mels]
    windows: List[np.ndarray] = []
    for start, end in audio.split_silence(wav, top_db=top_db):
        if end - start <= min_len:
            continue
        spec = np.abs(audio._stft_np(wav[start:end], cfg)) ** 2  # [T, bins]
        S = np.log10(spec @ basis + 1e-6).T  # [n_mels, T]
        if S.shape[1] < tisv_frame:
            continue
        if edges_only:
            windows.append(S[:, :tisv_frame])
            windows.append(S[:, -tisv_frame:])
        else:
            for j in range(S.shape[1] // tisv_frame):
                windows.append(S[:, j * tisv_frame:(j + 1) * tisv_frame])
    return windows


def _process_speaker(args_tuple) -> Tuple[str, int, Optional[str]]:
    (speaker_dir, out_path, cfg, n_mels, tisv_frame, top_db,
     edges_only) = args_tuple
    wavs = sorted(
        glob.glob(os.path.join(speaker_dir, "**", "*.wav"), recursive=True)
        + glob.glob(os.path.join(speaker_dir, "**", "*.WAV"), recursive=True))
    windows: List[np.ndarray] = []
    for path in wavs:
        try:
            wav = audio.load_wav(path, cfg.sample_rate)
        except Exception:  # unreadable file: skip, like the reference's
            continue       # missing-wav tolerance (preprocessor.py:100-102)
        windows.extend(log_mel_windows(wav, cfg, n_mels=n_mels,
                                       tisv_frame=tisv_frame, top_db=top_db,
                                       edges_only=edges_only))
    if not windows:
        return os.path.basename(speaker_dir.rstrip(os.sep)), 0, None
    np.save(out_path, np.stack(windows).astype(np.float32),
            allow_pickle=False)
    return os.path.basename(speaker_dir.rstrip(os.sep)), len(windows), out_path


def build_speaker_stacks(corpus_dir: str, out_dir: str, cfg: AudioConfig, *,
                         n_mels: int = 40, tisv_frame: int = 140,
                         top_db: float = 20.0, edges_only: bool = False,
                         test_fraction: float = 0.1, seed: int = 1234,
                         n_jobs: Optional[int] = None,
                         speaker_dirs: Optional[Sequence[str]] = None) -> dict:
    """Extract per-speaker TI-SV stacks into `<out_dir>/{train,test}_tisv/`.

    Speakers are shuffled with `seed` and split `1 - test_fraction` /
    `test_fraction` by SPEAKER (the reference's 90/10 split,
    data_preprocess.py:107); each split directory gets `speaker<i>.npy`
    stacks and a `metadata.csv` with columns `id,speaker_num,n_windows`
    (reference :162-197 wrote id,speaker_num).
    """
    if speaker_dirs is None:
        speaker_dirs = sorted(
            p for p in glob.glob(os.path.join(corpus_dir, "*"))
            if os.path.isdir(p))
    if not speaker_dirs:
        raise FileNotFoundError(
            f"no speaker directories under {corpus_dir!r}; expected "
            "<corpus>/<speaker>/**/*.wav")
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(speaker_dirs))
    n_test = int(len(speaker_dirs) * test_fraction)
    n_test = min(max(n_test, 1 if test_fraction > 0 else 0),
                 len(speaker_dirs) - 1)
    splits = {"train": [speaker_dirs[i] for i in order[:len(order) - n_test]],
              "test": [speaker_dirs[i] for i in order[len(order) - n_test:]]}

    result = {}
    for split, dirs in splits.items():
        if not dirs:
            continue
        split_dir = os.path.join(out_dir, f"{split}_tisv")
        os.makedirs(split_dir, exist_ok=True)
        tasks = [(d, os.path.join(split_dir, f"speaker{i}.npy"), cfg, n_mels,
                  tisv_frame, top_db, edges_only) for i, d in enumerate(dirs)]
        if n_jobs == 1 or len(tasks) == 1:
            rows = [_process_speaker(t) for t in tasks]
        else:
            with ProcessPoolExecutor(max_workers=n_jobs) as ex:
                rows = list(ex.map(_process_speaker, tasks))
        kept = [(sid, n, p) for sid, n, p in rows if p is not None]
        with open(os.path.join(split_dir, "metadata.csv"), "w",
                  encoding="utf-8", newline="") as f:
            w = csv.writer(f)
            w.writerow(["id", "speaker_num", "n_windows"])
            for i, (sid, n, p) in enumerate(kept):
                w.writerow([sid, f"speaker{i}", n])
        # stacks were written under the pre-filter index; rename any gaps away
        for i, (sid, n, p) in enumerate(kept):
            want = os.path.join(split_dir, f"speaker{i}.npy")
            if p != want:
                os.replace(p, want)
        dropped = [sid for sid, n, p in rows if p is None]
        if dropped:
            log(f"disc-preprocess[{split}]: dropped {len(dropped)} speakers "
                f"with no voiced windows: {dropped[:5]}...")
        log(f"disc-preprocess[{split}]: {len(kept)} speakers, "
            f"{sum(n for _, n, _ in kept)} windows -> {split_dir}")
        result[split] = split_dir
    return result
