"""WaveNet input pipeline: (audio, mel) pairs → cropped, normalized batches.

Behavioral parity with reference code/wavenet_vocoder/feeder.py:
- metadata: GTA map.txt rows `audio_path|mel_path|...` or preprocessing
  train.txt rows (audio/mel filenames resolved against the data dir)
- split: train_test_split seed 1234, test rounded down to a batch multiple
  (feeder.py:44-58)
- random crop to `max_time_steps` aligned to hop boundaries, preserving the
  x-len == c-len·hop upsampling invariant (feeder.py:368-398)
- conditioning mels clipped to the T2 range and rescaled to [0, 1]
  (clip_for_wavenet / normalize_for_wavenet, feeder.py:319-340)
- mulaw-quantize inputs one-hot encoded; scalar inputs [T, 1]

Layout: batch-time-channel (the model's convention), not the reference's BCT.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..config import Config
from ..ops.mulaw import is_mulaw_quantize
from .feeder import _round_down, _round_up, train_test_split_indices


def _ensure_divisible(length: int, divisor: int, lower: bool = True) -> int:
    if length % divisor == 0:
        return length
    return length - length % divisor if lower else length + divisor - length % divisor


def interp_to_unit(feats, cfg: Config):
    """[-max,max] (or [0,max]) → [0,1] (reference _interp, feeder.py:427)."""
    lo = -cfg.audio.max_abs_value if cfg.audio.symmetric_mels else 0.0
    return (feats - lo) / (cfg.audio.max_abs_value - lo)


class WaveNetFeeder:
    """Batched (x, c, g, lengths) stream for vocoder training."""

    def __init__(self, cfg: Config, metadata_path: str,
                 base_dir: Optional[str] = None, *, gta: bool = True,
                 batches_per_group: int = 64, seed: Optional[int] = None,
                 shard_by_host: bool = True):
        self.cfg = cfg
        self.gta = gta
        self.data_dir = os.path.dirname(metadata_path)
        self.base_dir = base_dir or self.data_dir
        self.batches_per_group = batches_per_group
        self.rng = np.random.default_rng(
            seed if seed is not None else cfg.train.wavenet_data_random_state)

        with open(metadata_path, encoding="utf-8") as f:
            self.metadata = [line.strip().split("|") for line in f if line.strip()]

        t = cfg.train
        test_size = (t.wavenet_test_size if t.wavenet_test_size is not None
                     else t.wavenet_test_batches * t.wavenet_batch_size)
        train_idx, test_idx = train_test_split_indices(
            len(self.metadata), test_size, t.wavenet_batch_size,
            t.wavenet_data_random_state)
        self.train_meta = [self.metadata[i] for i in train_idx]
        self.test_meta = [self.metadata[i] for i in test_idx]
        self._train_offset = 0

        # multi-host disjoint stride-shard of the train split (see
        # TacotronFeeder); test set replicated.
        if shard_by_host:
            import jax
            pc, pi = jax.process_count(), jax.process_index()
            if pc > 1:
                self.train_meta = self.train_meta[pi::pc]
                base = seed if seed is not None else \
                    t.wavenet_data_random_state
                self.rng = np.random.default_rng(base + pi)

    # -------------------------------------------------------------- loading

    def _resolve(self, row, kind: str) -> str:
        """Map a metadata row to an audio/mel npy path.

        GTA map.txt: `audio_path|gt_mel|gta_mel|time_steps|text` (5 fields);
        standalone wavenet-preprocess map.txt:
        `audio|mel|mel|speaker_id|time_steps|mel_frames` (6 fields, paths are
        .npy); train.txt: 12-field preprocessing row with filenames under
        dataset subdirs.
        """
        if row[0].endswith(".npy"):
            path = row[0] if kind == "audio" else row[2 if len(row) > 2 else 1]
            return path if os.path.isabs(path) else os.path.join(self.base_dir, path)
        # train.txt row
        sub = "audio" if kind == "audio" else "mels"
        name = row[1] if kind == "audio" else row[2]
        return os.path.join(self.data_dir, row[0], sub, name)

    def _load_example(self, row):
        x = np.load(self._resolve(row, "audio"))
        c = np.load(self._resolve(row, "mel"))
        g = int(float(row[9])) if len(row) > 9 else 0
        return x, c, g

    # ------------------------------------------------------------- batching

    def _assert_upsample_ready(self, x, c):
        hop = self.cfg.audio.effective_hop
        assert len(x) % len(c) == 0 and len(x) // len(c) == hop, \
            f"hop misalignment: {len(x)} samples vs {len(c)} frames (hop {hop})"

    def _crop(self, x, c):
        """Random hop-aligned crop to max_time_steps (feeder.py:368-390)."""
        cfg = self.cfg
        hop = cfg.audio.effective_hop
        max_steps = cfg.train.max_time_steps
        if cfg.train.max_time_sec is not None:
            max_steps = int(cfg.train.max_time_sec * cfg.audio.sample_rate)
        self._assert_upsample_ready(x, c)
        if max_steps is not None and len(x) > max_steps:
            aligned = _ensure_divisible(max_steps, hop, True)
            max_frames = aligned // hop
            start = int(self.rng.integers(0, len(c) - max_frames))
            x = x[start * hop: (start + max_frames) * hop]
            c = c[start: start + max_frames]
            self._assert_upsample_ready(x, c)
        return x, c

    def _pad_batch(self, examples) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        quantized = is_mulaw_quantize(cfg.wavenet.input_type)
        lengths = np.asarray([len(x) for x, _, _ in examples], np.int32)
        max_len = int(lengths.max())

        if quantized:
            xs = np.stack([np.pad(x, (0, max_len - len(x)),
                                  constant_values=127) for x, _, _ in examples])
            x_batch = np.eye(cfg.wavenet.quantize_channels, dtype=np.float32)[xs]
            y_batch = xs.astype(np.int32)
        else:
            xs = np.stack([np.pad(x.astype(np.float32), (0, max_len - len(x)))
                           for x, _, _ in examples])
            x_batch = xs[:, :, None]
            y_batch = xs

        hop = cfg.audio.effective_hop
        spec_pad = -cfg.audio.max_abs_value if cfg.audio.symmetric_mels else 0.0
        max_frames = max_len // hop
        cs = []
        for _, c, _ in examples:
            c = np.pad(c, ((0, max_frames - len(c)), (0, 0)),
                       constant_values=spec_pad)
            if cfg.audio.clip_for_wavenet:
                c = np.clip(c, spec_pad, cfg.audio.max_abs_value)
            if cfg.audio.normalize_for_wavenet:
                c = interp_to_unit(c, cfg)
            cs.append(c)
        c_batch = np.stack(cs).astype(np.float32)

        g_batch = np.asarray([g for _, _, g in examples], np.int32)
        return dict(x=x_batch, y=y_batch, c=c_batch, g=g_batch,
                    input_lengths=lengths)

    def _next_train_row(self):
        if self._train_offset >= len(self.train_meta):
            self._train_offset = 0
            perm = self.rng.permutation(len(self.train_meta))
            self.train_meta = [self.train_meta[i] for i in perm]
        row = self.train_meta[self._train_offset]
        self._train_offset += 1
        return row

    def _next_train(self):
        row = self._next_train_row()
        x, c, g = self._load_example(row)
        x, c = self._crop(x, c)
        return x, c, g

    def _load_group(self, rows):
        """Load a whole group's (audio, mel) pairs through the native
        GIL-free parallel loader (native/tacodata.cc), falling back to
        sequential np.load. Crop order matches the sequential path so the
        RNG stream (and therefore batch contents) is identical."""
        from .. import native
        if not native.available():
            return [(x, c) for x, c in
                    ((self._load_example(r)[:2]) for r in rows)]
        paths = []
        for r in rows:
            paths.append(self._resolve(r, "audio"))
            paths.append(self._resolve(r, "mel"))
        arrs = native.read_npy_batch_f32(paths)
        quantized = is_mulaw_quantize(self.cfg.wavenet.input_type)
        out = []
        for i in range(len(rows)):
            x = arrs[2 * i]
            if quantized:  # int16 npy came back as exact f32; restore ints
                x = x.astype(np.int64)
            out.append((x, arrs[2 * i + 1]))
        return out

    def train_batches(self, batch_size: Optional[int] = None) -> Iterator[Dict]:
        n = batch_size or self.cfg.train.wavenet_batch_size
        while True:
            rows = [self._next_train_row()
                    for _ in range(n * self.batches_per_group)]
            loaded = self._load_group(rows)
            group = []
            for row, (x, c) in zip(rows, loaded):
                g = int(float(row[9])) if len(row) > 9 else 0
                x, c = self._crop(x, c)
                group.append((x, c, g))
            group.sort(key=lambda e: len(e[0]))
            batches = [group[i:i + n] for i in range(0, len(group), n)]
            self.rng.shuffle(batches)
            for b in batches:
                if len(b) == n:
                    yield self._pad_batch(b)

    def test_batches(self, batch_size: Optional[int] = None) -> List[Dict]:
        n = batch_size or self.cfg.train.wavenet_batch_size
        examples = []
        for row in self.test_meta:
            x, c, g = self._load_example(row)
            x, c = self._crop(x, c)
            examples.append((x, c, g))
        examples.sort(key=lambda e: len(e[0]))
        return [self._pad_batch(examples[i:i + n])
                for i in range(0, len(examples), n) if i + n <= len(examples)]
