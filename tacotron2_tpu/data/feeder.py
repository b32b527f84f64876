"""Tacotron input pipeline: host-side loader replacing the TF FIFOQueue feeder.

Behavioral parity with reference code/tacotron/feeder.py:
- train/test split with sklearn train_test_split, seed 1234, test rounded down
  to a batch multiple with extras returned to train (feeder.py:90-101)
- length-bucketed groups of `batches_per_group` batches, sorted by mel length,
  then batch-shuffled (feeder.py:302-317)
- padding: inputs 0, mel targets -max_abs_value, stop tokens 1, mel lengths
  rounded up to the reduction factor (feeder.py:560-585)
- reference-mel selection policy: emt4/emth rows take a random same-emotion
  reference (speaker ref = self), librispeech/vctk rows a random same-speaker
  reference (emotion ref = self); intercross + unpaired modes (feeder.py:374-444)

TPU adaptation: no queue/threads-into-session — batches are plain numpy dicts
handed to `parallel.shard_batch`; an optional background prefetch thread keeps
the device fed. Optional shape bucketing (pad_text_multiple/pad_mel_multiple)
bounds XLA recompilation, off by default for exact parity.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..config import Config
from ..text import text_to_sequence

COLUMNS = ["dataset", "audio_filename", "mel_filename", "linear_filename",
           "spk_emb_filename", "time_steps", "mel_frames", "text",
           "emt_label", "spk_label", "basename", "sex"]


def _round_up(x: int, m: int) -> int:
    return x if x % m == 0 else x + m - x % m


def _round_down(x: int, m: int) -> int:
    return x if x % m == 0 else x - x % m


def train_test_split_indices(n: int, test_size, batch_size: int,
                             random_state: int):
    """sklearn.model_selection.train_test_split parity (feeder.py:90-101)."""
    from sklearn.model_selection import train_test_split
    indices = np.arange(n)
    train_idx, test_idx = train_test_split(indices, test_size=test_size,
                                           random_state=random_state)
    keep = _round_down(len(test_idx), batch_size)
    extra = test_idx[keep:]
    test_idx = test_idx[:keep]
    train_idx = np.concatenate([train_idx, extra])
    return train_idx, test_idx


class TacotronFeeder:
    """Batched example stream for Tacotron training."""

    def __init__(self, cfg: Config, metadata_path: str, *,
                 emt_only: bool = False, intercross_both: bool = False,
                 intercross_spk_only: bool = False, unpaired: bool = False,
                 up_ref_match_p: bool = False, no_general: bool = False,
                 remove_long_samples: bool = False,
                 batches_per_group: Optional[int] = None,
                 pad_text_multiple: int = 1, pad_mel_multiple: int = 1,
                 seed: Optional[int] = None, test_inputs: bool = False,
                 test_max_len: bool = False, shard_by_host: bool = True):
        self.cfg = cfg
        self.data_folder = os.path.dirname(metadata_path)
        self.emt_only = emt_only
        self.intercross_both = intercross_both
        self.intercross_spk_only = intercross_spk_only
        self.unpaired = unpaired
        self.up_ref_match_p = up_ref_match_p
        self.pad_text_multiple = pad_text_multiple
        self.pad_mel_multiple = pad_mel_multiple
        self.batches_per_group = batches_per_group or cfg.data.batches_per_group
        self.cleaners = cfg.data.cleaners
        self.rng = np.random.default_rng(
            seed if seed is not None else cfg.train.tacotron_data_random_state)

        with open(metadata_path, encoding="utf-8") as f:
            meta = [line.strip().split("|") for line in f if line.strip()]
        if remove_long_samples:
            before = len(meta)
            meta = [m for m in meta if not m[10].endswith("_023.wav")]
            meta = [m for m in meta if not m[10].endswith("_021.wav")]
            meta = [m for m in meta if int(m[6]) < 500]
            print(f"Removed long samples: {before} -> {len(meta)}")
        self.metadata = meta

        hop_s = cfg.audio.effective_hop / cfg.audio.sample_rate
        hours = sum(int(m[6]) for m in meta) * hop_s / 3600
        print(f"Loaded metadata for {len(meta)} examples ({hours:.2f} hours)")

        bs = cfg.train.tacotron_batch_size
        train_idx, test_idx = train_test_split_indices(
            len(meta), cfg.train.tacotron_test_size, bs,
            cfg.train.tacotron_data_random_state)
        self.train_meta = [meta[i] for i in train_idx]
        self.test_meta = [meta[i] for i in test_idx]
        self._train_offset = 0

        # multi-host: each host consumes a disjoint deterministic stride-shard
        # of the train split (test set replicated for consistent eval); the
        # shuffle RNG is decorrelated per host. Replaces the reference's
        # single-process feeder (SURVEY §2.4 "sharded data loading per host").
        if shard_by_host:
            import jax
            pc, pi = jax.process_count(), jax.process_index()
            if pc > 1:
                self.train_meta = self.train_meta[pi::pc]
                base = seed if seed is not None else \
                    cfg.train.tacotron_data_random_state
                self.rng = np.random.default_rng(base + pi)

        # debug modes: constant data for deterministic graph-plumbing checks
        # (reference --TEST_INPUTS, feeder.py:343-348,446-450) and
        # longest-batches-first for OOM-limit probing (--test_max_len,
        # feeder.py:106-109)
        self.test_inputs = test_inputs
        self.test_max_len = test_max_len
        if test_max_len:
            self.train_meta.sort(key=lambda m: int(m[6]), reverse=True)
            self.test_meta.sort(key=lambda m: int(m[6]), reverse=True)
            print("TESTING MAX LENGTH FOR SAMPLES TO FIND MAX BATCH SIZE")

        # class inventories for unpaired sampling (feeder.py:121-125)
        emts = sorted({m[8] for m in meta})
        spks = sorted({m[9] for m in meta})
        if no_general:
            emts = [e for e in emts if e != "0"]
            spks = [s for s in spks if s != "0"]
        self.emt_list, self.spk_list = emts, spks

        # padding values (feeder.py:130-139)
        self._pad = 0
        self._target_pad = (-cfg.audio.max_abs_value if cfg.audio.symmetric_mels
                            else 0.0)
        self._token_pad = 1.0

    # ------------------------------------------------------------- examples

    def _load_mel(self, meta_row) -> np.ndarray:
        path = os.path.join(self.data_folder, meta_row[0], "mels", meta_row[2])
        from .. import native
        if native.available():
            return native.read_npy_f32(path)
        return np.load(path)

    def _random_row_where(self, rows: List, pred) -> Optional[List]:
        cands = [m for m in rows if pred(m)]
        if not cands:
            return None
        return cands[int(self.rng.integers(len(cands)))]

    def _get_example(self, meta) -> Dict:
        """One training example with reference-mel policy (feeder.py:332-450)."""
        dataset, text = meta[0], meta[7]
        emt_label, spk_label = meta[8], meta[9]
        if self.test_inputs:
            const_mel = np.ones((30, self.cfg.audio.num_mels), np.float32)
            seq = np.asarray(text_to_sequence("hello", self.cleaners), np.int32)
            return dict(
                inputs=seq, mel_target=const_mel,
                token_target=np.zeros((29,), np.float32),
                emt_label=int(emt_label), spk_label=int(spk_label),
                ref_mel_emt=const_mel, ref_mel_spk=const_mel,
                emt_up_label=int(float(emt_label)),
                spk_up_label=int(float(spk_label)),
                ref_mel_up_emt=const_mel, ref_mel_up_spk=const_mel,
                mel_length=30)
        input_data = np.asarray(text_to_sequence(text, self.cleaners), np.int32)
        mel_target = self._load_mel(meta)
        token_target = np.zeros((len(mel_target) - 1,), np.float32)

        train_rows = self.train_meta
        ref_mel_up_emt = np.zeros((1, self.cfg.audio.num_mels), np.float32)
        ref_mel_up_spk = np.zeros((1, self.cfg.audio.num_mels), np.float32)
        emt_up, spk_up = emt_label, spk_label

        if self.emt_only:
            ref_mel_spk = np.zeros((1, self.cfg.audio.num_mels), np.float32)
            row = self._random_row_where(
                train_rows, lambda m: m[0] in ("emt4", "emth") and m[8] == emt_label)
            ref_mel_emt = self._load_mel(row) if row is not None else mel_target
        elif self.intercross_both or self.intercross_spk_only:
            chosen = (self.rng.choice(["emt", "spk"]) if self.intercross_spk_only
                      else "spk")
            label = emt_label if chosen == "emt" else spk_label
            col = 8 if chosen == "emt" else 9
            row = self._random_row_where(train_rows, lambda m: m[col] == label)
            ref_same = self._load_mel(row) if row is not None else mel_target
            ref_mel_emt = ref_same if chosen == "emt" else mel_target
            ref_mel_spk = mel_target if chosen == "emt" else ref_same
        else:
            if dataset in ("emt4", "emth"):
                ref_mel_spk = mel_target
                row = self._random_row_where(
                    train_rows,
                    lambda m: m[0] in ("emt4", "emth") and m[8] == emt_label)
                ref_mel_emt = self._load_mel(row) if row is not None else mel_target
            else:  # librispeech / vctk / generic multi-speaker
                ref_mel_emt = mel_target
                row = self._random_row_where(train_rows,
                                             lambda m: m[9] == spk_label)
                ref_mel_spk = self._load_mel(row) if row is not None else mel_target

        if self.unpaired:
            if self.up_ref_match_p:
                ref_mel_up_emt, ref_mel_up_spk = ref_mel_emt, ref_mel_spk
            else:
                emt_up = str(self.rng.choice(self.emt_list))
                spk_up = str(self.rng.choice(self.spk_list))
                row_e = self._random_row_where(train_rows, lambda m: m[8] == emt_up)
                row_s = self._random_row_where(train_rows, lambda m: m[9] == spk_up)
                if row_e is not None:
                    ref_mel_up_emt = self._load_mel(row_e)
                if row_s is not None:
                    ref_mel_up_spk = self._load_mel(row_s)

        return dict(
            inputs=input_data, mel_target=mel_target, token_target=token_target,
            emt_label=int(emt_label), spk_label=int(spk_label),
            ref_mel_emt=ref_mel_emt, ref_mel_spk=ref_mel_spk,
            emt_up_label=int(float(emt_up)), spk_up_label=int(float(spk_up)),
            ref_mel_up_emt=ref_mel_up_emt, ref_mel_up_spk=ref_mel_up_spk,
            mel_length=len(mel_target))

    def _next_train_example(self) -> Dict:
        if self._train_offset >= len(self.train_meta):
            self._train_offset = 0
            perm = self.rng.permutation(len(self.train_meta))
            self.train_meta = [self.train_meta[i] for i in perm]
        meta = self.train_meta[self._train_offset]
        self._train_offset += 1
        return self._get_example(meta)

    # --------------------------------------------------------------- batches

    def _pad_batch(self, examples: List[Dict], train: bool) -> Dict[str, np.ndarray]:
        """Pad + stack one batch (feeder.py:458-585, minus per-GPU splitting)."""
        r = self.cfg.tacotron.outputs_per_step

        input_lengths = np.asarray([len(e["inputs"]) for e in examples], np.int32)
        in_max = _round_up(int(input_lengths.max()), self.pad_text_multiple)
        inputs = np.stack([
            np.pad(e["inputs"], (0, in_max - len(e["inputs"])),
                   constant_values=self._pad) for e in examples])

        def pad_targets(key):
            max_len = max(len(e[key]) for e in examples)
            data_len = _round_up(_round_up(max_len, r), self.pad_mel_multiple)
            return np.stack([
                np.pad(e[key], ((0, data_len - len(e[key])), (0, 0)),
                       constant_values=self._target_pad) for e in examples])

        mel_targets = pad_targets("mel_target")
        tok_max = _round_up(
            _round_up(max(len(e["token_target"]) for e in examples) + 1, r),
            self.pad_mel_multiple)
        token_targets = np.stack([
            np.pad(e["token_target"], (0, tok_max - len(e["token_target"])),
                   constant_values=self._token_pad) for e in examples])

        batch = dict(
            inputs=inputs, input_lengths=input_lengths,
            mel_targets=mel_targets.astype(np.float32),
            stop_token_targets=token_targets.astype(np.float32),
            targets_lengths=np.asarray([e["mel_length"] for e in examples], np.int32),
            emt_labels=np.asarray([e["emt_label"] for e in examples], np.int32),
            spk_labels=np.asarray([e["spk_label"] for e in examples], np.int32),
            ref_mel_emt=pad_targets("ref_mel_emt").astype(np.float32),
            ref_mel_spk=pad_targets("ref_mel_spk").astype(np.float32),
        )
        if train and self.unpaired:
            batch["emt_up_labels"] = np.asarray(
                [e["emt_up_label"] for e in examples], np.int32)
            batch["spk_up_labels"] = np.asarray(
                [e["spk_up_label"] for e in examples], np.int32)
            batch["ref_mel_up_emt"] = pad_targets("ref_mel_up_emt").astype(np.float32)
            batch["ref_mel_up_spk"] = pad_targets("ref_mel_up_spk").astype(np.float32)
        return batch

    def train_batches(self, batch_size: Optional[int] = None) -> Iterator[Dict]:
        """Infinite stream of length-bucketed, shuffled train batches."""
        n = batch_size or self.cfg.train.tacotron_batch_size
        while True:
            examples = [self._next_train_example()
                        for _ in range(n * self.batches_per_group)]
            examples.sort(key=lambda e: e["mel_length"])
            batches = [examples[i:i + n] for i in range(0, len(examples), n)]
            self.rng.shuffle(batches)
            for b in batches:
                if len(b) == n:
                    yield self._pad_batch(b, train=True)

    def test_batches(self, batch_size: Optional[int] = None) -> List[Dict]:
        """Fixed eval batches over the whole test split (feeder.py:270-300)."""
        n = batch_size or self.cfg.train.tacotron_batch_size
        examples = [self._get_example(m) for m in self.test_meta]
        examples.sort(key=lambda e: e["mel_length"])
        batches = [examples[i:i + n] for i in range(0, len(examples), n)
                   if i + n <= len(examples)]
        return [self._pad_batch(b, train=False) for b in batches]

    def prefetch(self, iterator: Iterator[Dict], depth: int = 8) -> Iterator[Dict]:
        """Background-thread prefetch (replaces the FIFOQueue, feeder.py:163-234)."""
        q: queue.Queue = queue.Queue(maxsize=depth)
        stop = object()

        def worker():
            try:
                for item in iterator:
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item


def create_fixed_eval_set(metadata_path: str, out_path: str, *,
                          n_texts: int = 5, n_refs_per_class: int = 5,
                          min_frames: int = 200, class_col: int = 8,
                          seed: int = 0) -> str:
    """Build a reproducible style-transfer eval manifest.

    Generic version of the reference's fixed eval-set writer
    (feeder.py:585-687, `create_test_samps_fixed`): choose `n_texts` long
    utterances as the texts, cross each with `n_refs_per_class` reference
    utterances from every emotion class, and write rows in the synthesis
    metadata schema (train.txt columns + [12]=emt-ref 'dataset/mel',
    [13]=ref tag, [14]=spk-ref 'same') consumable by
    `synthesize --mode synthesis`.
    """
    rng = np.random.default_rng(seed)
    with open(metadata_path, encoding="utf-8") as f:
        meta = [line.strip().split("|") for line in f if line.strip()]
    long_rows = [m for m in meta if int(m[6]) > min_frames] or meta
    by_class: Dict[str, list] = {}
    for m in long_rows:
        by_class.setdefault(m[class_col], []).append(m)

    text_rows = [long_rows[i] for i in
                 rng.choice(len(long_rows), min(n_texts, len(long_rows)),
                            replace=False)]
    out_rows = []
    for t_row in text_rows:
        for cls in sorted(by_class):
            cands = by_class[cls]
            picks = rng.choice(len(cands), min(n_refs_per_class, len(cands)),
                               replace=False)
            for k, ci in enumerate(picks):
                ref = cands[int(ci)]
                row = list(t_row[:12])
                row[8] = cls                       # target emotion label
                row += [f"{ref[0]}/{ref[2]}",      # emt ref dataset/mel
                        f"e{cls}_{k + 1}",         # tag for output basenames
                        "same"]                    # spk ref = own mel
                out_rows.append("|".join(str(x) for x in row))
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(out_rows) + "\n")
    print(f"Wrote {len(out_rows)} fixed eval rows -> {out_path}")
    return out_path
