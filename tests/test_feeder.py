"""Data layer: preprocessing pipeline + feeder invariants on a synthetic corpus."""

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from tacotron2_tpu.config import Config, get_config
from tacotron2_tpu.data.feeder import (COLUMNS, TacotronFeeder, _round_up,
                                       train_test_split_indices)


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    from make_tiny_dataset import main
    out = tmp_path_factory.mktemp("tiny")
    return main(str(out), n=24)


def small_cfg() -> Config:
    cfg = get_config("default")
    return cfg.replace(train=dataclasses.replace(
        cfg.train, tacotron_batch_size=4, tacotron_test_size=0.25))


def test_preprocess_outputs(tiny_corpus):
    train_txt = os.path.join(tiny_corpus, "train.txt")
    assert os.path.exists(train_txt)
    with open(train_txt) as f:
        rows = [line.strip().split("|") for line in f]
    assert len(rows) == 24
    assert len(rows[0]) == len(COLUMNS)
    cfg = get_config("default")
    for r in rows[:5]:
        mel = np.load(os.path.join(tiny_corpus, r[0], "mels", r[2]))
        assert mel.shape == (int(r[6]), cfg.audio.num_mels)
        # hop-alignment invariant: time_steps == mel_frames * hop
        assert int(r[5]) == int(r[6]) * cfg.audio.hop_size
        assert mel.min() >= -4.0 and mel.max() <= 4.0


def test_split_determinism():
    a = train_test_split_indices(100, 0.1, 8, 1234)
    b = train_test_split_indices(100, 0.1, 8, 1234)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    # test rounded down to batch multiple
    assert len(a[1]) % 8 == 0
    assert len(a[0]) + len(a[1]) == 100


def test_feeder_batches(tiny_corpus):
    cfg = small_cfg()
    feeder = TacotronFeeder(cfg, os.path.join(tiny_corpus, "train.txt"),
                            batches_per_group=2)
    it = feeder.train_batches()
    batch = next(it)
    B = cfg.train.tacotron_batch_size
    assert batch["inputs"].shape[0] == B
    assert batch["mel_targets"].shape[0] == B
    assert batch["mel_targets"].shape[2] == 80
    # r-alignment of padded mel length
    assert batch["mel_targets"].shape[1] % cfg.tacotron.outputs_per_step == 0
    # padding values
    longest = batch["targets_lengths"].max()
    assert batch["mel_targets"].shape[1] >= longest
    # stop targets: 0 while speaking, 1 at/after end
    row = np.argmax(batch["targets_lengths"])
    L = batch["targets_lengths"][row]
    assert batch["stop_token_targets"][row, :L - 1].max() == 0.0
    assert batch["stop_token_targets"][row, -1] == 1.0
    # ref mels present and in range
    assert np.abs(batch["ref_mel_emt"]).max() <= 4.0
    assert batch["ref_mel_spk"].shape[2] == 80


def test_feeder_ref_policy_same_emotion(tiny_corpus):
    cfg = small_cfg()
    feeder = TacotronFeeder(cfg, os.path.join(tiny_corpus, "train.txt"),
                            batches_per_group=2)
    ex = feeder._get_example(feeder.train_meta[0])
    # emt4 dataset: speaker ref is the target itself
    np.testing.assert_array_equal(ex["ref_mel_spk"], ex["mel_target"])


def test_feeder_unpaired(tiny_corpus):
    cfg = small_cfg()
    feeder = TacotronFeeder(cfg, os.path.join(tiny_corpus, "train.txt"),
                            unpaired=True, batches_per_group=2)
    batch = next(feeder.train_batches())
    assert "ref_mel_up_emt" in batch and "emt_up_labels" in batch
    assert batch["ref_mel_up_emt"].shape[0] == cfg.train.tacotron_batch_size


def test_feeder_bucketing_sorts_lengths(tiny_corpus):
    cfg = small_cfg()
    feeder = TacotronFeeder(cfg, os.path.join(tiny_corpus, "train.txt"),
                            batches_per_group=3)
    it = feeder.train_batches()
    batches = [next(it) for _ in range(3)]
    # within a batch, lengths are close (bucketed): spread < global spread
    all_lens = [int(m[6]) for m in feeder.train_meta]
    for b in batches:
        spread = b["targets_lengths"].max() - b["targets_lengths"].min()
        assert spread <= max(all_lens) - min(all_lens)


def test_pad_multiple(tiny_corpus):
    cfg = small_cfg()
    feeder = TacotronFeeder(cfg, os.path.join(tiny_corpus, "train.txt"),
                            batches_per_group=2, pad_text_multiple=16,
                            pad_mel_multiple=32)
    batch = next(feeder.train_batches())
    assert batch["inputs"].shape[1] % 16 == 0
    assert batch["mel_targets"].shape[1] % 32 == 0


def test_prefetch(tiny_corpus):
    cfg = small_cfg()
    feeder = TacotronFeeder(cfg, os.path.join(tiny_corpus, "train.txt"),
                            batches_per_group=2)
    it = feeder.prefetch(feeder.train_batches(), depth=2)
    b1, b2 = next(it), next(it)
    assert b1["inputs"].shape[0] == b2["inputs"].shape[0]


def test_feeder_debug_modes(tiny_corpus):
    """--TEST_INPUTS constants and --test_max_len longest-first ordering."""
    cfg = small_cfg()
    path = os.path.join(tiny_corpus, "train.txt")
    f1 = TacotronFeeder(cfg, path, test_inputs=True, batches_per_group=2)
    b = next(f1.train_batches(4))
    assert np.all(b["mel_targets"] == 1.0)
    assert np.all(b["targets_lengths"] == 30)
    assert np.all(b["inputs"] == b["inputs"][0])  # every row is 'hello'

    f2 = TacotronFeeder(cfg, path, test_max_len=True)
    lengths = [int(m[6]) for m in f2.train_meta]
    assert lengths == sorted(lengths, reverse=True)


def test_create_fixed_eval_set(tiny_corpus):
    from tacotron2_tpu.data.feeder import create_fixed_eval_set
    out = os.path.join(tiny_corpus, "test_samps.txt")
    create_fixed_eval_set(os.path.join(tiny_corpus, "train.txt"), out,
                          n_texts=2, n_refs_per_class=1, min_frames=0)
    rows = [l.split("|") for l in open(out).read().strip().split("\n")]
    classes = {m[8] for m in
               (l.split("|") for l in open(os.path.join(tiny_corpus,
                                                        "train.txt")))}
    assert len(rows) == 2 * len(classes)  # texts x classes x 1 ref
    for r in rows:
        assert len(r) == 15
        assert r[12].startswith("emt4/") and r[14] == "same"
        assert r[13].startswith("e")
    # rows are consumable by the style-transfer resolver
    from tacotron2_tpu.synth.tacotron_synth import _resolve_refs
    texts, mels, refs_emt, refs_spk, basenames, emts, spks = _resolve_refs(
        rows, tiny_corpus)
    assert all(os.path.exists(p) for p in refs_emt)
