"""System-level convergence: overfit one batch of an ALIGNABLE corpus (text
deterministically renders the audio, through the real preprocessing path)
and require that location-sensitive attention actually forms a monotonic
diagonal and the teacher-forced mel error falls — the automated version of
the reference's practical convergence check (watching alignment plots during
training, code/tacotron/train.py:602-706). This fails if attention never
aligns, not just if gradients stop flowing."""

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from tacotron2_tpu.config import Config
from tacotron2_tpu.eval.convergence import (alignment_diagonality,
                                            batch_from_rows, masked_mel_mae,
                                            overfit)

STEPS = 600


def conv_config() -> Config:
    """Recipe validated by round-3 capacity trials: 12 utterances with a
    48-unit decoder LSTM and a small (16,16) prenet make text attention the
    cheapest path to low loss (with 4 utterances + a 64-unit LSTM, the
    decoder memorizes the batch and attention never needs to align);
    teacher-forced eval (natural free-running needs far longer training)."""
    cfg = Config()
    return cfg.replace(
        tacotron=dataclasses.replace(
            cfg.tacotron, embedding_dim=32, enc_conv_num_layers=1,
            enc_conv_channels=32, enc_conv_kernel_size=5,
            encoder_lstm_units=32, attention_dim=32, attention_filters=8,
            attention_kernel=15, prenet_layers=(16, 16),
            decoder_lstm_units=48, postnet_num_layers=1, postnet_channels=32,
            postnet_kernel_size=5, outputs_per_step=2),
        gst=dataclasses.replace(
            cfg.gst, num_gst=4, num_heads=2, style_embed_depth=8,
            style_att_dim=8, reference_filters=(4, 4), reference_depth=8,
            n_emt=4, n_spk=3),
        train=dataclasses.replace(cfg.train, tacotron_natural_eval=False),
    )


@pytest.mark.slow
def test_overfit_one_batch_aligns(tmp_path):
    """Fails if attention never becomes a monotonic diagonal or the mel
    error stops falling (hardware-scale counterpart: committed
    artifacts/convergence_r3 — full-size model, 2000 steps on the v5e,
    MAE 3.5->0.034, diagonality -0.96->+0.81)."""
    from make_tiny_dataset import make_alignable_corpus

    rows, _, mel_dir = make_alignable_corpus(str(tmp_path), n=12, chars=10,
                                             seed=3)
    cfg = conv_config()
    batch = batch_from_rows(rows, mel_dir, cfg)
    report, history = overfit(cfg, batch, STEPS, seed=0, eval_every=100,
                              stop_diag=0.75, stop_mae=1.2)

    # mel error must actually fall, to a usable bar on the [-4,4] scale
    assert report["final_mel_mae"] < 0.4 * report["initial_mel_mae"], history
    assert report["final_mel_mae"] < 1.2, history
    # attention must form a monotonic text->frame diagonal
    assert report["mean_diagonality"] > 0.6, (report["diagonality"], history)


def test_alignment_diagonality_metric():
    """The metric itself: a perfect diagonal scores ~1, uniform attention
    scores ~0, an anti-diagonal scores ~-1."""
    L, S = 16, 24
    diag = np.zeros((1, L, S), np.float32)
    idx = np.round(np.linspace(0, L - 1, S)).astype(int)
    diag[0, idx, np.arange(S)] = 1.0
    uni = np.full((1, L, S), 1.0 / L, np.float32)
    anti = diag[:, ::-1]
    lens = np.asarray([L])
    tl = np.asarray([S * 2])
    assert alignment_diagonality(diag, lens, tl, 2)[0] > 0.99
    assert abs(alignment_diagonality(uni, lens, tl, 2)[0]) < 0.2
    assert alignment_diagonality(anti, lens, tl, 2)[0] < -0.99
