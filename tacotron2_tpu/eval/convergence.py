"""Convergence harness: overfit-one-batch training with alignment metrics.

The reference's practical convergence check is watching alignment plots form
a diagonal during eval synthesis of a fixed sentence set
(code/tacotron/train.py:602-706). This module makes that check automatic:
train on one batch of an *alignable* corpus (text deterministically renders
the audio, scripts/make_tiny_dataset.make_alignable_corpus) and measure

- teacher-forced mel MAE (masked, reference's MaskedMSE domain), and
- alignment diagonality: Pearson correlation between the attention's
  expected input position per decoder step and the ideal linear ramp.

Used by tests/test_convergence.py (CPU tier, tiny model) and
scripts/train_convergence_tpu.py (real-chip run with committed artifacts).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..text import text_to_sequence


def batch_from_rows(rows: Sequence[tuple], mel_dir: str, cfg: Config,
                    pad_text_to: int = 0, pad_mel_to: int = 0) -> Dict:
    """train.txt row tuples -> one training batch (feeder padding semantics:
    inputs 0, targets -max_abs, stop targets 1; reference feeder.py:130-139).
    """
    r = cfg.tacotron.outputs_per_step
    pad_val = -cfg.audio.max_abs_value
    seqs, mels = [], []
    for row in rows:
        text, mel_fn = row[7], row[2]
        seqs.append(np.asarray(text_to_sequence(text, cfg.data.cleaners),
                               np.int32))
        mels.append(np.load(os.path.join(mel_dir, mel_fn)))
    in_len = np.asarray([len(s) for s in seqs], np.int32)
    T_in = max(pad_text_to, int(in_len.max()))
    tgt_len = np.asarray([len(m) for m in mels], np.int32)
    T_out = max(pad_mel_to, int(tgt_len.max()))
    T_out = ((T_out + r - 1) // r) * r
    B = len(rows)
    inputs = np.zeros((B, T_in), np.int32)
    targets = np.full((B, T_out, cfg.audio.num_mels), pad_val, np.float32)
    stops = np.ones((B, T_out), np.float32)
    for i, (s, m) in enumerate(zip(seqs, mels)):
        inputs[i, :len(s)] = s
        targets[i, :len(m)] = m
        stops[i, :len(m) - 1] = 0.0
    refs = targets[:, :128]
    return dict(
        inputs=jnp.asarray(inputs), input_lengths=jnp.asarray(in_len),
        mel_targets=jnp.asarray(targets),
        stop_token_targets=jnp.asarray(stops),
        targets_lengths=jnp.asarray(tgt_len),
        ref_mel_emt=jnp.asarray(refs), ref_mel_spk=jnp.asarray(refs),
        emt_labels=jnp.zeros((B,), jnp.int32),
        spk_labels=jnp.zeros((B,), jnp.int32))


def alignment_diagonality(aligns: np.ndarray, input_lengths: np.ndarray,
                          target_lengths: np.ndarray, r: int) -> List[float]:
    """Pearson corr between the attention's expected input position per
    decoder step and the ideal linear text->frame ramp; 1.0 = perfect
    monotonic diagonal, ~0 = unfocused/static attention."""
    out = []
    for b in range(aligns.shape[0]):
        L = int(input_lengths[b])
        S = max(2, int(target_lengths[b]) // r)
        a = np.asarray(aligns[b, :L, :S], np.float64)
        a = a / np.maximum(a.sum(axis=0, keepdims=True), 1e-8)
        pos = (np.arange(L)[:, None] * a).sum(axis=0)      # [S]
        ideal = np.linspace(0, L - 1, S)
        c = np.corrcoef(pos, ideal)[0, 1]
        out.append(float(0.0 if np.isnan(c) else c))
    return out


def masked_mel_mae(mel_out: np.ndarray, batch: Dict) -> float:
    tgt = np.asarray(batch["mel_targets"])
    lens = np.asarray(batch["targets_lengths"])
    errs = []
    for b in range(tgt.shape[0]):
        L = int(lens[b])
        errs.append(np.abs(np.asarray(mel_out)[b, :L] - tgt[b, :L]).mean())
    return float(np.mean(errs))


def overfit(cfg: Config, batch: Dict, steps: int, *, seed: int = 0,
            eval_every: int = 50, stop_diag: float = None,
            stop_mae: float = None, return_state: bool = False):
    """Train on one batch for `steps`; returns (final_report, history)
    — or (report, history, trained_state) with return_state, so callers
    can continue the pipeline (GTA synthesis, free-running synthesis).

    history entries: (step, loss, mel_mae, mean_diagonality). With
    stop_diag/stop_mae set, stops early once BOTH bars are met at an eval
    point (lets tests exit as soon as alignment has formed)."""
    from ..train.tacotron_step import TacotronTrainer

    trainer = TacotronTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(seed), batch)
    step_fn = jax.jit(trainer.train_step)
    eval_fn = jax.jit(trainer.eval_step)
    key = jax.random.PRNGKey(seed + 1)
    r = cfg.tacotron.outputs_per_step
    history = []

    def evaluate():
        out, terms = eval_fn(state, batch, jax.random.PRNGKey(123))
        mae = masked_mel_mae(np.asarray(out.mel_outputs), batch)
        diag = alignment_diagonality(
            np.asarray(out.alignments), np.asarray(batch["input_lengths"]),
            np.asarray(batch["targets_lengths"]), r)
        return mae, diag, out

    metrics = None
    steps_done = 0
    for i in range(steps):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, batch, k)
        steps_done = i + 1
        if (i + 1) % eval_every == 0 or i == 0 or i == steps - 1:
            mae, diag, _ = evaluate()
            history.append((i + 1, float(metrics["loss"]), mae,
                            float(np.mean(diag))))
            if (stop_diag is not None and stop_mae is not None
                    and float(np.mean(diag)) > stop_diag
                    and mae < stop_mae):
                break
    mae, diag, out = evaluate()
    report = dict(final_loss=(float(metrics["loss"])
                              if metrics is not None else None),
                  final_mel_mae=mae,
                  diagonality=diag, mean_diagonality=float(np.mean(diag)),
                  steps=steps_done,   # actual trained steps (early stop aware)
                  initial_mel_mae=history[0][2] if history else None,
                  alignments=np.asarray(out.alignments))
    if return_state:
        return report, history, state
    return report, history
