"""WaveNet training host loop.

Parity with reference code/wavenet_vocoder/train.py:194-342: feeder + jitted
step with EMA shadow params, rolling loss window, loss-explosion abort,
checkpoints (storing EMA weights for synthesis restore), periodic eval that
generates audio with the incremental sampler and plots the waveform plus a
mel-reconstruction comparison (train.py:89-126).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from ..config import Config
from ..data import audio as host_audio
from ..data.wavenet_feeder import WaveNetFeeder
from ..utils import ValueWindow, log
from .eval_guard import EvalFailureGuard
from ..utils.plot import plot_spectrogram, waveplot
from ..utils.summary import ProfilerHook, SummaryWriter
from .checkpoint import CheckpointManager
from .wavenet_step import WaveNetTrainer


def wavenet_train(cfg: Config, input_path: str, log_dir: str, *,
                  train_steps: Optional[int] = None, restore: bool = False,
                  gta: bool = True, batch_size: Optional[int] = None,
                  checkpoint_interval: Optional[int] = None,
                  eval_interval: Optional[int] = None,
                  profile_start: Optional[int] = None,
                  profile_end: Optional[int] = None):
    """Train the vocoder on (audio, mel) pairs; returns checkpoint dir + state."""
    steps = train_steps or cfg.train.wavenet_train_steps
    ckpt_interval = checkpoint_interval or cfg.train.checkpoint_interval
    eval_interval = eval_interval or cfg.train.eval_interval
    bs = batch_size or cfg.train.wavenet_batch_size

    ckpt_dir = os.path.join(log_dir, "wave_pretrained")
    eval_dir = os.path.join(log_dir, "wave_eval")
    os.makedirs(eval_dir, exist_ok=True)

    feeder = WaveNetFeeder(cfg, input_path, gta=gta)
    batches = iter(feeder.train_batches(bs))

    trainer = WaveNetTrainer(cfg)
    try:
        first = next(batches)
    except (IOError, FileNotFoundError) as e:
        raise RuntimeError(
            f"WaveNet feeder could not load its first batch ({e}). If this is "
            "a missing audio-*.npy, rerun preprocessing with --write-audio — "
            "vocoder training needs waveform targets alongside the mels."
        ) from e
    mgr = CheckpointManager(ckpt_dir, cfg.train.max_checkpoints_to_keep)
    will_restore = restore and mgr.latest_step() is not None
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.wavenet_random_seed),
                               first,
                               skip_data_dependent_init=will_restore)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    log(f"Initialized WaveNet model. Receptive field {cfg.wavenet.receptive_field} "
        f"samples ({cfg.wavenet.receptive_field / cfg.audio.sample_rate * 1000:.1f} ms). "
        f"WaveNet Parameters {n_params / 1e6:.3f} Million.")

    if will_restore:
        state = mgr.restore(state)
        log(f"Restored checkpoint at step {int(state.step)}")

    step_fn = jax.jit(trainer.train_step)
    loss_window = ValueWindow(100)
    time_window = ValueWindow(100)
    loss_guard = EvalFailureGuard("wavenet eval losses")
    gen_guard = EvalFailureGuard("wavenet eval generation")
    rng = jax.random.PRNGKey(cfg.train.wavenet_random_seed + 1)
    summary = SummaryWriter(log_dir)
    profiler = ProfilerHook(log_dir, profile_start, profile_end)

    for batch in batches:
        if int(state.step) >= steps:
            break
        rng, step_rng = jax.random.split(rng)
        t0 = time.time()
        state, metrics = step_fn(state, batch, step_rng)
        loss = float(metrics["loss"])
        time_window.append(time.time() - t0)
        loss_window.append(loss)
        step = int(state.step)
        profiler.step(step)
        if step % cfg.train.summary_interval == 0:
            summary.scalars(step, {k: float(v) for k, v in metrics.items()
                                   if np.ndim(v) == 0}, prefix="wavenet/")
            summary.scalars(step, {"sec_per_step": time_window.average},
                            prefix="wavenet/")
        if step % 10 == 0 or step < 5:
            log(f"Step {step:7d} [{time_window.average:.3f} sec/step, "
                f"loss={loss:.5f}, avg_loss={loss_window.average:.5f}]")

        # loss-explosion abort (wavenet_vocoder/train.py:311-313)
        if np.isnan(loss) or loss > 100.0:
            log(f"Loss exploded to {loss:.5f} at step {step}", slack=True)
            raise RuntimeError(f"Loss exploded to {loss} at step {step}")

        if (ckpt_interval > 0 and step % ckpt_interval == 0) or step == steps:
            mgr.save(step, state)
            log(f"Saved checkpoint at step {step} (params + EMA shadow)")
            _export_speaker_embeddings(cfg, state, log_dir)

        # interval 0/None disables periodic eval
        if eval_interval and step % eval_interval == 0:
            _eval_losses(trainer, state, feeder, bs, summary, step,
                         guard=loss_guard)
            _eval_generation(cfg, state, first, eval_dir, step,
                             guard=gen_guard)

    mgr.save(int(state.step), state)
    log(f"WaveNet training complete at step {int(state.step)}", slack=True)
    mgr.close()
    summary.close()
    profiler.close()
    return ckpt_dir, state


def _export_speaker_embeddings(cfg, state, log_dir):
    """Speaker-embedding projector export (wavenet_vocoder/train.py:26-39,
    327-334): the global-conditioning embedding table + a metadata TSV of
    speaker ids, in the TensorBoard-projector-compatible TSV layout
    (embeddings.tsv rows = tab-separated vectors; metadata.tsv = one label
    per row). No-op without speaker conditioning."""
    wn = cfg.wavenet
    if wn.gin_channels <= 0 or not wn.use_speaker_embedding:
        return
    table = state.params.get("gc_embedding", {}).get("embedding")
    if table is None:
        return
    emb_dir = os.path.join(log_dir, "speaker_embeddings")
    os.makedirs(emb_dir, exist_ok=True)
    arr = np.asarray(table)
    with open(os.path.join(emb_dir, "embeddings.tsv"), "w") as f:
        for row in arr:
            f.write("\t".join(f"{x:.6f}" for x in row) + "\n")
    with open(os.path.join(emb_dir, "metadata.tsv"), "w") as f:
        f.write("\n".join(f"speaker_{i}" for i in range(len(arr))) + "\n")
    log(f"Speaker embedding projector export updated ({arr.shape})")


def _eval_losses(trainer, state, feeder, batch_size, summary, step,
                 max_batches: int = 2, guard=None):
    """Held-out-split losses (reference wavenet eval scalars, train.py:41-64)."""
    try:
        eval_bs = min(batch_size, max(1, len(feeder.test_meta)))
        batches = feeder.test_batches(eval_bs)[:max_batches]
        if not batches:
            return
        eval_fn = jax.jit(trainer.eval_step)
        acc = []
        for b in batches:
            _, terms = eval_fn(state, b)
            acc.append(float(terms["loss"]))
        summary.scalars(step, {"loss": float(np.mean(acc))}, prefix="eval/")
        log(f"Eval step {step}: loss={float(np.mean(acc)):.5f}")
        if guard is not None:
            guard.success()
    except Exception as e:  # transient eval failure must never kill training
        if guard is not None:   # ... but K-in-a-row raises (eval_guard.py)
            guard.failure(step, e, log=log)
        else:
            log(f"wavenet eval losses failed at step {step}: {e}")


def _eval_generation(cfg, state, batch, eval_dir, step, guard=None):
    """Generate one eval utterance + mel-reconstruction plot (train.py:89-126)."""
    from ..synth.wavenet_synth import WaveNetSynthesizer

    try:
        t0 = time.time()
        frames = max(4, int(batch["input_lengths"][0]) // cfg.audio.effective_hop)
        mel01 = np.asarray(batch["c"][0][:frames])
        # undo the [0,1] rescale to recover a model-range mel for re-analysis
        lo = -cfg.audio.max_abs_value if cfg.audio.symmetric_mels else 0.0
        mel = mel01 * (cfg.audio.max_abs_value - lo) + lo
        synth = WaveNetSynthesizer(cfg, state.ema_params)
        wav = synth.synthesize([mel])[0]
        gen_rate = len(wav) / cfg.audio.effective_hop / max(time.time() - t0, 1e-9)
        log(f"eval generation: {len(wav)} samples, {gen_rate:.1f} frames/sec")
        target = np.asarray(batch["y"][0][: len(wav)])
        host_audio.save_wav(wav, os.path.join(eval_dir, f"step-{step}-pred.wav"),
                            cfg.audio.sample_rate)
        waveplot(os.path.join(eval_dir, f"step-{step}-waveplot.png"), wav,
                 target, cfg.audio.sample_rate)
        # mel reconstruction comparison (train.py:111-118)
        pre = host_audio.preemphasis(wav, cfg.audio.preemphasis,
                                     cfg.audio.preemphasize)
        # match the preprocessing chain's normalization of the mel source
        # signal (preem rescaled by its own peak, preprocess.py:74-95) so
        # the comparison has no constant gain offset (the reference instead
        # min/max-interps the generated mel, train.py:111-118)
        if cfg.audio.rescale:
            pre = pre / max(np.abs(pre).max(), 1e-9) * cfg.audio.rescaling_max
        mel_rec = host_audio.mel_spectrogram(pre, cfg.audio)
        n = min(len(mel_rec), len(mel))
        plot_spectrogram(mel_rec[:n],
                         os.path.join(eval_dir, f"step-{step}-mel-comparison.png"),
                         target_spectrogram=mel[:n],
                         title=f"step {step} reconstruction")
        if guard is not None:
            guard.success()
    except Exception as e:  # transient eval failure must never kill training
        if guard is not None:   # ... but K-in-a-row raises (eval_guard.py)
            guard.failure(step, e, log=log)
        else:
            log(f"wavenet eval generation failed at step {step}: {e}")
