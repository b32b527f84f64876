"""Tacotron training host loop.

Parity with reference code/tacotron/train.py:177-725: feeder + jitted train
step, rolling loss windows with a per-step log line, loss-explosion abort,
checkpoints every `checkpoint_interval` steps, periodic eval synthesis
emitting wavs/alignment/spectrogram artifacts. The graph-building /
session / queue machinery is replaced by jit + host prefetch + orbax.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from ..config import Config
from ..data import audio as host_audio
from ..data.feeder import TacotronFeeder
from ..parallel.mesh import make_mesh, shard_batch
from ..utils import ValueWindow, log
from ..utils.plot import plot_alignment, plot_spectrogram
from ..utils.summary import ProfilerHook, SummaryWriter
from .checkpoint import CheckpointManager, partial_restore
from .eval_guard import EvalFailureGuard
from .tacotron_step import TacotronTrainer

LOSS_WINDOWS = ["loss", "before_loss", "after_loss", "stop_token_loss",
                "regularization_loss", "style_emb_loss_emt",
                "style_emb_loss_spk", "style_emb_orthog_loss"]


def tacotron_train(cfg: Config, input_path: str, log_dir: str, *,
                   train_steps: Optional[int] = None, restore: bool = False,
                   use_mesh: bool = True, batch_size: Optional[int] = None,
                   eval_sentences=None, feeder_kwargs: Optional[dict] = None,
                   trainer_kwargs: Optional[dict] = None,
                   pad_text_multiple: int = 16, pad_mel_multiple: int = 128,
                   pretrained_disc_emt: Optional[str] = None,
                   pretrained_disc_spk: Optional[str] = None,
                   checkpoint_interval: Optional[int] = None,
                   eval_interval: Optional[int] = None,
                   profile_start: Optional[int] = None,
                   profile_end: Optional[int] = None,
                   save_output_vars: bool = False):
    """Train the spectrogram predictor; returns the checkpoint directory."""
    steps = train_steps or cfg.train.tacotron_train_steps
    ckpt_interval = checkpoint_interval or cfg.train.checkpoint_interval
    eval_interval = eval_interval or cfg.train.eval_interval
    bs = batch_size or cfg.train.tacotron_batch_size

    ckpt_dir = os.path.join(log_dir, "taco_pretrained")
    eval_dir = os.path.join(log_dir, "eval-dir")
    os.makedirs(eval_dir, exist_ok=True)

    feeder = TacotronFeeder(cfg, input_path,
                            pad_text_multiple=pad_text_multiple,
                            pad_mel_multiple=pad_mel_multiple,
                            **(feeder_kwargs or {}))
    batches = feeder.prefetch(feeder.train_batches(bs), depth=8)

    trainer = TacotronTrainer(cfg, **(trainer_kwargs or {}))
    first = next(batches)
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.tacotron_random_seed),
                               first)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    log(f"Initialized Tacotron model. Tacotron Parameters {n_params/1e6:.3f} Million.")

    mgr = CheckpointManager(ckpt_dir, cfg.train.max_checkpoints_to_keep)
    if restore and mgr.latest_step() is not None:
        restored = mgr.restore(state)
        # skip pretrained/nat_gan subtrees, as the reference's filtered saver
        restored = restored._replace(params=partial_restore(
            restored.params, state.params,
            lambda n: "pretrained" in n))
        state = restored
        log(f"Restored checkpoint at step {int(state.step)}")

    # graft pretrained emt/spk discriminator encoders into the
    # pretrained_ref_enc_{emt,spk} scopes (reference tacotron/train.py:
    # 280-285,331-340). Accepts the reference's shipped TF checkpoints
    # (disc/tf_import.py) or this repo's own orbax disc checkpoints.
    for kind, path in (("emt", pretrained_disc_emt),
                       ("spk", pretrained_disc_spk)):
        if not path:
            continue
        from ..disc.tf_import import is_tf_checkpoint, load_tf_disc_checkpoint
        scope = f"pretrained_ref_enc_{kind}"
        if is_tf_checkpoint(path):
            loaded = load_tf_disc_checkpoint(path)
            sub, sub_stats = loaded["params"], loaded["batch_stats"]
            src = "TF"
        else:
            from ..disc.train import load_pretrained_disc
            restored = load_pretrained_disc(path)
            sub = restored["params"]
            sub_stats = restored["batch_stats"]
            src = "orbax"
        from .checkpoint import import_pretrained_subtree
        state = state._replace(params=import_pretrained_subtree(
            state.params, sub, scope))
        if sub_stats and hasattr(state, "batch_stats") and                 state.batch_stats is not None and scope in state.batch_stats:
            bs = dict(state.batch_stats)
            bs[scope] = sub_stats
            state = state._replace(batch_stats=bs)
        log(f"Imported pretrained {kind} discriminator ({src}) from {path}")

    mesh = make_mesh() if use_mesh and jax.device_count() > 1 else None
    step_fn = jax.jit(trainer.train_step)

    # nat-GAN disc pretraining phase at step 0 (reference train.py:376-397)
    if trainer.nat_gan and int(state.step) == 0:
        n_disc = cfg.train.nat_gan_pretrain_steps_unpaired \
            if trainer.use_unpaired else cfg.train.nat_gan_pretrain_steps
        if n_disc:
            log(f"Pretraining nat-GAN discriminator for {n_disc} steps")
            disc_fn = jax.jit(trainer.disc_pretrain_step)
            pre_rng = jax.random.PRNGKey(cfg.train.tacotron_random_seed + 2)
            for i in range(n_disc):
                pre_rng, k = jax.random.split(pre_rng)
                state, dm = disc_fn(state, next(batches), k)
                if i % 50 == 0 or i == n_disc - 1:
                    log(f"nat-GAN disc pretrain {i}: "
                        f"d_loss={float(dm['d_loss']):.5f}")

    windows = {k: ValueWindow(100) for k in LOSS_WINDOWS}
    time_window = ValueWindow(100)
    rng = jax.random.PRNGKey(cfg.train.tacotron_random_seed + 1)
    summary = SummaryWriter(log_dir)
    profiler = ProfilerHook(log_dir, profile_start, profile_end)
    loss_guard = EvalFailureGuard("tacotron eval losses")
    synth_guard = EvalFailureGuard("tacotron eval synthesis")

    start_step = int(state.step)
    for batch in batches:
        if int(state.step) >= steps:
            break
        rng, step_rng = jax.random.split(rng)
        t0 = time.time()
        if mesh is not None:
            with mesh:
                batch = shard_batch(mesh, batch)
                state, metrics = step_fn(state, batch, step_rng)
        else:
            state, metrics = step_fn(state, batch, step_rng)
        loss = float(metrics["loss"])
        time_window.append(time.time() - t0)
        for k in windows:
            if k in metrics:
                windows[k].append(float(metrics[k]))

        step = int(state.step)
        profiler.step(step)
        if step % cfg.train.summary_interval == 0:
            summary.scalars(step, {k: float(v) for k, v in metrics.items()
                                   if np.ndim(v) == 0},
                            prefix="tacotron/")
            summary.scalars(step, {"sec_per_step": time_window.average},
                            prefix="tacotron/")
        if step % 10 == 0 or step < 5:
            log(f"Step {step:7d} [{time_window.average:.3f} sec/step, "
                f"loss={loss:.5f}, avg_loss={windows['loss'].average:.5f}, "
                f"before={windows['before_loss'].average:.5f}, "
                f"after={windows['after_loss'].average:.5f}, "
                f"stop={windows['stop_token_loss'].average:.5f}]")

        # loss-explosion abort (tacotron/train.py:508-510)
        if np.isnan(loss) or loss > 100.0:
            log(f"Loss exploded to {loss:.5f} at step {step}", slack=True)
            raise RuntimeError(f"Loss exploded to {loss} at step {step}")

        if (ckpt_interval > 0 and step % ckpt_interval == 0) \
                or step == 300 or step == steps:
            mgr.save(step, state)
            log(f"Saved checkpoint at step {step}")

        # interval 0/None disables periodic eval (mirrors the reference
        # leaving eval off rather than dividing by its interval)
        do_eval = eval_interval and step % eval_interval == 0
        if do_eval and step > start_step:
            _eval_losses(trainer, state, feeder, bs, summary, step,
                         guard=loss_guard)
            _eval_synthesis(cfg, trainer, state, first, eval_dir, step,
                            eval_sentences, guard=synth_guard)
        if save_output_vars and (step == start_step + 1 or do_eval):
            _save_output_vars(trainer, state, batch,
                              os.path.join(log_dir, "output_vars"), step)

    mgr.save(int(state.step), state)
    log(f"Tacotron training complete at step {int(state.step)}", slack=True)
    mgr.close()
    summary.close()
    profiler.close()
    return ckpt_dir, state


def _save_output_vars(trainer, state, batch, out_dir, step):
    """Debug CSV dumps of intermediate tensors (reference --save_output_vars,
    code/train.py:140 + tacotron/train.py:446-449: per-step CSVs of mel/decoder
    outputs and inputs/targets for offline numerics comparison)."""
    import jax

    os.makedirs(out_dir, exist_ok=True)
    try:
        out, _ = jax.jit(trainer.eval_step)(state, batch,
                                            jax.random.PRNGKey(0))
        dumps = {
            "mels": np.asarray(out.mel_outputs)[0],
            "dec_out": np.asarray(out.decoder_output)[0],
            "stop": np.asarray(out.stop_token_prediction),
            "align": np.asarray(out.alignments)[0],
            "inp": np.asarray(batch["inputs"]),
            "inp_len": np.asarray(batch["input_lengths"])[:, None],
            "targ": np.asarray(batch["mel_targets"])[0],
        }
        if "target_lengths" in batch:
            dumps["targ_len"] = np.asarray(batch["target_lengths"])[:, None]
        if "stop_token_targets" in batch:
            dumps["stop_targ"] = np.asarray(batch["stop_token_targets"])
        if out.refnet_out_emt is not None:
            dumps["emb"] = np.asarray(out.refnet_out_emt)
        for name, arr in dumps.items():
            np.savetxt(os.path.join(out_dir, f"{name}-{step}.csv"),
                       np.asarray(arr, np.float32).reshape(arr.shape[0], -1),
                       delimiter=",", fmt="%.6g")
        log(f"Dumped output vars for step {step} -> {out_dir}")
    except Exception as e:  # debug dump must never kill training
        log(f"save_output_vars failed at step {step}: {e}")


def _eval_losses(trainer, state, feeder, batch_size, summary, step,
                 max_batches: int = 4, guard=None):
    """Teacher-forced losses on the held-out split (reference eval model
    scalars, tacotron/train.py:92-102,602-650)."""
    import jax

    try:
        eval_bs = min(batch_size, max(1, len(feeder.test_meta)))
        batches = feeder.test_batches(eval_bs)[:max_batches]
        if not batches:
            return
        eval_fn = jax.jit(trainer.eval_step)
        rng = jax.random.PRNGKey(0)
        acc = {}
        for b in batches:
            _, terms = eval_fn(state, b, rng)
            for k, v in terms.items():
                if np.ndim(v) == 0:
                    acc.setdefault(k, []).append(float(v))
        means = {k: float(np.mean(v)) for k, v in acc.items()}
        summary.scalars(step, means, prefix="eval/")
        log(f"Eval step {step}: loss={means.get('loss', float('nan')):.5f} "
            f"before={means.get('before_loss', float('nan')):.5f} "
            f"after={means.get('after_loss', float('nan')):.5f} "
            f"stop={means.get('stop_token_loss', float('nan')):.5f}")
        if guard is not None:
            guard.success()
    except Exception as e:  # transient eval failure must never kill training
        if guard is not None:   # ... but K-in-a-row raises (eval_guard.py)
            guard.failure(step, e, log=log)
        else:
            log(f"eval losses failed at step {step}: {e}")


def _eval_synthesis(cfg, trainer, state, sample_batch, eval_dir, step,
                    sentences=None, guard=None):
    """Periodic convergence check: synthesize the fixed eval sentence set
    (hparams.py:370-395) with per-sentence wav + alignment + mel plots,
    bucketed by step//500 (reference tacotron/train.py:602-706)."""
    from ..data.eval_sentences import EVAL_SENTENCES
    from ..synth.tacotron_synth import TacotronSynthesizer

    bucket = os.path.join(eval_dir, f"step_{step // 500}")
    os.makedirs(os.path.join(bucket, "wavs"), exist_ok=True)
    os.makedirs(os.path.join(bucket, "plots"), exist_ok=True)
    synth = TacotronSynthesizer(cfg, state.params, state.batch_stats,
                                model=trainer.model)
    n = max(1, cfg.train.eval_num_sentences)
    texts = (sentences or EVAL_SENTENCES)[:n]
    # refs cycled from the sample batch (the reference's train-time eval
    # takes refs from the eval feeder batch)
    refs_e = np.asarray(sample_batch["ref_mel_emt"])
    refs_s = np.asarray(sample_batch["ref_mel_spk"])
    ref_list_e = [refs_e[i % len(refs_e)] for i in range(len(texts))]
    ref_list_s = [refs_s[i % len(refs_s)] for i in range(len(texts))]
    try:
        result = synth.synthesize(texts, ref_list_e, ref_list_s,
                                  max_steps=min(cfg.tacotron.max_iters, 400))
        wavs = synth.mels_to_wavs(result["mels"])
        for i, mel in enumerate(result["mels"]):
            host_audio.save_wav(
                wavs[i], os.path.join(bucket, "wavs",
                                      f"step-{step}-eval-{i}.wav"),
                cfg.audio.sample_rate)
            plot_alignment(
                result["alignments"][i],
                os.path.join(bucket, "plots", f"step-{step}-align-{i}.png"),
                title=f"step {step} | {texts[i][:40]}")
            plot_spectrogram(
                mel, os.path.join(bucket, "plots",
                                  f"step-{step}-mel-{i}.png"),
                title=f"step {step} | {texts[i][:40]}")
        log(f"Eval synthesis artifacts written for step {step} "
            f"({len(texts)} sentences)")
        if guard is not None:
            guard.success()
    except Exception as e:  # transient eval failure must never kill training
        if guard is not None:   # ... but K-in-a-row raises (eval_guard.py)
            guard.failure(step, e, log=log)
        else:
            log(f"eval synthesis failed at step {step}: {e}")
