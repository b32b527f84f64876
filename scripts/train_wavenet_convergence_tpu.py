"""Real-chip WaveNet convergence run: overfit the vocoder on a tiny corpus
with the fused train-stack kernels, then run the reference's own convergence
check — generate audio with the fused incremental sampler and compare the
mel re-extracted from the generated audio against the conditioning mel
(wavenet_vocoder/train.py:111-118).

Writes artifacts/convergence_r3/wavenet_{curve.jsonl,report.json,
mel_compare_*.png}.

Usage: python scripts/train_wavenet_convergence_tpu.py [--steps 1500]
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scripts.bench_train import _enable_compile_cache  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--crop", type=int, default=8000)
    p.add_argument("--eval-every", type=int, default=250)
    p.add_argument("--gen-seconds", type=float, default=0.75)
    p.add_argument("--n-eval", type=int, default=2,
                   help="utterances to generate for the regen-mel check")
    p.add_argument("--decay-steps", type=int, default=None,
                   help="override train.wavenet_decay_steps (the default "
                        "200k halving leaves LR ~flat over an overfit run; "
                        "a faster decay quiets the late-training loss noise)")
    p.add_argument("--out", default="artifacts/convergence_r3")
    args = p.parse_args(argv)

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from make_tiny_dataset import main as make_corpus
    from tacotron2_tpu.config import Config
    from tacotron2_tpu.data import audio as host_audio
    from tacotron2_tpu.models.wavenet.model import WaveNet
    from tacotron2_tpu.ops.wavenet_kernel import fused_incremental_sample
    from tacotron2_tpu.train.wavenet_step import WaveNetTrainer
    from tacotron2_tpu.utils.plot import plot_spectrogram

    cfg = Config()
    cfg = cfg.replace(wavenet=dataclasses.replace(
        cfg.wavenet, compute_dtype="bfloat16", use_fused_train_stack=True))
    if args.decay_steps is not None:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, wavenet_decay_steps=args.decay_steps))
    hop = cfg.audio.effective_hop
    T = (args.crop // hop) * hop
    B = args.batch

    with tempfile.TemporaryDirectory() as td:
        corpus = make_corpus(os.path.join(td, "tiny"), n=B)
        mel_dir = os.path.join(corpus, "emt4", "mels")
        aud_dir = os.path.join(corpus, "emt4", "audio")
        xs, cs = [], []
        rows = [l.split("|") for l in
                open(os.path.join(corpus, "train.txt"), encoding="utf-8")]
        for row in rows[:B]:
            aud = np.load(os.path.join(aud_dir, row[1]))
            mel = np.load(os.path.join(mel_dir, row[2]))
            assert len(aud) >= T, (len(aud), T)
            xs.append(aud[:T])
            cs.append(mel[: T // hop])
        x = jnp.asarray(np.stack(xs), jnp.float32)[..., None]
        c = jnp.asarray(np.stack(cs), jnp.float32)
    batch = dict(x=x, y=x[..., 0], c=c,
                 input_lengths=jnp.full((B,), T, jnp.int32))

    trainer = WaveNetTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_fn = jax.jit(trainer.train_step)
    key = jax.random.PRNGKey(1)

    os.makedirs(args.out, exist_ok=True)
    curve = open(os.path.join(args.out, "wavenet_curve.jsonl"), "w")
    t0 = time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, batch, k)
        if (i + 1) % args.eval_every == 0 or i == 0:
            rec = dict(step=i + 1, loss=round(float(metrics["loss"]), 4),
                       elapsed_s=round(time.time() - t0, 1))
            curve.write(json.dumps(rec) + "\n")
            curve.flush()
            print(rec, flush=True)
    final_loss = float(metrics["loss"])

    # ---- the reference's convergence check: generate with the fused
    # sampler and re-extract the mel from the audio. NOTE: the reference
    # synthesizes from EMA weights, but at overfit step counts the
    # 0.9999-decay EMA is still ~86% the random init — use the live params
    # for this short-run check (EMA restore itself is covered by
    # tests/test_wavenet_train.py)
    model = WaveNet(config=cfg)
    T_gen = (int(args.gen_seconds * cfg.audio.sample_rate) // hop) * hop
    n_eval = min(args.n_eval, B)
    c_gen = batch["c"][:n_eval, : T_gen // hop]
    c_up = model.apply({"params": state.params}, c_gen,
                       method=WaveNet.upsample)
    wavs = np.asarray(fused_incremental_sample(
        state.params, cfg, c_up, seed=9, chunk=500,
        cache_dtype=jnp.bfloat16, weight_dtype=jnp.bfloat16))
    maes, corrs = [], []
    for b in range(wavs.shape[0]):
        # the conditioning mels were computed from the PREEMPHASIZED signal,
        # rescaled by its own peak (preprocess.py:74-95), while the model
        # generates the raw-audio target — so re-extraction must invert that
        # chain: preemphasize, renormalize to rescaling_max, then mel.
        # Omitting the preemphasis capped regen-mel corr at ~0.67 (r3/r4);
        # omitting the rescale leaves a constant dB offset (MAE ~1.5 at
        # corr 0.97). The reference's eval handles the gain by min/max
        # interp-ing the generated mel into the target range
        # (wavenet_vocoder/train.py:111-118 _interp); renormalizing the
        # signal is the gain-exact equivalent.
        pre = host_audio.preemphasis(
            wavs[b].astype(np.float32), cfg.audio.preemphasis,
            cfg.audio.preemphasize)
        if cfg.audio.rescale:
            pre = pre / max(np.abs(pre).max(), 1e-9) * cfg.audio.rescaling_max
        mel_re = np.asarray(host_audio.mel_spectrogram(pre, cfg.audio))
        mel_ref = np.asarray(c_gen[b])[: mel_re.shape[0]]
        mel_re = mel_re[: mel_ref.shape[0]]
        maes.append(float(np.abs(mel_re - mel_ref).mean()))
        corrs.append(float(np.corrcoef(mel_re.ravel(), mel_ref.ravel())[0, 1]))
        plot_spectrogram(
            mel_re, os.path.join(args.out, f"wavenet_mel_compare_{b}.png"),
            title=f"re-extracted mel (MAE {maes[-1]:.2f}, corr {corrs[-1]:.2f})",
            target_spectrogram=mel_ref)
    report = dict(steps=args.steps, batch=B, crop=T,
                  final_loss=round(final_loss, 4),
                  gen_seconds=args.gen_seconds,
                  regen_mel_mae=[round(m, 3) for m in maes],
                  regen_mel_corr=[round(c_, 3) for c_ in corrs],
                  wall_s=round(time.time() - t0, 1),
                  device=str(jax.devices()[0]))
    with open(os.path.join(args.out, "wavenet_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    curve.close()
    print("REPORT", json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
