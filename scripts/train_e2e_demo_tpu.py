"""Full-chain text→speech demo on real hardware: the reference's 3-stage
`train --model Tacotron-2` sequencer (tacotron → GTA → wavenet,
code/train.py:57-117 / synthesize.py:33-45) executed end to end with
convergence, then free-running synthesis from TEXT to a committed WAV.

1. train the FULL-SIZE Tacotron on the alignable corpus (text renders the
   audio) until free-running alignment forms;
2. GTA-synthesize mels with the trained model (teacher-forced decode — the
   vocoder's prescribed conditioning, hparams.py GTA notes);
3. train the FULL-SIZE WaveNet on (waveform, GTA-mel) pairs with the fused
   train-stack kernels;
4. free-run: text → fused decode kernel → mel → fused sampler → wav, with
   no ground truth in the loop, and score the generated audio's
   re-extracted mel against the ground-truth mel of the same text.

Writes artifacts/e2e_demo_r4/{report.json, demo_*.wav, demo_mel_*.png,
align_*.png}.

Usage: python scripts/train_e2e_demo_tpu.py [--taco-steps 3000]
       [--wn-steps 20000]
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

from bench import _enable_compile_cache  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--taco-steps", type=int, default=3000)
    p.add_argument("--wn-steps", type=int, default=20000)
    p.add_argument("--utts", type=int, default=8)
    p.add_argument("--chars", type=int, default=14)
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--out", default="artifacts/e2e_demo_r4")
    args = p.parse_args(argv)

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from make_tiny_dataset import make_alignable_corpus
    from tacotron2_tpu.config import Config
    from tacotron2_tpu.data import audio as host_audio
    from tacotron2_tpu.eval.convergence import batch_from_rows, overfit
    from tacotron2_tpu.synth.tacotron_synth import TacotronSynthesizer
    from tacotron2_tpu.synth.wavenet_synth import WaveNetSynthesizer
    from tacotron2_tpu.train.wavenet_step import WaveNetTrainer
    from tacotron2_tpu.utils.plot import plot_alignment, plot_spectrogram

    cfg = Config()
    cfg = cfg.replace(
        tacotron=dataclasses.replace(
            cfg.tacotron, compute_dtype="bfloat16",
            use_fused_train_decoder=True),
        wavenet=dataclasses.replace(
            cfg.wavenet, compute_dtype="bfloat16",
            use_fused_train_stack=True,
            # small-batch synthesis: all-VMEM delay lines (the HBM-delay
            # DMA layout wants the batch lane-aligned to 128)
            sampler_hbm_delay_threshold=0),
        train=dataclasses.replace(cfg.train, wavenet_decay_steps=8000))

    os.makedirs(args.out, exist_ok=True)
    t_start = time.time()
    tmp = tempfile.mkdtemp(prefix="e2e_demo_")
    rows, acfg, mel_dir = make_alignable_corpus(
        tmp, n=args.utts, chars=args.chars, write_audio=True)
    cfg = cfg.replace(audio=acfg)
    aud_dir = os.path.join(tmp, "audio")
    texts = [row[7] for row in rows]
    gt_mels = [np.load(os.path.join(mel_dir, row[2])) for row in rows]
    gt_audio = [np.load(os.path.join(aud_dir, row[1])) for row in rows]

    # ---- stage 1: Tacotron ------------------------------------------------
    batch = batch_from_rows(rows, mel_dir, cfg)
    print(f"[taco] training {args.taco_steps} steps on {args.utts} utts",
          flush=True)
    report, history, state = overfit(
        cfg, batch, args.taco_steps, eval_every=args.eval_every,
        return_state=True)
    print(f"[taco] mel MAE {report['initial_mel_mae']:.3f} -> "
          f"{report['final_mel_mae']:.4f}, TF diagonality "
          f"{report['mean_diagonality']:.3f}", flush=True)

    taco_params = jax.device_get(state.params)
    synth = TacotronSynthesizer(cfg, taco_params, state.batch_stats)

    # ---- stage 2: GTA mels (the sequencer's middle stage) -----------------
    refs = [m[:64] for m in gt_mels]
    gta = synth.synthesize(texts, refs, refs,
                           mel_targets=gt_mels, gta=True)
    gta_mels = gta["mels"]
    gta_mae = float(np.mean([np.abs(g[:len(t)] - t[:len(g)]).mean()
                             for g, t in zip(gta_mels, gt_mels)]))
    print(f"[gta] synthesized {len(gta_mels)} GTA mels, "
          f"MAE vs GT {gta_mae:.4f}", flush=True)

    # ---- stage 3: WaveNet on (audio, GTA mel) -----------------------------
    # conditioning goes through the feeder's clip + [0,1] interp so training
    # matches what WaveNetSynthesizer feeds at synthesis time
    from tacotron2_tpu.data.wavenet_feeder import interp_to_unit
    hop = cfg.audio.effective_hop
    n_frames = min(len(m) for m in gta_mels)
    T = n_frames * hop
    x = jnp.asarray(np.stack([a[:T] for a in gt_audio]),
                    jnp.float32)[..., None]
    c_raw = np.stack([np.asarray(m[:n_frames]) for m in gta_mels])
    c = jnp.asarray(interp_to_unit(c_raw, cfg), jnp.float32)
    wn_batch = dict(x=x, y=x[..., 0], c=c,
                    input_lengths=jnp.full((args.utts,), T, jnp.int32))
    wn_trainer = WaveNetTrainer(cfg)
    wn_state = wn_trainer.init_state(jax.random.PRNGKey(0), wn_batch)
    wn_step = jax.jit(wn_trainer.train_step)
    key = jax.random.PRNGKey(1)
    print(f"[wavenet] training {args.wn_steps} steps on GTA mels "
          f"(B={args.utts}, T={T})", flush=True)
    t0 = time.time()
    metrics = None
    for i in range(args.wn_steps):
        key, k = jax.random.split(key)
        wn_state, metrics = wn_step(wn_state, wn_batch, k)
        if (i + 1) % 2000 == 0 or i == 0:
            print(dict(step=i + 1, loss=round(float(metrics["loss"]), 4),
                       elapsed_s=round(time.time() - t0, 1)), flush=True)
    wn_loss = float(metrics["loss"])

    # ---- stage 4: free-running text -> wav --------------------------------
    # cap decode length a bit above the known utterance length: bounds the
    # sampler's T even if the stop token is undertrained (a full max_iters
    # mel at B=8 lane-pads the sampler's [T, B] VMEM output 16x)
    max_steps = int(1.3 * n_frames / cfg.tacotron.outputs_per_step)
    out = synth.synthesize(texts, refs, refs, max_steps=max_steps)
    free_mels, lengths = out["mels"], out["lengths"]
    diag = []
    for a in out["alignments"]:        # [L_text, S] per utterance, trimmed
        a = np.asarray(a, np.float64)
        a = a / np.maximum(a.sum(axis=0, keepdims=True), 1e-8)
        pos = (np.arange(a.shape[0])[:, None] * a).sum(axis=0)
        ideal = np.linspace(0, a.shape[0] - 1, a.shape[1])
        c_ = np.corrcoef(pos, ideal)[0, 1]
        diag.append(float(0.0 if np.isnan(c_) else c_))

    wn_synth = WaveNetSynthesizer(cfg, jax.device_get(wn_state.params))
    wavs = wn_synth.synthesize(free_mels)

    maes, corrs, voc_corrs, taco_corrs = [], [], [], []
    for i, wav in enumerate(wavs):
        pre = host_audio.preemphasis(
            wav.astype(np.float32), cfg.audio.preemphasis,
            cfg.audio.preemphasize)
        if cfg.audio.rescale:
            pre = pre / max(np.abs(pre).max(), 1e-9) * cfg.audio.rescaling_max
        mel_re = np.asarray(host_audio.mel_spectrogram(pre, cfg.audio))
        L = min(len(mel_re), len(gt_mels[i]))
        mel_re, mel_gt = mel_re[:L], np.asarray(gt_mels[i])[:L]
        maes.append(float(np.abs(mel_re - mel_gt).mean()))
        corrs.append(float(np.corrcoef(mel_re.ravel(),
                                       mel_gt.ravel())[0, 1]))
        # error decomposition: vocoder fidelity (wav mel vs its ACTUAL
        # conditioning, the free-run taco mel) and taco fidelity (free-run
        # mel vs ground truth) — separates which stage loses quality
        Lv = min(len(mel_re), len(free_mels[i]))
        voc_corrs.append(float(np.corrcoef(
            mel_re[:Lv].ravel(),
            np.asarray(free_mels[i])[:Lv].ravel())[0, 1]))
        Lt = min(len(free_mels[i]), len(gt_mels[i]))
        taco_corrs.append(float(np.corrcoef(
            np.asarray(free_mels[i])[:Lt].ravel(),
            np.asarray(gt_mels[i])[:Lt].ravel())[0, 1]))
        if i < 3:
            host_audio.save_wav(wav, os.path.join(args.out,
                                                  f"demo_{i}.wav"),
                                cfg.audio.sample_rate)
            plot_spectrogram(
                mel_re, os.path.join(args.out, f"demo_mel_{i}.png"),
                title=f"'{texts[i]}' free-run wav mel "
                      f"(corr {corrs[-1]:.2f} vs GT)",
                target_spectrogram=mel_gt)
            plot_alignment(np.asarray(out["alignments"][i]),
                           os.path.join(args.out, f"align_{i}.png"),
                           title=f"free-run alignment (diag {diag[i]:.2f})")

    report = dict(
        utts=args.utts, chars=args.chars,
        taco_steps=report["steps"], taco_mel_mae=report["final_mel_mae"],
        taco_tf_diagonality=round(report["mean_diagonality"], 3),
        gta_mae_vs_gt=round(gta_mae, 4),
        wn_steps=args.wn_steps, wn_final_loss=round(wn_loss, 4),
        free_run_diagonality=[round(d, 3) for d in diag],
        free_run_lengths=lengths,
        text_to_wav_mel_mae=[round(m, 3) for m in maes],
        text_to_wav_mel_corr=[round(c_, 3) for c_ in corrs],
        vocoder_fidelity_corr=[round(c_, 3) for c_ in voc_corrs],
        taco_freerun_corr=[round(c_, 3) for c_ in taco_corrs],
        wall_s=round(time.time() - t_start, 1),
        device=str(jax.devices()[0]))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("REPORT", json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
