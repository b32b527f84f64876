"""Non-toy full-chain text→speech run on real hardware (round-5 quality gate).

Scales the round-4 demo (8 utts × 14 chars) to a real training problem:

- corpus: >=160 distinct utterances with sentence-length texts (40-80 chars,
  the reference's eval sentences are 60-120 chars, code/hparams.py:370-395),
  split into train / HELD-OUT texts never seen by either model;
- Tacotron: minibatched training over the train split with the fused train
  decoder and the reference's scheduled-sampling teacher-forcing decay
  (code/tacotron/models/helpers.py:140-179) so free-running decode is a
  trained mode, not an extrapolation;
- GTA: teacher-forced mels for the vocoder, the sequencer's middle stage
  (code/synthesize.py:33-45);
- WaveNet: trained on (GT audio, conditioning) crops where the conditioning
  is a MIXTURE of clean GTA mels, noise/blur-augmented GTA mels, and the
  Tacotron's own free-run mels (time-resampled onto the GT frame grid) — the
  robustness-to-predicted-mels that the reference's GTA stage targets;
- eval: free-run text→mel→wav on the HELD-OUT texts only; reports
  vocoder_fidelity_corr (wav-mel vs its actual conditioning) and
  text_to_wav_mel_corr (wav-mel vs ground-truth mel of the same text).

Writes artifacts/e2e_demo_r5/{report.json, curve jsonls, demo wavs/plots}.

Usage: python scripts/train_e2e_demo_r5_tpu.py [--taco-steps N] [--wn-steps N]
       [--smoke]  (tiny everything, plumbing check)
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _enable_compile_cache  # noqa: E402


def time_resample(mel, n_out):
    """Linearly resample a [T, M] mel onto n_out frames (pace-normalizing a
    free-run mel onto the ground-truth frame grid)."""
    import numpy as np
    n_in = len(mel)
    pos = np.linspace(0.0, n_in - 1.0, n_out)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w = (pos - i0)[:, None].astype(np.float32)
    return (1.0 - w) * mel[i0] + w * mel[i1]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--taco-steps", type=int, default=12000)
    p.add_argument("--wn-steps", type=int, default=50000)
    p.add_argument("--n-train", type=int, default=128)
    p.add_argument("--n-heldout", type=int, default=32)
    p.add_argument("--chars-lo", type=int, default=40)
    p.add_argument("--chars-hi", type=int, default=80)
    p.add_argument("--char-dur", type=float, default=0.06)
    p.add_argument("--taco-batch", type=int, default=16)
    p.add_argument("--wn-batch", type=int, default=16)
    p.add_argument("--wn-noise-max", type=float, default=0.25,
                   help="conditioning-augmentation noise std ceiling")
    p.add_argument("--wn-fid-every", type=int, default=25000,
                   help="mid-training held-out GT-mel regen fidelity eval "
                        "interval (0 = off)")
    p.add_argument("--crop", type=int, default=8000)
    p.add_argument("--eval-every", type=int, default=1000)
    p.add_argument("--synth-batch", type=int, default=32)
    p.add_argument("--wn-synth-batch", type=int, default=8,
                   help="vocoder sampling batch: the all-VMEM sampler's "
                        "output/delay buffers scale with B x T; at 400-frame "
                        "utterances B=32 exceeds the 100MB VMEM scope")
    p.add_argument("--out", default="artifacts/e2e_demo_r5")
    p.add_argument("--taco-ckpt", default=None,
                   help="reuse a trained tacotron checkpoint (msgpack)")
    p.add_argument("--wn-ckpt", default=None)
    p.add_argument("--wn-ckpt-every", type=int, default=5000,
                   help="rolling full-train-state checkpoint interval (the "
                        "tunnel can stall mid-run; the rolling checkpoint "
                        "makes the long vocoder stage resumable)")
    p.add_argument("--wn-resume", default=None,
                   help="resume wavenet training from a rolling checkpoint "
                        "(wn_train_ckpt.msgpack)")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args(argv)
    if args.smoke:
        args.taco_steps, args.wn_steps = 30, 30
        args.n_train, args.n_heldout = 8, 4
        args.eval_every = 10
        args.out = args.out + "_smoke"

    _enable_compile_cache()
    import flax.serialization as fser
    import jax
    import jax.numpy as jnp
    import numpy as np

    from make_tiny_dataset import make_alignable_corpus
    from tacotron2_tpu.config import Config
    from tacotron2_tpu.data import audio as host_audio
    from tacotron2_tpu.data.wavenet_feeder import interp_to_unit
    from tacotron2_tpu.eval.convergence import (alignment_diagonality,
                                                batch_from_rows,
                                                masked_mel_mae)
    from tacotron2_tpu.synth.tacotron_synth import TacotronSynthesizer
    from tacotron2_tpu.synth.wavenet_synth import WaveNetSynthesizer
    from tacotron2_tpu.train.tacotron_step import TacotronTrainer
    from tacotron2_tpu.train.wavenet_step import WaveNetTrainer
    from tacotron2_tpu.utils.plot import plot_alignment, plot_spectrogram

    t_start = time.time()
    os.makedirs(args.out, exist_ok=True)

    cfg = Config()
    cfg = cfg.replace(
        tacotron=dataclasses.replace(
            cfg.tacotron, compute_dtype="bfloat16",
            use_fused_train_decoder=True),
        wavenet=dataclasses.replace(
            cfg.wavenet, compute_dtype="bfloat16",
            use_fused_train_stack=True,
            sampler_hbm_delay_threshold=0),
        train=dataclasses.replace(
            cfg.train,
            # scheduled sampling: hold TF=1.0 for the first third, then decay
            # toward free-running (ratio ~0.2 by the end of the run)
            tacotron_teacher_forcing_mode="scheduled",
            tacotron_teacher_forcing_init_ratio=1.0,
            tacotron_teacher_forcing_start_decay=max(args.taco_steps // 3, 1),
            tacotron_teacher_forcing_decay_steps=max(args.taco_steps, 2),
            wavenet_decay_steps=max(args.wn_steps // 3, 1)))

    # ---- stage 0: corpus --------------------------------------------------
    n_total = args.n_train + args.n_heldout
    corpus_dir = os.path.join(args.out, "corpus")
    rows, acfg, mel_dir = make_alignable_corpus(
        corpus_dir, n=n_total, chars=(args.chars_lo, args.chars_hi),
        char_dur=args.char_dur, write_audio=True)
    cfg = cfg.replace(audio=acfg)
    aud_dir = os.path.join(corpus_dir, "audio")
    hop = cfg.audio.effective_hop
    r = cfg.tacotron.outputs_per_step

    train_rows, held_rows = rows[:args.n_train], rows[args.n_train:]
    train_texts = [row[7] for row in train_rows]
    held_texts = [row[7] for row in held_rows]
    assert not set(train_texts) & set(held_texts), "held-out texts leak"
    tr_mels = [np.load(os.path.join(mel_dir, row[2])) for row in train_rows]
    tr_audio = [np.load(os.path.join(aud_dir, row[1])) for row in train_rows]
    hd_mels = [np.load(os.path.join(mel_dir, row[2])) for row in held_rows]
    print(f"[corpus] {args.n_train} train / {args.n_heldout} held-out utts, "
          f"text {min(map(len, train_texts))}-{max(map(len, train_texts))} "
          f"chars, mel {min(map(len, tr_mels))}-{max(map(len, tr_mels))} "
          f"frames", flush=True)

    # one padded shape for every minibatch -> single compile
    pad_text = max(len(t) for t in train_texts + held_texts)
    pad_mel = max(len(m) for m in tr_mels + hd_mels)
    pad_mel = ((pad_mel + r - 1) // r) * r

    def make_batch(rows_subset):
        return batch_from_rows(rows_subset, mel_dir, cfg,
                               pad_text_to=pad_text, pad_mel_to=pad_mel)

    held_batch = make_batch(held_rows)

    # ---- stage 1: Tacotron minibatch training -----------------------------
    trainer = TacotronTrainer(cfg)
    B = min(args.taco_batch, args.n_train)
    first = make_batch(train_rows[:B])
    state = trainer.init_state(jax.random.PRNGKey(0), first)
    if args.taco_ckpt:
        with open(args.taco_ckpt, "rb") as f:
            blob = fser.from_bytes(
                dict(params=jax.device_get(state.params),
                     batch_stats=jax.device_get(state.batch_stats)),
                f.read())
        state = state._replace(params=blob["params"],
                               batch_stats=blob["batch_stats"],
                               step=jnp.asarray(args.taco_steps, jnp.int32))
        print("[taco] restored checkpoint, skipping training", flush=True)
    step_fn = jax.jit(trainer.train_step)
    eval_fn = jax.jit(trainer.eval_step)

    # pre-build all per-epoch batches once (host mem is cheap; shapes fixed)
    n_batches = args.n_train // B
    batches = [make_batch(train_rows[i * B:(i + 1) * B])
               for i in range(n_batches)]

    curve = open(os.path.join(args.out, "taco_curve.jsonl"), "w")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    taco_report = dict(steps=0)
    if not args.taco_ckpt:
        order = []
        metrics = None
        for i in range(args.taco_steps):
            if not order:
                order = list(rng.permutation(n_batches))
            b = batches[order.pop()]
            key, k = jax.random.split(key)
            state, metrics = step_fn(state, b, k)
            if (i + 1) % args.eval_every == 0 or i == 0 \
                    or i == args.taco_steps - 1:
                out, _ = eval_fn(state, held_batch, jax.random.PRNGKey(123))
                mae = masked_mel_mae(np.asarray(out.mel_outputs), held_batch)
                diag = alignment_diagonality(
                    np.asarray(out.alignments),
                    np.asarray(held_batch["input_lengths"]),
                    np.asarray(held_batch["targets_lengths"]), r)
                rec = dict(step=i + 1, loss=round(float(metrics["loss"]), 4),
                           tfr=round(float(metrics["teacher_forcing_ratio"]),
                                     3),
                           held_mel_mae=round(mae, 4),
                           held_tf_diag=round(float(np.mean(diag)), 3),
                           elapsed_s=round(time.time() - t0, 1))
                curve.write(json.dumps(rec) + "\n")
                curve.flush()
                print("[taco]", rec, flush=True)
                taco_report = dict(steps=i + 1, held_mel_mae=mae,
                                   held_tf_diag=float(np.mean(diag)),
                                   loss=float(metrics["loss"]))
        with open(os.path.join(args.out, "taco_ckpt.msgpack"), "wb") as f:
            f.write(fser.to_bytes(dict(
                params=jax.device_get(state.params),
                batch_stats=jax.device_get(state.batch_stats))))
    curve.close()

    taco_params = jax.device_get(state.params)
    synth = TacotronSynthesizer(cfg, taco_params, state.batch_stats)
    frames_per_char = args.char_dur * cfg.audio.sample_rate / hop
    max_steps = int(1.25 * args.chars_hi * frames_per_char / r)

    def run_batched(texts, mels_for_ref, fn):
        outs = []
        Bs = args.synth_batch
        for i in range(0, len(texts), Bs):
            outs.append(fn(texts[i:i + Bs], mels_for_ref[i:i + Bs]))
        return outs

    refs_tr = [m[:64] for m in tr_mels]
    refs_hd = [m[:64] for m in hd_mels]

    # ---- stage 2: GTA + free-run mels on the TRAIN split ------------------
    gta_mels, free_tr_mels = [], []
    for i in range(0, args.n_train, args.synth_batch):
        sl = slice(i, i + args.synth_batch)
        g = synth.synthesize(train_texts[sl], refs_tr[sl], refs_tr[sl],
                             mel_targets=tr_mels[sl], gta=True)
        gta_mels.extend(g["mels"])
        fr = synth.synthesize(train_texts[sl], refs_tr[sl], refs_tr[sl],
                              max_steps=max_steps)
        free_tr_mels.extend(fr["mels"])
    gta_mae = float(np.mean([np.abs(g[:len(t)] - t[:len(g)]).mean()
                             for g, t in zip(gta_mels, tr_mels)]))
    print(f"[gta] {len(gta_mels)} GTA mels, MAE vs GT {gta_mae:.4f}; "
          f"free-run train mels {len(free_tr_mels)}", flush=True)

    # ---- stage 3: WaveNet with conditioning-mixture crops -----------------
    T = (args.crop // hop) * hop
    Fc = T // hop
    Bw = args.wn_batch
    # per-utterance aligned tensors: GT audio, GTA mel, free-run mel
    # resampled onto the GT frame grid (pace-normalized)
    utt = []
    for a, g, fr_m, gt_m in zip(tr_audio, gta_mels, free_tr_mels, tr_mels):
        n_f = min(len(g), len(gt_m), len(a) // hop)
        if n_f < Fc:
            continue
        utt.append(dict(audio=a[:n_f * hop].astype(np.float32),
                        gta=np.asarray(g[:n_f], np.float32),
                        free=time_resample(np.asarray(fr_m, np.float32),
                                           n_f)))
    print(f"[wavenet] {len(utt)} crop-eligible utts, crop {T} samples "
          f"({Fc} frames)", flush=True)

    max_abs = cfg.audio.max_abs_value

    def sample_crop_batch(rng):
        xs = np.empty((Bw, T, 1), np.float32)
        cs = np.empty((Bw, Fc, cfg.audio.num_mels), np.float32)
        for j in range(Bw):
            u = utt[int(rng.integers(len(utt)))]
            off = int(rng.integers(len(u["gta"]) - Fc + 1))
            xs[j, :, 0] = u["audio"][off * hop:(off + Fc) * hop]
            mode = rng.random()
            if mode < 0.5:                       # clean GTA
                m = u["gta"][off:off + Fc]
            elif mode < 0.75:                    # noised/blurred GTA
                m = u["gta"][off:off + Fc].copy()
                m += rng.normal(0.0,
                                float(rng.uniform(0.05, args.wn_noise_max)),
                                m.shape).astype(np.float32)
                if rng.random() < 0.5:           # mild time blur
                    m = (np.roll(m, 1, 0) + m + np.roll(m, -1, 0)) / 3.0
            else:                                # the model's own free-run
                m = u["free"][off:off + Fc]
            m = np.clip(m, -max_abs, max_abs)
            cs[j] = interp_to_unit(m, cfg)
        return dict(x=jnp.asarray(xs), y=jnp.asarray(xs[..., 0]),
                    c=jnp.asarray(cs),
                    input_lengths=jnp.full((Bw,), T, jnp.int32))

    def regen_fidelity(params, mels, n_frames=160):
        """Held-out GT-mel vocode + re-extract corr — the metric the run is
        graded on, tracked mid-training."""
        ws = WaveNetSynthesizer(cfg, params)
        crops = [np.asarray(m[:n_frames], np.float32) for m in mels]
        out_w = ws.synthesize(crops)
        cs = []
        for wav, m in zip(out_w, crops):
            pre = host_audio.preemphasis(wav.astype(np.float32),
                                         cfg.audio.preemphasis,
                                         cfg.audio.preemphasize)
            if cfg.audio.rescale:
                pre = pre / max(np.abs(pre).max(), 1e-9) \
                    * cfg.audio.rescaling_max
            mel_re = np.asarray(host_audio.mel_spectrogram(pre, cfg.audio))
            L = min(len(mel_re), len(m))
            cs.append(round(float(np.corrcoef(mel_re[:L].ravel(),
                                              m[:L].ravel())[0, 1]), 3))
        return cs

    wn_trainer = WaveNetTrainer(cfg)
    wn_state = wn_trainer.init_state(jax.random.PRNGKey(0),
                                     sample_crop_batch(rng))
    wn_step = jax.jit(wn_trainer.train_step)
    roll_path = os.path.join(args.out, "wn_train_ckpt.msgpack")
    start = 0
    if args.wn_resume and os.path.exists(args.wn_resume):
        with open(args.wn_resume, "rb") as f:
            wn_state = fser.from_bytes(jax.device_get(wn_state), f.read())
        wn_state = jax.device_put(wn_state)
        start = int(wn_state.step)
        print(f"[wavenet] resumed rolling checkpoint at step {start}",
              flush=True)
    wn_curve = open(os.path.join(args.out, "wavenet_curve.jsonl"),
                    "a" if start else "w")
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    wn_loss = None
    if args.wn_ckpt:
        with open(args.wn_ckpt, "rb") as f:
            ema = fser.from_bytes(jax.device_get(wn_state.ema_params),
                                  f.read())
        wn_state = wn_state._replace(ema_params=ema)
        print("[wavenet] restored EMA checkpoint, skipping training",
              flush=True)
    else:
        metrics = None
        for i in range(start, args.wn_steps):
            b = sample_crop_batch(rng)
            key, k = jax.random.split(key)
            wn_state, metrics = wn_step(wn_state, b, k)
            # fidelity eval interval is independent of the log interval (a
            # nested check would silently never fire when wn_fid_every is
            # not a multiple of 2000)
            fid_due = args.wn_fid_every and (i + 1) % args.wn_fid_every == 0
            if (i + 1) % 2000 == 0 or i == start or fid_due:
                rec = dict(step=i + 1,
                           loss=round(float(metrics["loss"]), 4),
                           elapsed_s=round(time.time() - t0, 1))
                if fid_due:
                    rec["heldout_gt_fidelity"] = regen_fidelity(
                        jax.device_get(wn_state.ema_params), hd_mels[:4])
                wn_curve.write(json.dumps(rec) + "\n")
                wn_curve.flush()
                print("[wavenet]", rec, flush=True)
            if args.wn_ckpt_every and (i + 1) % args.wn_ckpt_every == 0:
                blob = fser.to_bytes(jax.device_get(wn_state))
                with open(roll_path + ".tmp", "wb") as f:
                    f.write(blob)
                os.replace(roll_path + ".tmp", roll_path)
        wn_loss = float(metrics["loss"]) if metrics is not None else None
        with open(os.path.join(args.out, "wn_ckpt.msgpack"), "wb") as f:
            f.write(fser.to_bytes(jax.device_get(wn_state.ema_params)))
    wn_curve.close()

    # ---- stage 4: HELD-OUT free-run text -> wav ---------------------------
    # the reference synthesizes from EMA weights (wavenet_vocoder/
    # synthesizer.py:14-60); at 50k steps the EMA shadow is fully formed
    wn_params = jax.device_get(wn_state.ema_params)
    wn_synth = WaveNetSynthesizer(cfg, wn_params)

    free_mels, aligns, lengths = [], [], []
    for i in range(0, args.n_heldout, args.synth_batch):
        sl = slice(i, i + args.synth_batch)
        out = synth.synthesize(held_texts[sl], refs_hd[sl], refs_hd[sl],
                               max_steps=max_steps)
        free_mels.extend(out["mels"])
        aligns.extend(out["alignments"])
        lengths.extend(out["lengths"])
    diag = []
    for a in aligns:
        a = np.asarray(a, np.float64)
        a = a / np.maximum(a.sum(axis=0, keepdims=True), 1e-8)
        pos = (np.arange(a.shape[0])[:, None] * a).sum(axis=0)
        ideal = np.linspace(0, a.shape[0] - 1, a.shape[1])
        c_ = np.corrcoef(pos, ideal)[0, 1]
        diag.append(float(0.0 if np.isnan(c_) else c_))

    wavs = []
    for i in range(0, len(free_mels), args.wn_synth_batch):
        wavs.extend(wn_synth.synthesize(free_mels[i:i + args.wn_synth_batch]))

    maes, corrs, voc_corrs, taco_corrs = [], [], [], []
    for i, wav in enumerate(wavs):
        pre = host_audio.preemphasis(
            wav.astype(np.float32), cfg.audio.preemphasis,
            cfg.audio.preemphasize)
        if cfg.audio.rescale:
            pre = pre / max(np.abs(pre).max(), 1e-9) * cfg.audio.rescaling_max
        mel_re = np.asarray(host_audio.mel_spectrogram(pre, cfg.audio))
        gt = np.asarray(hd_mels[i])
        # pace-normalize for the vs-GT comparison (free-run length differs
        # slightly from GT; compare content, not pace)
        mel_re_gt = time_resample(mel_re, len(gt))
        maes.append(float(np.abs(mel_re_gt - gt).mean()))
        corrs.append(float(np.corrcoef(mel_re_gt.ravel(), gt.ravel())[0, 1]))
        Lv = min(len(mel_re), len(free_mels[i]))
        voc_corrs.append(float(np.corrcoef(
            mel_re[:Lv].ravel(),
            np.asarray(free_mels[i])[:Lv].ravel())[0, 1]))
        fm_gt = time_resample(np.asarray(free_mels[i], np.float32), len(gt))
        taco_corrs.append(float(np.corrcoef(fm_gt.ravel(),
                                            gt.ravel())[0, 1]))
        if i < 4:
            host_audio.save_wav(wav, os.path.join(args.out, f"demo_{i}.wav"),
                                cfg.audio.sample_rate)
            plot_spectrogram(
                mel_re, os.path.join(args.out, f"demo_mel_{i}.png"),
                title=f"held-out free-run wav mel (corr {corrs[-1]:.2f} "
                      f"vs GT)",
                target_spectrogram=gt[:len(mel_re)])
            plot_alignment(np.asarray(aligns[i]),
                           os.path.join(args.out, f"align_{i}.png"),
                           title=f"held-out alignment (diag {diag[i]:.2f})")

    report = dict(
        n_train=args.n_train, n_heldout=args.n_heldout,
        chars=[args.chars_lo, args.chars_hi],
        held_text_chars=[len(t) for t in held_texts],
        taco_steps=args.taco_steps, **{f"taco_{k}": v
                                       for k, v in taco_report.items()
                                       if k != "steps"},
        gta_mae_vs_gt=round(gta_mae, 4),
        wn_steps=args.wn_steps,
        wn_final_loss=round(wn_loss, 4) if wn_loss is not None else None,
        heldout_free_run_diagonality=[round(d, 3) for d in diag],
        heldout_free_run_lengths=[int(x) for x in lengths],
        text_to_wav_mel_mae=[round(m, 3) for m in maes],
        text_to_wav_mel_corr=[round(c_, 3) for c_ in corrs],
        vocoder_fidelity_corr=[round(c_, 3) for c_ in voc_corrs],
        taco_freerun_corr=[round(c_, 3) for c_ in taco_corrs],
        min_text_to_wav_corr=round(min(corrs), 3),
        min_vocoder_fidelity_corr=round(min(voc_corrs), 3),
        wall_s=round(time.time() - t_start, 1),
        device=str(jax.devices()[0]))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("REPORT", json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
