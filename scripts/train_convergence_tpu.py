"""Real-chip convergence run: train the FULL-SIZE Tacotron on an alignable
synthetic corpus (text renders the audio, scripts/make_tiny_dataset.py) and
commit the evidence — loss curve, teacher-forced mel MAE, alignment
diagonality, and the alignment plot itself (the reference's practical
convergence check, code/tacotron/train.py:602-706).

Writes artifacts/convergence_r3/{curve.jsonl, report.json, align_*.png}.

Usage: python scripts/train_convergence_tpu.py [--steps 2000] [--utts 32]
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
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--utts", type=int, default=32)
    p.add_argument("--chars", type=int, default=24)
    p.add_argument("--eval-every", type=int, default=250)
    p.add_argument("--out", default="artifacts/convergence_r3")
    args = p.parse_args(argv)

    _enable_compile_cache()
    import jax
    import numpy as np

    from make_tiny_dataset import make_alignable_corpus
    from tacotron2_tpu.config import Config
    from tacotron2_tpu.eval.convergence import (alignment_diagonality,
                                                batch_from_rows,
                                                masked_mel_mae)
    from tacotron2_tpu.train.tacotron_step import TacotronTrainer
    from tacotron2_tpu.utils.plot import plot_alignment

    cfg = Config()
    cfg = cfg.replace(
        tacotron=dataclasses.replace(cfg.tacotron,
                                     use_fused_train_decoder=True,
                                     compute_dtype="bfloat16"),
        train=dataclasses.replace(cfg.train, tacotron_natural_eval=False))

    with tempfile.TemporaryDirectory() as td:
        rows, _, mel_dir = make_alignable_corpus(td, n=args.utts,
                                                 chars=args.chars, seed=11)
        batch = batch_from_rows(rows, mel_dir, cfg)
    r = cfg.tacotron.outputs_per_step

    trainer = TacotronTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_fn = jax.jit(trainer.train_step)
    eval_fn = jax.jit(trainer.eval_step)
    key = jax.random.PRNGKey(1)

    os.makedirs(args.out, exist_ok=True)
    curve_path = os.path.join(args.out, "curve.jsonl")
    curve = open(curve_path, "w")
    t0 = time.time()
    last = None

    def evaluate(i):
        out, terms = eval_fn(state, batch, jax.random.PRNGKey(123))
        mae = masked_mel_mae(np.asarray(out.mel_outputs), batch)
        diag = alignment_diagonality(
            np.asarray(out.alignments), np.asarray(batch["input_lengths"]),
            np.asarray(batch["targets_lengths"]), r)
        return mae, diag, np.asarray(out.alignments)

    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, batch, k)
        if (i + 1) % args.eval_every == 0 or i == 0 or i == args.steps - 1:
            mae, diag, aligns = evaluate(i)
            rec = dict(step=i + 1, loss=round(float(metrics["loss"]), 4),
                       mel_mae=round(mae, 4),
                       mean_diagonality=round(float(np.mean(diag)), 4),
                       min_diagonality=round(float(np.min(diag)), 4),
                       elapsed_s=round(time.time() - t0, 1))
            curve.write(json.dumps(rec) + "\n")
            curve.flush()
            print(rec, flush=True)
            last = (mae, diag, aligns)

    # ---- free-running (natural) synthesis check: the reference's actual
    # convergence bar is eval SYNTHESIS forming a diagonal
    # (tacotron/train.py:602-706) — run the trained params through the
    # synthesizer (fused decode kernel) with no teacher forcing
    natural = None
    try:
        from tacotron2_tpu.eval.convergence import alignment_diagonality
        from tacotron2_tpu.synth.tacotron_synth import TacotronSynthesizer

        synth = TacotronSynthesizer(cfg, state.params, state.batch_stats,
                                    model=trainer.model)
        texts = [row[7] for row in rows[:8]]
        refs = [np.asarray(batch["ref_mel_emt"][i]) for i in range(8)]
        out = synth.synthesize(texts, refs, refs, max_steps=160)
        lens_in = np.asarray([len(t) + 1 for t in texts])
        lens_out = np.asarray([m.shape[0] for m in out["mels"]])
        diag_n = []
        for a, li, lo in zip(out["alignments"], lens_in, lens_out):
            pad = np.zeros((li, max(1, lo // r)), np.float32)
            m = a[:li, :pad.shape[1]]
            pad[:m.shape[0], :m.shape[1]] = m
            diag_n.extend(alignment_diagonality(
                pad[None], np.asarray([li]), np.asarray([lo]), r))
        natural = dict(mean_diagonality=round(float(np.mean(diag_n)), 4),
                       per_utt=[round(d, 3) for d in diag_n],
                       out_frames=[int(x) for x in lens_out])
        print("NATURAL", json.dumps(natural), flush=True)
    except Exception as e:  # pragma: no cover
        natural = dict(error=f"{type(e).__name__}: {e}"[:200])
        print("NATURAL-ERROR", natural, flush=True)

    mae, diag, aligns = last
    for b in range(min(3, aligns.shape[0])):
        L = int(batch["input_lengths"][b])
        S = int(batch["targets_lengths"][b]) // r
        plot_alignment(aligns[b, :L, :S],
                       os.path.join(args.out, f"align_{b}.png"),
                       title=f"step {args.steps} diag={diag[b]:.3f}")
    report = dict(steps=args.steps, utts=args.utts, chars=args.chars,
                  final_mel_mae=round(mae, 4),
                  mean_diagonality=round(float(np.mean(diag)), 4),
                  per_utt_diagonality=[round(d, 3) for d in diag],
                  natural_synthesis=natural,
                  wall_s=round(time.time() - t0, 1),
                  device=str(jax.devices()[0]))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    curve.close()
    print("REPORT", json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
