"""Real-chip disentanglement convergence: intercross + style_emb_disc.

VERDICT r3 item 6 — show one of the fork's style features *converging*, not
just stepping: train the full-size Tacotron with GST + the style-embedding
discriminator heads on an intercross feeder (reference tacotron.py:808-897 —
references come from a DIFFERENT utterance of the same emotion/speaker, so
the reference encoder must extract style, not utterance identity), then:

  - losses (total + style CE heads) decreasing over the run;
  - style-classifier accuracy on HELD-OUT references above chance;
  - reference-encoder embeddings clustering by emotion
    (eval/analyze.py:plot_embedding_clusters).

Writes artifacts/convergence_r4/style_{curve.jsonl,report.json,clusters*.png}.

Usage: python scripts/train_style_convergence_tpu.py [--steps 2000]
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
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n-utts", type=int, default=48)
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--out", default="artifacts/convergence_r4")
    args = p.parse_args(argv)

    _enable_compile_cache()
    import jax
    import numpy as np

    from make_tiny_dataset import main as make_corpus
    from tacotron2_tpu.config import Config
    from tacotron2_tpu.data.feeder import TacotronFeeder
    from tacotron2_tpu.eval.analyze import plot_embedding_clusters
    from tacotron2_tpu.train.tacotron_step import TacotronTrainer

    cfg = Config()
    cfg = cfg.replace(
        tacotron=dataclasses.replace(
            cfg.tacotron, use_fused_train_decoder=True,
            compute_dtype="bfloat16"),
        train=dataclasses.replace(
            # the feeder rounds the held-out split DOWN to a multiple of the
            # train batch size (feeder.py:52), so hold out one full batch
            cfg.train, tacotron_batch_size=args.batch,
            tacotron_test_size=args.batch))
    assert cfg.gst.use_gst and cfg.gst.use_style_emb_disc

    tmp = tempfile.mkdtemp(prefix="style_conv_")
    corpus = make_corpus(os.path.join(tmp, "tiny"), n=args.n_utts)
    meta = os.path.join(corpus, "train.txt")
    # fixed shape buckets: one compiled program for every group (the tiny
    # corpus utterances are 0.8-1.6 s -> <=138 mel frames, texts <128 chars)
    feeder = TacotronFeeder(cfg, meta, intercross_both=True,
                            shard_by_host=False,
                            pad_text_multiple=128, pad_mel_multiple=192)

    # fixed rotation of train groups (overfit corpus; intercross resampling
    # still varies the refs within each epoch's groups)
    it = feeder.train_batches(args.batch)
    first = next(it)

    trainer = TacotronTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), first)
    step_fn = jax.jit(trainer.train_step)
    eval_fn = jax.jit(trainer.eval_step)
    key = jax.random.PRNGKey(1)

    test_batches = feeder.test_batches(args.batch)
    assert test_batches, "need a held-out split for the accuracy check"

    def style_accuracy(st):
        """argmax(style_emb_disc logits) vs labels on the held-out refs."""
        hits_e = hits_s = n = 0
        for b in test_batches:
            out, _ = eval_fn(st, b, jax.random.PRNGKey(7))
            pe = np.argmax(np.asarray(out.style_emb_logit_emt), -1)
            ps = np.argmax(np.asarray(out.style_emb_logit_spk), -1)
            hits_e += int((pe == np.asarray(b["emt_labels"])).sum())
            hits_s += int((ps == np.asarray(b["spk_labels"])).sum())
            n += len(pe)
        return hits_e / n, hits_s / n, n

    os.makedirs(args.out, exist_ok=True)
    curve = open(os.path.join(args.out, "style_curve.jsonl"), "w")
    t0 = time.time()
    acc0 = style_accuracy(state)
    batch = first
    metrics = None
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, batch, k)
        try:
            batch = next(it)
        except StopIteration:
            it = feeder.train_batches(args.batch)
            batch = next(it)
        if (i + 1) % args.eval_every == 0 or i == 0:
            ae, as_, _ = style_accuracy(state)
            rec = dict(step=i + 1,
                       loss=round(float(metrics["loss"]), 4),
                       style_emt=round(float(metrics["style_emb_loss_emt"]), 4),
                       style_spk=round(float(metrics["style_emb_loss_spk"]), 4),
                       heldout_acc_emt=round(ae, 3),
                       heldout_acc_spk=round(as_, 3),
                       elapsed_s=round(time.time() - t0, 1))
            curve.write(json.dumps(rec) + "\n")
            curve.flush()
            print(rec, flush=True)
    curve.close()

    # ---- embedding clusters over the whole corpus (train + test refs)
    embs, emts, spks = [], [], []
    for b in test_batches + [first]:
        out, _ = eval_fn(state, b, jax.random.PRNGKey(7))
        embs.append(np.asarray(out.refnet_out_emt))
        emts.extend(int(x) for x in np.asarray(b["emt_labels"]))
        spks.extend(int(x) for x in np.asarray(b["spk_labels"]))
    embs = np.concatenate(embs, axis=0)
    plot_embedding_clusters(
        embs, emts, os.path.join(args.out, "style_clusters_emt.png"),
        title="ref-encoder embeddings by emotion (intercross run)")
    plot_embedding_clusters(
        embs, spks, os.path.join(args.out, "style_clusters_spk.png"),
        title="ref-encoder embeddings by speaker (intercross run)")

    ae, as_, n = style_accuracy(state)
    report = dict(
        steps=args.steps, batch=args.batch, n_utts=args.n_utts,
        mode="intercross_both + style_emb_disc (fused train decoder)",
        final_loss=round(float(metrics["loss"]), 4),
        final_style_emt_ce=round(float(metrics["style_emb_loss_emt"]), 4),
        final_style_spk_ce=round(float(metrics["style_emb_loss_spk"]), 4),
        heldout_acc_emt_initial=round(acc0[0], 3),
        heldout_acc_spk_initial=round(acc0[1], 3),
        heldout_acc_emt=round(ae, 3), heldout_acc_spk=round(as_, 3),
        heldout_n=n, chance_emt=round(1 / cfg.gst.n_emt, 3),
        chance_spk=round(1 / cfg.gst.n_spk, 3),
        wall_s=round(time.time() - t0, 1),
        device=str(jax.devices()[0]))
    with open(os.path.join(args.out, "style_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("REPORT", json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
