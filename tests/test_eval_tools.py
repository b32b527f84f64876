"""Evaluation harness: WER, confusion matrices, embedding exports."""

import os

import numpy as np

from tacotron2_tpu.eval.analyze import (confusion_matrix,
                                        export_style_embeddings_tsv,
                                        plot_confusion_matrix,
                                        plot_embedding_clusters)
from tacotron2_tpu.eval.wer import corpus_wer, edit_distance, wer


def test_wer_basics():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the cat") == 1 / 3          # one deletion
    assert wer("the cat sat", "the dog sat") == 1 / 3      # one substitution
    assert wer("the cat", "the big cat") == 1 / 2          # one insertion
    # punctuation/case insensitive
    assert wer("Hello, World!", "hello world") == 0.0


def test_edit_distance_components():
    S, D, I, H = edit_distance("a b c d".split(), "a x c".split())
    assert (S, D, I, H) == (1, 1, 0, 2)


def test_corpus_wer():
    res = corpus_wer([("the cat sat", "the cat sat"),
                      ("a b c d", "a x c")])
    assert res["n_utterances"] == 2
    assert res["n_words"] == 7
    np.testing.assert_allclose(res["wer"], 2 / 7)


def test_confusion_matrix(tmp_path):
    labels = [0, 0, 1, 1, 2, 2]
    preds = [0, 1, 1, 1, 2, 0]
    cm = confusion_matrix(labels, preds, 3)
    assert cm.tolist() == [[1, 1, 0], [0, 2, 0], [1, 0, 1]]
    norm = plot_confusion_matrix(cm, str(tmp_path / "cm.png"),
                                 class_names=["n", "h", "s"])
    assert (tmp_path / "cm.png").stat().st_size > 1000
    np.testing.assert_allclose(norm.sum(axis=1), 1.0)


def test_embedding_plots_and_export(tmp_path):
    rng = np.random.default_rng(0)
    emb = np.concatenate([rng.normal(i * 3, 0.2, (10, 16)) for i in range(3)])
    labels = np.repeat(np.arange(3), 10)
    proj = plot_embedding_clusters(emb, labels, str(tmp_path / "emb.png"))
    assert proj.shape == (30, 2)
    # clusters remain separated in the projection
    c0 = proj[labels == 0].mean(axis=0)
    c2 = proj[labels == 2].mean(axis=0)
    assert np.linalg.norm(c0 - c2) > 1.0
    ep, mp = export_style_embeddings_tsv(emb, [(i, f"utt{i}") for i in range(30)],
                                         str(tmp_path))
    assert np.loadtxt(ep, delimiter="\t").shape == (30, 16)


def test_human_eval_ab(tmp_path):
    from tacotron2_tpu.eval.human_eval import build_ab_test, score_ab_test
    new, bsl, out = tmp_path / "new", tmp_path / "bsl", tmp_path / "test"
    new.mkdir(); bsl.mkdir()
    for i in range(4):
        (new / f"utt{i}.wav").write_bytes(b"N" * 10)
        (bsl / f"utt{i}.wav").write_bytes(b"B" * 10)
    answers = build_ab_test(str(new), str(bsl), str(out), seed=3)
    wavs = sorted(os.listdir(out))
    assert sum(1 for w in wavs if w.endswith(".wav")) == 8
    # each pair holds one file from each system, randomized order
    import csv
    rows = list(csv.DictReader(open(answers)))
    assert len(rows) == 4
    for i, r in enumerate(rows):
        assert {r["test1"], r["test2"]} == {"new", "bsl"}
        a = (out / f"test_{i}_0.wav").read_bytes()[:1].decode()
        assert a == ("N" if r["test1"] == "new" else "B")
    # scoring: listener always picks option 1
    resp = tmp_path / "resp.csv"
    resp.write_text("index,choice\n" + "\n".join(f"{i},1" for i in range(4)))
    res = score_ab_test(answers, str(resp))
    expected = sum(1 for r in rows if r["test1"] == "new")
    assert res["prefer_new"] == expected and res["total"] == 4


def test_roofline_accounting():
    """Speed-of-light accounting sanity: chip peak lookup, positive FLOP
    counts, decode useful < actual (block-diag context redundancy), and
    mfu_entry's achieved/percent/bound arithmetic."""
    from tacotron2_tpu.config import get_config
    from tacotron2_tpu.utils import roofline as R

    cfg = get_config("default")
    assert R.chip_peaks("TPU v5 lite0")[0] == 197.0
    assert R.chip_peaks("TPU v4")[0] == 275.0
    assert R.chip_peaks("unknown chip") == (197.0, 819.0)

    samp = R.wavenet_sampler_step(cfg, 256)
    dec = R.tacotron_decode_step(cfg, 48, 256)
    gl = R.griffin_lim_audio_second(cfg)
    wnt = R.wavenet_train_step(cfg, 16, 11008)
    tt = R.tacotron_train_step(cfg, 96, 400, 50)
    for w in (samp, dec, gl, wnt, tt):
        assert w["flops_per_step"] > 0
    assert dec["actual_flops_per_step"] > dec["flops_per_step"]
    # train step ~ 3x fwd of the stack: more FLOPs than 2x the fwd-only
    assert wnt["flops_per_step"] > 2 * (wnt["flops_per_step"] / 3)

    e = R.mfu_entry(wnt, 33e-3, "TPU v5 lite0")
    assert abs(e["achieved_tflops"]
               - wnt["flops_per_step"] / 33e-3 / 1e12) < 0.1
    assert 0 < e["pct_bf16_peak"] < 100
    assert e["bound"] in ("flops", "hbm")
    e2 = R.mfu_entry(dec, 58e-6, "TPU v5 lite0")
    assert e2["actual_tflops"] > e2["achieved_tflops"]
