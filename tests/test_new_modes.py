"""New harness surfaces: style-transfer/embs synthesis modes, standalone
wavenet preprocessing, generic metadata builder, summaries, disc-test."""

import json
import os
import sys

import numpy as np
import pytest

from tacotron2_tpu.config import Config

from test_tacotron_model import RNGS, make_batch, tiny_config

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _tiny_synth():
    from tacotron2_tpu.models.tacotron.model import Tacotron
    from tacotron2_tpu.synth.tacotron_synth import TacotronSynthesizer
    cfg = tiny_config()
    model = Tacotron(config=cfg)
    batch = make_batch(B=2)
    variables = model.init(RNGS, batch["inputs"], batch["input_lengths"],
                           mel_targets=batch["mel_targets"],
                           ref_mel_emt=batch["ref_mel_emt"],
                           ref_mel_spk=batch["ref_mel_spk"], train=True)
    return cfg, TacotronSynthesizer(cfg, variables["params"],
                                    variables.get("batch_stats", {}),
                                    model=model)


def _fake_corpus(root, cfg, n=4, frames=24):
    """Preprocessed-corpus layout: <root>/<ds>/mels/*.npy + train.txt rows."""
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "emt4", "mels"), exist_ok=True)
    rows = []
    hop = cfg.audio.effective_hop
    for i in range(n):
        mel = rng.uniform(-4, 4, (frames, cfg.audio.num_mels)).astype(np.float32)
        np.save(os.path.join(root, "emt4", "mels", f"mel-{i}.npy"), mel)
        rows.append(f"emt4|audio-{i}.npy|mel-{i}.npy|linear-{i}.npy|s.npy|"
                    f"{frames * hop}|{frames}|hello world {i}|{i % 2}|0|"
                    f"utt{i}.wav|F")
    path = os.path.join(root, "train.txt")
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
    return path


def test_resolve_refs_same_and_cross(tmp_path):
    from tacotron2_tpu.synth.tacotron_synth import _read_meta, _resolve_refs
    meta_path = tmp_path / "synth_meta.txt"
    rows = [
        "emt4|a.npy|mel-0.npy|l|s|100|10|hi there|1|0|utt0.wav|F|same|tag0|same",
        "emt4|a.npy|mel-1.npy|l|s|100|10|bye now|2|0|utt1.wav|F|"
        "emt4/mel-0.npy|tagX|jessa/mel-9.npy",
    ]
    meta_path.write_text("# comment\n" + "\n".join(rows) + "\n")
    meta = _read_meta(str(meta_path))
    assert len(meta) == 2  # comment skipped
    texts, mels, refs_emt, refs_spk, basenames, emts, spks = _resolve_refs(
        meta, "/data")
    assert texts == ["hi there", "bye now"]
    assert refs_emt[0] == "/data/emt4/mels/mel-0.npy"  # same -> own mel
    assert refs_emt[1] == "/data/emt4/mels/mel-0.npy"  # explicit dataset/file
    assert refs_spk[1] == "/data/jessa/mels/mel-9.npy"
    assert basenames == ["utt0_tag0", "utt1_tagX"]
    assert emts == [1, 2] and spks == [0, 0]
    # flip swaps the two ref lists
    _, _, fe, fs, _, _, _ = _resolve_refs(meta, "/data", flip_spk_emt=True)
    assert fe == refs_spk and fs == refs_emt


def test_style_transfer_driver(tmp_path):
    from tacotron2_tpu.synth.tacotron_synth import run_style_transfer
    cfg, synth = _tiny_synth()
    _fake_corpus(str(tmp_path), cfg)
    hop = cfg.audio.effective_hop
    meta = tmp_path / "synth_meta.txt"
    meta.write_text(
        f"emt4|a.npy|mel-0.npy|l|s|{24 * hop}|24|one two|0|0|u0.wav|F|"
        "emt4/mel-1.npy|e1|same\n"
        f"emt4|a.npy|mel-2.npy|l|s|{24 * hop}|24|three four|1|0|u1.wav|F|"
        "same|e0|emt4/mel-3.npy\n")
    map_path = run_style_transfer(synth, str(meta), str(tmp_path),
                                  str(tmp_path / "out"), save_wavs=False)
    assert os.path.exists(map_path)
    rows = [l.split("|") for l in open(map_path).read().strip().split("\n")]
    assert len(rows) == 2
    for r in rows:
        assert os.path.exists(r[0])
        mel = np.load(r[0])
        assert mel.shape[1] == cfg.audio.num_mels


def test_synthesis_multiple_driver(tmp_path):
    """Accent-cross batcher: N spk per accent x M texts x each chosen accent
    as ref (reference run_synthesis_multiple, tacotron/synthesize.py:233-305)."""
    from tacotron2_tpu.synth.tacotron_synth import run_synthesis_multiple
    cfg, synth = _tiny_synth()
    train_txt = _fake_corpus(str(tmp_path), cfg, n=6)
    out = run_synthesis_multiple(
        synth, train_txt, str(tmp_path), str(tmp_path / "out"),
        n_spk_per_accent=1, n_text_per_spk=2, min_frames=0, seed=1)
    mels = sorted(os.listdir(os.path.join(out, "mels")))
    wavs = sorted(os.listdir(os.path.join(out, "wavs")))
    # 2 accents (emt labels 0/1) x 1 spk x 2 texts x 2 refs = 8 samples
    assert len(mels) == 8 and len(wavs) == 8
    # basenames carry the source and ref accent tags
    assert any("_Am_" in m for m in mels) and any(
        m.rstrip(".npy").endswith("_Au") for m in mels)
    for m in mels:
        arr = np.load(os.path.join(out, "mels", m))
        assert arr.shape[1] == cfg.audio.num_mels


def test_style_embs_export(tmp_path):
    from tacotron2_tpu.synth.tacotron_synth import run_style_embs
    cfg, synth = _tiny_synth()
    train_txt = _fake_corpus(str(tmp_path), cfg, n=6)
    emb_dir = run_style_embs(synth, train_txt, str(tmp_path),
                             str(tmp_path / "out"), n_spk=1, n_per_spk=4)
    emb = np.loadtxt(os.path.join(emb_dir, "emb_emt.tsv"), delimiter="\t")
    # real + synth rows stacked: 2 * 4 utterances; the ref-encoder output is
    # always 128-d (the reference hardcodes its final dense to 128,
    # modules.py:41,55, independent of reference_depth)
    assert emb.shape == (8, 128)
    meta_lines = open(os.path.join(emb_dir, "meta.tsv")).read().strip().split("\n")
    assert meta_lines[0].startswith("dataset\t")
    assert len(meta_lines) == 1 + 8
    assert meta_lines[1].endswith("real") and meta_lines[-1].endswith("synth")


def test_embed_only_pass():
    cfg, synth = _tiny_synth()
    rng = np.random.default_rng(3)
    mels = [rng.uniform(-4, 4, (16, cfg.audio.num_mels)).astype(np.float32)
            for _ in range(2)]
    out = synth.embed(["a b", "c d"], mels)
    assert out["emb_emt"].shape == (2, 128)
    assert out["emb_mo_emt"].shape == (2, 128)
    # distinct refs give distinct embeddings
    assert not np.allclose(out["emb_emt"][0], out["emb_emt"][1])


def test_wavenet_standalone_preprocess(tmp_path):
    from tacotron2_tpu.data import audio
    from tacotron2_tpu.data.preprocess import (wavenet_build_from_path,
                                               write_wavenet_metadata)
    from tacotron2_tpu.data.wavenet_feeder import WaveNetFeeder
    import dataclasses
    cfg = Config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, wavenet_test_size=None, wavenet_test_batches=1,
        wavenet_batch_size=1, max_time_steps=4000))
    sr = cfg.audio.sample_rate
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        t = np.linspace(0, 0.5, sr // 2, endpoint=False)
        w = (0.5 * np.sin(2 * np.pi * 220 * t) +
             0.01 * rng.standard_normal(len(t))).astype(np.float32)
        audio.save_wav(w, str(wav_dir / f"utt{i}.wav"), sr)

    out_dir = tmp_path / "wn"
    rows = wavenet_build_from_path(cfg, str(wav_dir), str(out_dir), serial=True)
    assert len(rows) == 3
    map_path = write_wavenet_metadata(rows, str(out_dir), cfg)
    hop = cfg.audio.effective_hop
    for r in rows:
        x = np.load(r[0])
        c = np.load(r[1])
        assert len(x) == len(c) * hop  # upsampling invariant
        assert len(x) == int(r[4]) and len(c) == int(r[5])

    # the feeder consumes the 6-field map rows directly
    feeder = WaveNetFeeder(cfg, map_path, gta=False)
    batch = next(iter(feeder.train_batches(1)))
    assert batch["x"].shape[1] == batch["c"].shape[1] * hop


def test_create_metadata_layouts(tmp_path):
    from tacotron2_tpu.data.preprocess import create_metadata
    # ljspeech layout
    lj = tmp_path / "lj"
    (lj / "wavs").mkdir(parents=True)
    (lj / "metadata.csv").write_text(
        "LJ001-0001|raw text 1|Normalized text one.\n"
        "LJ001-0002|raw text 2|Normalized text two.\n")
    out = create_metadata(str(lj), str(tmp_path / "meta_lj.txt"))
    rows = [l.split("|") for l in open(out).read().strip().split("\n")]
    assert rows[0] == ["wavs/LJ001-0001.wav", "Normalized text one.", "0",
                       "0", "U"]
    # folders layout
    fl = tmp_path / "folders"
    for spk in ("p1", "p2"):
        (fl / spk).mkdir(parents=True)
        (fl / spk / "a.wav").write_bytes(b"RIFF")
        (fl / spk / "a.txt").write_text(f"hello from {spk}")
    out2 = create_metadata(str(fl), str(tmp_path / "meta_f.txt"),
                           layout="folders")
    rows2 = [l.split("|") for l in open(out2).read().strip().split("\n")]
    assert len(rows2) == 2 and rows2[0][3] == "p1" and rows2[1][3] == "p2"


def test_summary_writer_and_profiler_hook(tmp_path):
    from tacotron2_tpu.utils.summary import ProfilerHook, SummaryWriter
    w = SummaryWriter(str(tmp_path), use_tensorboard=False)
    w.scalars(10, {"loss": 1.5, "skipme": np.zeros(3)}, prefix="t/")
    w.scalars(20, {"loss": 1.2})
    w.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().strip().split("\n")]
    assert lines[0]["step"] == 10 and lines[0]["t/loss"] == 1.5
    assert "t/skipme" not in lines[0]  # non-scalars skipped
    assert lines[1]["loss"] == 1.2
    # hook with no start step is inert
    hook = ProfilerHook(str(tmp_path))
    hook.step(5)
    hook.close()


def test_disc_test_roundtrip(tmp_path):
    """disc-train a few steps on the tiny corpus, then disc-test on it."""
    from make_tiny_dataset import main as make_corpus
    from tacotron2_tpu.disc.train import disc_test, disc_train
    import dataclasses
    corpus = make_corpus(str(tmp_path / "corpus"), n=12)
    cfg = Config()
    cfg = cfg.replace(gst=dataclasses.replace(
        cfg.gst, reference_filters=(4, 4), reference_depth=8))
    ckpt_dir, _ = disc_train(cfg, os.path.join(corpus, "train.txt"),
                             str(tmp_path / "disc"), kind="emt",
                             train_steps=3, n_per_class=2, loss_type="ce",
                             checkpoint_interval=3)
    acc, cm = disc_test(cfg, ckpt_dir, os.path.join(corpus, "train.txt"),
                        str(tmp_path / "disc_test"), kind="emt",
                        crop_frames=32)
    assert 0.0 <= acc <= 1.0
    assert cm.sum() == 12
    assert os.path.exists(tmp_path / "disc_test" / "confusion_emt.png")
    assert os.path.exists(tmp_path / "disc_test" / "disc_test_emt.csv")


def test_emt_disc_standalone(tmp_path):
    """Standalone CNN+GRU emotion classifier (reference emt_disc/): a few CE
    steps on a fake corpus run, checkpoint lands, loss finite."""
    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.disc.model import EmtDisc
    from tacotron2_tpu.disc.train import emt_disc_train

    cfg = tiny_config()
    path = _fake_corpus(tmp_path, cfg, n=8, frames=16)
    ckpt_dir, params = emt_disc_train(
        cfg, path, str(tmp_path / "run"), train_steps=4, batch_size=4,
        n_classes=4, eval_interval=2, checkpoint_interval=4)
    assert os.path.isdir(ckpt_dir)
    # net shape parity with networks.py: 128-d tanh embedding + 4 logits
    model = EmtDisc(config=cfg, n_classes=4)
    mels = jnp.asarray(np.zeros((2, 16, cfg.audio.num_mels), np.float32))
    variables = model.init(dict(params=jax.random.PRNGKey(0)), mels,
                           train=False)
    emb, logits = model.apply(variables, mels, train=False)
    assert emb.shape == (2, 128) and logits.shape == (2, 4)
    assert np.all(np.abs(np.asarray(emb)) <= 1.0)  # tanh output


def test_corpus_metadata_builders(tmp_path):
    """Corpus-specific manifest builders (reference datasets/metadata.py)
    against tiny synthetic trees with the same on-disk layouts."""
    from tacotron2_tpu.data.preprocess import create_metadata

    # --- emt4: Wav tree + all_txt_wav.txt `name|script|emt`
    emt4 = tmp_path / "emt4src"
    (emt4 / "Wav" / "sess" / "a").mkdir(parents=True)
    for i, emt in [(1, 0), (2, 2)]:
        (emt4 / "Wav" / "sess" / "a" / f"{i:07d}.wav").write_bytes(b"")
    (emt4 / "all_txt_wav.txt").write_text(
        "0000001|hello there|0\n0000002|angry words|2\n")
    out = create_metadata(str(emt4), str(tmp_path / "m_emt4.txt"),
                          layout="emt4")
    rows = [l.split("|") for l in open(out).read().strip().split("\n")]
    assert len(rows) == 2
    assert rows[0][1] == "hello there" and rows[0][2] == "0"
    assert rows[1][2] == "2" and rows[0][3] == "0" and rows[0][4] == "F"

    # --- emth: tab transcript + leading-digit emotion with Zo swap 1<->2
    emth = tmp_path / "emthsrc"
    (emth / "Wave16kNormalized" / "x" / "y").mkdir(parents=True)
    for name in ("1_0001", "2_0001"):
        (emth / "Wave16kNormalized" / "x" / "y" / f"{name}.wav").write_bytes(b"")
    (emth / "all_txt_wav.txt").write_text(
        "1_0001\tangry line\n2_0001\tsad line\n")
    out = create_metadata(str(emth), str(tmp_path / "m_emth.txt"),
                          layout="emth")
    rows = [l.split("|") for l in open(out).read().strip().split("\n")]
    by_name = {r[0].split("/")[-1]: r for r in rows}
    assert by_name["1_0001.wav"][2] == "2"  # harriton 1 (angry) -> zo 2
    assert by_name["2_0001.wav"][2] == "1"
    assert rows[0][3] == "1" and rows[0][4] == "M"

    # --- librispeech: spk/book tree + trans.txt + SPEAKERS.TXT
    ls = tmp_path / "lssrc"
    (ls / "train-clean-100" / "19" / "198").mkdir(parents=True)
    (ls / "train-clean-100" / "19" / "198" / "19-198-0001.flac").write_bytes(b"")
    (ls / "train-clean-100" / "19" / "198" / "19-198.trans.txt").write_text(
        "19-198-0001 HELLO WORLD\n")
    (ls / "SPEAKERS.TXT").write_text(
        ";ID |SEX| SUBSET\n19 | F | train-clean-100\n")
    out = create_metadata(str(ls), str(tmp_path / "m_ls.txt"),
                          layout="librispeech")
    rows = [l.split("|") for l in open(out).read().strip().split("\n")]
    assert rows[0][0] == "19/198/19-198-0001.flac"
    assert rows[0][1] == "HELLO WORLD" and rows[0][3] == "19"
    assert rows[0][4] == "F"

    # --- vctk: wav48/txt trees + speaker-info.csv, quote stripping,
    #     7-column output with accent|region
    vctk = tmp_path / "vctksrc"
    (vctk / "wav48" / "p225").mkdir(parents=True)
    (vctk / "txt" / "p225").mkdir(parents=True)
    (vctk / "wav48" / "p225" / "p225_001.wav").write_bytes(b"")
    (vctk / "txt" / "p225" / "p225_001.txt").write_text('"Please call."\n')
    (vctk / "speaker-info.csv").write_text(
        "ID,SEX,ACCENTS,REGION\n225,F,English,Southern England\n")
    out = create_metadata(str(vctk), str(tmp_path / "m_vctk.txt"),
                          layout="vctk")
    rows = [l.split("|") for l in open(out).read().strip().split("\n")]
    # reference order: strip quotes BEFORE the trailing-newline [:-1], so a
    # quote followed by newline survives (metadata.py:221-229 faithfully)
    assert rows[0][1] == 'Please call."'
    assert rows[0][5] == "English" and rows[0][6] == "Southern England"


def test_vctk_accent_relabel(tmp_path):
    """train.txt emt column rewritten to the sorted-accent index
    (reference vctk_metadata_accent, metadata.py:232-261)."""
    from tacotron2_tpu.data.preprocess import vctk_accent_relabel

    info = tmp_path / "speaker-info.csv"
    info.write_text("ID,SEX,ACCENTS,REGION\n"
                    "225,F,English,S England\n226,M,Scottish,Edinburgh\n")
    train = tmp_path / "train.txt"
    # 12-field train.txt rows; basename field (10) = p<spk>_<utt>.wav
    row = ("vctk|a.npy|mel-1.npy|l.npy|s.npy|4000|20|text|0|225|"
           "p225_001.wav|F")
    row2 = row.replace("225", "226").replace("p225", "p226")
    row3 = row.replace("p225_001", "p999_001")  # unknown speaker: dropped
    train.write_text("\n".join([row, row2, row3]) + "\n")
    out = vctk_accent_relabel(str(train), str(info),
                              str(tmp_path / "train_accent.txt"))
    rows = [l.split("|") for l in open(out).read().strip().split("\n")]
    assert len(rows) == 2
    # sorted accents = [English, Scottish] -> indices 0, 1
    assert rows[0][8] == "0" and rows[1][8] == "1"


def test_mels_to_wavs_matches_per_utterance():
    """Batched G-L inversion pads/trims per utterance consistently with the
    per-utterance mel_to_wav path (CPU → both take the XLA scan)."""
    import dataclasses

    cfg, synth = _tiny_synth()
    synth.cfg = cfg.replace(audio=dataclasses.replace(
        cfg.audio, n_fft=512, win_size=512, hop_size=128,
        griffin_lim_iters=3, preemphasize=False, trim_silence=False))
    rng = np.random.default_rng(1)
    mels = [rng.uniform(-4, 4, (f, 20)).astype(np.float32) for f in (18, 24)]
    wavs = synth.mels_to_wavs(mels)
    assert [len(w) for w in wavs] == [128 * 17, 128 * 23]
    for m, w in zip(mels, wavs):
        ref = synth.mel_to_wav(m)
        assert len(ref) == len(w)
        # padded-batch G-L perturbs the tail near the silence boundary;
        # identical zero-phase init keeps the bulk waveform aligned
        corr = np.corrcoef(w, ref)[0, 1]
        assert corr > 0.98, corr
    assert synth.mels_to_wavs([]) == []
    # degenerate 1-frame mel: hop*(F-1) = 0 samples, same as mel_to_wav
    one = rng.uniform(-4, 4, (1, 20)).astype(np.float32)
    assert synth.mels_to_wavs([one])[0].size == 0
    # with signal_normalization off the pad must still be raw-dB silence,
    # quieter than the content (review finding: -max_abs_value would be loud)
    synth.cfg = synth.cfg.replace(audio=dataclasses.replace(
        synth.cfg.audio, signal_normalization=False))
    raw = rng.uniform(-100, -20, (10, 20)).astype(np.float32)
    w_raw = synth.mels_to_wavs([raw, raw[:6]])
    # the pad must denormalize to SILENCE. The trimmed waveform is nearly
    # immune to the pad value (pad windows lie past hop*(F-1)), so assert the
    # real invariant on the pad value itself: a padded frame's linear
    # magnitude must be negligible vs a content frame's (with the old
    # -max_abs_value bug in the raw-dB domain the padded region inverted to
    # RMS ~41 vs ~0.002 for proper silence)
    from tacotron2_tpu.ops import stft as dstft
    from tacotron2_tpu.synth.tacotron_synth import gl_pad_value
    a = synth.cfg.audio
    pad_frame = np.full((1, 1, a.num_mels), gl_pad_value(a), np.float32)
    content_frame = raw[None, :1]
    def mag(x):
        m = x[0, 0]
        if a.signal_normalization:
            m = np.asarray(dstft.denormalize_db(np.asarray(m), a))
        return float(np.max(10.0 ** ((m + a.ref_level_db) / 20.0)))
    assert mag(pad_frame) < 1e-3 * mag(content_frame), \
        (mag(pad_frame), mag(content_frame))
    # and a loose wav-level sanity: the tail near the pad boundary is not
    # blown up relative to the body
    tail = w_raw[1][-synth.cfg.audio.effective_hop:]
    body = w_raw[1][: -synth.cfg.audio.effective_hop]
    rms = lambda x: float(np.sqrt(np.mean(np.square(x))))
    assert rms(tail) < rms(body) * 1.5, (rms(tail), rms(body))
    assert [len(w) for w in w_raw] == [128 * 9, 128 * 5]


def test_run_eval_save_wavs_batched(tmp_path):
    """run_eval with save_wavs=True exercises the batched mels_to_wavs
    indexing (wav/plot per sentence, all files non-trivial)."""
    import dataclasses

    from tacotron2_tpu.synth.tacotron_synth import run_eval

    cfg, synth = _tiny_synth()
    synth.cfg = cfg.replace(audio=dataclasses.replace(
        cfg.audio, n_fft=512, win_size=512, hop_size=128,
        griffin_lim_iters=2))
    rng = np.random.default_rng(5)
    refs = [rng.uniform(-4, 4, (9, 20)).astype(np.float32)] * 2
    run_eval(synth, ["one two", "three"], refs, refs,
             str(tmp_path / "out"), save_wavs=True)
    eval_dir = tmp_path / "out" / "eval"
    for i in range(2):
        wav_path = eval_dir / "wavs" / f"wav-eval-{i}.wav"
        assert wav_path.exists()
        # 0.5 s silence pad + at least one hop of audio
        assert wav_path.stat().st_size > cfg.audio.sample_rate // 2 * 2
        assert (eval_dir / "plots" / f"alignment-eval-{i}.png").exists()
    assert (eval_dir / "map.txt").exists()


def test_synthesize_emt_attn_simple_block_path():
    """emt_attn='simple' synthesis through the synthesizer: the emt
    operands (emt_memory sequence + ref_spk) thread through the memory pass
    into the block decode loop (scan-block on CPU; the blocked fused kernel
    takes the same operands on TPU)."""
    import dataclasses

    from tacotron2_tpu.models.tacotron.model import Tacotron
    from tacotron2_tpu.synth.tacotron_synth import TacotronSynthesizer

    cfg = tiny_config(emt_attn=True, emt_attn_type="simple")
    cfg = cfg.replace(tacotron=dataclasses.replace(
        cfg.tacotron, max_iters=8, early_stop_block=4))
    model = Tacotron(config=cfg)
    batch = make_batch(B=2)
    variables = model.init(RNGS, batch["inputs"], batch["input_lengths"],
                           mel_targets=batch["mel_targets"],
                           ref_mel_emt=batch["ref_mel_emt"],
                           ref_mel_spk=batch["ref_mel_spk"], train=True)
    synth = TacotronSynthesizer(cfg, variables["params"],
                                variables.get("batch_stats", {}), model=model)
    rng = np.random.default_rng(0)
    refs = [rng.uniform(-4, 4, (9, 20)).astype(np.float32)] * 2
    out = synth.synthesize(["ab cd", "efg"], refs, refs)
    assert len(out["mels"]) == 2
    for m in out["mels"]:
        assert np.isfinite(m).all()
        assert m.shape[1] == cfg.audio.num_mels
