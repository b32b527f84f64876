"""Native data-IO runtime (native/tacodata.cc via ctypes): parity + fallback."""

import os

import numpy as np
import pytest

from tacotron2_tpu import native as nat


pytestmark = pytest.mark.skipif(not nat.available(),
                                reason="native toolchain unavailable")


def test_npy_parity_dtypes(tmp_path):
    for arr in [np.random.rand(127, 80).astype(np.float32),
                np.random.rand(33).astype(np.float16),
                (np.random.rand(5, 7, 3) * 100).astype(np.int16),
                np.random.rand(4, 4)]:  # f64
        p = str(tmp_path / "t.npy")
        np.save(p, arr)
        got = nat.read_npy_f32(p)
        assert got.shape == arr.shape and got.dtype == np.float32
        np.testing.assert_allclose(got, arr.astype(np.float32),
                                   rtol=1e-3, atol=1e-3)


def test_npy_batch_parallel(tmp_path):
    paths = []
    for i in range(24):
        p = str(tmp_path / f"b{i}.npy")
        np.save(p, np.full((10, 10), i, np.float32))
        paths.append(p)
    outs = nat.read_npy_batch_f32(paths, num_threads=8)
    assert all(np.all(o == i) for i, o in enumerate(outs))


def test_mulaw_parity():
    from tacotron2_tpu.ops import mulaw as jm
    x = np.random.uniform(-1, 1, 1000).astype(np.float32)
    np.testing.assert_allclose(nat.mulaw(x), np.asarray(jm.mulaw(x, 255)),
                               atol=1e-5)
    np.testing.assert_allclose(nat.inv_mulaw(nat.mulaw(x)), x, atol=1e-5)
    q_nat = nat.mulaw_quantize(x, 255)
    q_ref = np.asarray(jm.mulaw_quantize(x, 255))
    assert np.abs(q_nat - q_ref).max() <= 1  # rounding-mode tolerance
    assert q_nat.min() >= 0 and q_nat.max() <= 255


def test_wav_roundtrip_vs_scipy(tmp_path):
    from tacotron2_tpu.data import audio
    w = (np.sin(np.linspace(0, 100, 16000)) * 0.5).astype(np.float32)
    p = str(tmp_path / "w.wav")
    nat.write_wav_pcm16(p, w, 16000)
    back, sr = nat.read_wav_pcm16(p)
    assert sr == 16000 and len(back) == len(w)
    np.testing.assert_allclose(back, audio.load_wav(p, 16000), atol=1e-4)
    # peak normalization matches the reference save_wav scaling
    assert abs(np.abs(back).max() - 32767 / 32768) < 1e-3


def test_missing_file_raises():
    with pytest.raises(IOError):
        nat.read_npy_f32("/nonexistent/x.npy")


def test_wavenet_feeder_uses_native(tmp_path):
    """Group loading through the native path yields identical batches to the
    sequential fallback (same RNG stream)."""
    import dataclasses

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.data import wavenet_feeder as wf

    cfg = Config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, wavenet_test_size=None, wavenet_test_batches=1,
        wavenet_batch_size=1, max_time_steps=2000))
    hop = cfg.audio.effective_hop
    rows = []
    for i in range(6):
        frames = 12 + i
        x = np.random.rand(frames * hop).astype(np.float32)
        c = np.random.rand(frames, 80).astype(np.float32)
        xp, cp = tmp_path / f"a{i}.npy", tmp_path / f"m{i}.npy"
        np.save(xp, x)
        np.save(cp, c)
        rows.append(f"{xp}|{cp}|{cp}|<no_g>|{len(x)}|{frames}")
    mp = tmp_path / "map.txt"
    mp.write_text("\n".join(rows) + "\n")

    f1 = wf.WaveNetFeeder(cfg, str(mp), gta=False, batches_per_group=2, seed=7)
    b1 = next(iter(f1.train_batches(1)))
    # sequential fallback: force the no-native path
    f2 = wf.WaveNetFeeder(cfg, str(mp), gta=False, batches_per_group=2, seed=7)
    f2._load_group = lambda rs: [f2._load_example(r)[:2] for r in rs]
    b2 = next(iter(f2.train_batches(1)))
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k])
