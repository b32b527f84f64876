"""WaveNet feeder + train step: invariants and learning smoke test."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.config import Config
from tacotron2_tpu.data.wavenet_feeder import WaveNetFeeder, interp_to_unit
from tacotron2_tpu.train.wavenet_step import WaveNetTrainer

from test_wavenet import tiny_wn_config


@pytest.fixture(scope="module")
def wn_corpus(tmp_path_factory):
    """Synthetic (audio, mel) pairs with the hop-alignment invariant."""
    out = tmp_path_factory.mktemp("wn")
    cfg = tiny_wn_config()
    hop = int(np.prod(cfg.wavenet.upsample_scales))  # 4
    os.makedirs(out / "ds" / "audio", exist_ok=True)
    os.makedirs(out / "ds" / "mels", exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(20):
        frames = int(rng.integers(20, 60))
        T = frames * hop
        t = np.arange(T) / 16000
        x = (0.4 * np.sin(2 * np.pi * (200 + 20 * i) * t)).astype(np.float32)
        c = rng.uniform(-4, 4, (frames, cfg.wavenet.cin_channels)).astype(np.float32)
        np.save(out / "ds" / "audio" / f"audio-{i}.npy", x)
        np.save(out / "ds" / "mels" / f"mel-{i}.npy", c)
        rows.append(f"ds|audio-{i}.npy|mel-{i}.npy|linear-{i}.npy|s.npy|{T}|{frames}|text|0|0|b{i}.wav|F")
    meta = out / "train.txt"
    meta.write_text("\n".join(rows) + "\n")
    return str(meta), cfg


def small_train_cfg(cfg: Config) -> Config:
    return cfg.replace(
        train=dataclasses.replace(cfg.train, wavenet_batch_size=2,
                                  wavenet_test_size=None, wavenet_test_batches=2,
                                  max_time_steps=96),
        audio=dataclasses.replace(cfg.audio, hop_size=4, num_mels=10))


def test_feeder_batches(wn_corpus):
    meta, cfg = wn_corpus
    cfg = small_train_cfg(cfg)
    feeder = WaveNetFeeder(cfg, meta, gta=False, batches_per_group=2)
    batch = next(feeder.train_batches())
    B = cfg.train.wavenet_batch_size
    assert batch["x"].shape[0] == B and batch["x"].shape[2] == 1
    T = batch["x"].shape[1]
    assert T <= cfg.train.max_time_steps
    assert T % cfg.audio.effective_hop == 0
    # upsampling invariant after crop+pad
    assert batch["c"].shape[1] * cfg.audio.effective_hop == T
    # mels rescaled to [0, 1]
    assert batch["c"].min() >= 0.0 and batch["c"].max() <= 1.0


def test_interp_to_unit():
    cfg = Config()
    x = np.array([-4.0, 0.0, 4.0])
    np.testing.assert_allclose(interp_to_unit(x, cfg), [0.0, 0.5, 1.0])


def test_train_step_learns(wn_corpus):
    meta, cfg = wn_corpus
    cfg = small_train_cfg(cfg)
    feeder = WaveNetFeeder(cfg, meta, gta=False, batches_per_group=2)
    it = feeder.train_batches()
    batch = next(it)
    trainer = WaveNetTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.train_step)
    losses = []
    for i in range(10):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # EMA params differ from live params but stay close
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params, state.ema_params)
    max_diff = max(jax.tree_util.tree_leaves(diff))
    assert 0 < max_diff < 1.0


def test_ema_warmup_forgets_init(wn_corpus):
    """The EMA shadow must track live params early in training instead of
    retaining the random init: with warmup decay min(0.9999, (1+t)/(10+t)),
    after k steps the init's weight is prod_t (1+t)/(10+t) ~ 1e-k, so the
    shadow-vs-live distance must be FAR below the live-vs-init distance
    (a constant 0.9999 decay leaves ~(1 - k*1e-4) of the init in the
    shadow, which corrupts autoregressive sampling at short horizons)."""
    meta, cfg = wn_corpus
    cfg = small_train_cfg(cfg)
    feeder = WaveNetFeeder(cfg, meta, gta=False, batches_per_group=2)
    batch = next(feeder.train_batches())
    trainer = WaveNetTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    init_params = jax.device_get(state.params)
    step = jax.jit(trainer.train_step)
    for i in range(12):
        state, _ = step(state, batch, jax.random.PRNGKey(i))

    def max_abs_diff(a, b):
        return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
            a, b)))

    live_vs_init = max_abs_diff(state.params, init_params)
    ema_vs_live = max_abs_diff(state.ema_params, state.params)
    ema_vs_init = max_abs_diff(state.ema_params, init_params)
    assert live_vs_init > 0
    # shadow has moved with training (would be ~0 under pure init retention)
    assert ema_vs_init > 0.5 * live_vs_init
    # and retains almost none of the init: it sits near the live params
    assert ema_vs_live < 0.25 * live_vs_init, (ema_vs_live, live_vs_init)


def test_eval_step_uses_ema(wn_corpus):
    meta, cfg = wn_corpus
    cfg = small_train_cfg(cfg)
    feeder = WaveNetFeeder(cfg, meta, gta=False, batches_per_group=2)
    batch = next(feeder.train_batches())
    trainer = WaveNetTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, _ = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(1))
    out_ema, terms_ema = trainer.eval_step(state, batch, use_ema=True)
    out_live, terms_live = trainer.eval_step(state, batch, use_ema=False)
    assert np.isfinite(float(terms_ema["loss"]))
    assert float(terms_ema["loss"]) != float(terms_live["loss"])


def test_paper_preset_mol_train_step():
    """paper_hparams config: 22.05 kHz, MoL head (out_channels=30) trains."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.config import get_config
    from tacotron2_tpu.train.wavenet_step import WaveNetTrainer

    cfg = get_config("paper")
    assert cfg.audio.sample_rate == 22050
    assert cfg.wavenet.out_channels == 30  # 10-mixture MoL
    cfg = cfg.replace(wavenet=dataclasses.replace(
        cfg.wavenet, layers=4, stacks=2, residual_channels=8,
        gate_channels=16, skip_out_channels=8, upsample_scales=(2, 2)))
    rng = np.random.default_rng(0)
    B, T_mel, hop = 2, 6, 4
    batch = dict(
        x=jnp.asarray(rng.uniform(-0.5, 0.5, (B, T_mel * hop, 1)), jnp.float32),
        y=jnp.asarray(rng.uniform(-0.5, 0.5, (B, T_mel * hop)), jnp.float32),
        c=jnp.asarray(rng.uniform(0, 1, (B, T_mel, cfg.wavenet.cin_channels)),
                      jnp.float32),
        input_lengths=jnp.full((B,), T_mel * hop, jnp.int32))
    trainer = WaveNetTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.train_step)
    l0 = None
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
        if l0 is None:
            l0 = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < l0  # MoL NLL decreasing

def test_bf16_stack_train_step_converges():
    """compute_dtype=bfloat16: residual stack in bf16 (params/head f32) —
    loss matches the f32 stack closely at init and decreases under training,
    and remat_conv_stack composes with it."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.models.wavenet.model import WaveNet, compute_wavenet_loss
    from tacotron2_tpu.train.wavenet_step import WaveNetTrainer

    base = Config()
    small = dataclasses.replace(
        base.wavenet, layers=4, stacks=2, residual_channels=8,
        gate_channels=16, skip_out_channels=8, upsample_scales=(2, 2))
    cfg32 = base.replace(wavenet=small)
    cfgbf = base.replace(wavenet=dataclasses.replace(
        small, compute_dtype="bfloat16", remat_conv_stack=True))
    rng = np.random.default_rng(0)
    B, T_mel, hop = 2, 6, 4
    batch = dict(
        x=jnp.asarray(rng.uniform(-0.5, 0.5, (B, T_mel * hop, 1)), jnp.float32),
        y=jnp.asarray(rng.uniform(-0.5, 0.5, (B, T_mel * hop)), jnp.float32),
        c=jnp.asarray(rng.uniform(0, 1, (B, T_mel, cfg32.wavenet.cin_channels)),
                      jnp.float32),
        input_lengths=jnp.full((B,), T_mel * hop, jnp.int32))

    # same params, both stacks: loss agrees at init
    lengths = batch["input_lengths"]
    m32, mbf = WaveNet(config=cfg32), WaveNet(config=cfgbf)
    v = m32.init(dict(params=jax.random.PRNGKey(0),
                      dropout=jax.random.PRNGKey(1)),
                 batch["x"], batch["c"], None, train=False)
    l32 = compute_wavenet_loss(m32.apply(v, batch["x"], batch["c"], None,
                                         train=False),
                               batch["y"], lengths, cfg32)["loss"]
    lbf = compute_wavenet_loss(mbf.apply(v, batch["x"], batch["c"], None,
                                         train=False),
                               batch["y"], lengths, cfgbf)["loss"]
    assert float(mbf.apply(v, batch["x"], batch["c"], None,
                           train=False).y_hat.dtype == jnp.float32)
    np.testing.assert_allclose(float(l32), float(lbf), rtol=2e-2)

    trainer = WaveNetTrainer(cfgbf)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    # params (and grads) stay f32 under the bf16 stack
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(state.params))
    step = jax.jit(trainer.train_step)
    l0 = None
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
        if l0 is None:
            l0 = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < l0


def test_weight_norm_data_dependent_init():
    """After the DDI pass (reference modules.py:110-126), the FIRST
    weight-normed conv's pre-activation output on the init batch has
    per-channel mean ~0 and std ~init_scale (later layers' inputs change
    when earlier layers rescale, but the sequential pass normalizes each in
    turn, so every layer ends near-normalized)."""
    import dataclasses

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.models.wavenet.model import (WaveNet,
                                                    data_dependent_init)

    cfg = Config()
    cfg = cfg.replace(wavenet=dataclasses.replace(
        cfg.wavenet, layers=4, stacks=2, residual_channels=16,
        gate_channels=32, skip_out_channels=16, cin_channels=20,
        upsample_scales=(2, 2), out_channels=2, dropout=0.0,
        weight_normalization=True))
    model = WaveNet(config=cfg)
    rng = np.random.default_rng(0)
    B, T_mel, hop = 2, 8, 4
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (B, T_mel * hop, 1)), jnp.float32)
    c = jnp.asarray(rng.uniform(0, 1, (B, T_mel, 20)), jnp.float32)
    variables = model.init(dict(params=jax.random.PRNGKey(0),
                                dropout=jax.random.PRNGKey(1)),
                           x, c, train=True)
    params = data_dependent_init(model, variables["params"], x, c)

    # capture post-DDI intermediates and check normalization layer by layer
    _, st = model.apply({"params": params}, x, c, train=False,
                        mutable=["intermediates"])
    checked = 0

    def walk(tree, ptree):
        nonlocal checked
        for k, v in tree.items():
            if k == "wn_out":
                continue
            sub = ptree.get(k, {}) if isinstance(ptree, dict) else {}
            if isinstance(v, dict) and "wn_out" in v and "g" in sub:
                out = np.asarray(v["wn_out"][0])
                axes = tuple(range(out.ndim - 1))
                np.testing.assert_allclose(out.mean(axes), 0.0, atol=1e-4)
                np.testing.assert_allclose(out.std(axes), 1.0, atol=1e-3)
                checked += 1
            if isinstance(v, dict):
                walk(v, sub)
    walk(st["intermediates"], params)
    assert checked >= 10  # first conv + 4 blocks x (conv/cin/skip/out) + final


def test_speaker_embedding_projector_export(tmp_path):
    """Projector export (reference wavenet train.py:26-39,327-334): the
    speaker embedding table lands as embeddings.tsv + metadata.tsv."""
    import dataclasses

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.train.wavenet_step import WaveNetTrainer
    from tacotron2_tpu.train.wavenet_train import _export_speaker_embeddings

    cfg = Config()
    cfg = cfg.replace(wavenet=dataclasses.replace(
        cfg.wavenet, layers=2, stacks=1, residual_channels=8,
        gate_channels=16, skip_out_channels=8, cin_channels=10,
        upsample_scales=(2, 2), out_channels=2, dropout=0.0,
        gin_channels=6, use_speaker_embedding=True, n_speakers=3))
    trainer = WaveNetTrainer(cfg)
    rng = np.random.default_rng(0)
    B, T_mel, hop = 2, 4, 4
    batch = dict(
        x=jnp.asarray(rng.uniform(-0.5, 0.5, (B, T_mel * hop, 1)),
                      jnp.float32),
        y=jnp.asarray(rng.uniform(-0.5, 0.5, (B, T_mel * hop)), jnp.float32),
        c=jnp.asarray(rng.uniform(0, 1, (B, T_mel, 10)), jnp.float32),
        g=jnp.asarray([0, 2], jnp.int32),
        input_lengths=jnp.full((B,), T_mel * hop, jnp.int32))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    _export_speaker_embeddings(cfg, state, str(tmp_path))
    emb = open(tmp_path / "speaker_embeddings" / "embeddings.tsv").read()
    meta = open(tmp_path / "speaker_embeddings" / "metadata.tsv").read()
    assert len(emb.strip().split("\n")) == 3
    assert len(emb.strip().split("\n")[0].split("\t")) == 6
    assert meta.strip().split("\n") == ["speaker_0", "speaker_1", "speaker_2"]
