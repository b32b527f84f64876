"""Train step: loss decreases, schedules match reference anchors, mesh shards."""

import dataclasses
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.config import Config, MeshConfig
from tacotron2_tpu.parallel.mesh import make_mesh, shard_batch
from tacotron2_tpu.train.optim import (tacotron_lr_schedule,
                                       teacher_forcing_schedule,
                                       wavenet_lr_schedule)
from tacotron2_tpu.train.tacotron_step import TacotronTrainer

from test_tacotron_model import make_batch, tiny_config


def test_lr_schedule_anchors():
    cfg = Config()
    lr = tacotron_lr_schedule(cfg)
    # phase 1: clipped at init before decay passes it
    np.testing.assert_allclose(float(lr(0)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(lr(15000)), 1e-3, rtol=1e-5)
    # exponential_decay(1e-3, step-15000, 10000, 0.5)
    np.testing.assert_allclose(float(lr(25000)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(lr(35000)), 2.5e-4, rtol=1e-5)
    # phase 3: floor at final lr
    np.testing.assert_allclose(float(lr(400000)), 1e-4, rtol=1e-5)


def test_tfr_schedule():
    cfg = Config()
    tfr = teacher_forcing_schedule(cfg)
    assert float(tfr(0)) == 1.0  # constant mode default
    cfg2 = cfg.replace(train=dataclasses.replace(
        cfg.train, tacotron_teacher_forcing_mode="scheduled"))
    tfr2 = teacher_forcing_schedule(cfg2)
    assert float(tfr2(0)) == 1.0
    assert float(tfr2(9999)) == 1.0
    assert float(tfr2(30000)) < 0.5  # decaying after start
    assert float(tfr2(50000)) < 0.11


def test_wavenet_noam():
    cfg = Config().replace(train=dataclasses.replace(
        Config().train, wavenet_lr_schedule="noam"))
    lr = wavenet_lr_schedule(cfg)
    peak_step = 4000
    assert float(lr(peak_step)) > float(lr(100))
    assert float(lr(peak_step)) > float(lr(100000))


def test_train_step_reduces_loss():
    cfg = tiny_config()
    trainer = TacotronTrainer(cfg)
    batch = make_batch(B=4, T_in=10, T_out=12)
    batch["input_lengths"] = jnp.full((4,), 10, jnp.int32)
    batch["targets_lengths"] = jnp.full((4,), 12, jnp.int32)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.train_step)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["after_loss"]))
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no improvement: {losses}"


@pytest.mark.slow
def test_train_step_on_mesh():
    cfg = tiny_config()
    trainer = TacotronTrainer(cfg)
    B = 8
    batch = make_batch(B=B, T_in=10, T_out=12)
    batch["input_lengths"] = jnp.full((B,), 10, jnp.int32)
    batch["targets_lengths"] = jnp.full((B,), 12, jnp.int32)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    mesh = make_mesh(MeshConfig(), jax.devices())
    assert mesh.shape["data"] == 8
    with mesh:
        sb = shard_batch(mesh, batch)
        state2, metrics = jax.jit(trainer.train_step)(state, sb, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))

    # sharded result == single-device result (same params/batch/rng)
    _, metrics_local = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_local["loss"]), rtol=1e-4)


def test_multi_optimizer_masks():
    from tacotron2_tpu.train.optim import (is_nat_gan_var, is_refnet_var,
                                           main_update_predicate)
    pred = main_update_predicate(True, False, False)
    assert not pred("refnet_emt/conv2d_0/kernel")
    assert not pred("nat_gan_enc/conv2d_0/kernel")
    assert not pred("pretrained_ref_enc_emt/kernel")
    assert pred("decoder/cell/lstm1/kernel")
    assert is_refnet_var("style_disc_emt/dense/kernel")
    assert is_nat_gan_var("nat_gan_disc/dense/kernel")


def test_nat_gan_disc_pretrain_step():
    """disc_pretrain_step: moves only nat-GAN disc params, keeps step at 0."""
    import jax

    from tacotron2_tpu.train.tacotron_step import TacotronTrainer

    cfg = tiny_config()
    trainer = TacotronTrainer(cfg, nat_gan=True)
    batch = make_batch(B=2)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_fn = jax.jit(trainer.disc_pretrain_step)
    new_state, dm = step_fn(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 0  # pretraining doesn't advance the step
    assert np.isfinite(float(dm["d_loss"]))

    flat_old = jax.tree_util.tree_leaves_with_path(state.params)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
    moved = unmoved = 0
    for path, old in flat_old:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        new = flat_new[path]
        changed = not np.allclose(np.asarray(old), np.asarray(new))
        if "nat_gan" in name:
            moved += changed
        else:
            unmoved += changed
    assert moved > 0          # disc params updated
    assert unmoved == 0       # generator untouched


def test_remat_decoder_same_grads():
    """remat_decoder=True (the reference's swap_memory lever, rebuilt as
    jax.checkpoint on the decode scan body) must not change the math."""
    import dataclasses as dc

    from tacotron2_tpu.models.tacotron.model import Tacotron

    cfg = tiny_config()
    cfg_r = cfg.replace(tacotron=dc.replace(cfg.tacotron, remat_decoder=True))
    batch = make_batch(B=2, T_in=10, T_out=12)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2),
                teacher_forcing=jax.random.PRNGKey(3))

    def loss_fn(cfg_use, params, batch_stats):
        model = Tacotron(config=cfg_use)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["inputs"], batch["input_lengths"],
            batch["mel_targets"], batch["ref_mel_emt"], batch["ref_mel_spk"],
            train=False, teacher_forcing_ratio=1.0,
            rngs=dict(dropout=jax.random.PRNGKey(5),
                      zoneout=jax.random.PRNGKey(6),
                      teacher_forcing=jax.random.PRNGKey(7)))
        return jnp.mean((out.mel_outputs - batch["mel_targets"]) ** 2)

    model = Tacotron(config=cfg)
    variables = model.init(rngs, batch["inputs"], batch["input_lengths"],
                           batch["mel_targets"], batch["ref_mel_emt"],
                           batch["ref_mel_spk"], train=True)
    params, bstats = variables["params"], variables["batch_stats"]
    g_plain = jax.grad(lambda p: loss_fn(cfg, p, bstats))(params)
    g_remat = jax.grad(lambda p: loss_fn(cfg_r, p, bstats))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g_plain, g_remat)


@pytest.mark.slow
def test_bf16_decoder_train_step():
    """tacotron.compute_dtype=bfloat16: decode scan in bf16 (master params,
    cum-alignments, BN stacks, losses stay f32) — init-loss parity with the
    f32 path and decreasing loss under training."""
    import dataclasses

    from test_tacotron_model import make_batch, tiny_config

    cfg = tiny_config()
    cfg_bf = cfg.replace(tacotron=dataclasses.replace(
        cfg.tacotron, compute_dtype="bfloat16"))
    batch = make_batch(B=4, T_in=10, T_out=12)
    batch["input_lengths"] = jnp.full((4,), 10, jnp.int32)
    batch["targets_lengths"] = jnp.full((4,), 12, jnp.int32)

    tr32, trbf = TacotronTrainer(cfg), TacotronTrainer(cfg_bf)
    s32 = tr32.init_state(jax.random.PRNGKey(0), batch)
    rngs = dict(zip(["dropout", "zoneout", "teacher_forcing"],
                    jax.random.split(jax.random.PRNGKey(1), 3)))
    o32, _ = tr32._forward(s32.params, s32.batch_stats, batch, rngs,
                           jnp.asarray(1.0), train=True)
    obf, _ = trbf._forward(s32.params, s32.batch_stats, batch, rngs,
                           jnp.asarray(1.0), train=True)
    assert obf.mel_outputs.dtype == jnp.float32
    l32 = float(tr32._losses(o32, batch, s32.params)["loss"])
    lbf = float(trbf._losses(obf, batch, s32.params)["loss"])
    assert abs(l32 - lbf) / abs(l32) < 2e-2

    state = trbf.init_state(jax.random.PRNGKey(0), batch)
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(state.params))
    step = jax.jit(trbf.train_step)
    l0 = None
    for i in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if l0 is None:
            l0 = float(m["loss"])
    assert np.isfinite(float(m["loss"])) and float(m["loss"]) < l0
