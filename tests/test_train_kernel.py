"""Fused teacher-forced (training) decoder kernels: parity vs the flax scan.

Forward parity, gradient parity (custom_vjp BPTT backward + XLA weight-grad
GEMM pass vs jax.grad of the scan), trainer integration, and the EMA-zoneout
eval/GTA mode — all on the Pallas TPU interpreter (CPU), on a shrunken config
(the kernels are dimension-generic; full-size hardware numbers live in
scripts/bench_train_kernel.py).

Randomized paths (prenet dropout / train zoneout) cannot match flax threefry
draws, so exact tests run with dropout/zoneout off; the stochastic path is
asserted finite + sensitive.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.config import get_config
from tacotron2_tpu.models.tacotron.decoder import Decoder
from tacotron2_tpu.ops.tacotron_train_kernel import (
    build_train_fwd, extract_decoder_params_traced, make_fused_teacher_forced)

B, T_IN, M, STEPS = 3, 12, 64, 5


def small_cfg(**tc_over):
    cfg = get_config("default")
    tc = dict(dropout_rate=0.0, zoneout_rate=0.0, decoder_lstm_units=32,
              attention_dim=16, attention_filters=8, attention_kernel=7,
              prenet_layers=(16, 16), outputs_per_step=2)
    tc.update(tc_over)
    cfg = cfg.replace(tacotron=dataclasses.replace(cfg.tacotron, **tc),
                      audio=dataclasses.replace(cfg.audio, num_mels=10))
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.normal(size=(B, T_IN, M)), jnp.float32)
    mask = jnp.arange(T_IN)[None, :] < jnp.asarray([T_IN, 9, 5])[:, None]
    keys = jnp.asarray(
        rng.normal(size=(B, T_IN, cfg.tacotron.attention_dim)) * 0.3,
        jnp.float32)
    r, mels = cfg.tacotron.outputs_per_step, cfg.audio.num_mels
    mel_targets = jnp.asarray(rng.normal(size=(B, STEPS * r, mels)),
                              jnp.float32)
    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2),
                teacher_forcing=jax.random.PRNGKey(3))
    variables = dec.init(rngs, mel_targets, keys, memory, mask, 1.0,
                         train=True, method=Decoder.teacher_forced)
    return cfg, dec, variables["params"], keys, memory, mask, mel_targets


def _scan_out(cfg, dec, params, keys, memory, mask, mel_targets, tfr,
              train=True):
    return dec.apply(
        {"params": params}, mel_targets, keys, memory, mask, tfr, train=train,
        method=Decoder.teacher_forced,
        rngs=dict(dropout=jax.random.PRNGKey(7), zoneout=jax.random.PRNGKey(8),
                  teacher_forcing=jax.random.PRNGKey(9)))


def _teacher(cfg, mel_targets):
    r, mels = cfg.tacotron.outputs_per_step, cfg.audio.num_mels
    tf_inputs = mel_targets[:, r - 1::r, :]
    return jnp.concatenate(
        [jnp.zeros((B, 1, mels)), tf_inputs[:, :-1]], 1).transpose(1, 0, 2)


@pytest.mark.parametrize("tfr", [1.0, 0.0])
def test_fwd_parity(setup, tfr):
    cfg, dec, params, keys, memory, mask, mel_targets = setup
    frames_ref, stops_ref, aligns_ref, _ = _scan_out(
        cfg, dec, params, keys, memory, mask, mel_targets, tfr)
    fwd = build_train_fwd(cfg, B, T_IN, STEPS, M, weight_dtype=jnp.float32,
                          interpret=True)
    coins = jnp.full((STEPS,), int(tfr), jnp.int32)
    res = jax.jit(fwd)(extract_decoder_params_traced({"decoder": params}, cfg),
                       keys, memory, mask, _teacher(cfg, mel_targets), coins,
                       jnp.asarray(3, jnp.int32))
    r, mels = cfg.tacotron.outputs_per_step, cfg.audio.num_mels
    frames = (res["out"][:, :, :r * mels].transpose(1, 0, 2)
              .reshape(B, STEPS * r, mels))
    stops = (res["out"][:, :, r * mels:r * mels + r].transpose(1, 0, 2)
             .reshape(B, STEPS * r))
    aligns = res["align"][:, :, :T_IN].transpose(1, 2, 0)
    np.testing.assert_allclose(np.asarray(frames), np.asarray(frames_ref),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(stops), np.asarray(stops_ref),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(aligns), np.asarray(aligns_ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("tfr", [1.0, 0.0])
def test_grad_parity(setup, tfr):
    """custom_vjp gradients (BPTT kernel + weight-grad GEMMs) match jax.grad
    of the scan for every decoder parameter, the keys, and the memory."""
    cfg, dec, params, keys, memory, mask, mel_targets = setup
    rng = np.random.default_rng(1)
    r, mels = cfg.tacotron.outputs_per_step, cfg.audio.num_mels
    wf = jnp.asarray(rng.normal(size=(B, STEPS * r, mels)), jnp.float32)
    ws = jnp.asarray(rng.normal(size=(B, STEPS * r)), jnp.float32)
    wa = jnp.asarray(rng.normal(size=(B, T_IN, STEPS)), jnp.float32) * 0.1
    coins = jnp.full((STEPS,), int(tfr), jnp.int32)
    fused = make_fused_teacher_forced(cfg, B, T_IN, STEPS, M,
                                      weight_dtype=jnp.float32,
                                      interpret=True)
    teacher = _teacher(cfg, mel_targets)

    def loss_scan(p, k, m):
        f, s, a, _ = _scan_out(cfg, dec, p, k, m, mask, mel_targets, tfr)
        return jnp.sum(f * wf) + jnp.sum(s * ws) + jnp.sum(a * wa)

    def loss_fused(p, k, m):
        dp = extract_decoder_params_traced({"decoder": p}, cfg)
        f, s, a = fused(dp, k, m, mask, teacher, coins,
                        jnp.asarray(3, jnp.int32))
        return jnp.sum(f * wf) + jnp.sum(s * ws) + jnp.sum(a * wa)

    l1 = float(loss_scan(params, keys, memory))
    l2 = float(jax.jit(loss_fused)(params, keys, memory))
    assert abs(l1 - l2) < 1e-4 * max(abs(l1), 1.0)

    g1 = jax.jit(jax.grad(loss_scan, argnums=(0, 1, 2)))(params, keys, memory)
    g2 = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(params, keys, memory)
    flat2 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_flatten_with_path(g2[0])[0]}
    for k, v1 in jax.tree_util.tree_flatten_with_path(g1[0])[0]:
        v2 = flat2[jax.tree_util.keystr(k)]
        scale = max(float(jnp.max(jnp.abs(v1))), 1e-6)
        err = float(jnp.max(jnp.abs(v1 - v2))) / scale
        assert err < 1e-3, (jax.tree_util.keystr(k), err)
    for v1, v2 in [(g1[1], g2[1]), (g1[2], g2[2])]:
        scale = max(float(jnp.max(jnp.abs(v1))), 1e-6)
        assert float(jnp.max(jnp.abs(v1 - v2))) / scale < 1e-3


def test_eval_ema_zoneout_parity(setup):
    """train_zoneout=False (GTA / teacher-forced eval) matches the scan with
    train=False zoneout (EMA mix), dropout off."""
    cfg, dec, params, keys, memory, mask, mel_targets = setup
    cfg_z = small_cfg(zoneout_rate=0.1)
    dec_z = Decoder(config=cfg_z)
    frames_ref, stops_ref, _, _ = _scan_out(
        cfg_z, dec_z, params, keys, memory, mask, mel_targets, 1.0,
        train=False)
    fwd = build_train_fwd(cfg_z, B, T_IN, STEPS, M, weight_dtype=jnp.float32,
                          train_zoneout=False, interpret=True)
    res = jax.jit(fwd)(
        extract_decoder_params_traced({"decoder": params}, cfg_z),
        keys, memory, mask, _teacher(cfg_z, mel_targets),
        jnp.ones((STEPS,), jnp.int32), jnp.asarray(3, jnp.int32))
    r, mels = cfg_z.tacotron.outputs_per_step, cfg_z.audio.num_mels
    frames = (res["out"][:, :, :r * mels].transpose(1, 0, 2)
              .reshape(B, STEPS * r, mels))
    np.testing.assert_allclose(np.asarray(frames), np.asarray(frames_ref),
                               rtol=0, atol=3e-5)


def test_stochastic_paths_finite(setup):
    """Dropout + train zoneout active: outputs finite and rng-sensitive."""
    cfg0, dec, params, keys, memory, mask, mel_targets = setup
    cfg = small_cfg(dropout_rate=0.5, zoneout_rate=0.1)
    fwd = build_train_fwd(cfg, B, T_IN, STEPS, M, weight_dtype=jnp.float32,
                          interpret=True)
    dp = extract_decoder_params_traced({"decoder": params}, cfg)
    coins = jnp.ones((STEPS,), jnp.int32)
    teacher = _teacher(cfg, mel_targets)
    r1 = jax.jit(fwd)(dp, keys, memory, mask, teacher, coins,
                      jnp.asarray(3, jnp.int32))
    assert np.isfinite(np.asarray(r1["out"])).all()
    # grads through the stochastic path are finite too
    fused = make_fused_teacher_forced(cfg, B, T_IN, STEPS, M,
                                      weight_dtype=jnp.float32,
                                      interpret=True)

    def loss(p):
        f, s, a = fused(extract_decoder_params_traced({"decoder": p}, cfg),
                        keys, memory, mask, teacher, coins,
                        jnp.asarray(3, jnp.int32))
        return jnp.sum(f * f) + jnp.sum(s)

    g = jax.jit(jax.grad(loss))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_trainer_integration():
    """use_fused_train_decoder=True inside the FULL train step reproduces the
    scan path's loss and grad norm (dropout/zoneout off for determinism)."""
    import sys
    sys.path.insert(0, "tests")
    from test_tacotron_model import make_batch, tiny_config

    from tacotron2_tpu.train.tacotron_step import TacotronTrainer

    batch = make_batch(B=2, T_in=10, T_out=12)
    results = {}
    for fused in (True, False):
        cfg = tiny_config()
        cfg = cfg.replace(tacotron=dataclasses.replace(
            cfg.tacotron, prenet_layers=(16, 16), dropout_rate=0.0,
            zoneout_rate=0.0, use_fused_train_decoder=fused,
            fused_train_dtype="float32"))
        trainer = TacotronTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        _, m = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(1))
        results[fused] = (float(m["loss"]), float(m["grad_norm"]))
    (lf, gf), (ls, gs) = results[True], results[False]
    assert abs(lf - ls) < 1e-4 * max(1.0, abs(ls)), results
    assert abs(gf - gs) < 2e-3 * max(1.0, abs(gs)), results


@pytest.mark.slow
def test_sharded_fused_grad_parity():
    """Fused kernel under shard_map on a 2-device data mesh: forward and
    gradients match the single-device kernel (the transpose-psum of the
    replicated params IS the gradient all-reduce). This is the code path a
    real multi-chip TPU takes (decoder.py:_teacher_forced_fused); here the
    interpret-mode kernel runs under shard_map on the CPU virtual mesh."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    cfg = small_cfg()
    Bs, ndata = 4, 2
    fn_shard = make_fused_teacher_forced(cfg, Bs // ndata, T_IN, STEPS, M,
                                         weight_dtype=jnp.float32,
                                         interpret=True)
    fn_full = make_fused_teacher_forced(cfg, Bs, T_IN, STEPS, M,
                                        weight_dtype=jnp.float32,
                                        interpret=True)

    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2))
    variables = dec.init(rngs, 2, 1,
                         jnp.zeros((2, 8, cfg.tacotron.attention_dim)),
                         jnp.zeros((2, 8, M)), None,
                         method=Decoder.autoregressive)
    dp = extract_decoder_params_traced(
        {"decoder": {"cell": variables["params"]["cell"]}}, cfg)

    rng = np.random.default_rng(0)
    keys = jnp.asarray(
        rng.normal(size=(Bs, T_IN, cfg.tacotron.attention_dim)) * 0.3,
        jnp.float32)
    memory = jnp.asarray(rng.normal(size=(Bs, T_IN, M)) * 0.3, jnp.float32)
    mask = jnp.ones((Bs, T_IN), bool)
    mels = cfg.audio.num_mels
    teacher = jnp.asarray(rng.normal(size=(STEPS, Bs, mels)) * 0.1,
                          jnp.float32)
    coins = jnp.ones((STEPS,), jnp.int32)
    seed = jnp.int32(5)

    mesh = Mesh(np.array(jax.devices()[:ndata]).reshape(ndata), ("data",))

    def body(dp, k, m, msk, te, co, se):
        # dropout/zoneout are off in small_cfg, so the per-shard seed offset
        # (decoder.py adds axis_index) is irrelevant here; keep seeds equal
        # so outputs are bitwise comparable to the single-device kernel
        return fn_shard(dp, k, m, msk, te, co, se)

    sharded = shard_map(body, mesh=mesh,
                        in_specs=(P(), P("data"), P("data"), P("data"),
                                  P(None, "data"), P(), P()),
                        out_specs=(P("data"), P("data"), P("data")),
                        check_vma=False)

    def loss_sharded(dp):
        f, s, _ = sharded(dp, keys, memory, mask, teacher, coins, seed)
        return jnp.sum(f ** 2) + jnp.sum(s ** 2)

    def loss_single(dp):
        f, s, _ = fn_full(dp, keys, memory, mask, teacher, coins, seed)
        return jnp.sum(f ** 2) + jnp.sum(s ** 2)

    f1, s1, a1 = sharded(dp, keys, memory, mask, teacher, coins, seed)
    f2, s2, a2 = fn_full(dp, keys, memory, mask, teacher, coins, seed)
    np.testing.assert_allclose(f1, f2, atol=1e-5)
    np.testing.assert_allclose(s1, s2, atol=1e-5)

    g1 = jax.grad(loss_sharded)(dp)
    g2 = jax.grad(loss_single)(dp)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
