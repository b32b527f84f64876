"""Fused WaveNet train-stack kernel (ops/wavenet_train_kernel.py) parity vs
the flax ResidualConv1DGLU stack — forward values and gradients (params, x0,
cond) through the custom VJP. Interpret mode on CPU; dropout off (the
interpret-mode PRNG is not seed-faithful — hardware dropout consistency is
asserted by scripts/check_train_stack.py on the TPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.config import Config
from tacotron2_tpu.models.wavenet.modules import ResidualConv1DGLU
from tacotron2_tpu.ops.wavenet_train_kernel import (
    StackParams, extract_stack_params, fused_stack_apply, stack_supported)


def tiny_cfg(**kw) -> Config:
    cfg = Config()
    wn = dict(layers=4, stacks=2, residual_channels=8, gate_channels=16,
              skip_out_channels=8, kernel_size=3, cin_channels=10,
              dropout=0.0)
    wn.update(kw)
    return cfg.replace(wavenet=dataclasses.replace(cfg.wavenet, **wn))


def make_blocks(cfg):
    wn = cfg.wavenet
    return [ResidualConv1DGLU(
        residual_channels=wn.residual_channels,
        gate_channels=wn.gate_channels, kernel_size=wn.kernel_size,
        skip_out_channels=wn.skip_out_channels, dilation=d,
        dropout=wn.dropout, cin_channels=wn.cin_channels,
        gin_channels=wn.gin_channels, use_bias=wn.use_bias,
        residual_legacy=wn.residual_legacy,
        weight_norm=wn.weight_normalization, init_scale=wn.init_scale)
        for d in wn.dilations]


def init_layer_params(cfg, B, T, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, cfg.wavenet.residual_channels))
                    * 0.3, jnp.float32)
    c = jnp.asarray(rng.normal(size=(B, T, cfg.wavenet.cin_channels)) * 0.3,
                    jnp.float32)
    params = []
    for i, block in enumerate(make_blocks(cfg)):
        v = block.init(dict(params=jax.random.PRNGKey(10 + i),
                            dropout=jax.random.PRNGKey(1)),
                       x, c, None, train=False)
        params.append(v["params"])
    return params, x, c


def ref_stack(cfg, layer_params, x0, c_up):
    """model.body's residual loop (models/wavenet/model.py:113-127) on the
    same flax blocks — the XLA oracle."""
    blocks = make_blocks(cfg)
    x, skips = x0, None
    for block, p in zip(blocks, layer_params):
        x, h = block.apply({"params": p}, x, c_up, None, train=False)
        if skips is None:
            skips = h
        else:
            skips = skips + h
            if cfg.wavenet.legacy:
                skips = skips * np.sqrt(0.5)
    return skips


@pytest.mark.parametrize("T,Tt", [(12, 4), (10, 4)])
def test_fused_stack_fwd_parity(T, Tt):
    cfg = tiny_cfg()
    assert stack_supported(cfg)
    params, x0, c = init_layer_params(cfg, B=2, T=T)
    ref = ref_stack(cfg, params, x0, c)
    sp = extract_stack_params(params, cfg)
    out = fused_stack_apply(cfg, sp, x0, c, 3, Tt=Tt, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_fused_stack_fwd_parity_weightnorm():
    cfg = tiny_cfg(weight_normalization=True)
    params, x0, c = init_layer_params(cfg, B=2, T=8)
    ref = ref_stack(cfg, params, x0, c)
    sp = extract_stack_params(params, cfg)
    out = fused_stack_apply(cfg, sp, x0, c, 3, Tt=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_fused_stack_grad_parity():
    """d(loss)/d(layer_params, x0, c) through extract_stack_params + the
    custom VJP matches jax.grad of the flax stack."""
    cfg = tiny_cfg()
    params, x0, c = init_layer_params(cfg, B=2, T=12)
    tgt = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, 12, cfg.wavenet.skip_out_channels)), jnp.float32)

    def loss_ref(params, x0, c):
        return jnp.mean((ref_stack(cfg, params, x0, c) - tgt) ** 2)

    def loss_fused(params, x0, c):
        sp = extract_stack_params(params, cfg)
        out = fused_stack_apply(cfg, sp, x0, c, 3, Tt=4, interpret=True)
        return jnp.mean((out - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x0, c)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(params, x0, c)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fus)
    assert len(flat_r) == len(flat_f)
    for (path_r, a), (path_f, b) in zip(flat_r, flat_f):
        assert path_r == path_f
        # activations are saved bf16 for backward (x, tanh a, sigmoid b) —
        # grads differ from the f32 oracle by the ~0.4% bf16 quantization
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-2, atol=5e-5,
            err_msg=str(path_r))


def test_fused_stack_grad_parity_weightnorm_nonlegacy():
    cfg = tiny_cfg(weight_normalization=True)
    cfg = cfg.replace(wavenet=dataclasses.replace(
        cfg.wavenet, legacy=False, residual_legacy=False))
    params, x0, c = init_layer_params(cfg, B=1, T=8)

    def loss_ref(params, x0, c):
        return jnp.sum(ref_stack(cfg, params, x0, c) ** 2)

    def loss_fused(params, x0, c):
        sp = extract_stack_params(params, cfg)
        # f32 saved activations: isolates kernel logic from the production
        # bf16 activation quantization — parity must be tight here
        out = fused_stack_apply(cfg, sp, x0, c, 3, Tt=4,
                                acts_dtype_name="float32", interpret=True)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x0, c)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(params, x0, c)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_fused_stack_sharded_matches_xla_on_mesh():
    """WaveNet.body with use_fused_train_stack under a 4-device CPU mesh
    (the shard_map branch a real multi-chip TPU takes: batch split over
    'data', params replicated, transpose-psum grad all-reduce) matches the
    XLA stack's loss and grads."""
    import os

    from jax.sharding import Mesh

    from tacotron2_tpu.models.wavenet.model import (WaveNet,
                                                    compute_wavenet_loss)

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device virtual CPU mesh (conftest)")
    cfg0 = tiny_cfg()
    cfg0 = cfg0.replace(wavenet=dataclasses.replace(
        cfg0.wavenet, upsample_scales=(2, 2), out_channels=2),
        audio=dataclasses.replace(cfg0.audio,
                                  num_mels=cfg0.wavenet.cin_channels))
    cfg1 = cfg0.replace(wavenet=dataclasses.replace(
        cfg0.wavenet, use_fused_train_stack=True))
    B, T_mel, hop = 4, 6, 4
    T = T_mel * hop
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (B, T, 1)), jnp.float32)
    c = jnp.asarray(rng.uniform(0, 1, (B, T_mel, cfg0.wavenet.cin_channels)),
                    jnp.float32)
    y = x[..., 0]
    lens = jnp.full((B,), T, jnp.int32)

    def make_loss(cfg):
        model = WaveNet(config=cfg)
        variables = model.init(dict(params=jax.random.PRNGKey(0),
                                    dropout=jax.random.PRNGKey(1)),
                               x, c, train=True)

        def loss(params):
            out = model.apply({"params": params}, x, c, train=True,
                              rngs={"dropout": jax.random.PRNGKey(7)})
            return compute_wavenet_loss(out, y, lens, cfg)["loss"]
        return variables["params"], loss

    params, loss_xla = make_loss(cfg0)
    _, loss_fused = make_loss(cfg1)
    l0, g0 = jax.value_and_grad(loss_xla)(params)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    with mesh:
        l1, g1 = jax.jit(jax.value_and_grad(loss_fused))(params)
    assert abs(float(l0) - float(l1)) < 2e-3, (float(l0), float(l1))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-2, atol=3e-3)
