"""WaveNet tensor parallelism: sharded forward/train ≡ replicated numerics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tacotron2_tpu.config import Config, MeshConfig
from tacotron2_tpu.models.wavenet.model import WaveNet, compute_wavenet_loss
from tacotron2_tpu.parallel.mesh import make_mesh
from tacotron2_tpu.parallel.partition import (shard_wavenet_state,
                                              wavenet_param_shardings)
from tacotron2_tpu.train.wavenet_step import WaveNetTrainer


def mp_config(**kw) -> Config:
    cfg = Config()
    wn = dict(layers=4, stacks=2, residual_channels=16, gate_channels=32,
              skip_out_channels=16, kernel_size=3, cin_channels=10,
              upsample_scales=(2, 2), out_channels=2, dropout=0.0)
    wn.update(kw)
    return cfg.replace(
        wavenet=dataclasses.replace(cfg.wavenet, **wn),
        audio=dataclasses.replace(cfg.audio, num_mels=10, hop_size=4),
        train=dataclasses.replace(cfg.train, wavenet_batch_size=4))


def make_batch(cfg, B=4, T_mel=8):
    hop = 4
    T = T_mel * hop
    rng = np.random.default_rng(0)
    return dict(
        x=jnp.asarray(rng.uniform(-0.5, 0.5, (B, T, 1)), jnp.float32),
        y=jnp.asarray(rng.uniform(-0.5, 0.5, (B, T)), jnp.float32),
        c=jnp.asarray(rng.uniform(0, 1, (B, T_mel, cfg.wavenet.cin_channels)),
                      jnp.float32),
        input_lengths=jnp.full((B,), T, jnp.int32))


def test_param_sharding_layout():
    cfg = mp_config()
    mesh = make_mesh(MeshConfig(data_parallelism=4, model_parallelism=2))
    model = WaveNet(config=cfg)
    batch = make_batch(cfg)
    variables = model.init(dict(params=jax.random.PRNGKey(0),
                                dropout=jax.random.PRNGKey(1)),
                           batch["x"], batch["c"], train=False)
    sh = wavenet_param_shardings(variables["params"], mesh)
    blk = sh["residual_block_0"]
    assert blk["causal_conv"]["Conv_0"]["kernel"].spec == P(None, None, "model")
    assert blk["cin_conv"]["Dense_0"]["kernel"].spec == P(None, "model")
    assert blk["skip_conv"]["Dense_0"]["kernel"].spec == P("model", None)
    assert blk["out_conv"]["Dense_0"]["kernel"].spec == P("model", None)
    assert sh["input_convolution"]["Dense_0"]["kernel"].spec == P()
    assert sh["upsample_network"]["up_0"]["Conv_0"]["kernel"].spec == P()


def test_sharded_forward_matches_replicated():
    cfg = mp_config()
    mesh = make_mesh(MeshConfig(data_parallelism=4, model_parallelism=2))
    model = WaveNet(config=cfg)
    batch = make_batch(cfg)
    variables = model.init(dict(params=jax.random.PRNGKey(0),
                                dropout=jax.random.PRNGKey(1)),
                           batch["x"], batch["c"], train=False)

    ref = model.apply(variables, batch["x"], batch["c"], train=False).y_hat

    with mesh:
        sharded_params = jax.device_put(
            variables["params"], wavenet_param_shardings(variables["params"], mesh))
        data_sh = NamedSharding(mesh, P("data"))
        x = jax.device_put(batch["x"], NamedSharding(mesh, P("data", None, None)))
        c = jax.device_put(batch["c"], NamedSharding(mesh, P("data", None, None)))

        @jax.jit
        def fwd(p, x, c):
            return model.apply({"params": p}, x, c, train=False).y_hat

        out = fwd(sharded_params, x, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_sharded_train_step_matches_replicated():
    cfg = mp_config()
    mesh = make_mesh(MeshConfig(data_parallelism=4, model_parallelism=2))
    trainer = WaveNetTrainer(cfg)
    batch = make_batch(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    step = jax.jit(trainer.train_step)
    ref_state, ref_metrics = step(state, batch, jax.random.PRNGKey(1))

    with mesh:
        st = shard_wavenet_state(state, mesh)
        sb = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(
                mesh, P(*(["data"] + [None] * (a.ndim - 1))))), batch)
        new_state, metrics = step(st, sb, jax.random.PRNGKey(1))
        # losses identical and parameters updated identically
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(ref_metrics["loss"]), rtol=1e-5)
        k_sharded = np.asarray(jax.device_get(
            new_state.params["residual_block_0"]["skip_conv"]["Dense_0"]["kernel"]))
    k_ref = np.asarray(
        ref_state.params["residual_block_0"]["skip_conv"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(k_sharded, k_ref, atol=1e-5, rtol=1e-4)


def test_sharded_sampler_matches_single_device():
    """Batch-sharded fused sampler over the 8-device CPU mesh == unsharded."""
    import dataclasses

    from tacotron2_tpu.config import Config, MeshConfig
    from tacotron2_tpu.models.wavenet.model import WaveNet
    from tacotron2_tpu.ops.wavenet_kernel import (fused_incremental_sample,
                                                  sharded_incremental_sample)
    from tacotron2_tpu.parallel.mesh import make_mesh

    cfg = Config()
    cfg = cfg.replace(
        wavenet=dataclasses.replace(
            cfg.wavenet, layers=4, stacks=2, residual_channels=128,
            gate_channels=256, skip_out_channels=128, upsample_scales=(2, 2),
            cin_channels=80),
        audio=dataclasses.replace(cfg.audio, num_mels=80))
    B, frames = 8, 8
    T = frames * 4
    model = WaveNet(config=cfg)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(0, 1, (B, frames, 80)), jnp.float32)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
        jnp.zeros((B, T, 1)), c, train=False)
    params = variables["params"]
    fc2 = params["final_convolution_2"]["Dense_0"]
    fc2["bias"] = fc2["bias"].at[1].set(-30.0)  # suppress sampling noise
    fc2["kernel"] = fc2["kernel"].at[:, 1].set(0.0)
    c_up = model.apply({"params": params}, c, method=WaveNet.upsample)

    mesh = make_mesh(MeshConfig(), jax.devices()[:4])  # 4-way data axis
    s_sharded = sharded_incremental_sample(params, cfg, c_up, seed=5,
                                           mesh=mesh, chunk=16, interpret=True)
    assert s_sharded.shape == (B, T)
    # per-shard generation matches running that shard's batch alone (noise
    # suppressed -> deterministic given conditioning)
    s_local = fused_incremental_sample(params, cfg, c_up[:2], seed=5,
                                       chunk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(s_sharded[:2]), np.asarray(s_local),
                               atol=2e-4, rtol=1e-3)


def test_maybe_initialize_distributed_env_paths(monkeypatch):
    """Single code path for 1-host and N-host starts (mesh.py): explicit
    env -> initialize(addr,...); pod markers -> argless initialize();
    neither -> no-op."""
    import tacotron2_tpu.parallel.mesh as mesh_mod

    calls = []

    def fake_init(**kwargs):
        calls.append(kwargs)

    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize", fake_init)
    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "CLOUD_TPU_TASK_ID", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
                "TPU_WORKER_ID", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)

    # no env: no-op
    assert mesh_mod.maybe_initialize_distributed() is False
    assert calls == []

    # explicit coordinator env
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert mesh_mod.maybe_initialize_distributed() is True
    assert calls[-1] == dict(coordinator_address="10.0.0.1:1234",
                             num_processes=4, process_id=2)

    # pod autodetect markers: argument-less initialize
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    monkeypatch.delenv("JAX_NUM_PROCESSES")
    monkeypatch.delenv("JAX_PROCESS_ID")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    assert mesh_mod.maybe_initialize_distributed() is True
    assert calls[-1] == {}


def test_current_mesh_and_axis_inside_jit():
    """Centralized mesh detection (ADVICE r3): must work during jit tracing
    (jax.sharding.get_mesh raises there — regression caught by the r4
    multiprocess dryrun) and under the legacy `with mesh:` context."""
    from tacotron2_tpu.parallel.mesh import current_mesh_and_axis

    assert current_mesh_and_axis("data") == (None, 1)

    mesh = make_mesh(MeshConfig(), jax.devices()[:4])
    seen = {}

    @jax.jit
    def fn(x):
        m, n = current_mesh_and_axis("data")
        seen["n"] = n
        seen["mesh"] = m
        return x + 1

    with mesh:
        m, n = current_mesh_and_axis("data")
        assert n == 4 and m is mesh
        fn(jnp.zeros((4,)))
    assert seen["n"] == 4
