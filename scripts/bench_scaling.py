"""Data-parallel scaling-efficiency harness (BASELINE ≥90% 1→4-host target).

Measures Tacotron train-step throughput (audio-seconds/s) at increasing
data-parallel widths over the available device mesh, holding per-device batch
constant (weak scaling), and reports efficiency vs linear.

On real multi-chip hardware this measures the ICI all-reduce path; on a dev
box it runs on virtual CPU devices (XLA_FLAGS=--xla_force_host_platform_
device_count=8) to validate the mechanism. Usage:
  python scripts/bench_scaling.py [--widths 1,2,4,8] [--per-device-batch 4]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--widths", default="1,2,4,8")
    p.add_argument("--per-device-batch", type=int, default=4)
    p.add_argument("--t-out", type=int, default=128)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--cpu", action="store_true",
                   help="force 8 virtual CPU devices")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8")
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tacotron2_tpu.config import Config, MeshConfig
    from tacotron2_tpu.parallel.mesh import make_mesh, shard_batch
    from tacotron2_tpu.train.tacotron_step import TacotronTrainer

    # small-but-real model for quick iteration on CPU; full model on TPU
    cfg = Config()
    if jax.default_backend() == "cpu":
        cfg = cfg.replace(tacotron=dataclasses.replace(
            cfg.tacotron, embedding_dim=64, enc_conv_num_layers=2,
            enc_conv_channels=64, encoder_lstm_units=32, attention_dim=32,
            attention_filters=8, attention_kernel=7, prenet_layers=(32, 32),
            decoder_lstm_units=64, postnet_num_layers=2, postnet_channels=64),
            gst=dataclasses.replace(Config().gst, reference_filters=(8, 8),
                                    reference_depth=16, num_gst=4, num_heads=2,
                                    style_embed_depth=16, style_att_dim=16))

    hop, sr = cfg.audio.effective_hop, cfg.audio.sample_rate
    audio_s_per_sample = args.t_out * hop / sr
    devices = jax.devices()
    widths = [int(w) for w in args.widths.split(",") if int(w) <= len(devices)]

    def make_global_batch(B):
        rng = np.random.default_rng(0)
        return dict(
            inputs=jnp.asarray(rng.integers(2, 60, (B, 48)), jnp.int32),
            input_lengths=jnp.full((B,), 48, jnp.int32),
            mel_targets=jnp.asarray(
                rng.uniform(-4, 4, (B, args.t_out, cfg.audio.num_mels)),
                jnp.float32),
            stop_token_targets=jnp.zeros((B, args.t_out), jnp.float32),
            targets_lengths=jnp.full((B,), args.t_out, jnp.int32),
            ref_mel_emt=jnp.asarray(
                rng.uniform(-4, 4, (B, 64, cfg.audio.num_mels)), jnp.float32),
            ref_mel_spk=jnp.asarray(
                rng.uniform(-4, 4, (B, 64, cfg.audio.num_mels)), jnp.float32),
            emt_labels=jnp.zeros((B,), jnp.int32),
            spk_labels=jnp.zeros((B,), jnp.int32))

    if jax.default_backend() == "cpu":
        print("NOTE: virtual CPU devices share physical cores — this run "
              "validates the sharded-step MECHANISM; efficiency numbers are "
              "only meaningful on real multi-chip hardware.")

    results = {}
    for w in widths:
        B = args.per_device_batch * w
        batch = make_global_batch(B)
        trainer = TacotronTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        mesh = make_mesh(MeshConfig(data_parallelism=w, model_parallelism=1),
                         devices[:w])
        step = jax.jit(trainer.train_step)
        with mesh:
            sb = shard_batch(mesh, batch)
            st = jax.device_put(state, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))
            st, m = step(st, sb, jax.random.PRNGKey(1))
            float(m["loss"])  # sync
            t0 = time.perf_counter()
            for i in range(args.steps):
                st, m = step(st, sb, jax.random.PRNGKey(2 + i))
            float(m["loss"])
            dt = (time.perf_counter() - t0) / args.steps
        tput = B * audio_s_per_sample / dt
        results[w] = tput
        eff = tput / (results[widths[0]] * w / widths[0])
        print(f"width={w}: global_batch={B}, {dt*1e3:.1f} ms/step, "
              f"{tput:.1f} audio-s/s, scaling efficiency {eff*100:.1f}%")
    return results


if __name__ == "__main__":
    main()
