"""Capture a jax.profiler device trace of the Tacotron train step and print
the top ops by self time (parsed from the xplane via tensorboard-plugin-profile).

Usage: python scripts/profile_trace.py [--batch 96] [--t-out 400] [--top 40]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_train import _enable_compile_cache  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--t-out", type=int, default=400)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default="/tmp/taco_trace")
    args = p.parse_args(argv)

    _enable_compile_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.train.tacotron_step import TacotronTrainer

    cfg = Config()
    cfg = cfg.replace(tacotron=dataclasses.replace(
        cfg.tacotron, compute_dtype="bfloat16", use_fused_train_decoder=True))

    B, T_out = args.batch, args.t_out
    T_in = max(8, T_out // 8)
    rng = np.random.default_rng(0)
    batch = dict(
        inputs=jnp.asarray(rng.integers(2, 60, (B, T_in)), jnp.int32),
        input_lengths=jnp.full((B,), T_in, jnp.int32),
        mel_targets=jnp.asarray(
            rng.uniform(-4, 4, (B, T_out, cfg.audio.num_mels)), jnp.float32),
        stop_token_targets=jnp.zeros((B, T_out), jnp.float32),
        targets_lengths=jnp.full((B,), T_out, jnp.int32),
        ref_mel_emt=jnp.asarray(
            rng.uniform(-4, 4, (B, 128, cfg.audio.num_mels)), jnp.float32),
        ref_mel_spk=jnp.asarray(
            rng.uniform(-4, 4, (B, 128, cfg.audio.num_mels)), jnp.float32),
        emt_labels=jnp.zeros((B,), jnp.int32),
        spk_labels=jnp.zeros((B,), jnp.int32))

    trainer = TacotronTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.train_step)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    float(m["loss"])  # compile + sync

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(2 + i))
        float(m["loss"])

    # ---- parse the xplane: top ops by self time
    xs = sorted(glob.glob(os.path.join(
        args.logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not xs:
        print("no xplane captured"); return
    xplane = xs[-1]
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    params = {"tqx": "out:csv;"}
    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats^", params)
    txt = data.decode() if isinstance(data, bytes) else str(data)
    lines = txt.splitlines()
    print(lines[0])
    for ln in lines[1:args.top + 1]:
        print(ln)


if __name__ == "__main__":
    main()
