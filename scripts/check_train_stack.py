"""Hardware validation of the fused WaveNet train-stack kernels
(ops/wavenet_train_kernel.py) — the checks interpret mode cannot do:

1. loss/grad parity vs the XLA stack on the real chip (dropout off);
2. dropout-seed consistency: with dropout ON, the directional derivative
   (L(p+eps*v) - L(p-eps*v)) / 2eps must match <grad, v> under a FIXED rng —
   this fails if the backward pass regenerates different masks than forward;
3. train-step throughput with wavenet.use_fused_train_stack on vs off.

Usage: python scripts/check_train_stack.py [--skip-parity] [--steps 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_train import _enable_compile_cache, bench_wavenet_train  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--skip-parity", action="store_true")
    p.add_argument("--skip-perf", action="store_true")
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args(argv)

    _enable_compile_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.models.wavenet.model import (WaveNet,
                                                    compute_wavenet_loss)

    assert jax.default_backend() == "tpu", jax.default_backend()

    if not args.skip_parity:
        # small full-channel model so the kernels compile fast but exercise
        # the production lane widths (C=128, G=256)
        cfg0 = Config()
        cfg0 = cfg0.replace(wavenet=dataclasses.replace(
            cfg0.wavenet, layers=4, stacks=2, dropout=0.0))
        B, T_mel = 2, 8
        hop = int(np.prod(cfg0.wavenet.upsample_scales))
        T = T_mel * hop
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-0.5, 0.5, (B, T, 1)), jnp.float32)
        c = jnp.asarray(rng.uniform(0, 1, (B, T_mel, cfg0.audio.num_mels)),
                        jnp.float32)
        y = x

        def make_loss(cfg):
            model = WaveNet(config=cfg)
            variables = model.init(
                dict(params=jax.random.PRNGKey(0),
                     dropout=jax.random.PRNGKey(1)), x, c, train=True)

            def loss(params, key):
                out = model.apply({"params": params}, x, c, train=True,
                                  rngs={"dropout": key})
                return compute_wavenet_loss(
                    out, y, jnp.full((B,), T, jnp.int32), cfg)["loss"]
            return variables["params"], loss

        params, loss_xla = make_loss(cfg0)
        cfg1 = cfg0.replace(wavenet=dataclasses.replace(
            cfg0.wavenet, use_fused_train_stack=True))
        _, loss_fused = make_loss(cfg1)

        key = jax.random.PRNGKey(7)
        l0, g0 = jax.jit(jax.value_and_grad(loss_xla))(params, key)
        l1, g1 = jax.jit(jax.value_and_grad(loss_fused))(params, key)
        dl = abs(float(l0) - float(l1))
        gmax = max(float(jnp.max(jnp.abs(a - b)))
                   for a, b in zip(jax.tree_util.tree_leaves(g0),
                                   jax.tree_util.tree_leaves(g1)))
        print(json.dumps({"check": "parity_drop0", "dloss": dl,
                          "max_dgrad": gmax, "ok": dl < 1e-4 and gmax < 1e-2}),
              flush=True)

        # dropout-seed consistency: directional derivative vs <grad, v>
        # under a fixed rng, at dropout=0.5 — if the backward kernel
        # regenerated DIFFERENT masks than forward, half the activations'
        # grad paths would be wrong (~50% error); finite-difference
        # curvature noise stays ~5%. Threshold 20% separates them cleanly.
        cfg2 = cfg1.replace(wavenet=dataclasses.replace(
            cfg1.wavenet, dropout=0.5))
        params2, loss_d = make_loss(cfg2)
        vg = jax.jit(jax.value_and_grad(loss_d))
        l_a, g = vg(params2, key)
        l_b, _ = vg(params2, key)
        det_ok = float(l_a) == float(l_b)  # same rng -> bitwise same loss
        vdir = jax.tree_util.tree_map(jnp.ones_like, params2)
        gdot = sum(float(jnp.sum(a * b))
                   for a, b in zip(jax.tree_util.tree_leaves(g),
                                   jax.tree_util.tree_leaves(vdir)))
        eps = 1e-3
        lp = jax.jit(loss_d)(jax.tree_util.tree_map(
            lambda p, v: p + eps * v, params2, vdir), key)
        lm = jax.jit(loss_d)(jax.tree_util.tree_map(
            lambda p, v: p - eps * v, params2, vdir), key)
        fd = (float(lp) - float(lm)) / (2 * eps)
        rel = abs(fd - gdot) / max(abs(fd), 1e-6)
        print(json.dumps({"check": "dropout_directional", "fd": fd,
                          "grad_dot": gdot, "rel_err": rel,
                          "deterministic": det_ok,
                          "ok": bool(rel < 0.2 and det_ok)}), flush=True)

    if not args.skip_perf:
        base = Config()
        base = base.replace(wavenet=dataclasses.replace(
            base.wavenet, compute_dtype="bfloat16"))
        fused = base.replace(wavenet=dataclasses.replace(
            base.wavenet, use_fused_train_stack=True))
        for name, cfg in (("fused", fused), ("xla", base)):
            r = bench_wavenet_train(cfg, args.batch, args.steps)
            print(json.dumps(dict(name=name, **{
                k: round(v, 2) if isinstance(v, float) else v
                for k, v in r.items()})), flush=True)


if __name__ == "__main__":
    main()
