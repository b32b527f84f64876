"""On-chip ablation of the decode kernel's energy/context compute layouts.

VERDICT r4 items 3+7: the blocked long-input kernel regressed from 119.9
(r3) to 150-159 µs/step (r4) after commit 585eb78 swapped the r3 all-matmul
attention forms (block-diagonal vmat energy reduce + [B, B*Tp] block-diag
context) for 3-D forms (VPU lane reduce + batched dot_general). The swap cut
*accounting* FLOPs but introduced per-step [B, T*A] → [B, T, A] lane-split
relayouts, and a batched matvec has the same MXU pass count as the dense
block-diagonal matmul anyway. This script measures every combination on the
real chip so the default can be set by data:

  energy_mode:  vpu (r4) | vmat (r3) | dot (thin [A,8] matmul)
  context_mode: batched (r4) | blockdiag (r3)

for (a) the blocked long-input kernel at the BENCH shape B=32/T_in=400/K=256
and (b) the monolithic kernel at B=64/T_in=256/500 steps (+ B=48 where
B=64 exceeds VMEM with the vmat operand).

Writes artifacts/decode_ablate_r5.json.

Usage: python scripts/bench_decode_ablate_modes.py [--repeats 3]
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache  # noqa: E402


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--blocked-only", action="store_true")
    p.add_argument("--mono-only", action="store_true")
    p.add_argument("--out", default="artifacts/decode_ablate_r5.json")
    args = p.parse_args(argv)

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_tpu.config import get_config
    from tacotron2_tpu.models.tacotron.decoder import Decoder
    from tacotron2_tpu.ops.tacotron_decoder_kernel import (
        build_decoder_block_kernel, build_decoder_kernel,
        extract_decoder_params, init_decoder_state)

    cfg = get_config("default")
    M = 1024
    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2))
    variables = dec.init(rngs, 2, 1, jnp.zeros((2, 8, 128)),
                         jnp.zeros((2, 8, M)), None,
                         method=Decoder.autoregressive)
    dp = extract_decoder_params({"decoder": variables["params"]}, cfg)
    rng = np.random.default_rng(0)

    def sync(x):
        return float(jnp.sum(x[-1, :, 0]))

    def spread(vals):
        ss = sorted(vals)
        return dict(min=round(ss[0], 1), med=round(ss[len(ss) // 2], 1),
                    max=round(ss[-1], 1))

    results = {"device": str(jax.devices()[0])}
    modes = list(itertools.product(["vpu", "vmat", "dot"],
                                   ["batched", "blockdiag"]))

    # ---- blocked long-input kernel: B=32, T_in=400, K=256 ----------------
    if not args.mono_only:
        B, T_in, K = 32, 400, 256
        memory = jnp.asarray(rng.normal(size=(B, T_in, M)) * 0.1, jnp.float32)
        keys = jnp.asarray(rng.normal(size=(B, T_in, 128)) * 0.1, jnp.float32)
        mask = jnp.ones((B, T_in), bool)
        blocked = {}
        for em, cm in modes:
            name = f"{em}+{cm}"
            try:
                run = build_decoder_block_kernel(
                    cfg, B, T_in, K, M, weight_dtype=jnp.bfloat16,
                    energy_mode=em, context_mode=cm)
                st = init_decoder_state(cfg, B, T_in, M)
                f, _, _, st = run(dp, keys, memory, mask, st, 7)
                sync(f)
                vals = []
                for i in range(args.repeats):
                    st = init_decoder_state(cfg, B, T_in, M)
                    t0 = time.perf_counter()
                    for j in range(2):
                        f, _, _, st = run(dp, keys, memory, mask, st,
                                          8 + i * 16 + j)
                    sync(f)
                    vals.append((time.perf_counter() - t0) / (2 * K) * 1e6)
                blocked[name] = spread(vals)
                print(f"[blocked B={B} T={T_in}] {name}: {blocked[name]}",
                      flush=True)
            except Exception as e:
                blocked[name] = dict(error=f"{type(e).__name__}: {e}"[:160])
                print(f"[blocked] {name}: ERROR {blocked[name]}", flush=True)
        results["blocked_B32_T400"] = blocked

    # ---- monolithic kernel: B=64 (and 48), T_in=256, 500 steps -----------
    if not args.blocked_only:
        for B in (64, 48):
            T_in, steps = 256, 500
            memory = jnp.asarray(rng.normal(size=(B, T_in, M)) * 0.1,
                                 jnp.float32)
            keys = jnp.asarray(rng.normal(size=(B, T_in, 128)) * 0.1,
                               jnp.float32)
            mask = jnp.ones((B, T_in), bool)
            mono = {}
            for em, cm in modes:
                name = f"{em}+{cm}"
                try:
                    run = build_decoder_kernel(
                        cfg, B, T_in, steps, M, weight_dtype=jnp.bfloat16,
                        energy_mode=em, context_mode=cm)
                    f, _, _ = run(dp, keys, memory, mask, 7)
                    sync(f)
                    vals = []
                    for i in range(args.repeats):
                        t0 = time.perf_counter()
                        f, _, _ = run(dp, keys, memory, mask, 8 + i)
                        sync(f)
                        vals.append((time.perf_counter() - t0) / steps * 1e6)
                    mono[name] = spread(vals)
                    print(f"[mono B={B} T={T_in}] {name}: {mono[name]}",
                          flush=True)
                except Exception as e:
                    mono[name] = dict(error=f"{type(e).__name__}: {e}"[:160])
                    print(f"[mono B={B}] {name}: ERROR {mono[name]}",
                          flush=True)
            results[f"mono_B{B}_T256"] = mono
            if B == 64 and all("error" not in v for v in mono.values()):
                break  # B=48 fallback only needed if B=64 fails somewhere

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
