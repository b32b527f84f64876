"""Measured counterfactual: batch-sharded vs channel-sharded (TP) sampler.

The serving design (DESIGN §3, `sharded_incremental_sample`,
`TextToWavProgram.sharded_call`) batch-shards autoregressive sampling and
claims model-sharding would put a collective inside every sample step. The
BASELINE story for the reference is the opposite ("decoder/attention state
exchanged via collectives"). This script turns that design claim into a
measurement (VERDICT r4 item 6 / Missing #2).

It times the WaveNet sampler's per-step recurrence at true sampler
dimensions (L dilated layers; per layer: gate matmul [B,2R]x[2R,2G] →
GLU → residual matmul [B,G]x[G,R] + skip matmul [B,G]x[G,S]) under
`shard_map` on a virtual CPU mesh in three configurations:

  batch_sharded    B split over n devices, weights replicated, ZERO
                   per-step collectives (the shipped design);
  channel_sharded  gate columns / residual+skip rows split over n devices —
                   the residual feed of layer l+1 needs the FULL [B, R]
                   residual, so each layer ends in a psum([B, R]); skips
                   stay partial until one psum at step end (L+1 psums/step);
  channel_nocomm   the same channel split with the psums DELETED (wrong
                   math — isolates the collective cost from the
                   small-matmul inefficiency).

CPU-mesh numbers are RELATIVE (no real ICI): the collective here is a
memory-bus copy, i.e. a LOWER bound on its real cost. The analytic overlay
for v5e: ~1-3 µs ICI latency per psum × L=20 layers ≈ 20-60 µs added to a
measured 12-62 µs/step (BENCH r3/r4) — a 1.3-5x slowdown before counting
the lost weight-residency (TP re-splits weights that already fit in VMEM).
Batch sharding loses nothing: sampling has no cross-stream dependency.

Writes artifacts/tp_sampler_counterfactual.json and prints the table.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       PALLAS_AXON_POOL_IPS= python scripts/bench_tp_sampler.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8, help="global streams")
    p.add_argument("--layers", type=int, default=20)
    p.add_argument("--residual", type=int, default=128)
    p.add_argument("--gate", type=int, default=128,
                   help="per-direction gate width (tanh/sigmoid halves)")
    p.add_argument("--skip", type=int, default=128)
    p.add_argument("--steps", type=int, default=512, help="scan length")
    p.add_argument("--devices", type=int, default=4)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--out", default="artifacts/tp_sampler_counterfactual.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    jax.config.update("jax_platforms", "cpu")
    n = args.devices
    devs = jax.devices("cpu")[:n]
    assert len(devs) == n, f"need {n} virtual devices, have {len(devs)}"
    mesh = Mesh(np.array(devs).reshape(n), ("x",))

    B, L, R, G, S = args.batch, args.layers, args.residual, args.gate, \
        args.skip
    rng = np.random.default_rng(0)

    def make_weights(g_local, r_out_full=True):
        """Per-layer weights at a given local gate width."""
        ws = []
        for _ in range(L):
            ws.append((
                jnp.asarray(rng.normal(0, 0.05, (2 * R, 2 * g_local)),
                            jnp.float32),   # gate (current + delayed input)
                jnp.asarray(rng.normal(0, 0.05, (g_local, R)), jnp.float32),
                jnp.asarray(rng.normal(0, 0.05, (g_local, S)), jnp.float32),
            ))
        return ws

    def step_body(ws, x, psum_residual, psum_skip):
        """One sample step over the layer stack. x: [b, R]."""
        skip = jnp.zeros((x.shape[0], S), jnp.float32)
        for (wg, wr, wsk) in ws:
            z = jnp.concatenate([x, x], axis=-1) @ wg     # [b, 2g]
            a = jnp.tanh(z[:, :z.shape[1] // 2]) * \
                jax.nn.sigmoid(z[:, z.shape[1] // 2:])    # [b, g]
            dx = a @ wr                                    # [b, R] (partial)
            if psum_residual:
                dx = jax.lax.psum(dx, "x")
            x = x + dx
            skip = skip + a @ wsk
        if psum_skip:
            skip = jax.lax.psum(skip, "x")
        return x, skip

    def make_scan(ws, psum_residual, psum_skip):
        def scan_fn(x0):
            def body(x, _):
                x, skip = step_body(ws, x, psum_residual, psum_skip)
                return x, skip[:, 0]
            return jax.lax.scan(body, x0, None, length=args.steps)
        return scan_fn

    results = {}

    def timeit(fn, x0):
        out = fn(x0)
        jax.block_until_ready(out)
        vals = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(x0)
            jax.block_until_ready(out)
            vals.append((time.perf_counter() - t0) / args.steps)
        ss = sorted(vals)
        med = ss[len(ss) // 2]
        return dict(us_per_step=round(med * 1e6, 2),
                    us_spread=[round(ss[0] * 1e6, 2),
                               round(ss[-1] * 1e6, 2)])

    # --- batch-sharded: B/n rows per device, full weights, no comms ------
    ws_full = make_weights(G)
    scan_local = make_scan(ws_full, psum_residual=False, psum_skip=False)
    fn_batch = jax.jit(shard_map(
        scan_local, mesh=mesh, in_specs=(P("x"),), out_specs=(P("x"), P("x")),
        check_rep=False))
    x0 = jnp.asarray(rng.normal(0, 0.1, (B, R)), jnp.float32)
    results["batch_sharded"] = timeit(fn_batch, x0)
    results["batch_sharded"].update(local_batch=B // n, collectives_per_step=0)

    # --- channel-sharded: full B per device, G/n gate channels, psums ----
    ws_tp = make_weights(G // n)
    for name, pr, pk, note in [
            ("channel_sharded", True, True,
             f"{L} residual psums + 1 skip psum per step"),
            ("channel_nocomm", False, False,
             "psums deleted (wrong math; isolates collective cost)")]:
        scan_tp = make_scan(ws_tp, psum_residual=pr, psum_skip=pk)
        fn_tp = jax.jit(shard_map(
            scan_tp, mesh=mesh, in_specs=(P(),), out_specs=(P(), P()),
            check_rep=False))
        results[name] = timeit(fn_tp, x0)
        results[name].update(local_batch=B, local_gate=G // n, note=note)

    results["channel_sharded"]["collectives_per_step"] = L + 1

    bs = results["batch_sharded"]["us_per_step"]
    cs = results["channel_sharded"]["us_per_step"]
    nc = results["channel_nocomm"]["us_per_step"]
    report = dict(
        config=dict(B=B, L=L, R=R, G=G, S=S, steps=args.steps, devices=n,
                    backend="virtual CPU mesh (relative numbers; a CPU "
                            "psum is a memory copy — a LOWER bound on ICI)"),
        results=results,
        tp_vs_batch_slowdown=round(cs / bs, 2),
        collective_share_of_tp_step=round((cs - nc) / cs, 3),
        analytic_v5e=dict(
            psum_latency_us=[1, 3], psums_per_step=L + 1,
            added_us_per_step=[L + 1, 3 * (L + 1)],
            measured_fused_step_us=[12.2, 62.5],
            note="20+ ICI round-trips inside a 12-62 us step dominate it; "
                 "batch sharding has no cross-stream dependency to pay for"),
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
