"""Parameter partition rules: channel-sharding the WaveNet stack over 'model'.

The BASELINE north-star requirement beyond the reference (SURVEY.md §2.4):
when the WaveNet residual stack exceeds one chip's HBM, tensor-parallel
channel-split the gated convolutions — gate channels column-sharded, skip/out
projections row-sharded so their contributions are partial sums that XLA
reduces with a psum over the 'model' axis (GSPMD inserts the collective from
these PartitionSpecs; no hand-written NCCL analog).

Sharding layout per residual block (modules.ResidualConv1DGLU):
  causal_conv kernel [kw, R, G]  → shard G   (column parallel)
  cin/gin 1x1 kernel [C, G]      → shard G
  gate biases [G]                → shard
  skip_conv kernel [G/2, S]      → shard G/2 (row parallel → psum)
  out_conv  kernel [G/2, R]      → shard G/2 (row parallel → psum)
  skip/out biases, first/final convs, upsamplers → replicated

Note on the tanh·sigmoid gate: `a, b = split(z, 2)` slices the sharded gate
axis; GSPMD re-shards the halves. For an N-way 'model' axis with G/2 divisible
by N this stays a local slice on each device pair-group — validated numerically
by tests/test_model_parallel.py on the virtual mesh.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _wavenet_param_spec(path: str, leaf, model_axis: str) -> P:
    """PartitionSpec for one WaveNet parameter, by name and rank."""
    if "residual_block" in path:
        if "causal_conv" in path:
            if leaf.ndim == 3:            # [kw, R, G]
                return P(None, None, model_axis)
            if leaf.ndim == 2:            # weight-normed v [.., G]? handled below
                return P(None, model_axis)
            return P(model_axis)          # bias [G] / g [G]
        if "cin_conv" in path or "gin_conv" in path:
            if leaf.ndim == 2:            # [C, G]
                return P(None, model_axis)
            return P(model_axis)          # bias/g [G]
        if "skip_conv" in path or "out_conv" in path:
            if leaf.ndim == 2:            # [G/2, S] row-parallel
                return P(model_axis, None)
            return P()                    # bias [S]/[R] replicated (added once)
    return P()


def wavenet_param_shardings(params: Any, mesh: Mesh,
                            model_axis: str = "model") -> Any:
    """Pytree of NamedShardings matching `params` for the WaveNet model."""
    def spec(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        return NamedSharding(mesh, _wavenet_param_spec(name, leaf, model_axis))

    return jax.tree_util.tree_map_with_path(spec, params)


def replicated_shardings(tree: Any, mesh: Mesh) -> Any:
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: repl, tree)


def shard_wavenet_state(state, mesh: Mesh, model_axis: str = "model"):
    """Place a WaveNetTrainState: params/ema/opt model-sharded, step replicated.

    Adam moments share the parameter layout, so the same spec tree applies to
    every params-shaped subtree inside the optimizer state.
    """
    param_sh = wavenet_param_shardings(state.params, mesh, model_axis)

    def place(subtree):
        """device_put a params-shaped pytree with the param shardings."""
        return jax.device_put(subtree, param_sh)

    import optax

    def place_opt(opt_state):
        def visit(node):
            if isinstance(node, optax.ScaleByAdamState):
                return optax.ScaleByAdamState(
                    count=jax.device_put(node.count, NamedSharding(mesh, P())),
                    mu=place(node.mu), nu=place(node.nu))
            return node

        return jax.tree_util.tree_map(
            visit, opt_state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))

    return state._replace(
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        params=place(state.params),
        ema_params=place(state.ema_params),
        opt_state=place_opt(state.opt_state))
