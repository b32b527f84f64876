"""Device mesh construction and canonical shardings.

Design (SURVEY.md §2.4, BASELINE north star): a 2-D logical mesh
('data', 'model') from day one. Default: all devices on 'data' (pure DP, the
reference's only strategy); 'model' > 1 channel-shards the WaveNet residual
stack and GST/encoder matmuls when a single chip's HBM is insufficient.

Multi-host: `jax.distributed.initialize()` is the caller's responsibility
(CLI does it when JAX_COORDINATOR is set); this module only lays out whatever
`jax.devices()` shows into the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up from environment (SURVEY §2.4: replaces the
    reference's single-process CPU-parameter-server story with
    jax.distributed + pjit collectives over ICI/DCN).

    Reads JAX_COORDINATOR_ADDRESS (+ optional JAX_NUM_PROCESSES,
    JAX_PROCESS_ID); on TPU pods these are usually auto-detected and
    `jax.distributed.initialize()` needs no arguments. Returns True when
    distributed mode was initialized.
    """
    import os
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    kwargs = dict(coordinator_address=addr)
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def host_shard_indices(n: int) -> "np.ndarray":
    """This host's deterministic stride-shard of range(n)."""
    return np.arange(jax.process_index(), n, jax.process_count())


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build the ('data', 'model') mesh over available devices."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallelism)
    if n % mp:
        raise ValueError(f"{n} devices not divisible by model_parallelism={mp}")
    dp = cfg.data_parallelism if cfg.data_parallelism > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P(mesh.axis_names[0], *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put every array in a host batch with batch-axis sharding.

    Replaces the reference's py_func split + per-GPU feed (tacotron.py:96-105,
    feeder.py:459-540): one padded global batch, sharded on its leading axis.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch)
