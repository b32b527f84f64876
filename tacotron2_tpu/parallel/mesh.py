"""Device mesh construction and canonical shardings.

Design (SURVEY.md §2.4, BASELINE north star): a 2-D logical mesh
('data', 'model') from day one. Default: all devices on 'data' (pure DP, the
reference's only strategy); 'model' > 1 channel-shards the WaveNet residual
stack and GST/encoder matmuls when a single chip's HBM is insufficient.

Multi-host: `maybe_initialize_distributed()` gives one bring-up path for
1-host and N-host starts (explicit env, pod auto-detect, or no-op);
`make_mesh` lays out whatever `jax.devices()` shows into the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up (SURVEY §2.4: replaces the reference's
    single-process CPU-parameter-server story with jax.distributed + pjit
    collectives over ICI/DCN). ONE code path for 1-host and N-host starts:

    - JAX_COORDINATOR_ADDRESS set -> explicit initialize(addr, n, id) from
      JAX_NUM_PROCESSES / JAX_PROCESS_ID (manual clusters);
    - otherwise, on TPU pod environments (GCE metadata / megascale env
      detected by jax's cluster autodetect) -> argument-less
      `jax.distributed.initialize()`;
    - single-host dev boxes / CPU -> no-op.

    Returns True when distributed mode was initialized. Never raises on the
    single-host path: an autodetect failure falls back to local-only.
    """
    import os
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs = dict(coordinator_address=addr)
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kwargs)
        return True
    if not _pod_environment_detected():
        return False
    try:
        jax.distributed.initialize()   # pod auto-detect (TPU metadata)
        return True
    except Exception as e:  # pragma: no cover - depends on pod runtime
        import logging
        logging.getLogger(__name__).warning(
            "jax.distributed auto-init failed (%s); continuing single-host", e)
        return False


def _pod_environment_detected() -> bool:
    """Heuristic for 'this is a TPU pod worker': any of the cluster env
    markers jax's ClusterEnv autodetect itself keys on."""
    import os
    # NOTE: TPU_SKIP_MDS_QUERY deliberately excluded — dev-box TPU tunnel
    # plugins set it while NOT being pod workers
    markers = ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
               "CLOUD_TPU_TASK_ID", "TPU_WORKER_ID")
    return any(os.environ.get(m) for m in markers)


def current_mesh_and_axis(axis: str = "data"):
    """(active mesh, size of `axis` in it) — (None, 1) when no mesh is active.

    THE single mesh-detection point for model code that picks between the
    single-device and shard_map'ed fused-kernel branches (ADVICE r3: this
    lived as three private-API reads scattered through models/). Prefers the
    public `jax.sharding.get_mesh` (reflects `jax.sharding.set_mesh` /
    `use_mesh`); falls back to the legacy `with mesh:` context via
    thread_resources, so a JAX upgrade that drops the private attribute
    breaks HERE, loudly, in one place.
    """
    mesh = None
    get_mesh = getattr(jax.sharding, "get_mesh", None)
    if get_mesh is not None:
        try:
            m = get_mesh()
        except ValueError:   # raised inside jit tracing; use legacy context
            m = None
        if m is not None and not m.empty and isinstance(m, Mesh):
            mesh = m
    if mesh is None:
        m = jax.interpreters.pxla.thread_resources.env.physical_mesh
        if not m.empty:
            mesh = m
    if mesh is None:
        return None, 1
    n = dict(zip(mesh.axis_names, mesh.shape.values())).get(axis, 1)
    return mesh, n


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
