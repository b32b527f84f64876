"""Parallelism layer: device mesh, shardings, collectives.

Replaces the reference's in-graph tower data parallelism + CPU parameter
server (SURVEY.md §2.4) with a jax.sharding Mesh('data', 'model'): batches
sharded over 'data', gradients all-reduced by pjit-inserted psums over ICI,
WaveNet channel sharding over 'model'.
"""

from .mesh import (batch_sharding, make_mesh, replicated_sharding,
                   shard_batch)  # noqa: F401
