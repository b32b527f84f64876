"""Gradient reversal (identity forward, negated gradient backward).

TPU-native replacement for the reference's FlipGradientBuilder graph-op
override (tacotron/models/modules.py:668-684) using `jax.custom_vjp`.
"""

from __future__ import annotations

import jax


@jax.custom_vjp
def flip_gradient(x, scale: float = 1.0):
    return x


def _fwd(x, scale):
    return x, scale


def _bwd(scale, g):
    return (jax.tree_util.tree_map(lambda t: -t * scale, g), None)


flip_gradient.defvjp(_fwd, _bwd)
