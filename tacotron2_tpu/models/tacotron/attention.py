"""Location-sensitive attention, functional and scan-friendly.

Re-design of reference code/tacotron/models/attention.py:94-227 for TPU:
the memory projection (keys) is computed ONCE per utterance outside the decode
loop; the per-step energy
    e = v_a · tanh(W_keys + W_query(q) + W_loc(conv31(cum_align)) + b_a)
is a fused VPU/MXU computation inside the `lax.scan` body. Supports softmax or
smoothing-sigmoid normalization, encoder-padding masks, cumulative weights,
and the synthesis-only monotonic/window constraint (attention.py:202-215).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .modules import glorot

NEG_INF = -(2.0 ** 32) + 1.0  # reference's padding value (attention.py:214)


class AttentionParams(nn.Module):
    """Holds the per-step attention parameters (query/location/v_a).

    The memory side (`keys`) is produced by `memory_layer` once per sequence.
    """

    attention_dim: int = 128
    attention_filters: int = 32
    attention_kernel: int = 31

    def setup(self):
        self.query_layer = nn.Dense(self.attention_dim, use_bias=False,
                                    kernel_init=glorot, name="query_layer")
        self.memory_layer = nn.Dense(self.attention_dim, use_bias=False,
                                     kernel_init=glorot, name="memory_layer")
        self.location_convolution = nn.Conv(
            self.attention_filters, (self.attention_kernel,), padding="SAME",
            use_bias=True, kernel_init=glorot, name="location_features_convolution")
        self.location_layer = nn.Dense(self.attention_dim, use_bias=False,
                                       kernel_init=glorot, name="location_features_layer")
        self.v_a = self.param("attention_variable_projection",
                              nn.initializers.glorot_uniform(), (self.attention_dim, 1))
        self.b_a = self.param("attention_bias", nn.initializers.zeros,
                              (self.attention_dim,))

    def compute_keys(self, memory):
        """[B, T, M] → [B, T, A]; run once, outside the decode loop."""
        return self.memory_layer(memory)

    def __call__(self, query, keys, memory, cum_alignments, memory_mask,
                 prev_max_attention, *, synthesis_constraint: bool = False,
                 constraint_type: str = "window", attention_win_size: int = 7,
                 smoothing: bool = False):
        """One attention step.

        query: [B, Q] (decoder LSTM output); keys: [B, T, A]; memory: [B, T, M];
        cum_alignments: [B, T]; memory_mask: [B, T] bool or None;
        prev_max_attention: [B] int32.
        Returns (context [B, M], alignments [B, T], new_cum [B, T], max_att [B]).
        """
        q = self.query_layer(query)[:, None, :]                      # [B, 1, A]
        f = self.location_convolution(cum_alignments[:, :, None])    # [B, T, F]
        # under mixed precision the cumulative alignments stay f32 (they
        # accumulate ~1/step); cast the location features back down so the
        # f32 carry doesn't promote the whole energy/softmax/context chain
        loc = self.location_layer(f).astype(keys.dtype)              # [B, T, A]
        energy = jnp.squeeze(
            jnp.tanh(keys + q + loc + self.b_a.astype(keys.dtype)) @ self.v_a,
            -1)

        if synthesis_constraint:
            T = energy.shape[-1]
            idx = jnp.arange(T)[None, :]
            p = prev_max_attention[:, None]
            w = attention_win_size
            if constraint_type == "monotonic":
                # allowed: [p, p+w) — only look forward w steps (attention.py:206-207)
                forbidden = (idx < p) | (idx >= p + w)
            else:  # window: allowed [p - (w//2 + w%2), p + w//2) (attention.py:210-211)
                back = w // 2 + (w % 2)
                forbidden = (idx < p - back) | (idx >= p + w // 2)
            energy = jnp.where(forbidden, NEG_INF, energy)

        if memory_mask is not None:
            energy = jnp.where(memory_mask, energy, -jnp.inf)

        if smoothing:
            sig = jax.nn.sigmoid(energy)
            if memory_mask is not None:
                sig = jnp.where(memory_mask, sig, 0.0)
            alignments = sig / jnp.sum(sig, axis=-1, keepdims=True)
        else:
            alignments = jax.nn.softmax(energy, axis=-1)

        max_attention = jnp.argmax(alignments, axis=-1).astype(jnp.int32)
        context = jnp.einsum("bt,btm->bm", alignments, memory)
        return context, alignments, cum_alignments + alignments, max_attention


class SimpleBahdanauAttention(nn.Module):
    """Additive attention over a fixed value sequence, queried per decode step.

    Reference: SimpleBahdanauAttention (attention.py:230-260), used by the
    Tacotron_emt_attn variant to attend over emotion-reference timesteps.
    """

    units: int

    @nn.compact
    def __call__(self, query, values):
        # query: [B, Q], values: [B, T, V]
        w1 = nn.Dense(self.units, kernel_init=glorot, name="W1")(values)
        w2 = nn.Dense(self.units, kernel_init=glorot, name="W2")(query)[:, None, :]
        score = nn.Dense(1, kernel_init=glorot, name="V")(jnp.tanh(w1 + w2))
        weights = jax.nn.softmax(score, axis=1)            # [B, T, 1]
        context = jnp.sum(weights * values, axis=1)        # [B, V]
        return context, jnp.squeeze(weights, -1)
