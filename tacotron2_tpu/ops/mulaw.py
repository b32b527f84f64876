"""μ-law companding and input-type helpers.

Parity with reference code/wavenet_vocoder/util.py:10-120 (mulaw/inv_mulaw,
mulaw_quantize/inv_mulaw_quantize, input-type predicates). Written against the
numpy API surface shared by numpy and jax.numpy, so the same functions run on
host arrays and inside jit.
"""

from __future__ import annotations

import numpy as np


def _xp(x):
    import jax.numpy as jnp
    return jnp if isinstance(x, jnp.ndarray) else np


def mulaw(x, mu: int = 255):
    """[-1, 1] → [-1, 1] companded: sign(x)·ln(1+μ|x|)/ln(1+μ)."""
    xp = _xp(x)
    return xp.sign(x) * xp.log1p(mu * xp.abs(x)) / xp.log1p(np.float32(mu))


def inv_mulaw(y, mu: int = 255):
    """Inverse companding: sign(y)·((1+μ)^|y| − 1)/μ."""
    xp = _xp(y)
    return xp.sign(y) * (1.0 / mu) * ((1.0 + mu) ** xp.abs(y) - 1.0)


def mulaw_quantize(x, mu: int = 255):
    """[-1, 1] → int in [0, μ].

    TRUNCATES like the reference (_asint = .astype(int),
    wavenet_vocoder/util.py:98-103) — not round-to-nearest; silence (x=0)
    quantizes to 127, the center the silence trim assumes
    (audio.start_and_end_indices)."""
    xp = _xp(x)
    y = mulaw(x, mu)
    return ((y + 1.0) / 2.0 * mu).astype(xp.int32)


def inv_mulaw_quantize(y, mu: int = 255):
    """int [0, μ] → [-1, 1]."""
    return inv_mulaw(2.0 * y.astype(np.float32) / mu - 1.0, mu)


# ------------------------------------------------------------ type predicates
# Reference util.py:64-120: dispatch on hparams.input_type/quantize_channels.


def is_mulaw_quantize(input_type: str) -> bool:
    return input_type == "mulaw-quantize"


def is_mulaw(input_type: str) -> bool:
    return input_type == "mulaw"


def is_raw(input_type: str) -> bool:
    return input_type == "raw"


def is_scalar_input(input_type: str) -> bool:
    return is_raw(input_type) or is_mulaw(input_type)


def sequence_mask(lengths, max_len: int, dtype=np.float32):
    """[B] lengths → [B, max_len, 1] mask (reference util.py:144-148)."""
    xp = _xp(lengths)
    rng = xp.arange(max_len)
    mask = (rng[None, :] < lengths[:, None]).astype(dtype)
    return mask[:, :, None]
