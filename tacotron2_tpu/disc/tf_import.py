"""Ingest the reference's shipped TensorFlow discriminator checkpoints.

The reference restores pretrained emotion/speaker discriminators
(TF checkpoints under code/spk_disc/pretrained_model_{emt,spk}_disc/) into
the Tacotron graph's `Tacotron_model/inference/pretrained_ref_enc_{emt,spk}`
scopes (tacotron/train.py:280-285,331-340). This module reads those TF
checkpoints and converts them to the flax ReferenceEncoder parameter layout
so the same graft works here (train/checkpoint.py:import_pretrained_subtree).

Variable mapping (TF name -> flax):
  <scope>/conv2d_i/conv2d/{kernel,bias}         -> conv2d_i/{kernel,bias}
  <scope>/conv2d_i/batch_normalization/gamma    -> BatchNorm_i/scale
  <scope>/conv2d_i/batch_normalization/beta     -> BatchNorm_i/bias
  .../moving_{mean,variance}                    -> batch_stats BatchNorm_i/{mean,var}
  <scope>/rnn/gru_cell/gates/{kernel,bias}      -> GRU_0/GRUCell_0/gates_{kernel,bias}
  <scope>/rnn/gru_cell/candidate/{kernel,bias}  -> GRU_0/GRUCell_0/candidate_{kernel,bias}
  <scope>/dense/{kernel,bias}                   -> Dense_0/{kernel,bias}
  w, b (GE2E scale/bias, scope-less)            -> returned separately

The shapes and semantics line up exactly: our GRUCell uses the TF gate
layout (modules.py:186-204), conv SAME padding matches, and BatchNorm eps
1e-3 / momentum 0.99 are the tf.layers defaults. Conversion parity against
a TF-side forward pass of the actual shipped checkpoint is asserted by
tests/test_reference_parity.py::test_tf_disc_checkpoint_ingestion.

TensorFlow is only needed to READ the checkpoint (scripts or one-time
conversion); it is imported lazily and gated with a clear error.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Tuple

import numpy as np


def _find_prefix(path: str) -> str:
    """Accept a checkpoint prefix, a .index file, or a directory."""
    if os.path.isdir(path):
        idx = glob.glob(os.path.join(path, "*.index"))
        if not idx:
            raise FileNotFoundError(f"no TF checkpoint *.index under {path}")

        def step_of(p):
            # numeric-aware "latest": ckpt-1000 beats ckpt-999 (plain
            # lexicographic sort would pick the stale one)
            m = re.search(r"-(\d+)\.index$", p)
            return (int(m.group(1)) if m else -1, p)

        return max(idx, key=step_of)[:-len(".index")]
    if path.endswith(".index"):
        return path[:-len(".index")]
    return path


def read_tf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """All variables of a TF checkpoint as {name: np.ndarray}."""
    try:
        from tensorflow.python.training import py_checkpoint_reader
        reader = py_checkpoint_reader.NewCheckpointReader(_find_prefix(path))
    except ImportError as e:  # pragma: no cover - TF present in dev images
        raise ImportError(
            "reading reference TF checkpoints requires tensorflow; "
            "convert once with scripts/convert_tf_disc.py on a machine "
            "that has it") from e
    return {name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()}


def tf_disc_to_flax(tf_vars: Dict[str, np.ndarray]
                    ) -> Tuple[Dict[str, Any], Dict[str, Any],
                               Dict[str, np.ndarray]]:
    """TF discriminator variables -> (params, batch_stats, extras).

    `params`/`batch_stats` are ReferenceEncoder subtrees ready to graft
    under pretrained_ref_enc_{emt,spk}; extras holds the GE2E w/b scalars
    and anything unmapped."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    extras: Dict[str, np.ndarray] = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(value, np.float32)

    for name, value in tf_vars.items():
        parts = name.split("/")
        tail = parts[-3:] if len(parts) >= 3 else parts
        if len(parts) >= 3 and parts[-2] == "conv2d" and \
                parts[-3].startswith("conv2d_"):
            put(params, (parts[-3], tail[-1]), value)
        elif len(parts) >= 3 and parts[-2] == "batch_normalization":
            i = parts[-3].split("_")[-1]
            bn = f"BatchNorm_{i}"
            key = {"gamma": ("params", bn, "scale"),
                   "beta": ("params", bn, "bias"),
                   "moving_mean": ("stats", bn, "mean"),
                   "moving_variance": ("stats", bn, "var")}[parts[-1]]
            put(params if key[0] == "params" else stats, key[1:], value)
        elif "gru_cell" in parts:
            kind = parts[-2]            # gates | candidate
            put(params, ("GRU_0", "GRUCell_0", f"{kind}_{parts[-1]}"), value)
        elif parts[-2:-1] == ["dense"] or (len(parts) >= 2
                                           and parts[-2] == "dense"):
            put(params, ("Dense_0", parts[-1]), value)
        else:
            extras[name] = np.asarray(value)
    return params, stats, extras


def load_tf_disc_checkpoint(path: str):
    """Read + convert a shipped reference discriminator checkpoint.

    Returns dict(params=..., batch_stats=..., extras=...) where params /
    batch_stats are ReferenceEncoder subtrees."""
    params, stats, extras = tf_disc_to_flax(read_tf_checkpoint(path))
    return dict(params=params, batch_stats=stats, extras=extras)


def is_tf_checkpoint(path: str) -> bool:
    """True if `path` points at a TF checkpoint (vs an orbax directory)."""
    if os.path.isdir(path):
        return bool(glob.glob(os.path.join(path, "*.index")))
    return path.endswith(".index") or os.path.exists(path + ".index")
