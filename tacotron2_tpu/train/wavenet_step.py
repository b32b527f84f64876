"""WaveNet train/eval step with EMA shadow params.

Replaces the reference's tower loop + EMA train-op chain (wavenet.py:522-613):
one jitted step — forward, masked NLL, clipped Adam, then EMA update of every
parameter (the shadow weights checkpointed for synthesis, the reference's
'shadow saver', wavenet_vocoder/train.py:67-86).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.wavenet.model import WaveNet, compute_wavenet_loss
from .optim import make_wavenet_optimizer


class WaveNetTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any


class WaveNetTrainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.model = WaveNet(config=cfg)
        self.tx = make_wavenet_optimizer(cfg)

    def init_state(self, rng, batch: Dict[str, Any],
                   skip_data_dependent_init: bool = False
                   ) -> WaveNetTrainState:
        g = batch.get("g") if self.cfg.wavenet.gin_channels > 0 else None
        variables = self.model.init(
            dict(params=rng, dropout=jax.random.PRNGKey(0)),
            batch["x"], batch["c"], g, train=True)
        params = variables["params"]
        wn = self.cfg.wavenet
        # skip_data_dependent_init: the DDI forward passes are O(#weight-
        # normed convs) un-jitted model applies — pointless when a
        # checkpoint restore is about to overwrite the params
        if (wn.weight_normalization and wn.data_dependent_init
                and not skip_data_dependent_init):
            from ..models.wavenet.model import data_dependent_init
            from ..utils.infolog import log
            log("Applying weight normalization data-dependent init "
                "forward pass (reference wavenet train.py:287-298)")
            params = data_dependent_init(self.model, params, batch["x"],
                                         batch["c"], g,
                                         init_scale=wn.init_scale)
        return WaveNetTrainState(
            step=jnp.zeros((), jnp.int32), params=params, ema_params=params,
            opt_state=self.tx.init(params))

    def train_step(self, state: WaveNetTrainState, batch: Dict[str, Any],
                   rng: jax.Array):
        g = batch.get("g") if self.cfg.wavenet.gin_channels > 0 else None

        def loss_fn(params):
            out = self.model.apply({"params": params}, batch["x"], batch["c"],
                                   g, train=True, rngs={"dropout": rng})
            terms = compute_wavenet_loss(out, batch["y"], batch["input_lengths"],
                                         self.cfg)
            return terms["loss"], terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # warmup-limited EMA decay: min(decay, (1+t)/(10+t)). The shadow is
        # initialized at the RANDOM init (reference EMA semantics,
        # wavenet_vocoder/train.py:67-86, TF ExponentialMovingAverage with
        # zero_debias off); with a constant 0.9999 decay, 0.9999^t of that
        # random init still contaminates the shadow — ~5% at 30k steps,
        # which measurably corrupts autoregressive sampling at short
        # training horizons (the reference never sees this at its
        # hundreds-of-k step counts). The warmup forgets the init within
        # the first ~100 steps and converges to the reference's constant
        # decay, leaving long-horizon semantics unchanged.
        decay = self.cfg.train.wavenet_ema_decay
        t = state.step.astype(jnp.float32) + 1.0
        decay_t = jnp.minimum(decay, (1.0 + t) / (10.0 + t))
        ema = jax.tree_util.tree_map(
            lambda s, p: s * decay_t + p * (1.0 - decay_t),
            state.ema_params, new_params)

        metrics = dict(terms)
        metrics["grad_norm"] = optax.global_norm(grads)
        return WaveNetTrainState(step=state.step + 1, params=new_params,
                                 ema_params=ema, opt_state=new_opt), metrics

    def eval_step(self, state: WaveNetTrainState, batch: Dict[str, Any],
                  use_ema: bool = True):
        params = state.ema_params if use_ema else state.params
        g = batch.get("g") if self.cfg.wavenet.gin_channels > 0 else None
        out = self.model.apply({"params": params}, batch["x"], batch["c"], g,
                               train=False)
        terms = compute_wavenet_loss(out, batch["y"], batch["input_lengths"],
                                     self.cfg)
        return out, terms
