"""Tacotron train/eval step: one pjit-able function.

Replaces the reference's per-tower graph + CPU-hub gradient averaging
(tacotron.py:1002-1225) with a single jitted step over a batch sharded on the
mesh 'data' axis — pjit inserts the gradient all-reduce over ICI.

Multi-optimizer training (main / refnet 'optimizer_r' / nat-GAN 'optimizer_n')
is expressed as up to three backward passes over disjoint masked optax
transforms, all inside the same step (SURVEY.md §2.1 'Optimizers').
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.tacotron.losses import compute_losses
from ..models.tacotron.model import Tacotron
from .optim import make_tacotron_optimizer, teacher_forcing_schedule


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state_main: Any
    opt_state_refnet: Optional[Any]
    opt_state_nat: Optional[Any]


class TacotronTrainer:
    """Owns model + optimizer transforms; produces jit/pjit-able step fns."""

    def __init__(self, cfg: Config, *, emt_only=False, adv_emb_disc=False,
                 nat_gan=False, pretrained_emb_disc=False,
                 pretrained_emb_disc_all=False, use_unpaired=False,
                 opt_ref_no_mo=False, nat_gan_derate=1.0):
        self.cfg = cfg
        self.use_unpaired = use_unpaired
        self.nat_gan = nat_gan
        self.opt_ref_no_mo = opt_ref_no_mo
        self.pretrained_emb_disc_all = pretrained_emb_disc_all
        self.emt_only = emt_only
        self.adv_emb_disc = adv_emb_disc
        self.nat_gan_derate = nat_gan_derate
        self.model = Tacotron(
            config=cfg, emt_only=emt_only, adv_emb_disc=adv_emb_disc,
            nat_gan=nat_gan, pretrained_emb_disc=pretrained_emb_disc,
            pretrained_emb_disc_all=pretrained_emb_disc_all)
        self.tfr_schedule = teacher_forcing_schedule(cfg)
        self._tx = None  # built lazily once params exist

    # ------------------------------------------------------------------ init

    def init_state(self, rng, batch: Dict[str, Any]) -> TrainState:
        rngs = dict(zip(["params", "dropout", "zoneout", "teacher_forcing"],
                        jax.random.split(rng, 4)))
        variables = self.model.init(
            rngs, batch["inputs"], batch["input_lengths"],
            mel_targets=batch["mel_targets"],
            ref_mel_emt=batch["ref_mel_emt"], ref_mel_spk=batch["ref_mel_spk"],
            ref_mel_up_emt=batch.get("ref_mel_up_emt"),
            ref_mel_up_spk=batch.get("ref_mel_up_spk"),
            emt_labels=batch.get("emt_labels"),
            use_unpaired=self.use_unpaired, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx_main, tx_refnet, tx_nat = make_tacotron_optimizer(
            self.cfg, params, opt_ref_no_mo=self.opt_ref_no_mo,
            pretrained_emb_disc_all=self.pretrained_emb_disc_all,
            nat_gan=self.nat_gan)
        self._tx = (tx_main, tx_refnet, tx_nat)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats,
            opt_state_main=tx_main.init(params),
            opt_state_refnet=tx_refnet.init(params) if tx_refnet else None,
            opt_state_nat=tx_nat.init(params) if tx_nat else None)

    def ensure_tx(self, params):
        if self._tx is None:
            self._tx = make_tacotron_optimizer(
                self.cfg, params, opt_ref_no_mo=self.opt_ref_no_mo,
                pretrained_emb_disc_all=self.pretrained_emb_disc_all,
                nat_gan=self.nat_gan)
        return self._tx

    # ------------------------------------------------------------------ fwd

    def _forward(self, params, batch_stats, batch, rngs, tfr, *, train: bool):
        if self.cfg.tacotron.compute_dtype == "bfloat16":
            # compute-copy of the params in bf16 (master copy / optimizer /
            # losses stay f32; the cast is differentiable so grads come back
            # f32). The decoder casts its inputs to bf16 so the decode scan
            # runs fully in bf16; encoder/postnet stay f32 because their
            # BatchNorm statistics (f32) re-promote activations.
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = dict(
            mel_targets=batch["mel_targets"],
            ref_mel_emt=batch["ref_mel_emt"], ref_mel_spk=batch["ref_mel_spk"],
            ref_mel_up_emt=batch.get("ref_mel_up_emt"),
            ref_mel_up_spk=batch.get("ref_mel_up_spk"),
            emt_labels=batch.get("emt_labels"),
            teacher_forcing_ratio=tfr, train=train,
            use_unpaired=self.use_unpaired)
        if train:
            out, updates = self.model.apply(
                variables, batch["inputs"], batch["input_lengths"],
                rngs=rngs, mutable=["batch_stats"], **kwargs)
            return out, updates["batch_stats"]
        out = self.model.apply(variables, batch["inputs"], batch["input_lengths"],
                               rngs=rngs, **kwargs)
        return out, batch_stats

    def _losses(self, out, batch, params):
        return compute_losses(
            out, batch, params, self.cfg, use_unpaired=self.use_unpaired,
            nat_gan=self.nat_gan, adv_emb_disc=self.adv_emb_disc,
            emt_only=self.emt_only,
            pretrained_emb_disc_all=self.pretrained_emb_disc_all,
            nat_gan_derate=self.nat_gan_derate)

    # ------------------------------------------------------------------ step

    def train_step(self, state: TrainState, batch: Dict[str, Any],
                   rng: jax.Array):
        """One optimizer step; returns (new_state, metrics)."""
        tx_main, tx_refnet, tx_nat = self.ensure_tx(state.params)
        rngs = dict(zip(["dropout", "zoneout", "teacher_forcing"],
                        jax.random.split(rng, 3)))
        tfr = self.tfr_schedule(state.step)

        def loss_fn(params, target: str):
            out, new_bs = self._forward(params, state.batch_stats, batch, rngs,
                                        tfr, train=True)
            terms = self._losses(out, batch, params)
            return terms[target], (terms, new_bs)

        (loss, (terms, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, "loss")
        updates, new_opt_main = tx_main.update(grads, state.opt_state_main,
                                               state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_opt_refnet = state.opt_state_refnet
        if tx_refnet is not None:
            # refnet/style vars trained on loss_no_mo_up (tacotron.py:1062-1066)
            grads_r = jax.grad(lambda p: loss_fn(p, "loss_no_mo_up")[0])(state.params)
            upd_r, new_opt_refnet = tx_refnet.update(grads_r, state.opt_state_refnet,
                                                     new_params)
            new_params = optax.apply_updates(new_params, upd_r)

        new_opt_nat = state.opt_state_nat
        if tx_nat is not None:
            grads_n = jax.grad(lambda p: loss_fn(p, "d_loss")[0])(state.params)
            upd_n, new_opt_nat = tx_nat.update(grads_n, state.opt_state_nat,
                                               new_params)
            new_params = optax.apply_updates(new_params, upd_n)

        metrics = {k: v for k, v in terms.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["teacher_forcing_ratio"] = tfr
        new_state = TrainState(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state_main=new_opt_main, opt_state_refnet=new_opt_refnet,
            opt_state_nat=new_opt_nat)
        return new_state, metrics

    def disc_pretrain_step(self, state: TrainState, batch: Dict[str, Any],
                           rng: jax.Array):
        """nat-GAN discriminator-only update (reference pretraining phase,
        tacotron/train.py:376-397: ~200-300 disc iterations at step 0 before
        the generator sees any adversarial gradient)."""
        tx_main, _, tx_nat = self.ensure_tx(state.params)
        assert tx_nat is not None, "disc pretraining requires nat_gan=True"
        rngs = dict(zip(["dropout", "zoneout", "teacher_forcing"],
                        jax.random.split(rng, 3)))
        tfr = self.tfr_schedule(state.step)

        def loss_fn(params):
            out, new_bs = self._forward(params, state.batch_stats, batch, rngs,
                                        tfr, train=True)
            terms = self._losses(out, batch, params)
            return terms["d_loss"], (terms, new_bs)

        (_, (terms, new_bs)), grads_n = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        upd_n, new_opt_nat = tx_nat.update(grads_n, state.opt_state_nat,
                                           state.params)
        new_params = optax.apply_updates(state.params, upd_n)
        new_state = TrainState(
            step=state.step, params=new_params, batch_stats=new_bs,
            opt_state_main=state.opt_state_main,
            opt_state_refnet=state.opt_state_refnet,
            opt_state_nat=new_opt_nat)
        return new_state, {k: terms[k] for k in
                           ("d_loss", "g_loss_p", "g_loss_up") if k in terms}

    def eval_step(self, state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        """Eval forward (natural or teacher-forced per config) + losses."""
        rngs = dict(zip(["dropout", "zoneout", "teacher_forcing"],
                        jax.random.split(rng, 3)))
        tfr = (jnp.asarray(0.0) if self.cfg.train.tacotron_natural_eval
               else self.tfr_schedule(state.step))
        out, _ = self._forward(state.params, state.batch_stats, batch, rngs,
                               tfr, train=False)
        terms = self._losses(out, batch, state.params)
        return out, terms
