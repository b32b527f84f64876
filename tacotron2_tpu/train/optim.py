"""Optimizers, LR/TFR schedules, EMA — optax equivalents of the reference.

- LR schedule: tf.train.exponential_decay clipped to [final, init]
  (tacotron.py:1227-1251; hparams.py:272-277).
- Teacher-forcing schedule: constant or 'scheduled' narrow exponential decay
  (helpers.py:140-179).
- Tacotron multi-optimizer: main / refnet ('optimizer_r') / nat-GAN disc
  ('optimizer_n') over disjoint variable sets selected by parameter-path
  predicates (tacotron.py:1002-1109) — expressed as optax.masked chains so the
  whole thing remains one pjit-able update.
- WaveNet: Adam + norm/value clipping + EMA shadow params
  (wavenet.py:522-613).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Config

# ------------------------------------------------------------------ schedules


def exponential_decay(init: float, start_decay: int, decay_steps: int,
                      decay_rate: float, lo: Optional[float] = None,
                      hi: Optional[float] = None) -> Callable:
    """tf.train.exponential_decay(init, step-start, steps, rate), clipped."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = init * decay_rate ** ((step - start_decay) / decay_steps)
        if lo is not None or hi is not None:
            lr = jnp.clip(lr, lo, hi)
        return lr

    return schedule


def tacotron_lr_schedule(cfg: Config) -> Callable:
    t = cfg.train
    if not t.tacotron_decay_learning_rate:
        return lambda step: jnp.asarray(t.tacotron_initial_learning_rate)
    return exponential_decay(
        t.tacotron_initial_learning_rate, t.tacotron_start_decay,
        t.tacotron_decay_steps, t.tacotron_decay_rate,
        lo=t.tacotron_final_learning_rate, hi=t.tacotron_initial_learning_rate)


def teacher_forcing_schedule(cfg: Config) -> Callable:
    """Ratio as a function of global step (helpers.py:140-179)."""
    t = cfg.train
    if t.tacotron_teacher_forcing_mode == "constant":
        ratio = t.tacotron_teacher_forcing_ratio
        return lambda step: jnp.asarray(ratio, jnp.float32)

    init = t.tacotron_teacher_forcing_init_ratio
    decay = exponential_decay(init, t.tacotron_teacher_forcing_start_decay,
                              t.tacotron_teacher_forcing_decay_steps,
                              0.1)  # tacotron_teacher_forcing_decay_exp_rate

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < t.tacotron_teacher_forcing_start_decay,
                         init, decay(step))

    return schedule


def wavenet_lr_schedule(cfg: Config) -> Callable:
    t = cfg.train
    if t.wavenet_lr_schedule == "noam":
        warmup = t.wavenet_warmup

        def schedule(step):
            step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
            return (t.wavenet_learning_rate * warmup ** 0.5 *
                    jnp.minimum(step * warmup ** -1.5, step ** -0.5))

        return schedule
    return exponential_decay(t.wavenet_learning_rate, 0,
                             t.wavenet_decay_steps, t.wavenet_decay_rate)


# --------------------------------------------------------------- param masks


def path_name(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path).lower()


def make_mask(params, predicate: Callable[[str], bool]):
    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: predicate(path_name(path)), params)
    return flat


def masked_only(tx, mask):
    """Apply `tx` to masked leaves and ZERO all others.

    optax.masked alone passes unmasked updates through unchanged — applying
    those would add raw gradients to frozen variables, corrupting the
    reference's var-list optimizer semantics (tacotron.py:1047-1066).
    """
    labels = jax.tree_util.tree_map(
        lambda m: "on" if m else "off", mask)
    return optax.multi_transform({"on": tx, "off": optax.set_to_zero()},
                                 labels)


def is_refnet_var(name: str) -> bool:
    """'optimizer_r' variable set (tacotron.py:1064)."""
    return "refnet" in name or "style_disc" in name


def is_nat_gan_var(name: str) -> bool:
    return "nat_gan" in name


def is_pretrained_var(name: str) -> bool:
    return "pretrained" in name


def main_update_predicate(opt_ref_no_mo: bool, pretrained_emb_disc_all: bool,
                          fine_tuning: bool) -> Callable[[str], bool]:
    """Main optimizer variable filter (tacotron.py:1047-1050)."""

    def pred(name: str) -> bool:
        if is_pretrained_var(name) or is_nat_gan_var(name):
            return False
        if (opt_ref_no_mo or pretrained_emb_disc_all) and is_refnet_var(name):
            return False
        if fine_tuning and ("inputs_embedding" in name or "encoder_" in name
                            or name.startswith("encoder")):
            return False
        return True

    return pred


# --------------------------------------------------------------- optimizers


def make_tacotron_optimizer(cfg: Config, params, *, opt_ref_no_mo: bool = False,
                            pretrained_emb_disc_all: bool = False,
                            nat_gan: bool = False):
    """One optax transform applying the reference's up-to-3 optimizers.

    The caller computes a gradient dict {'main', 'refnet', 'nat_gan'} (each a
    full-tree gradient from its own loss) and we apply each through a masked
    adam. Returns (tx_main, tx_refnet_or_None, tx_natgan_or_None).
    """
    t = cfg.train
    lr = tacotron_lr_schedule(cfg)

    def adam():
        steps = [optax.clip_by_global_norm(1.0)] if t.tacotron_clip_gradients else []
        steps.append(optax.adam(lr, b1=t.tacotron_adam_beta1,
                                b2=t.tacotron_adam_beta2,
                                eps=t.tacotron_adam_epsilon))
        return optax.chain(*steps)

    main_pred = main_update_predicate(opt_ref_no_mo, pretrained_emb_disc_all,
                                      t.tacotron_fine_tuning)
    tx_main = masked_only(adam(), make_mask(params, main_pred))
    tx_refnet = (masked_only(adam(), make_mask(params, is_refnet_var))
                 if opt_ref_no_mo or pretrained_emb_disc_all else None)
    tx_nat = (masked_only(adam(), make_mask(params, is_nat_gan_var))
              if nat_gan else None)
    return tx_main, tx_refnet, tx_nat


def make_wavenet_optimizer(cfg: Config):
    """Adam + max-norm/value clipping (wavenet.py:522-603)."""
    t = cfg.train
    steps = []
    if t.wavenet_clip_gradients:
        steps.append(optax.clip_by_global_norm(t.wavenet_gradient_max_norm))
        steps.append(optax.clip(t.wavenet_gradient_max_value))
    steps.append(optax.adam(wavenet_lr_schedule(cfg), b1=t.wavenet_adam_beta1,
                            b2=t.wavenet_adam_beta2, eps=t.wavenet_adam_epsilon))
    return optax.chain(*steps)


class EmaState(NamedTuple):
    params: Any


def ema_init(params) -> EmaState:
    return EmaState(params=params)


def ema_update(state: EmaState, new_params, decay: float) -> EmaState:
    """Shadow-weight EMA (wavenet.py:605-613; decay 0.9999)."""
    upd = jax.tree_util.tree_map(
        lambda s, p: s * decay + p * (1.0 - decay), state.params, new_params)
    return EmaState(params=upd)
