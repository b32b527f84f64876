"""WaveNet output distributions: MoL, Gaussian, categorical (pure jnp).

Parity with reference code/wavenet_vocoder/models/mixture.py (discretized
mixture of logistics loss + sampler), gaussian.py (Gaussian MLE with CDF
trick + sampler) and modules.py:781-798 (masked softmax CE).

Layout note: the reference keeps [B, C, T]; here everything is batch-first
channels-last [B, T, C] (TPU convention used across this codebase).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def log_sum_exp(x):
    """Numerically stable log-sum-exp over the last axis (mixture.py:5-10)."""
    m = jnp.max(x, axis=-1)
    m2 = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m2), axis=-1))


def discretized_mix_logistic_loss(y_hat, y, num_classes=65536,
                                  log_scale_min=-32.23619130191664,
                                  reduce=True):
    """MoL negative log-likelihood (mixture.py:18-77).

    y_hat: [B, T, 3·nr_mix] (logit_probs, means, log_scales); y: [B, T, 1]
    scaled to [-1, 1].
    """
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[:, :, :nr_mix]
    means = y_hat[:, :, nr_mix:2 * nr_mix]
    log_scales = jnp.maximum(y_hat[:, :, 2 * nr_mix:3 * nr_mix], log_scale_min)

    y = jnp.broadcast_to(y, y.shape[:-1] + (nr_mix,))
    centered = y - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered - 1.0 / (num_classes - 1))
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    log_probs = jnp.where(
        y < -0.999, log_cdf_plus,
        jnp.where(y > 0.999, log_one_minus_cdf_min,
                  jnp.where(cdf_delta > 1e-5,
                            jnp.log(jnp.maximum(cdf_delta, 1e-12)),
                            log_pdf_mid - math.log((num_classes - 1) / 2))))
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)

    nll = -log_sum_exp(log_probs)
    return jnp.sum(nll) if reduce else nll[..., None]


def sample_from_discretized_mix_logistic(key, y, log_scale_min=-7.0):
    """Gumbel-max mixture pick + logistic sample, clipped (mixture.py:79-110).

    y: [B, T, 3·nr_mix] → [B, T] in [-1, 1].
    """
    nr_mix = y.shape[-1] // 3
    logit_probs = y[:, :, :nr_mix]
    k1, k2 = jax.random.split(key)
    temp = jax.random.uniform(k1, logit_probs.shape, minval=1e-5, maxval=1 - 1e-5)
    argmax = jnp.argmax(logit_probs - jnp.log(-jnp.log(temp)), axis=-1)
    one_hot = jax.nn.one_hot(argmax, nr_mix)
    means = jnp.sum(y[:, :, nr_mix:2 * nr_mix] * one_hot, axis=-1)
    log_scales = jnp.maximum(
        jnp.sum(y[:, :, 2 * nr_mix:3 * nr_mix] * one_hot, axis=-1), log_scale_min)
    u = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1 - u))
    return jnp.clip(x, -1.0, 1.0)


def _normal_cdf(x, loc, scale):
    return 0.5 * (1.0 + jax.lax.erf((x - loc) / (scale * math.sqrt(2.0))))


def gaussian_mle_loss(y_hat, y, log_scale_min_gauss=-16.11809565095832,
                      num_classes=65536, use_cdf=False, reduce=True):
    """Gaussian maximum-likelihood loss (gaussian.py:5-37).

    y_hat: [B, T, 2] (mean, log_scale); y: [B, T, 1].
    """
    mean = y_hat[:, :, 0]
    log_scale = jnp.maximum(y_hat[:, :, 1], log_scale_min_gauss)
    y = jnp.squeeze(y, -1)

    if use_cdf:
        scale = jnp.exp(log_scale)
        cdf_plus = _normal_cdf(y + 1.0 / (num_classes - 1), mean, scale)
        cdf_min = _normal_cdf(y - 1.0 / (num_classes - 1), mean, scale)
        log_prob = jnp.log(jnp.maximum(cdf_plus - cdf_min, 1e-12))
    else:
        log_prob = -0.5 * (math.log(2.0 * math.pi) + 2.0 * log_scale +
                           jnp.square(y - mean) * jnp.exp(-2.0 * log_scale))

    return -jnp.sum(log_prob) if reduce else -log_prob[..., None]


def sample_from_gaussian(key, y, log_scale_min_gauss=-7.0):
    """Sample from predicted Normal, clipped to [-1, 1] (gaussian.py:39-52)."""
    mean = y[:, :, 0]
    log_scale = jnp.maximum(y[:, :, 1], log_scale_min_gauss)
    x = mean + jnp.exp(log_scale) * jax.random.normal(key, mean.shape)
    return jnp.clip(x, -1.0, 1.0)


def masked_cross_entropy_loss(outputs, targets, lengths):
    """Softmax CE for mulaw-quantize mode (modules.py:781-798).

    outputs: [B, T, Q] logits; targets: [B, T] int ids.
    """
    mask = (jnp.arange(outputs.shape[1])[None, :] < lengths[:, None]).astype(jnp.float32)
    oh = jax.nn.one_hot(targets, outputs.shape[-1])
    losses = -jnp.sum(oh * jax.nn.log_softmax(outputs, axis=-1), axis=-1)
    masked = losses * mask
    return jnp.sum(masked) / jnp.maximum(
        jnp.sum((masked != 0).astype(jnp.float32)), 1.0)


def masked_distribution_loss(loss_fn, y_hat, y, lengths):
    """Sequence-masked mean of a per-sample NLL (modules.py:800-836)."""
    per = loss_fn(y_hat, y, reduce=False)  # [B, T, 1]
    mask = (jnp.arange(y.shape[1])[None, :] < lengths[:, None]
            ).astype(jnp.float32)[:, :, None]
    mask = jnp.broadcast_to(mask, per.shape)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
