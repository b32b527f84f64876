"""WaveNet vocoder model (flax): teacher-forced training forward + losses.

Re-design of reference code/wavenet_vocoder/models/wavenet.py:86-721 in
batch-time-channel layout: first 1×1 conv → L gated residual blocks with
dilation cycle → skip sum (·√0.5 legacy) → relu/1×1/relu/1×1 head.
The autoregressive sampler (wavenet.py:724-911) lives in sampler.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config
from ...ops.mulaw import is_mulaw_quantize, is_scalar_input
from . import distributions as D
from .modules import Conv1x1, ResidualConv1DGLU, UpsampleNetwork, glorot


@jax.tree_util.register_dataclass
@dataclass
class WaveNetOutput:
    y_hat: jnp.ndarray                      # [B, T, out_channels]
    upsampled_features: Optional[jnp.ndarray] = None  # [B, T, cin]


class WaveNet(nn.Module):
    """Config-driven WaveNet; see module docstring."""

    config: Config

    @property
    def wn(self):
        return self.config.wavenet

    def setup(self):
        wn = self.config.wavenet
        self.scalar_input = is_scalar_input(wn.input_type)
        wnorm, isc = wn.weight_normalization, wn.init_scale
        # bf16 mixed precision for the (HBM-bound) residual stack; the
        # distribution head and loss stay f32.
        dt = jnp.bfloat16 if wn.compute_dtype == "bfloat16" else None
        self.compute_dtype = dt
        self.first_conv = Conv1x1(wn.residual_channels, weight_norm=wnorm,
                                  init_scale=isc, dtype=dt,
                                  name="input_convolution")
        self.residual_layers = [
            ResidualConv1DGLU(
                residual_channels=wn.residual_channels,
                gate_channels=wn.gate_channels,
                kernel_size=wn.kernel_size,
                skip_out_channels=wn.skip_out_channels,
                dilation=d, dropout=wn.dropout,
                cin_channels=wn.cin_channels, gin_channels=wn.gin_channels,
                use_bias=wn.use_bias, residual_legacy=wn.residual_legacy,
                weight_norm=wnorm, init_scale=isc, dtype=dt,
                name=f"residual_block_{i}")
            for i, d in enumerate(wn.dilations)]
        self.final_conv1 = Conv1x1(wn.skip_out_channels, weight_norm=wnorm,
                                   init_scale=isc, name="final_convolution_1")
        self.final_conv2 = Conv1x1(wn.out_channels, weight_norm=wnorm,
                                   init_scale=isc, name="final_convolution_2")

        if wn.cin_channels > 0:
            self.upsample_network = UpsampleNetwork(
                upsample_type=wn.upsample_type, scales=tuple(wn.upsample_scales),
                freq_kernel=wn.freq_axis_kernel_size, cin_channels=wn.cin_channels,
                activation=wn.upsample_activation, leaky_alpha=wn.leaky_alpha,
                nn_init=wn.nn_init, nn_scaler=wn.nn_scaler,
                name="upsample_network")

        if wn.gin_channels > 0 and wn.use_speaker_embedding:
            self.embed_speakers = nn.Embed(
                wn.n_speakers, wn.gin_channels,
                embedding_init=nn.initializers.normal(stddev=0.1),
                name="gc_embedding")

    # --------------------------------------------------------------- helpers

    def upsample(self, c):
        """Mel [B, T_mel, M] → sample-rate local features [B, T_mel·hop, M]."""
        return self.upsample_network(c)

    def embed_global(self, g):
        """Speaker ids [B] → [B, gin_channels] (wavenet.py:669-678)."""
        wn = self.config.wavenet
        if g is None or wn.gin_channels <= 0:
            return None
        if wn.use_speaker_embedding:
            return self.embed_speakers(g.reshape(-1))
        return g

    def _data_axis(self):
        from ...parallel.mesh import current_mesh_and_axis
        return current_mesh_and_axis("data")

    def _use_fused_stack(self, train: bool, c, g) -> bool:
        """Gate for the fused Pallas train-stack kernels
        (ops/wavenet_train_kernel.py): training, local cond only, not during
        init. Single device needs the TPU backend; under an active mesh the
        kernels run per-shard via shard_map over the 'data' axis (interpret
        mode on CPU virtual meshes, so tests/dryruns exercise the same
        branch a real multi-chip TPU takes)."""
        from ...ops.wavenet_train_kernel import stack_supported
        wn = self.config.wavenet
        if not (train and wn.use_fused_train_stack and c is not None
                and g is None and not self.is_initializing()
                and stack_supported(self.config)):
            return False
        mesh, ndata = self._data_axis()
        if mesh is None or mesh.size == 1:
            return jax.default_backend() == "tpu"
        return ndata > 1

    def _fused_stack(self, x, c):
        """Run the gated stack through the fused fwd+bwd kernels; returns
        the f32 skip sum (same contract as the XLA loop).

        Under an active ('data', ...) mesh the kernel runs per-shard via
        shard_map — batch rows split over 'data', params replicated (the
        shard_map transpose psums their cotangents = the grad all-reduce),
        per-shard dropout decorrelated by axis index — mirroring the
        Tacotron fused train decoder's multi-chip path (decoder.py)."""
        from ...ops.wavenet_train_kernel import (extract_stack_params,
                                                fused_stack_apply)
        layer_params = [layer.variables["params"]
                        for layer in self.residual_layers]
        sp = extract_stack_params(layer_params, self.config)
        seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        x32, c32 = x.astype(jnp.float32), c.astype(jnp.float32)
        mesh, ndata = self._data_axis()
        if mesh is not None and ndata > 1:
            if x.shape[0] % ndata != 0:
                return None  # caller falls back to the XLA loop
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            interpret = jax.default_backend() != "tpu"
            cfg = self.config

            Bl = x.shape[0] // ndata
            Tt = 128 if Bl <= 16 else 64

            def body(sp_, x_, c_, seed_):
                seed_ = seed_ + jax.lax.axis_index("data").astype(jnp.int32)
                return fused_stack_apply(cfg, sp_, x_, c_, seed_, Tt=Tt,
                                         interpret=interpret)

            return shard_map(
                body, mesh=mesh,
                in_specs=(jax.tree_util.tree_map(lambda _: P(), sp),
                          P("data", None, None), P("data", None, None), P()),
                out_specs=P("data", None, None),
                check_vma=False)(sp, x32, c32, seed)
        # bigger batches shrink the time tile to hold rows = Tt*B (the
        # VMEM unit of the saved-activation tiles and halo carries) constant
        Tt = 128 if x.shape[0] <= 16 else 64
        return fused_stack_apply(self.config, sp, x32, c32, seed, Tt=Tt)

    def body(self, x, c, g_vec, *, train: bool):
        """Conv stack [B, T, in] → logits [B, T, out_channels] (wavenet.py:650-721)."""
        wn = self.config.wavenet
        g = None
        if g_vec is not None:
            g = jnp.broadcast_to(g_vec[:, None, :],
                                 (x.shape[0], x.shape[1], g_vec.shape[-1]))
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            if c is not None:
                c = c.astype(self.compute_dtype)
            if g is not None:
                g = g.astype(self.compute_dtype)
        x = self.first_conv(x)

        skips = (self._fused_stack(x, c)
                 if self._use_fused_stack(train, c, g) else None)
        if skips is None:
            def run_block(conv, x, c, g):
                return conv(x, c=c, g=g, train=train)

            if train and wn.remat_conv_stack:
                run_block = nn.remat(run_block, prevent_cse=False)
            skips = None
            for conv in self.residual_layers:
                x, h = run_block(conv, x, c, g)
                if skips is None:
                    skips = h
                else:
                    skips = skips + h
                    if wn.legacy:
                        skips = skips * jnp.asarray(np.sqrt(0.5), h.dtype)
        # distribution head in f32 (log-scale numerics)
        x = nn.relu(skips.astype(jnp.float32))
        x = nn.relu(self.final_conv1(x))
        return self.final_conv2(x)

    # ------------------------------------------------------------------ main

    def __call__(self, x, c=None, g=None, *, train: bool = False
                 ) -> WaveNetOutput:
        """Teacher-forced forward.

        x: [B, T, 1] scalar waveform or [B, T, Q] one-hot;
        c: [B, T_mel, cin] mel conditioning (upsampled internally);
        g: [B] speaker ids or [B, gin] features.
        """
        c_up = None
        if c is not None and self.config.wavenet.cin_channels > 0:
            c_up = self.upsample(c)
            assert c_up.shape[1] == x.shape[1], \
                f"upsampled cond {c_up.shape} != input {x.shape}"
        y_hat = self.body(x, c_up, self.embed_global(g), train=train)
        return WaveNetOutput(y_hat=y_hat, upsampled_features=c_up)


def compute_wavenet_loss(out: WaveNetOutput, y_target, lengths,
                         cfg: Config) -> Dict[str, jnp.ndarray]:
    """Next-sample prediction loss (wavenet.py:476-519): y_hat[:, :-1] vs
    y[:, 1:], masked by (lengths - 1)."""
    wn = cfg.wavenet
    y_hat = out.y_hat[:, :-1]
    if is_mulaw_quantize(wn.input_type):
        y = y_target[:, 1:]                      # [B, T-1] int ids
        loss = D.masked_cross_entropy_loss(y_hat, y, lengths - 1)
    else:
        y = y_target[:, 1:]
        if y.ndim == 2:
            y = y[..., None]
        if wn.out_channels == 2:
            fn = lambda yh, yy, reduce: D.gaussian_mle_loss(
                yh, yy, log_scale_min_gauss=wn.log_scale_min_gauss,
                num_classes=wn.quantize_channels, use_cdf=wn.cdf_loss,
                reduce=reduce)
        else:
            fn = lambda yh, yy, reduce: D.discretized_mix_logistic_loss(
                yh, yy, num_classes=wn.quantize_channels,
                log_scale_min=wn.log_scale_min, reduce=reduce)
        loss = D.masked_distribution_loss(
            lambda yh, yy, reduce=False: fn(yh, yy, reduce), y_hat, y,
            lengths - 1)
    return {"loss": loss}


def data_dependent_init(model, params, x, c=None, g=None, *,
                        init_scale: float = 1.0):
    """Salimans-Kingma data-dependent initialization of weight-normed convs.

    Reference WeightNorm._data_dep_init (wavenet modules.py:110-126), run as
    a fresh-training forward pass (train.py:287-298): for each weight-normed
    layer IN EXECUTION ORDER, compute per-channel moments (m, v) of its
    pre-activation output on the init batch and assign
        g <- g * init_scale / sqrt(v + 1e-10),  bias <- -m * scale.
    Sequential like the reference (layer k's moments see layers 1..k-1
    already initialized), so one forward pass per weight-normed conv. Runs
    with train=False (deterministic moments; the reference's init pass kept
    dropout active, which only adds noise to the estimates).

    Returns the updated params tree.
    """
    import copy

    params = copy.deepcopy(jax.device_get(params))

    def capture():
        _, st = model.apply({"params": params}, x, c, g, train=False,
                            mutable=["intermediates"])
        found = []

        def walk(tree, path):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    if k == "wn_out":
                        found.append((path, v[0]))
                    else:
                        walk(v, path + (k,))
        walk(st["intermediates"], ())
        return found

    order = [path for path, _ in capture()]
    for target in order:
        out = dict(capture())[target]
        sub = params
        for k in target:
            sub = sub[k]
        if "g" not in sub:   # non-weight-normed conv also sows; skip
            continue
        axes = tuple(range(out.ndim - 1))
        m = np.asarray(jnp.mean(out, axis=axes), np.float32)
        v = np.asarray(jnp.var(out, axis=axes), np.float32)
        scale = init_scale / np.sqrt(v + 1e-10)
        sub["g"] = jnp.asarray(np.asarray(sub["g"]) * scale)
        if "bias" in sub:
            sub["bias"] = jnp.asarray(-m * scale)
    return params
