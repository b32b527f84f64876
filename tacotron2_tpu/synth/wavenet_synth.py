"""WaveNet synthesizer: mels → waveforms with EMA weights.

Parity with reference code/wavenet_vocoder/synthesizer.py:14-132: restore the
EMA shadow weights, pad/clip/[0,1]-normalize the conditioning mels, run the
batched incremental sampler, trim to true lengths, save wavs + plots.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np

from ..config import Config
from ..data import audio as host_audio
from ..data.wavenet_feeder import interp_to_unit
from ..models.wavenet.model import WaveNet
from ..models.wavenet.sampler import incremental_sample
from ..utils import log
from ..utils.plot import waveplot


class WaveNetSynthesizer:
    """use_fused_kernel: route generation through the fused Pallas sampler
    (ops/wavenet_kernel.py, ~10x the XLA scan) when the config is eligible
    (scalar input + Gaussian head + kernel_size 3, the defaults)."""

    def __init__(self, cfg: Config, ema_params, *, seed: int = 0,
                 use_fused_kernel: Optional[bool] = None):
        self.cfg = cfg
        self.model = WaveNet(config=cfg)
        self.params = ema_params
        self._key = jax.random.PRNGKey(seed)
        self._seed_counter = seed
        if use_fused_kernel is None:
            use_fused_kernel = (
                jax.default_backend() == "tpu"
                and cfg.wavenet.out_channels == 2
                and cfg.wavenet.input_type in ("raw", "mulaw")
                and cfg.wavenet.kernel_size == 3)
        self.use_fused_kernel = use_fused_kernel
        self._upsample = jax.jit(
            lambda p, c: self.model.apply({"params": p}, c,
                                          method=WaveNet.upsample))
        self._sample = jax.jit(
            lambda p, c_up, key: incremental_sample(p, cfg, c_up, key))

    def _prepare_mels(self, mels: Sequence[np.ndarray]):
        cfg = self.cfg
        pad_val = -cfg.audio.max_abs_value if cfg.audio.symmetric_mels else 0.0
        max_len = max(len(m) for m in mels)
        out = []
        for m in mels:
            m = np.pad(m, ((0, max_len - len(m)), (0, 0)), constant_values=pad_val)
            if cfg.audio.clip_for_wavenet:
                m = np.clip(m, pad_val, cfg.audio.max_abs_value)
            if cfg.audio.normalize_for_wavenet:
                m = interp_to_unit(m, cfg)
            out.append(m)
        return np.stack(out).astype(np.float32), [len(m) for m in mels]

    def synthesize(self, mels: Sequence[np.ndarray],
                   speaker_ids: Optional[Sequence[int]] = None
                   ) -> List[np.ndarray]:
        """Batched mels [frames, num_mels] → waveforms trimmed to true length."""
        c, frame_lengths = self._prepare_mels(mels)
        c_up = self._upsample(self.params, c)
        if self.use_fused_kernel:
            import jax.numpy as jnp

            from ..ops.wavenet_kernel import fused_incremental_sample
            self._seed_counter += 1
            cache_dtype = (jnp.bfloat16
                           if self.cfg.wavenet.sampler_cache_dtype == "bfloat16"
                           else jnp.float32)
            weight_dtype = (jnp.bfloat16
                            if self.cfg.wavenet.sampler_weight_dtype == "bfloat16"
                            else jnp.float32)
            thresh = self.cfg.wavenet.sampler_hbm_delay_threshold or None
            samples = np.asarray(fused_incremental_sample(
                self.params, self.cfg, c_up, self._seed_counter,
                cache_dtype=cache_dtype, weight_dtype=weight_dtype,
                hbm_delay_threshold=thresh,
                window=self.cfg.wavenet.sampler_window,
                chunk=self.cfg.wavenet.sampler_chunk))
        else:
            self._key, sk = jax.random.split(self._key)
            samples, _ = self._sample(self.params, c_up, sk)
            samples = np.asarray(samples)
        hop = self.cfg.audio.effective_hop
        wavs = []
        for i, L in enumerate(frame_lengths):
            wav = samples[i, : L * hop]
            if self.cfg.wavenet.input_type == "mulaw-quantize":
                from ..ops.mulaw import inv_mulaw_quantize
                wav = np.asarray(inv_mulaw_quantize(
                    wav.astype(np.int32), self.cfg.wavenet.quantize_channels - 1))
            elif self.cfg.wavenet.input_type == "mulaw":
                from ..ops.mulaw import inv_mulaw
                wav = np.asarray(inv_mulaw(wav,
                                           self.cfg.wavenet.quantize_channels - 1))
            wavs.append(wav.astype(np.float32))
        return wavs


    def synthesize_debug(self, wavs: Sequence[np.ndarray],
                         mels: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Teacher-forced sanity path (reference `wavenet_synth_debug`,
        synthesizer.py:50-53,83-94): run the parallel train-mode forward on
        ground-truth waveforms and return the one-step-ahead predicted means.
        A healthy checkpoint reproduces the input almost exactly; gross
        mismatch isolates vocoder bugs from conditioning/sampler bugs."""
        import jax.numpy as jnp

        from ..models.wavenet.distributions import \
            sample_from_discretized_mix_logistic
        c, frame_lengths = self._prepare_mels(mels)
        hop = self.cfg.audio.effective_hop
        T = c.shape[1] * hop
        x = np.zeros((len(wavs), T, 1), np.float32)
        for i, w in enumerate(wavs):
            x[i, :min(len(w), T), 0] = w[:T]
        out = self.model.apply({"params": self.params}, jnp.asarray(x),
                               jnp.asarray(c), train=False)
        y_hat = np.asarray(out.y_hat)
        if self.cfg.wavenet.out_channels == 2:        # Gaussian: [.., 0]=mean
            pred = y_hat[..., 0]
        elif self.cfg.wavenet.input_type == "mulaw-quantize":
            pred = np.argmax(y_hat, axis=-1).astype(np.float32)
            from ..ops.mulaw import inv_mulaw_quantize
            pred = np.asarray(inv_mulaw_quantize(
                pred.astype(np.int32), self.cfg.wavenet.quantize_channels - 1))
        else:                                          # MoL: sample means
            key = jax.random.PRNGKey(0)
            pred = np.asarray(sample_from_discretized_mix_logistic(
                key, jnp.asarray(y_hat)))
        return [pred[i, : L * hop].astype(np.float32)
                for i, L in enumerate(frame_lengths)]


def run_synthesis(synth: WaveNetSynthesizer, map_path: str, output_dir: str,
                  batch_size: Optional[int] = None,
                  limit: Optional[int] = None) -> List[str]:
    """Vocode every mel in a map.txt (reference wavenet synthesize.py:12-78)."""
    out_dir = os.path.join(output_dir, "wavs")
    plot_dir = os.path.join(output_dir, "plots")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(plot_dir, exist_ok=True)
    with open(map_path, encoding="utf-8") as f:
        rows = [line.strip().split("|") for line in f if line.strip()]
    if limit:
        rows = rows[:limit]
    bs = batch_size or synth.cfg.train.wavenet_synthesis_batch_size

    paths = []
    for start in range(0, len(rows), bs):
        chunk = rows[start:start + bs]
        # mel path: GTA map row -> col 2; eval map row -> col 0
        mel_paths = [r[2] if len(r) >= 4 else r[0] for r in chunk]
        mels = [np.load(p) for p in mel_paths]
        # pad the remainder batch to the full size so the fused kernel /
        # jit cache compiled for batch `bs` is reused (results discarded)
        n_real = len(mels)
        if n_real < bs:
            mels = mels + [mels[-1]] * (bs - n_real)
        wavs = synth.synthesize(mels)[:n_real]
        for i, wav in enumerate(wavs):
            name = os.path.splitext(os.path.basename(mel_paths[i]))[0]
            wav_path = os.path.join(out_dir, f"wavenet-{name}.wav")
            host_audio.save_wav(wav, wav_path, synth.cfg.audio.sample_rate)
            waveplot(os.path.join(plot_dir, f"wavenet-{name}.png"), wav, None,
                     synth.cfg.audio.sample_rate)
            paths.append(wav_path)
        log(f"vocoded {min(start + bs, len(rows))}/{len(rows)}")
    return paths
