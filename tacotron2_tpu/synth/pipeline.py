"""Single-program text→waveform serving pipeline.

The production chain — Tacotron memory pass → fused autoregressive decode
kernel → postnet → mel rescale → WaveNet conditioning upsample → fused
sampler kernel — compiled into ONE XLA program with zero host round-trips
between stages. The reference runs the same chain as two separate processes
handing off via disk (synthesize.py:33-45, tacotron/synthesizer.py →
wavenet_vocoder/synthesizer.py); the per-stage drivers here
(`TacotronSynthesizer`/`WaveNetSynthesizer`) keep the handoffs on device but
still activate one program per stage. For serving, one program means:

- one compile, one executable to load/warm per shape bucket;
- no host sync (or tunnel/PCIe hop) between the decoder and the vocoder;
- XLA schedules the inter-stage elementwise glue (clip, [0,1] interp,
  silence masking, padding) into the surrounding programs for free;
- stop-token length recovery runs on device (`synthesizer.py:384-387`
  semantics) and the mel tail is masked to the silence pad value, so the
  vocoder conditions on silence past each utterance's end instead of
  garbage frames.

Static shapes (B, T_in, max decode steps) are the serving shape bucket;
longer texts / more streams recompile into a new bucket, exactly like the
per-stage fused paths.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.tacotron.model import Tacotron
from ..models.wavenet.model import WaveNet
from ..models.wavenet.sampler import extract_sampler_params
from ..ops.tacotron_decoder_kernel import (build_decoder_kernel,
                                           extract_decoder_params)
from ..ops.wavenet_kernel import build_sampler_kernel


def _round_up(x: int, m: int) -> int:
    return x if x % m == 0 else x + m - x % m


class TextToWavProgram:
    """One jitted XLA program: padded text ids → waveform samples.

    Eligibility mirrors the per-stage fused paths: no `emt_attn` (its
    multihead variants decode via scan blocks), equal-width prenet, padded
    text ≤ 256 (the monolithic decode kernel's VMEM envelope), and the
    fused-sampler head family (scalar raw/mulaw input, kernel_size 3).

    `batch` is the sampler batch (the vocoder throughput lever);
    `taco_chunk` (≤ 64 on v5e) slices it for the decode kernel, whose VMEM
    working set scales with B — the program simply contains
    batch/taco_chunk decode-kernel calls followed by one sampler call.
    """

    def __init__(self, cfg: Config, taco_params, batch_stats, wn_params, *,
                 batch: int, steps: int, t_in: int, t_ref: int = 64,
                 taco_chunk: Optional[int] = None, upsample_chunk: int = 32,
                 interpret: bool = False, emt_only: bool = False,
                 sampler_bf16: Optional[bool] = None,
                 vocoder: str = "wavenet"):
        tc, au, wn = cfg.tacotron, cfg.audio, cfg.wavenet
        assert vocoder in ("wavenet", "griffin_lim")
        self.vocoder = vocoder
        assert not cfg.gst.emt_attn, \
            "emt_attn variants use the per-stage blocked/scan paths"
        assert len(set(tc.prenet_layers)) == 1, "kernel wants equal prenet FCs"
        assert _round_up(t_in, 1) <= 256, \
            "monolithic decode kernel envelope is 256 padded chars; " \
            "use the per-stage blocked kernel beyond it"
        if vocoder == "wavenet" and not interpret \
                and (wn.sampler_hbm_delay_threshold or 0) > 0:
            # the HBM-delay sampler's conditioning/delay DMA slices put the
            # batch on the lane dimension; Mosaic requires 128-alignment
            # (measured: B=64 fails to compile, B=256 is the serving shape)
            assert batch % 128 == 0, \
                "single-program pipeline with the HBM-delay sampler needs " \
                "batch % 128 == 0 (set wavenet.sampler_hbm_delay_threshold=0" \
                " for small all-VMEM batches)"
        self.cfg = cfg
        self.batch, self.steps, self.t_in, self.t_ref = batch, steps, t_in, t_ref
        self.taco_chunk = taco_chunk or min(batch, 64)
        assert batch % self.taco_chunk == 0, \
            "batch must be a multiple of taco_chunk"
        self.n_chunks = batch // self.taco_chunk
        self.upsample_chunk = min(upsample_chunk, batch)

        r, hop = tc.outputs_per_step, au.effective_hop
        self.hop = hop
        self.frames = steps * r
        self.t_audio = self.frames * hop
        self.t_audio_pad = _round_up(self.t_audio, wn.sampler_chunk)

        self._model = Tacotron(config=cfg, emt_only=emt_only)
        self._wn_model = WaveNet(config=cfg)
        self._taco_params = taco_params
        self._batch_stats = batch_stats or {}
        self._wn_params = wn_params if vocoder == "wavenet" else {}
        self._dec_params = extract_decoder_params(taco_params, cfg,
                                                  emt_only=emt_only)
        self._sampler_params = (extract_sampler_params(wn_params, cfg)
                                if vocoder == "wavenet" else ())

        # memory width M (encoder output ++ tiled style embedding) via an
        # abstract pass — needed to size the decode kernel before any data
        mem_shapes = jax.eval_shape(
            self._memory_fn, taco_params, self._batch_stats,
            jax.ShapeDtypeStruct((self.taco_chunk, t_in), jnp.int32),
            jax.ShapeDtypeStruct((self.taco_chunk,), jnp.int32),
            jax.ShapeDtypeStruct((self.taco_chunk, t_ref, au.num_mels),
                                 jnp.float32),
            jax.ShapeDtypeStruct((self.taco_chunk, t_ref, au.num_mels),
                                 jnp.float32))
        self.memory_width = int(mem_shapes[1].shape[-1])

        wd = (jnp.bfloat16 if tc.fused_decoder_dtype == "bfloat16"
              else jnp.float32)
        self._dec_run = build_decoder_kernel(
            cfg, self.taco_chunk, t_in, steps, self.memory_width,
            weight_dtype=wd, emit_alignments=False,
            early_stop_block=tc.early_stop_block, interpret=interpret)
        if vocoder == "wavenet":
            # serving default: bf16 delay cache + weights — the
            # measured-best production sampler config (parity-validated; an
            # f32 HBM-delay sampler at B=256 alone wants ~194 MB of VMEM
            # and cannot compile). Interpret-mode tests stay f32 for exact
            # XLA-scan comparison.
            if sampler_bf16 is None:
                sampler_bf16 = not interpret
            sdt = jnp.bfloat16 if sampler_bf16 else jnp.float32
            cache_dtype = (jnp.bfloat16
                           if wn.sampler_cache_dtype == "bfloat16" else sdt)
            weight_dtype = (jnp.bfloat16
                            if wn.sampler_weight_dtype == "bfloat16" else sdt)
            self._sampler_run = build_sampler_kernel(
                cfg, batch, self.t_audio_pad, chunk=wn.sampler_chunk,
                cache_dtype=cache_dtype, weight_dtype=weight_dtype,
                hbm_delay_threshold=wn.sampler_hbm_delay_threshold or None,
                window=wn.sampler_window, interpret=interpret)
        else:
            # Griffin-Lim route (the reference's vocoder-free default,
            # synthesize.py GL_on_GPU): pure XLA, inlines into the program.
            # Output matches mels_to_wavs' hop*(frames-1) trim; the host
            # wrapper applies inv_preemphasis (as the reference does,
            # tacotron/train.py:660).
            self._sampler_run = None
            self.t_audio = self.hop * (self.frames - 1)

        self._seed = 0
        self._jit_run = jax.jit(self._forward)
        self._sharded_cache = {}

    # ------------------------------------------------------------ stage fns

    def _memory_fn(self, params, batch_stats, inputs, input_lengths,
                   refs_emt, refs_spk):
        return self._model.apply(
            {"params": params, "batch_stats": batch_stats},
            inputs, input_lengths, refs_emt, refs_spk,
            method=Tacotron.synthesis_memory_ext)

    def _postnet_fn(self, params, batch_stats, frames):
        return self._model.apply(
            {"params": params, "batch_stats": batch_stats}, frames,
            method=Tacotron.postnet_pass)

    # ------------------------------------------------------------- program

    def _forward(self, taco_params, batch_stats, dec_params, wn_params,
                 sampler_params, inputs, input_lengths, refs_emt, refs_spk,
                 seed):
        cfg, au = self.cfg, self.cfg.audio
        r = cfg.tacotron.outputs_per_step
        C = self.taco_chunk
        mels_l, stops_l = [], []
        for i in range(self.n_chunks):
            sl = slice(i * C, (i + 1) * C)
            keys, memory, mask, _, _ = self._memory_fn(
                taco_params, batch_stats, inputs[sl], input_lengths[sl],
                refs_emt[sl], refs_spk[sl])
            frames, stops, _ = self._dec_run(dec_params, keys, memory, mask,
                                             seed + i)
            _, mel = self._postnet_fn(taco_params, batch_stats, frames)
            mels_l.append(mel)
            stops_l.append(stops)
        mel = jnp.concatenate(mels_l, axis=0)          # [B, frames, mels]
        stops = jnp.concatenate(stops_l, axis=0)       # [B, frames]

        # device stop-length recovery (synthesizer.py:384-387: first frame
        # whose stop prob rounds to 1, else full length)
        fired = stops >= 0.5
        first = jnp.argmax(fired, axis=1)
        mel_len = jnp.where(jnp.any(fired, axis=1), first, self.frames)
        mel_len = jnp.maximum(mel_len, r)              # ≥ one reduction group

        # mask the tail to normalized silence so the vocoder conditions on
        # silence past the end (denormalizes to min_level_db, not a loud pad)
        lo = -au.max_abs_value if au.symmetric_mels else 0.0
        pad_val = lo if au.signal_normalization else \
            (au.min_level_db - au.ref_level_db)
        frame_idx = jnp.arange(self.frames)[None, :, None]
        mel = jnp.where(frame_idx < mel_len[:, None, None], mel, pad_val)

        if self.vocoder == "griffin_lim":
            from ..ops import griffin_lim as gl
            samples = gl.inv_mel_spectrogram(mel, au)[:, :self.t_audio]
            wav_len = jnp.minimum(mel_len * self.hop, self.t_audio)
            return samples, wav_len, mel, stops, mel_len

        # rescale to [0,1] (feeder _interp parity) and vocode
        c = mel
        if au.clip_for_wavenet:
            c = jnp.clip(c, lo, au.max_abs_value)
        if au.normalize_for_wavenet:
            c = (c - lo) / (au.max_abs_value - lo)

        ups = [self._wn_model.apply({"params": wn_params},
                                    c[j:j + self.upsample_chunk],
                                    method=WaveNet.upsample)
               for j in range(0, self.batch, self.upsample_chunk)]
        c_up = jnp.concatenate(ups, axis=0)            # [B, frames*hop, mels]
        if c_up.shape[1] < self.t_audio_pad:
            c_up = jnp.pad(
                c_up, ((0, 0), (0, self.t_audio_pad - c_up.shape[1]), (0, 0)))
        samples = self._sampler_run(sampler_params, c_up, seed)
        return (samples[:, :self.t_audio], mel_len * self.hop, mel, stops,
                mel_len)

    # --------------------------------------------------------------- public

    def __call__(self, inputs, input_lengths, refs_emt, refs_spk
                 ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array,
                            jax.Array]:
        """Run the program. Returns (samples [B, t_audio], wav_lengths [B],
        mel [B, frames, num_mels], stop_probs [B, frames], mel_lengths [B]).
        Trim host-side: `samples[i, :wav_lengths[i]]`."""
        assert inputs.shape == (self.batch, self.t_in), \
            f"expected {(self.batch, self.t_in)}, got {inputs.shape}"
        nm = self.cfg.audio.num_mels
        assert refs_emt.shape == (self.batch, self.t_ref, nm), \
            f"refs_emt must be {(self.batch, self.t_ref, nm)}, " \
            f"got {refs_emt.shape}"
        assert refs_spk.shape == (self.batch, self.t_ref, nm), \
            f"refs_spk must be {(self.batch, self.t_ref, nm)}, " \
            f"got {refs_spk.shape}"
        self._seed += self.n_chunks
        return self._jit_run(
            self._taco_params, self._batch_stats, self._dec_params,
            self._wn_params, self._sampler_params,
            jnp.asarray(inputs), jnp.asarray(input_lengths),
            jnp.asarray(refs_emt), jnp.asarray(refs_spk),
            jnp.asarray(self._seed, jnp.int32))

    def sharded_call(self, mesh, inputs, input_lengths, refs_emt, refs_spk,
                     axis: str = "data"):
        """Multi-chip serving: shard the global batch over `axis` — each
        device runs the FULL single-chip program on its local shard with a
        decorrelated sampler seed. Zero per-step communication (the same
        rationale as `sharded_incremental_sample`: model-sharding the
        sampler would put an ICI collective inside every ~62 µs sample
        step; batch-sharding needs none). The program must be built with
        `batch` = the PER-DEVICE batch; global inputs carry
        mesh.shape[axis] × batch rows."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        n = mesh.shape[axis]
        assert inputs.shape[0] == n * self.batch, \
            f"global batch {inputs.shape[0]} != {n} devices × {self.batch}"
        self._seed += self.n_chunks * n

        fn = self._sharded_cache.get((mesh, axis))
        if fn is None:
            def local(tp, bs, dp, wp, sp, i, il, re, rs, seed):
                shard = jax.lax.axis_index(axis)
                return self._forward(tp, bs, dp, wp, sp, i, il, re, rs,
                                     seed + shard * self.n_chunks)

            rep = P()
            fn = jax.jit(shard_map(
                local, mesh=mesh,
                in_specs=(rep, rep, rep, rep, rep,
                          P(axis), P(axis), P(axis), P(axis), rep),
                out_specs=(P(axis),) * 5, check_rep=False))
            self._sharded_cache[(mesh, axis)] = fn
        return fn(
            self._taco_params, self._batch_stats, self._dec_params,
            self._wn_params, self._sampler_params,
            jnp.asarray(inputs), jnp.asarray(input_lengths),
            jnp.asarray(refs_emt), jnp.asarray(refs_spk),
            jnp.asarray(self._seed, jnp.int32))

    def synthesize(self, texts, ref_mels_emt, ref_mels_spk):
        """Convenience host wrapper: texts/refs → list of trimmed wavs.

        Batches shorter than the program's bucket are padded with repeats of
        the first row and trimmed after (a serving bucket never asserts on a
        short final batch); longer ones run in multiple program calls."""
        from ..text import text_to_sequence
        n = len(texts)
        assert n > 0 and len(ref_mels_emt) == n and len(ref_mels_spk) == n
        seqs = [np.asarray(text_to_sequence(t, self.cfg.data.cleaners),
                           np.int32) for t in texts]
        lengths = np.asarray([len(s) for s in seqs], np.int32)
        assert int(lengths.max()) <= self.t_in, \
            f"text longer than the program's t_in={self.t_in} bucket"
        inputs = np.stack([np.pad(s, (0, self.t_in - len(s)))
                           for s in seqs])
        pad_val = -self.cfg.audio.max_abs_value

        def pad_ref(m):
            m = np.asarray(m, np.float32)[:self.t_ref]
            return np.pad(m, ((0, self.t_ref - len(m)), (0, 0)),
                          constant_values=pad_val)

        refs_e = np.stack([pad_ref(m) for m in ref_mels_emt])
        refs_s = np.stack([pad_ref(m) for m in ref_mels_spk])

        samples_l, wav_len_l = [], []
        for i in range(0, n, self.batch):
            sl = slice(i, i + self.batch)
            ii, ll = inputs[sl], lengths[sl]
            re_, rs = refs_e[sl], refs_s[sl]
            short = self.batch - len(ii)
            if short:                      # fill the bucket with row repeats
                fill = np.arange(short) % len(ii)
                ii = np.concatenate([ii, ii[fill]])
                ll = np.concatenate([ll, ll[fill]])
                re_ = np.concatenate([re_, re_[fill]])
                rs = np.concatenate([rs, rs[fill]])
            s, wl, _, _, _ = self(ii, ll, re_, rs)
            take = self.batch - short
            samples_l.append(np.asarray(s)[:take])
            wav_len_l.append(np.asarray(wl)[:take])
        samples = np.concatenate(samples_l)
        wav_len = np.concatenate(wav_len_l)
        wavs = [samples[i, :wav_len[i]] for i in range(n)]
        if self.vocoder == "griffin_lim":
            from ..data import audio as host_audio
            a = self.cfg.audio
            wavs = [host_audio.inv_preemphasis(w, a.preemphasis,
                                               a.preemphasize) for w in wavs]
        elif self.cfg.wavenet.input_type == "mulaw":
            # per-stage parity (wavenet_synth.py:98-103): the sampler emits
            # companded samples for mulaw input; invert before returning
            from ..ops.mulaw import inv_mulaw
            q = self.cfg.wavenet.quantize_channels - 1
            wavs = [np.asarray(inv_mulaw(w, q), np.float32) for w in wavs]
        return wavs
