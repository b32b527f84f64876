"""Tacotron synthesizer: checkpointed model → mels, alignments, wavs.

Parity with reference code/tacotron/synthesizer.py (load/synthesize,
filenames_to_inputs, stop-token length recovery, G-L wav emission) and
code/tacotron/synthesize.py's modes:
- eval: sentences + reference mels → mels + map.txt for the vocoder
- gta: ground-truth-aligned teacher forcing → gta mels + map.txt
- synthesis: style transfer (text + emt-ref + spk-ref rows)

TPU notes: batches are padded to shape buckets so repeat synthesis hits the
jit cache; decoding runs a static `max_steps` scan and lengths are recovered
from stop tokens on the host (synthesizer.py:384-387).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import audio as host_audio
from ..models.tacotron.model import Tacotron
from ..ops import griffin_lim
from ..text import text_to_sequence
from ..utils import log
from ..utils.plot import plot_alignment, plot_spectrogram


def _round_up(x: int, m: int) -> int:
    return x if x % m == 0 else x + m - x % m


def gl_pad_value(a) -> float:
    """Mel value used to pad a Griffin-Lim batch: must denormalize to
    min_level_db silence, NOT to a loud frame (a -max_abs_value pad in the
    raw-dB domain would invert to near-full-scale noise)."""
    if a.signal_normalization:
        # normalized-domain silence: denormalizes to min_level_db
        return -a.max_abs_value if a.symmetric_mels else 0.0
    # raw-dB domain: inv path adds ref_level_db back before dB→amp
    return a.min_level_db - a.ref_level_db


class TacotronSynthesizer:
    """Bound model + params with batched synthesis entry points."""

    def __init__(self, cfg: Config, params, batch_stats=None, *,
                 model: Optional[Tacotron] = None, seed: int = 0):
        self.cfg = cfg
        self.model = model or Tacotron(config=cfg)
        self.params = params
        self.batch_stats = batch_stats or {}
        self._key = jax.random.PRNGKey(seed)
        self._jit_synth = jax.jit(self._synth_fn,
                                  static_argnames=("max_steps", "use_gta"))
        # fused Pallas decode path (ops/tacotron_decoder_kernel.py)
        self._jit_memory = jax.jit(self._memory_fn)
        self._jit_postnet = jax.jit(self._postnet_fn)
        self._dec_params = None
        self._fused_cache: Dict[tuple, object] = {}
        self._fused_seed = seed
        self._jit_block = jax.jit(self._block_fn, static_argnames=("k",))

    # ------------------------------------------------------------- plumbing

    def _rngs(self):
        self._key, k1, k2, k3 = jax.random.split(self._key, 4)
        return dict(dropout=k1, zoneout=k2, teacher_forcing=k3)

    def _synth_fn(self, params, batch_stats, inputs, input_lengths,
                  ref_mel_emt, ref_mel_spk, mel_targets, emt_labels, rngs, *,
                  max_steps: int, use_gta: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        if use_gta:
            out = self.model.apply(
                variables, inputs, input_lengths, mel_targets=mel_targets,
                ref_mel_emt=ref_mel_emt, ref_mel_spk=ref_mel_spk,
                emt_labels=emt_labels, gta=True, train=False, rngs=rngs)
        else:
            out = self.model.apply(
                variables, inputs, input_lengths,
                ref_mel_emt=ref_mel_emt, ref_mel_spk=ref_mel_spk,
                emt_labels=emt_labels,
                synthesis=True, max_steps=max_steps, train=False, rngs=rngs)
        return (out.mel_outputs, out.alignments, out.stop_token_prediction)

    def _memory_fn(self, params, batch_stats, inputs, input_lengths,
                   ref_mel_emt, ref_mel_spk):
        return self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            inputs, input_lengths, ref_mel_emt, ref_mel_spk,
            method=Tacotron.synthesis_memory_ext)

    def _block_fn(self, params, batch_stats, carry, keys, memory, mask,
                  emt_memory, ref_spk, rngs, *, k: int):
        """One K-step autoregressive block from an explicit decoder state."""
        from ..models.tacotron.decoder import Decoder
        dec = Decoder(config=self.cfg)
        frames, stops, aligns, _, new_carry = dec.apply(
            {"params": params["decoder"]}, memory.shape[0], k, keys, memory,
            mask, emt_memory=emt_memory, ref_spk=ref_spk,
            initial_state=carry, return_state=True,
            method=Decoder.autoregressive, rngs=rngs)
        return frames, stops, aligns, new_carry

    def _scan_block_synth(self, inputs, input_lengths, refs_emt, refs_spk,
                          steps: int, k: int):
        """XLA-scan decode in K-step blocks with host-side early exit.

        The reference's dynamic_decode stops when every stream's stop
        condition fired (custom_decoder.py:107-139, helpers.py:51-56); here
        the host checks the sticky fired flags between jitted blocks —
        short-utterance batches pay O(longest utterance), not O(max_iters).
        """
        import jax.numpy as jnp

        from ..models.tacotron.decoder import Decoder
        tc = self.cfg.tacotron
        keys, memory, mask, emt_memory, ref_spk = self._jit_memory(
            self.params, self.batch_stats, jnp.asarray(inputs),
            jnp.asarray(input_lengths), jnp.asarray(refs_emt),
            jnp.asarray(refs_spk))
        B = memory.shape[0]
        dec = Decoder(config=self.cfg)
        carry = dec.bind({"params": self.params["decoder"]})._initial_carry(
            B, memory, tc.compute_dtype == "bfloat16")
        fired = np.zeros(B, bool)
        frames_l, stops_l, aligns_l = [], [], []
        n_blocks = -(-steps // k)
        for b in range(n_blocks):
            frames, stops, aligns, carry = self._jit_block(
                self.params, self.batch_stats, carry, keys, memory, mask,
                emt_memory, ref_spk, self._rngs(), k=k)
            frames_l.append(np.asarray(frames))
            stops_l.append(np.asarray(stops))
            aligns_l.append(np.asarray(aligns))
            sp = stops_l[-1].reshape(B, k, tc.outputs_per_step)
            fin = (sp.max(-1) if tc.stop_at_any else sp.min(-1)) > 0.5
            fired |= fin.any(axis=1)
            if fired.all():
                break
        r = tc.outputs_per_step
        # the block loop rounds up to ceil(steps/k)*k decoder steps; trim to
        # the requested cap so non-converged streams match the scan/fused
        # paths' max_steps semantics
        frames = jnp.asarray(np.concatenate(frames_l, axis=1)[:, : steps * r])
        stops = np.concatenate(stops_l, axis=1)[:, : steps * r]
        aligns = np.concatenate(aligns_l, axis=2)[:, :, : steps]
        _, mel_out = self._jit_postnet(self.params, self.batch_stats, frames)
        return mel_out, aligns, stops

    def _postnet_fn(self, params, batch_stats, frames):
        return self.model.apply(
            {"params": params, "batch_stats": batch_stats}, frames,
            method=Tacotron.postnet_pass)

    def _fused_eligible(self, t_in_padded: int) -> bool:
        tc, gst = self.cfg.tacotron, self.cfg.gst
        return (tc.use_fused_decoder
                and jax.default_backend() == "tpu"   # scan path elsewhere
                and not gst.emt_attn
                and t_in_padded <= 256               # VMEM: operands ~ T^2
                and len(set(tc.prenet_layers)) == 1)

    def _fused_block_eligible(self, batch: int, t_in_padded: int) -> bool:
        """Long-input (and emt_attn 'simple'/'multihead') fused path: the
        blocked kernel's tiled attention operands scale with B*Tp*M instead
        of Tp^2, so T_in beyond 256 stays on the MXU as long as the resident
        operands fit VMEM (~512 at B<=32, ~1024 at B<=16 on v5e); the
        simple and multihead(mlp) emt-reference attentions run in-kernel
        (style_tokens needs emt labels -> scan path)."""
        from ..ops.tacotron_decoder_kernel import block_kernel_vmem_bytes
        tc, gst = self.cfg.tacotron, self.cfg.gst
        emt_ok = (not gst.emt_attn
                  or gst.emt_attn_type == "simple"
                  or (gst.emt_attn_type == "multihead"
                      and gst.style_att_type == "mlp_attention"))
        if not (tc.use_fused_decoder
                and jax.default_backend() == "tpu"
                and emt_ok
                and len(set(tc.prenet_layers)) == 1):
            return False
        k = max(tc.fused_block_steps, 1)
        M = 1024  # pre-embed estimate; _fused_block_synth re-checks real M
        return block_kernel_vmem_bytes(
            self.cfg, batch, t_in_padded, k, M) <= 100 * 1024 * 1024

    def _fused_block_synth(self, inputs, input_lengths, refs_emt, refs_spk,
                           steps: int, k: int):
        """Blocked fused decode for long inputs: K-step Pallas kernel calls
        with explicit carry, host-side early exit between blocks (the
        reference dynamic_decode stop, custom_decoder.py:107-139)."""
        import jax.numpy as jnp

        from ..ops.tacotron_decoder_kernel import (build_decoder_block_kernel,
                                                   extract_decoder_params,
                                                   init_decoder_state)
        tc, gst = self.cfg.tacotron, self.cfg.gst
        keys, memory, mask, emt_memory, ref_spk = self._jit_memory(
            self.params, self.batch_stats, jnp.asarray(inputs),
            jnp.asarray(input_lengths), jnp.asarray(refs_emt),
            jnp.asarray(refs_spk))
        B, t_in, M = memory.shape
        # eligibility was gated on an M=1024 estimate before the memory was
        # built; re-validate with the REAL width and fall back to the scan
        # block path rather than failing at kernel build (ADVICE r3)
        from ..ops.tacotron_decoder_kernel import block_kernel_vmem_bytes
        if block_kernel_vmem_bytes(self.cfg, B, t_in, k, int(M)) \
                > 100 * 1024 * 1024:
            return self._scan_block_synth(
                inputs, input_lengths, refs_emt, refs_spk, steps,
                max(self.cfg.tacotron.early_stop_block, 1))
        if self._dec_params is None:
            self._dec_params = extract_decoder_params(
                self.params, self.cfg, emt_only=self.model.emt_only)
        wd = (jnp.bfloat16 if tc.fused_decoder_dtype == "bfloat16"
              else jnp.float32)
        emt_T = (int(emt_memory.shape[1])
                 if gst.emt_attn and emt_memory is not None else None)
        cache_key = ("block", B, t_in, M, k, emt_T)
        run = self._fused_cache.get(cache_key)
        if run is None:
            run = build_decoder_block_kernel(self.cfg, B, t_in, k, M,
                                             weight_dtype=wd, emt_T=emt_T)
            self._fused_cache[cache_key] = run
        state = init_decoder_state(self.cfg, B, t_in, M)
        fired = np.zeros(B, bool)
        frames_l, stops_l, aligns_l = [], [], []
        n_blocks = -(-steps // k)
        for _ in range(n_blocks):
            self._fused_seed += 1
            frames, stops, aligns, state = run(
                self._dec_params, keys, memory, mask, state,
                self._fused_seed, emt_memory, ref_spk)
            frames_l.append(np.asarray(frames))
            stops_l.append(np.asarray(stops))
            aligns_l.append(np.asarray(aligns))
            sp = stops_l[-1].reshape(B, k, tc.outputs_per_step)
            fin = (sp.max(-1) if tc.stop_at_any else sp.min(-1)) > 0.5
            fired |= fin.any(axis=1)
            if fired.all():
                break
        r = tc.outputs_per_step
        frames = jnp.asarray(np.concatenate(frames_l, axis=1)[:, : steps * r])
        stops = np.concatenate(stops_l, axis=1)[:, : steps * r]
        aligns = np.concatenate(aligns_l, axis=2)[:, :, : steps]
        _, mel_out = self._jit_postnet(self.params, self.batch_stats, frames)
        return mel_out, aligns, stops

    def _fused_synth(self, inputs, input_lengths, refs_emt, refs_spk,
                     steps: int):
        """Autoregressive decode via the fused Pallas kernel: jitted
        memory/keys pass -> whole-decode kernel -> jitted postnet."""
        import jax.numpy as jnp

        from ..ops.tacotron_decoder_kernel import (build_decoder_kernel,
                                                   extract_decoder_params)
        keys, memory, mask, _, _ = self._jit_memory(
            self.params, self.batch_stats, jnp.asarray(inputs),
            jnp.asarray(input_lengths), jnp.asarray(refs_emt),
            jnp.asarray(refs_spk))
        B, t_in, M = memory.shape
        if self._dec_params is None:
            self._dec_params = extract_decoder_params(self.params, self.cfg)
        wd = (jnp.bfloat16 if self.cfg.tacotron.fused_decoder_dtype == "bfloat16"
              else jnp.float32)
        cache_key = (B, t_in, M, steps)
        run = self._fused_cache.get(cache_key)
        if run is None:
            run = build_decoder_kernel(
                self.cfg, B, t_in, steps, M, weight_dtype=wd,
                early_stop_block=self.cfg.tacotron.early_stop_block)
            self._fused_cache[cache_key] = run
        self._fused_seed += 1
        frames, stops, aligns = run(self._dec_params, keys, memory, mask,
                                    self._fused_seed)
        _, mel_out = self._jit_postnet(self.params, self.batch_stats, frames)
        return mel_out, aligns, stops

    def prepare_inputs(self, texts: Sequence[str],
                       pad_multiple: int = 16) -> Tuple[np.ndarray, np.ndarray]:
        """Texts → padded id matrix + lengths (synthesizer.py:297-362)."""
        seqs = [np.asarray(text_to_sequence(t, self.cfg.data.cleaners), np.int32)
                for t in texts]
        lengths = np.asarray([len(s) for s in seqs], np.int32)
        max_len = _round_up(int(lengths.max()), pad_multiple)
        inputs = np.stack([np.pad(s, (0, max_len - len(s))) for s in seqs])
        return inputs, lengths

    def _pad_refs(self, refs: Sequence[np.ndarray], pad_multiple: int = 64):
        pad_val = -self.cfg.audio.max_abs_value
        max_len = _round_up(max(len(r) for r in refs), pad_multiple)
        return np.stack([
            np.pad(r, ((0, max_len - len(r)), (0, 0)), constant_values=pad_val)
            for r in refs]).astype(np.float32)

    def get_output_lengths(self, stop_probs: np.ndarray) -> List[int]:
        """First index with stop>0.5, else full length (synthesizer.py:384-387)."""
        out = []
        for row in np.round(np.asarray(stop_probs)).astype(np.int32):
            idx = np.flatnonzero(row == 1)
            out.append(int(idx[0]) if len(idx) else len(row))
        return out

    # ------------------------------------------------------------ synthesis

    def synthesize(self, texts: Sequence[str], ref_mels_emt: Sequence[np.ndarray],
                   ref_mels_spk: Sequence[np.ndarray],
                   mel_targets: Optional[Sequence[np.ndarray]] = None,
                   gta: bool = False, max_steps: Optional[int] = None,
                   emt_labels: Optional[Sequence[int]] = None
                   ) -> Dict[str, List[np.ndarray]]:
        """Batch synthesis; returns trimmed mels + alignments (+ raw stops).

        `emt_labels` drives the style_tokens emt_attn variant's decoder
        attention query (one-hot concat, tacotron_emt_attn.py:261-285);
        that variant defaults to label 0 when omitted."""
        labels_arr = (jnp.asarray(np.asarray(emt_labels, np.int32))
                      if emt_labels is not None else None)
        inputs, input_lengths = self.prepare_inputs(texts)
        refs_emt = self._pad_refs(ref_mels_emt)
        refs_spk = self._pad_refs(ref_mels_spk)

        if gta:
            assert mel_targets is not None
            r = self.cfg.tacotron.outputs_per_step
            pad_val = -self.cfg.audio.max_abs_value
            tgt_lengths = [len(m) for m in mel_targets]
            max_t = _round_up(max(tgt_lengths), max(r, 64))
            targets = np.stack([
                np.pad(m, ((0, max_t - len(m)), (0, 0)), constant_values=pad_val)
                for m in mel_targets]).astype(np.float32)
            mels, aligns, stops = self._jit_synth(
                self.params, self.batch_stats, inputs, input_lengths,
                refs_emt, refs_spk, targets, labels_arr, self._rngs(),
                max_steps=0, use_gta=True)
            lengths = tgt_lengths
        else:
            steps = max_steps or self.cfg.tacotron.max_iters
            k = self.cfg.tacotron.early_stop_block
            # emt_attn block decode needs the emt-attention operands threaded
            # through the jitted block; style_tokens additionally needs emt
            # labels (not part of the synthesize() API) so it keeps the
            # one-shot scan path
            blockable = (not self.cfg.gst.emt_attn
                         or self.cfg.gst.emt_attn_type in ("simple",
                                                           "multihead"))
            kf = min(max(self.cfg.tacotron.fused_block_steps, 1), steps)
            if self._fused_eligible(inputs.shape[1]):
                mels, aligns, stops = self._fused_synth(
                    inputs, input_lengths, refs_emt, refs_spk, steps)
            elif (0 < k < steps and self._fused_block_eligible(
                    len(inputs), inputs.shape[1])):
                mels, aligns, stops = self._fused_block_synth(
                    inputs, input_lengths, refs_emt, refs_spk, steps, kf)
            elif 0 < k < steps and blockable:
                mels, aligns, stops = self._scan_block_synth(
                    inputs, input_lengths, refs_emt, refs_spk, steps, k)
            else:
                mels, aligns, stops = self._jit_synth(
                    self.params, self.batch_stats, inputs, input_lengths,
                    refs_emt, refs_spk, None, labels_arr, self._rngs(),
                    max_steps=steps, use_gta=False)
            lengths = self.get_output_lengths(np.asarray(stops))

        mels = np.asarray(mels)
        aligns = np.asarray(aligns)
        m = self.cfg.audio.max_abs_value
        out_mels, out_aligns = [], []
        for i, L in enumerate(lengths):
            L = max(int(L), 1)
            out_mels.append(np.clip(mels[i, :L], -m, m))
            out_aligns.append(aligns[i, :input_lengths[i],
                                     : max(1, L // self.cfg.tacotron.outputs_per_step)])
        return dict(mels=out_mels, alignments=out_aligns,
                    stop_tokens=np.asarray(stops), lengths=lengths)

    def mel_to_wav(self, mel: np.ndarray) -> np.ndarray:
        """Griffin-Lim inversion (the GL_on_GPU path + inv preemphasis)."""
        wav = np.asarray(griffin_lim.inv_mel_spectrogram(mel, self.cfg.audio))
        return host_audio.inv_preemphasis(wav, self.cfg.audio.preemphasis,
                                          self.cfg.audio.preemphasize)

    def mels_to_wavs(self, mels: Sequence[np.ndarray],
                     max_batch: int = 32) -> list:
        """Batched Griffin-Lim inversion of variable-length mels.

        Pads to a common frame count (bucketed to multiples of 64 so
        repeated calls reuse one compilation) and inverts up to `max_batch`
        mels per device call (the big-batch shape is what makes the XLA G-L
        path hit its measured-best MXU throughput; chunking bounds device
        memory for large sentence lists), then trims each waveform to its
        utterance's own hop·(frames−1) samples — the same length the
        per-utterance mel_to_wav path produces.

        NOTE (documented divergence): padding frames participate in the G-L
        phase iterations, so batched waveforms differ slightly from the
        per-utterance mel_to_wav path near the tail (corr > 0.98; the pad
        denormalizes to silence, tests/test_new_modes.py)."""
        if not len(mels):
            return []
        if len(mels) > max_batch:
            out = []
            for i in range(0, len(mels), max_batch):
                out.extend(self.mels_to_wavs(mels[i:i + max_batch],
                                             max_batch))
            return out
        a = self.cfg.audio
        pad_val = gl_pad_value(a)
        F = max(m.shape[0] for m in mels)
        F = _round_up(F, 64) + 1
        batch = np.stack([np.pad(np.asarray(m, np.float32),
                                 ((0, F - m.shape[0]), (0, 0)),
                                 constant_values=pad_val) for m in mels])
        wavs = np.asarray(griffin_lim.inv_mel_spectrogram(
            jnp.asarray(batch), a))
        hop = a.effective_hop
        return [host_audio.inv_preemphasis(
                    wavs[i, : hop * (m.shape[0] - 1)],
                    a.preemphasis, a.preemphasize)
                for i, m in enumerate(mels)]

    def embed(self, texts: Sequence[str], mel_refs: Sequence[np.ndarray]
              ) -> Dict[str, np.ndarray]:
        """Embed-only pass (reference synthesizer `emb_only=True`): teacher-
        force on the reference mels themselves and return the ref-encoder
        embeddings of both the real refs and the re-embedded model output
        (tacotron/synthesize.py:363-372, tacotron.py:383-386)."""
        inputs, input_lengths = self.prepare_inputs(texts)
        refs = self._pad_refs(mel_refs)
        variables = {"params": self.params, "batch_stats": self.batch_stats}
        out = self.model.apply(
            variables, inputs, input_lengths, mel_targets=refs,
            ref_mel_emt=refs, ref_mel_spk=refs, gta=True, train=False,
            synth_embeddings=True, rngs=self._rngs())
        return dict(
            emb_emt=np.asarray(out.refnet_out_emt),
            emb_spk=(np.asarray(out.refnet_out_spk)
                     if out.refnet_out_spk is not None else None),
            emb_mo_emt=(np.asarray(out.refnet_out_mel_emt)
                        if out.refnet_out_mel_emt is not None else None),
            emb_mo_spk=(np.asarray(out.refnet_out_mel_spk)
                        if out.refnet_out_mel_spk is not None else None))


# ------------------------------------------------------------------- drivers


def run_eval(synth: TacotronSynthesizer, sentences: Sequence[str],
             ref_mels_emt, ref_mels_spk, output_dir: str,
             save_wavs: bool = True) -> str:
    """Sentences → mels + map.txt (+wavs/plots); reference run_eval
    (tacotron/synthesize.py:53-83).

    Wavs come from the batched chunked G-L (mels_to_wavs): not
    sample-identical to per-utterance inversion — see its docstring."""
    # absolute so map rows resolve regardless of the consumer's cwd
    eval_dir = os.path.abspath(os.path.join(output_dir, "eval"))
    os.makedirs(os.path.join(eval_dir, "mels"), exist_ok=True)
    if save_wavs:
        os.makedirs(os.path.join(eval_dir, "wavs"), exist_ok=True)
        os.makedirs(os.path.join(eval_dir, "plots"), exist_ok=True)

    result = synth.synthesize(sentences, ref_mels_emt, ref_mels_spk)
    wavs = synth.mels_to_wavs(result["mels"]) if save_wavs else []
    map_rows = []
    for i, (text, mel) in enumerate(zip(sentences, result["mels"])):
        mel_path = os.path.join(eval_dir, "mels", f"mel-eval-{i}.npy")
        np.save(mel_path, mel, allow_pickle=False)
        map_rows.append(f"{mel_path}|{text}")
        if save_wavs:
            wav = wavs[i]
            # trailing 0.5 s silence pad, as the reference does
            # (synthesizer.py:259-267)
            wav = np.concatenate([wav, np.zeros(synth.cfg.audio.sample_rate // 2,
                                                np.float32)])
            host_audio.save_wav(wav, os.path.join(eval_dir, "wavs",
                                                  f"wav-eval-{i}.wav"),
                                synth.cfg.audio.sample_rate)
            plot_alignment(result["alignments"][i],
                           os.path.join(eval_dir, "plots", f"alignment-eval-{i}.png"),
                           title=text)
            plot_spectrogram(mel,
                             os.path.join(eval_dir, "plots", f"mel-eval-{i}.png"),
                             title=text)
    map_path = os.path.join(eval_dir, "map.txt")
    with open(map_path, "w", encoding="utf-8") as f:
        f.write("\n".join(map_rows) + "\n")
    log(f"Wrote eval synthesis for {len(sentences)} sentences -> {eval_dir}")
    return map_path


def run_gta_synthesis(synth: TacotronSynthesizer, metadata_path: str,
                      output_dir: str, batch_size: int = 32,
                      limit: Optional[int] = None) -> str:
    """Teacher-forced GTA mels for the whole corpus → map.txt feeding WaveNet.

    Reference: run_synthesis (tacotron/synthesize.py GTA mode) writing
    tacotron_output/gta/map.txt rows `audio|gt_mel|gta_mel|time_steps|text`.
    """
    gta_dir = os.path.abspath(os.path.join(output_dir, "gta"))
    os.makedirs(os.path.join(gta_dir, "mels"), exist_ok=True)
    data_dir = os.path.abspath(os.path.dirname(metadata_path))
    with open(metadata_path, encoding="utf-8") as f:
        meta = [line.strip().split("|") for line in f if line.strip()]
    if limit:
        meta = meta[:limit]

    map_rows = []
    for start in range(0, len(meta), batch_size):
        rows = meta[start:start + batch_size]
        texts = [r[7] for r in rows]
        mels = [np.load(os.path.join(data_dir, r[0], "mels", r[2])) for r in rows]
        result = synth.synthesize(texts, mels, mels, mel_targets=mels, gta=True)
        for r, mel_out in zip(rows, result["mels"]):
            out_path = os.path.join(gta_dir, "mels", f"gta-{r[2]}")
            np.save(out_path, mel_out, allow_pickle=False)
            audio_path = os.path.join(data_dir, r[0], "audio", r[1])
            gt_mel_path = os.path.join(data_dir, r[0], "mels", r[2])
            map_rows.append(f"{audio_path}|{gt_mel_path}|{out_path}|{r[5]}|{r[7]}")
        log(f"GTA synthesis {min(start + batch_size, len(meta))}/{len(meta)}")

    map_path = os.path.join(gta_dir, "map.txt")
    with open(map_path, "w", encoding="utf-8") as f:
        f.write("\n".join(map_rows) + "\n")
    log(f"Wrote GTA map -> {map_path}")
    return map_path


def _read_meta(path: str) -> List[List[str]]:
    with open(path, encoding="utf-8") as f:
        return [line.strip().split("|") for line in f
                if line.strip() and not line.startswith("#")]


def _resolve_refs(meta: List[List[str]], input_dir: str,
                  flip_spk_emt: bool = False):
    """Resolve per-row emotion/speaker reference mel paths from a synthesis
    metadata file (reference get_filenames_from_metadata,
    tacotron/synthesize.py:85-129).

    Rows use the train.txt schema with two extra columns appended:
      [12] emt ref — 'same' (use own mel) or 'dataset/mel-file.npy'
      [14] spk ref — 'same' or 'dataset/mel-file.npy'
    Unlike the reference (which hard-codes emt refs to emt4/emth and spk refs
    to jessa), refs name their dataset explicitly, keeping the policy generic.
    """
    texts, mel_paths, refs_emt, refs_spk, basenames = [], [], [], [], []
    emt_labels, spk_labels = [], []
    for m in meta:
        own = os.path.join(input_dir, m[0], "mels", m[2])
        texts.append(m[7])
        mel_paths.append(own)

        def ref_path(spec):
            if spec == "same":
                return own
            ds, _, fname = spec.partition("/")
            return os.path.join(input_dir, ds, "mels", fname)

        emt_spec = m[12] if len(m) > 12 else "same"
        spk_spec = m[14] if len(m) > 14 else "same"
        refs_emt.append(ref_path(emt_spec))
        refs_spk.append(ref_path(spk_spec))
        ref_tag = m[13] if len(m) > 13 else "same"
        basenames.append(f"{m[10].split('.')[0]}_{ref_tag}")
        emt_labels.append(int(m[8]))
        spk_labels.append(int(m[9]))
    if flip_spk_emt:
        refs_emt, refs_spk = refs_spk, refs_emt
    return texts, mel_paths, refs_emt, refs_spk, basenames, emt_labels, spk_labels


def run_style_transfer(synth: TacotronSynthesizer, synth_metadata_path: str,
                       input_dir: str, output_dir: str, *,
                       flip_spk_emt: bool = False, batch_size: int = 16,
                       save_wavs: bool = True,
                       limit: Optional[int] = None) -> str:
    """'synthesis' mode: per-row text + emt-ref + spk-ref style transfer
    (reference run_synthesis_sytle_transfer, tacotron/synthesize.py:132-152).

    Writes mels/wavs/plots under `<output_dir>/natural/` plus a map.txt with
    rows `mel_path|text|emt_label|spk_label` for downstream vocoding/eval.
    """
    synth_dir = os.path.abspath(os.path.join(output_dir, "natural"))
    for sub in ("mels", "wavs", "plots"):
        os.makedirs(os.path.join(synth_dir, sub), exist_ok=True)
    meta = _read_meta(synth_metadata_path)
    if limit:
        meta = meta[:limit]
    (texts, _mel_paths, refs_emt, refs_spk, basenames,
     emt_labels, spk_labels) = _resolve_refs(meta, input_dir, flip_spk_emt)
    frame_shift = synth.cfg.audio.effective_hop / synth.cfg.audio.sample_rate
    hours = sum(int(m[6]) for m in meta) * frame_shift / 3600
    log(f"Style-transfer synthesis: {len(meta)} rows ({hours:.2f} h)")

    map_rows = []
    for start in range(0, len(texts), batch_size):
        sl = slice(start, start + batch_size)
        r_emt = [np.load(p) for p in refs_emt[sl]]
        r_spk = [np.load(p) for p in refs_spk[sl]]
        result = synth.synthesize(texts[sl], r_emt, r_spk)
        wavs = synth.mels_to_wavs(result["mels"]) if save_wavs else []
        for j, mel in enumerate(result["mels"]):
            i = start + j
            mel_path = os.path.join(synth_dir, "mels", f"mel-{basenames[i]}.npy")
            np.save(mel_path, mel, allow_pickle=False)
            map_rows.append(
                f"{mel_path}|{texts[i]}|{emt_labels[i]}|{spk_labels[i]}")
            if save_wavs:
                wav = wavs[j]
                host_audio.save_wav(
                    wav, os.path.join(synth_dir, "wavs",
                                      f"wav-{basenames[i]}.wav"),
                    synth.cfg.audio.sample_rate)
                plot_alignment(result["alignments"][j],
                               os.path.join(synth_dir, "plots",
                                            f"alignment-{basenames[i]}.png"),
                               title=texts[i])
        log(f"style transfer {min(start + batch_size, len(texts))}/{len(texts)}")
    map_path = os.path.join(synth_dir, "map.txt")
    with open(map_path, "w", encoding="utf-8") as f:
        f.write("\n".join(map_rows) + "\n")
    return map_path


def run_synthesis_random(synth: TacotronSynthesizer, train_txt: str,
                         input_dir: str, output_dir: str, *,
                         n_per_emotion: int = 5, paired: bool = False,
                         emt_dataset: Optional[str] = None, seed: int = 2,
                         batch_size: int = 16) -> str:
    """Seeded random style-transfer experiment batcher (reference
    synthesize_random, tacotron/synthesize.py:234-305): choose N test texts
    per emotion class and synthesize each with a random same-emotion
    reference (or its own paired ref), logging a meta.csv of what was used.
    """
    rng = np.random.default_rng(seed)
    synth_dir = os.path.join(output_dir, "random")
    os.makedirs(synth_dir, exist_ok=True)
    meta = _read_meta(train_txt)
    emt_rows: Dict[int, list] = {}
    for m in meta:
        if emt_dataset is None or m[0] == emt_dataset:
            emt_rows.setdefault(int(m[8]), []).append(m)
    n_emt = 1 if paired else len(emt_rows)

    texts, refs_emt, refs_spk, basenames = [], [], [], []
    meta_rows = ["basename,text,emt_label,spk_label,ref_mel"]
    for emt in sorted(emt_rows)[:n_emt]:
        rows = emt_rows[emt]
        chosen = rng.choice(len(rows), min(n_per_emotion, len(rows)),
                            replace=False)
        for ci in chosen:
            row = rows[ci]
            own = os.path.join(input_dir, row[0], "mels", row[2])
            if paired:
                ref = own
            else:
                ref_row = rows[int(rng.choice(len(rows)))]
                ref = os.path.join(input_dir, ref_row[0], "mels", ref_row[2])
            texts.append(row[7])
            refs_emt.append(ref)
            refs_spk.append(own)
            base = f"{row[10].split('.')[0]}_e{emt}"
            basenames.append(base)
            meta_rows.append(
                f"{base},{row[7]!r},{emt},{row[9]},{os.path.basename(ref)}")

    with open(os.path.join(synth_dir, "meta.csv"), "w", encoding="utf-8") as f:
        f.write("\n".join(meta_rows) + "\n")
    for start in range(0, len(texts), batch_size):
        sl = slice(start, start + batch_size)
        result = synth.synthesize(texts[sl],
                                  [np.load(p) for p in refs_emt[sl]],
                                  [np.load(p) for p in refs_spk[sl]])
        wavs = synth.mels_to_wavs(result["mels"])
        for j, mel in enumerate(result["mels"]):
            i = start + j
            np.save(os.path.join(synth_dir, f"mel-{basenames[i]}.npy"),
                    mel, allow_pickle=False)
            host_audio.save_wav(wavs[j],
                                os.path.join(synth_dir, f"wav-{basenames[i]}.wav"),
                                synth.cfg.audio.sample_rate)
    log(f"random-experiment synthesis: {len(texts)} samples -> {synth_dir}")
    return synth_dir


def run_synthesis_multiple(synth: TacotronSynthesizer, train_txt: str,
                           input_dir: str, output_dir: str, *,
                           accents: Optional[Sequence[int]] = None,
                           n_spk_per_accent: int = 2, n_text_per_spk: int = 5,
                           min_frames: int = 200, seed: int = 0,
                           flip_spk_emt: bool = False, batch_size: int = 16,
                           acc_names: Optional[Sequence[str]] = None) -> str:
    """Accent-cross experiment batcher (reference run_synthesis_multiple,
    tacotron/synthesize.py:233-305): pick N speakers per chosen accent group
    (the emt_label column doubles as the accent id for VCTK-style corpora) and
    M long texts per speaker, then synthesize each text once per chosen accent
    with a random reference utterance from that accent as the emotion/accent
    ref and the utterance's own mel as the speaker ref.

    Differences from the reference: accents/counts are parameters instead of
    hard-coded ['0','3']; the accent display names default to the reference's
    VCTK list but any corpus's label names can be passed; the random choices
    are seeded for reproducibility.
    """
    if acc_names is None:
        # VCTK accent display names (tacotron/synthesize.py:264-265)
        acc_names = ["American", "Australian", "Canadian", "English", "Indian",
                     "Irish", "NewZealand", "NorthernIrish", "Scottish",
                     "SouthAfrican", "Welsh"]
    rng = np.random.default_rng(seed)
    synth_dir = os.path.abspath(os.path.join(output_dir, "multiple"))
    for sub in ("mels", "wavs"):
        os.makedirs(os.path.join(synth_dir, sub), exist_ok=True)
    meta = _read_meta(train_txt)
    # only synthesize long samples (reference synthesize.py:253-254)
    meta = [m for m in meta if int(m[6]) > min_frames]
    by_acc: Dict[int, list] = {}
    for m in meta:
        by_acc.setdefault(int(m[8]), []).append(m)
    if accents is None:
        accents = sorted(by_acc)[:2]
    accents = [a for a in accents if a in by_acc]

    def _name(a: int) -> str:
        return acc_names[a][:2] if a < len(acc_names) else str(a)

    texts, refs_emt, refs_spk, basenames = [], [], [], []
    for acc in accents:
        rows = by_acc[acc]
        spks = sorted({int(m[9]) for m in rows})
        chosen_spks = rng.choice(spks, min(n_spk_per_accent, len(spks)),
                                 replace=False)
        for spk in chosen_spks:
            spk_rows = [m for m in rows if int(m[9]) == int(spk)]
            idxs = rng.choice(len(spk_rows),
                              min(n_text_per_spk, len(spk_rows)),
                              replace=False)
            for ti in idxs:
                row = spk_rows[int(ti)]
                own = os.path.join(input_dir, row[0], "mels", row[2])
                for acc_ref in accents:
                    ref_row = by_acc[acc_ref][int(rng.choice(len(by_acc[acc_ref])))]
                    texts.append(row[7])
                    refs_spk.append(own)
                    refs_emt.append(os.path.join(input_dir, ref_row[0], "mels",
                                                 ref_row[2]))
                    sex = row[11] if len(row) > 11 else ""
                    basenames.append(f"{row[10].split('.')[0]}_{_name(acc)}"
                                     f"_{sex}_{_name(acc_ref)}")
    if flip_spk_emt:
        refs_emt, refs_spk = refs_spk, refs_emt

    log(f"synthesis_multiple: {len(texts)} samples "
        f"({len(accents)} accents x {n_spk_per_accent} spk x {n_text_per_spk})")
    for start in range(0, len(texts), batch_size):
        sl = slice(start, start + batch_size)
        result = synth.synthesize(texts[sl],
                                  [np.load(p) for p in refs_emt[sl]],
                                  [np.load(p) for p in refs_spk[sl]])
        wavs = synth.mels_to_wavs(result["mels"])
        for j, mel in enumerate(result["mels"]):
            i = start + j
            np.save(os.path.join(synth_dir, "mels", f"mel-{basenames[i]}.npy"),
                    mel, allow_pickle=False)
            host_audio.save_wav(
                wavs[j], os.path.join(synth_dir, "wavs",
                                      f"wav-{basenames[i]}.wav"),
                synth.cfg.audio.sample_rate)
        log(f"synthesis_multiple {min(start + batch_size, len(texts))}"
            f"/{len(texts)}")
    return synth_dir


def run_style_embs(synth: TacotronSynthesizer, train_txt: str, input_dir: str,
                   output_dir: str, *, n_spk: int = 8, n_per_spk: int = 8,
                   seed: int = 0, batch_size: int = 16) -> str:
    """'style_embs' mode: export reference-encoder embeddings for projector
    visualization (reference get_style_embeddings,
    tacotron/synthesize.py:307-391). Writes meta.tsv + emb_emt.tsv +
    emb_spk.tsv; each embedding file stacks [real-ref rows; synth mel-out
    rows], and meta.tsv labels them real/synth."""
    rng = np.random.default_rng(seed)
    emb_dir = os.path.join(output_dir, "embeddings")
    os.makedirs(emb_dir, exist_ok=True)
    meta = _read_meta(train_txt)
    by_spk: Dict[int, list] = {}
    for m in meta:
        by_spk.setdefault(int(m[9]), []).append(m)
    spk_ids = sorted(by_spk)
    chosen_spks = sorted(rng.choice(spk_ids, min(n_spk, len(spk_ids)),
                                    replace=False))
    rows = []
    for sid in chosen_spks:
        cand = by_spk[sid]
        for ci in rng.choice(len(cand), min(n_per_spk, len(cand)),
                             replace=False):
            rows.append(cand[int(ci)])

    embs_emt, embs_spk, embs_mo_emt, embs_mo_spk = [], [], [], []
    for start in range(0, len(rows), batch_size):
        batch = rows[start:start + batch_size]
        texts = [m[7] for m in batch]
        mels = [np.load(os.path.join(input_dir, m[0], "mels", m[2]))
                for m in batch]
        out = synth.embed(texts, mels)
        embs_emt.append(out["emb_emt"])
        if out["emb_spk"] is not None:
            embs_spk.append(out["emb_spk"])
        if out["emb_mo_emt"] is not None:
            embs_mo_emt.append(out["emb_mo_emt"])
        if out["emb_mo_spk"] is not None:
            embs_mo_spk.append(out["emb_mo_spk"])

    def _write_tsv(name, chunks_real, chunks_synth):
        if not chunks_real:
            return
        arr = np.vstack(chunks_real + chunks_synth)
        np.savetxt(os.path.join(emb_dir, name), arr, delimiter="\t", fmt="%.6f")

    _write_tsv("emb_emt.tsv", embs_emt, embs_mo_emt)
    _write_tsv("emb_spk.tsv", embs_spk, embs_mo_spk)
    header = "dataset\tmel_filename\tmel_frames\temt_label\tspk_label\tbasename\tsex\treal"
    lines = [header]
    for tag, present in (("real", True), ("synth", bool(embs_mo_emt))):
        if not present:
            continue
        for m in rows:
            lines.append("\t".join([m[0], m[2], m[6], m[8], m[9], m[10],
                                    m[11] if len(m) > 11 else "", tag]))
    with open(os.path.join(emb_dir, "meta.tsv"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    log(f"style embeddings for {len(rows)} utterances -> {emb_dir}")
    return emb_dir
