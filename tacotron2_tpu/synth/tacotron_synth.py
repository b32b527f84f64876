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

    # ------------------------------------------------------------- plumbing

    def _rngs(self):
        self._key, k1, k2, k3 = jax.random.split(self._key, 4)
        return dict(dropout=k1, zoneout=k2, teacher_forcing=k3)

    def _synth_fn(self, params, batch_stats, inputs, input_lengths,
                  ref_mel_emt, ref_mel_spk, mel_targets, rngs, *,
                  max_steps: int, use_gta: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        if use_gta:
            out = self.model.apply(
                variables, inputs, input_lengths, mel_targets=mel_targets,
                ref_mel_emt=ref_mel_emt, ref_mel_spk=ref_mel_spk,
                gta=True, train=False, rngs=rngs)
        else:
            out = self.model.apply(
                variables, inputs, input_lengths,
                ref_mel_emt=ref_mel_emt, ref_mel_spk=ref_mel_spk,
                synthesis=True, max_steps=max_steps, train=False, rngs=rngs)
        return (out.mel_outputs, out.alignments, out.stop_token_prediction)

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
                   gta: bool = False, max_steps: Optional[int] = None
                   ) -> Dict[str, List[np.ndarray]]:
        """Batch synthesis; returns trimmed mels + alignments (+ raw stops)."""
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
                refs_emt, refs_spk, targets, self._rngs(),
                max_steps=0, use_gta=True)
            lengths = tgt_lengths
        else:
            steps = max_steps or self.cfg.tacotron.max_iters
            mels, aligns, stops = self._jit_synth(
                self.params, self.batch_stats, inputs, input_lengths,
                refs_emt, refs_spk, None, self._rngs(),
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


# ------------------------------------------------------------------- drivers


def run_eval(synth: TacotronSynthesizer, sentences: Sequence[str],
             ref_mels_emt, ref_mels_spk, output_dir: str,
             save_wavs: bool = True) -> str:
    """Sentences → mels + map.txt (+wavs/plots); reference run_eval
    (tacotron/synthesize.py:53-83)."""
    eval_dir = os.path.join(output_dir, "eval")
    os.makedirs(os.path.join(eval_dir, "mels"), exist_ok=True)
    if save_wavs:
        os.makedirs(os.path.join(eval_dir, "wavs"), exist_ok=True)
        os.makedirs(os.path.join(eval_dir, "plots"), exist_ok=True)

    result = synth.synthesize(sentences, ref_mels_emt, ref_mels_spk)
    map_rows = []
    for i, (text, mel) in enumerate(zip(sentences, result["mels"])):
        mel_path = os.path.join(eval_dir, "mels", f"mel-eval-{i}.npy")
        np.save(mel_path, mel, allow_pickle=False)
        map_rows.append(f"{mel_path}|{text}")
        if save_wavs:
            wav = synth.mel_to_wav(mel)
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
    gta_dir = os.path.join(output_dir, "gta")
    os.makedirs(os.path.join(gta_dir, "mels"), exist_ok=True)
    data_dir = os.path.dirname(metadata_path)
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
