"""Diagnose the r5 e2e vocoder-fidelity gap: is the WaveNet bad at its own
manifold (GT/GTA mels) or only at free-run conditioning?

Vocodes (a) held-out GROUND-TRUTH mels and (b) held-out free-run mels with
the trained EMA weights and reports regen-mel fidelity for each. If (a) is
also ~0.75, the vocoder underfits the corpus; if (a) >> (b), the free-run
mels are off-manifold and the mixture training needs strengthening.

Usage: python scripts/diag_vocoder_r5.py [--n 8]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _enable_compile_cache  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--out-dir", default="artifacts/e2e_demo_r5")
    p.add_argument("--wn-ckpt", default="artifacts/e2e_demo_r5/wn_ckpt.msgpack")
    p.add_argument("--taco-ckpt",
                   default="artifacts/e2e_demo_r5/taco_ckpt.msgpack")
    args = p.parse_args(argv)

    _enable_compile_cache()
    import flax.serialization as fser
    import jax
    import numpy as np

    from make_tiny_dataset import make_alignable_corpus
    from tacotron2_tpu.config import Config
    from tacotron2_tpu.data import audio as host_audio
    from tacotron2_tpu.synth.tacotron_synth import TacotronSynthesizer
    from tacotron2_tpu.synth.wavenet_synth import WaveNetSynthesizer
    from tacotron2_tpu.train.tacotron_step import TacotronTrainer
    from tacotron2_tpu.train.wavenet_step import WaveNetTrainer

    cfg = Config()
    cfg = cfg.replace(
        tacotron=dataclasses.replace(
            cfg.tacotron, compute_dtype="bfloat16",
            use_fused_train_decoder=True),
        wavenet=dataclasses.replace(
            cfg.wavenet, compute_dtype="bfloat16",
            use_fused_train_stack=True, sampler_hbm_delay_threshold=0))
    corpus_dir = os.path.join("artifacts/e2e_demo_r5", "corpus")
    rows, acfg, mel_dir = make_alignable_corpus(
        corpus_dir, n=160, chars=(40, 80), char_dur=0.06, write_audio=True)
    cfg = cfg.replace(audio=acfg)
    held = rows[128:128 + args.n]
    texts = [r[7] for r in held]
    gt_mels = [np.load(os.path.join(mel_dir, r[2])) for r in held]

    # wavenet EMA params
    wn_trainer = WaveNetTrainer(cfg)
    import jax.numpy as jnp
    hop = cfg.audio.effective_hop
    dummy = dict(x=jnp.zeros((1, 4 * hop, 1)), y=jnp.zeros((1, 4 * hop)),
                 c=jnp.zeros((1, 4, cfg.audio.num_mels)),
                 input_lengths=jnp.full((1,), 4 * hop, jnp.int32))
    wn_state = wn_trainer.init_state(jax.random.PRNGKey(0), dummy)
    with open(args.wn_ckpt, "rb") as f:
        ema = fser.from_bytes(jax.device_get(wn_state.ema_params), f.read())
    wn_synth = WaveNetSynthesizer(cfg, ema)

    # taco for free-run mels
    from tacotron2_tpu.eval.convergence import batch_from_rows
    trainer = TacotronTrainer(cfg)
    first = batch_from_rows(held, mel_dir, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), first)
    with open(args.taco_ckpt, "rb") as f:
        blob = fser.from_bytes(
            dict(params=jax.device_get(state.params),
                 batch_stats=jax.device_get(state.batch_stats)), f.read())
    synth = TacotronSynthesizer(cfg, blob["params"], blob["batch_stats"])
    refs = [m[:64] for m in gt_mels]
    max_steps = int(1.25 * 80 * 0.06 * cfg.audio.sample_rate / hop)
    free = synth.synthesize(texts, refs, refs, max_steps=max_steps)["mels"]

    def fidelity(mels):
        wavs = wn_synth.synthesize(list(mels))
        corrs = []
        for wav, m in zip(wavs, mels):
            pre = host_audio.preemphasis(wav.astype(np.float32),
                                         cfg.audio.preemphasis,
                                         cfg.audio.preemphasize)
            if cfg.audio.rescale:
                pre = pre / max(np.abs(pre).max(), 1e-9) \
                    * cfg.audio.rescaling_max
            mel_re = np.asarray(host_audio.mel_spectrogram(pre, cfg.audio))
            L = min(len(mel_re), len(m))
            corrs.append(float(np.corrcoef(mel_re[:L].ravel(),
                                           np.asarray(m)[:L].ravel())[0, 1]))
        return [round(c, 3) for c in corrs]

    rep = dict(gt_mel_fidelity=fidelity(gt_mels),
               free_run_fidelity=fidelity(free))
    print("DIAG", json.dumps(rep))


if __name__ == "__main__":
    main()
