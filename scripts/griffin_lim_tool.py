"""Griffin-Lim audition tool: invert saved mel/linear .npy files to wavs.

CLI replacement for the reference's griffin_lim_synthesis_tool.ipynb
(repo root; README.md:146) — audition preprocessing parameters by listening
to inverted spectrograms.

Usage:
  python scripts/griffin_lim_tool.py mel1.npy [mel2.npy ...] \
      [--linear] [--out-dir gl_out] [--preset default] [--hparams k=v,...]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tacotron2_tpu.config import get_config
from tacotron2_tpu.data import audio
from tacotron2_tpu.ops import griffin_lim


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("spectrograms", nargs="+")
    p.add_argument("--linear", action="store_true",
                   help="inputs are linear spectrograms, not mels")
    p.add_argument("--out-dir", default="gl_out")
    p.add_argument("--preset", default="default")
    p.add_argument("--hparams", default="")
    p.add_argument("--host", action="store_true",
                   help="use the numpy host path instead of the device path")
    args = p.parse_args(argv)

    cfg = get_config(args.preset, args.hparams)
    os.makedirs(args.out_dir, exist_ok=True)
    for path in args.spectrograms:
        S = np.load(path)
        if args.host:
            inv = (audio.inv_linear_spectrogram if args.linear
                   else audio.inv_mel_spectrogram)
            wav = inv(S, cfg.audio)
        else:
            inv = (griffin_lim.inv_linear_spectrogram if args.linear
                   else griffin_lim.inv_mel_spectrogram)
            wav = audio.inv_preemphasis(np.asarray(inv(S, cfg.audio)),
                                        cfg.audio.preemphasis,
                                        cfg.audio.preemphasize)
        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.out_dir, f"{name}.wav")
        audio.save_wav(wav, out, cfg.audio.sample_rate)
        print(f"{path} -> {out} ({len(wav) / cfg.audio.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
