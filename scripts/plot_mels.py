"""Plot saved mel .npy files for visual inspection.

Reference: single_use/plot_mels.py (hard-coded folders there; a CLI here).

Usage: python scripts/plot_mels.py mel-0.npy [mel-1.npy ...] [--out-dir plots]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tacotron2_tpu.utils.plot import plot_spectrogram


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mels", nargs="+", help=".npy mel files (frames-major)")
    p.add_argument("--out-dir", default="mel_plots")
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    for path in args.mels:
        mel = np.load(path)
        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.out_dir, f"{name}.png")
        plot_spectrogram(mel, out, title=name)
        print(f"{path} {mel.shape} -> {out}")


if __name__ == "__main__":
    main()
