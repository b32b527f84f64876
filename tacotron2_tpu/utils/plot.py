"""Training/eval artifact plots: alignments, spectrograms, waveforms.

Parity with reference code/tacotron/utils/plot.py:16-77 and
code/wavenet_vocoder/util.py:174-233 (waveplot, comparison spectrograms).
Matplotlib runs headless (Agg).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def split_title_line(title_text: str, max_words: int = 5) -> str:
    seq = title_text.split()
    return "\n".join([" ".join(seq[i:i + max_words])
                      for i in range(0, len(seq), max_words)])


def plot_alignment(alignment, path: str, title: Optional[str] = None,
                   max_len: Optional[int] = None):
    """alignment: [T_in(enc), steps(dec)] heatmap (reference plot.py:16-37)."""
    if max_len is not None:
        alignment = alignment[:, :max_len]
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111)
    im = ax.imshow(alignment, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    plt.xlabel("Decoder timestep")
    plt.ylabel("Encoder timestep")
    if title is not None:
        plt.title(split_title_line(title))
    plt.tight_layout()
    plt.savefig(path, format="png")
    plt.close(fig)


def plot_spectrogram(pred_spectrogram, path: str, title: Optional[str] = None,
                     target_spectrogram=None, max_len: Optional[int] = None,
                     auto_aspect: bool = False):
    """Prediction (+optional target) spectrogram panels (reference plot.py:40-77).

    Spectrograms are [frames, bins]."""
    if max_len is not None:
        pred_spectrogram = pred_spectrogram[:max_len]
        if target_spectrogram is not None:
            target_spectrogram = target_spectrogram[:max_len]
    fig = plt.figure(figsize=(10, 8))
    if target_spectrogram is not None:
        ax1 = fig.add_subplot(211)
        im = ax1.imshow(np.rot90(target_spectrogram), aspect="auto",
                        interpolation="none")
        ax1.set_title("Target Mel-Spectrogram")
        fig.colorbar(im, ax=ax1)
        ax2 = fig.add_subplot(212)
        im = ax2.imshow(np.rot90(pred_spectrogram), aspect="auto",
                        interpolation="none")
        ax2.set_title("Predicted Mel-Spectrogram")
        fig.colorbar(im, ax=ax2)
    else:
        ax = fig.add_subplot(111)
        im = ax.imshow(np.rot90(pred_spectrogram), aspect="auto",
                       interpolation="none")
        fig.colorbar(im, ax=ax)
    if title is not None:
        fig.suptitle(split_title_line(title))
    plt.tight_layout()
    plt.savefig(path, format="png")
    plt.close(fig)


def waveplot(path: str, y_hat, y_target, sample_rate: int):
    """Generated vs target waveform panels (reference util.py:174-233)."""
    fig = plt.figure(figsize=(12, 4))
    if y_target is not None:
        ax = plt.subplot(2, 1, 1)
        ax.plot(np.asarray(y_target))
        ax.set_title("Target waveform")
        ax = plt.subplot(2, 1, 2)
        ax.plot(np.asarray(y_hat))
        ax.set_title("Predicted waveform")
    else:
        ax = plt.subplot(1, 1, 1)
        ax.plot(np.asarray(y_hat))
        ax.set_title("Generated waveform")
    plt.tight_layout()
    plt.savefig(path, format="png")
    plt.close(fig)
