"""Result analysis: discriminator confusion matrices + embedding cluster plots.

Parity with reference code/single_use/analyze_results.py:41-91 (emotion/
speaker confusion matrices from discriminator outputs, embedding cluster
scatter plots) and the spk_disc test_disc flow (classify synthesized wavs).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def confusion_matrix(labels: Sequence[int], preds: Sequence[int],
                     n_classes: Optional[int] = None) -> np.ndarray:
    """[n_classes, n_classes] counts: rows=true, cols=predicted."""
    labels = np.asarray(labels, np.int64)
    preds = np.asarray(preds, np.int64)
    n = n_classes or int(max(labels.max(), preds.max())) + 1
    cm = np.zeros((n, n), np.int64)
    np.add.at(cm, (labels, preds), 1)
    return cm


def plot_confusion_matrix(cm: np.ndarray, path: str, class_names=None,
                          title: str = "Confusion matrix",
                          normalize: bool = True):
    """Normalized heatmap with counts (analyze_results.py:41-64)."""
    display = cm.astype(np.float64)
    if normalize:
        display = display / np.maximum(display.sum(axis=1, keepdims=True), 1)
    n = cm.shape[0]
    names = class_names or [str(i) for i in range(n)]
    fig, ax = plt.subplots(figsize=(1.2 * n + 2, 1.2 * n + 1.5))
    im = ax.imshow(display, cmap="Blues", vmin=0, vmax=1 if normalize else None)
    fig.colorbar(im, ax=ax)
    ax.set_xticks(range(n)), ax.set_xticklabels(names, rotation=45)
    ax.set_yticks(range(n)), ax.set_yticklabels(names)
    for i in range(n):
        for j in range(n):
            ax.text(j, i, f"{cm[i, j]}", ha="center", va="center",
                    color="white" if display[i, j] > 0.5 else "black")
    ax.set_xlabel("Predicted"), ax.set_ylabel("True")
    ax.set_title(title)
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)
    return display


def classify_mels(disc_model, variables, mels: Sequence[np.ndarray],
                  crop_frames: int = 128) -> np.ndarray:
    """Run the discriminator over mels → predicted class ids
    (spk_disc/model.py test_disc equivalent)."""
    import jax.numpy as jnp
    preds = []
    for mel in mels:
        if len(mel) < crop_frames:
            mel = np.pad(mel, ((0, crop_frames - len(mel)), (0, 0)),
                         constant_values=-4.0)
        mel = mel[None, :crop_frames]
        _, logits = disc_model.apply(variables, jnp.asarray(mel), train=False)
        preds.append(int(np.argmax(np.asarray(logits)[0])))
    return np.asarray(preds)


def plot_embedding_clusters(embeddings: np.ndarray, labels: Sequence[int],
                            path: str, title: str = "Style embeddings",
                            method: str = "pca"):
    """2-D projection scatter colored by class (analyze_results.py:66-91).

    PCA projection (the reference uses a t-SNE-style plot; PCA is the
    dependency-free equivalent with the same diagnostic value).
    """
    X = np.asarray(embeddings, np.float64)
    X = X - X.mean(axis=0)
    _, _, vt = np.linalg.svd(X, full_matrices=False)
    proj = X @ vt[:2].T
    labels = np.asarray(labels)
    fig, ax = plt.subplots(figsize=(7, 6))
    for c in np.unique(labels):
        pts = proj[labels == c]
        ax.scatter(pts[:, 0], pts[:, 1], label=str(c), s=18, alpha=0.75)
    ax.legend(title="class")
    ax.set_title(title)
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)
    return proj


def export_style_embeddings_tsv(embeddings: np.ndarray, metadata_rows,
                                out_dir: str, prefix: str = "style_embs"):
    """Embedding + metadata TSVs (reference synthesize.py 'style_embs' mode)."""
    os.makedirs(out_dir, exist_ok=True)
    emb_path = os.path.join(out_dir, f"{prefix}.tsv")
    meta_path = os.path.join(out_dir, f"{prefix}_meta.tsv")
    np.savetxt(emb_path, np.asarray(embeddings), delimiter="\t", fmt="%.6f")
    with open(meta_path, "w", encoding="utf-8") as f:
        for row in metadata_rows:
            f.write("\t".join(str(x) for x in row) + "\n")
    return emb_path, meta_path
