"""Discriminator trainer: N×M grouped batches → GE2E or CE training.

Parity with reference code/spk_disc/main.py:15-37 (N classes × M utterances
per batch), model.py train loop, and the checkpoint export consumed by
Tacotron's pretrained_ref_enc_{emt,spk} import (tacotron/train.py:280-285,
via checkpoint.import_pretrained_subtree).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..train.checkpoint import CheckpointManager
from ..utils import ValueWindow, log
from .model import DiscriminatorModel, disc_ce_loss, ge2e_loss, similarity_matrix


class DiscFeeder:
    """Groups train.txt rows by class; yields [N·M, T, mels] batches.

    `kind` selects the label column: "emt" (col 8), "spk" (col 9), or
    "accent" — the reference's third discriminator type (spk_disc/utils.py
    :218-223, :287-289) where the emt_label column doubles as the accent id
    and only the `keep_top_accents` most frequent accents are kept (the
    reference hard-codes its 5 largest VCTK accents [0,2,3,5,8]).
    `remove_long_samps` drops rows over 500 frames (utils.py:209-217).
    """

    def __init__(self, cfg: Config, metadata_path: str, kind: str = "emt",
                 crop_frames: int = 128, seed: int = 1234,
                 remove_long_samps: bool = False, keep_top_accents: int = 5):
        self.cfg = cfg
        self.kind = kind
        self.crop = crop_frames
        self.data_dir = os.path.dirname(metadata_path)
        self.rng = np.random.default_rng(seed)
        with open(metadata_path, encoding="utf-8") as f:
            rows = [line.strip().split("|") for line in f if line.strip()]
        if remove_long_samps:
            n_before = len(rows)
            rows = [r for r in rows if int(r[6]) < 500]
            log(f"disc feeder: removed long samples {n_before} -> {len(rows)}")
        col = 9 if kind == "spk" else 8
        self.by_class: Dict[int, list] = {}
        for r in rows:
            self.by_class.setdefault(int(float(r[col])), []).append(r)
        if kind == "accent" and len(self.by_class) > keep_top_accents:
            top = sorted(self.by_class,
                         key=lambda c: len(self.by_class[c]),
                         reverse=True)[:keep_top_accents]
            self.by_class = {c: self.by_class[c] for c in sorted(top)}
            log(f"disc feeder: kept {keep_top_accents} largest accents "
                f"{sorted(top)}")
        self.classes = sorted(self.by_class)

    @property
    def n_classes(self) -> int:
        return max(self.classes) + 1

    def _load_crop(self, row) -> np.ndarray:
        mel = np.load(os.path.join(self.data_dir, row[0], "mels", row[2]))
        if len(mel) >= self.crop:
            start = int(self.rng.integers(0, len(mel) - self.crop + 1))
            return mel[start:start + self.crop]
        pad = self.crop - len(mel)
        return np.pad(mel, ((0, pad), (0, 0)),
                      constant_values=-self.cfg.audio.max_abs_value)

    def batches(self, N: Optional[int] = None, M: int = 8) -> Iterator[Dict]:
        N = N or len(self.classes)
        while True:
            chosen = self.rng.choice(self.classes, size=N, replace=N > len(self.classes))
            mels, labels = [], []
            for c in chosen:
                rows = self.by_class[int(c)]
                idx = self.rng.integers(0, len(rows), size=M)
                for i in idx:
                    mels.append(self._load_crop(rows[int(i)]))
                    labels.append(int(c))
            yield dict(mels=np.stack(mels).astype(np.float32),
                       labels=np.asarray(labels, np.int32), N=N, M=M)


class DiscStackFeeder:
    """GE2E batches from per-speaker TI-SV stacks (`speaker<i>.npy`).

    The reference's utils.py `random_batch_old` (:30-107): each stack is
    `[n_windows, n_mels, frames]` from `disc.data_preprocess`; a batch picks
    N random speakers x M random windows each and yields
    `[N·M, frames, n_mels]` (time-major per utterance, matching the
    DiscriminatorModel input), labels = stack index.
    """

    def __init__(self, stacks_dir: str, seed: int = 1234):
        import re
        paths = [p for p in os.listdir(stacks_dir)
                 if re.fullmatch(r"speaker\d+\.npy", p)]
        if not paths:
            raise FileNotFoundError(
                f"no speaker<i>.npy stacks in {stacks_dir!r}; run "
                "`disc-preprocess` first")
        paths.sort(key=lambda p: int(p[len("speaker"):-len(".npy")]))
        self.stacks = [np.load(os.path.join(stacks_dir, p), mmap_mode="r")
                       for p in paths]
        self.rng = np.random.default_rng(seed)
        self.classes = list(range(len(self.stacks)))

    @property
    def n_classes(self) -> int:
        return len(self.stacks)

    def batches(self, N: Optional[int] = None, M: int = 8) -> Iterator[Dict]:
        N = N or min(4, self.n_classes)
        while True:
            chosen = self.rng.choice(self.n_classes, size=N,
                                     replace=N > self.n_classes)
            mels, labels = [], []
            for c in chosen:
                stack = self.stacks[int(c)]
                idx = self.rng.integers(0, stack.shape[0], size=M)
                for i in idx:
                    mels.append(np.asarray(stack[int(i)]).T)  # [T, n_mels]
                    labels.append(int(c))
            yield dict(mels=np.stack(mels).astype(np.float32),
                       labels=np.asarray(labels, np.int32), N=N, M=M)


def disc_train(cfg: Config, input_path: str, base_dir: str, *,
               kind: str = "emt", train_steps: int = 10000,
               n_per_class: int = 8, loss_type: str = "softmax",
               learning_rate: float = 1e-3,
               checkpoint_interval: int = 1000,
               remove_long_samps: bool = False,
               stacks_dir: Optional[str] = None):
    """Train an emt/spk/accent discriminator; checkpoints under disc_<kind>/.

    `stacks_dir` switches the input from train.txt metadata to TI-SV
    per-speaker stacks (reference spk_disc/main.py path via utils.py
    random_batch_old).
    """
    if stacks_dir is not None:
        feeder = DiscStackFeeder(stacks_dir)
    else:
        if not input_path:
            raise ValueError("disc_train needs --input-path (train.txt) "
                             "or --stacks-dir")
        feeder = DiscFeeder(cfg, input_path, kind=kind,
                            remove_long_samps=remove_long_samps)
    use_ce = loss_type == "ce"
    model = DiscriminatorModel(config=cfg, output_classes=feeder.n_classes,
                               discriminator=use_ce)
    it = feeder.batches(M=n_per_class)
    batch = next(it)

    variables = model.init(dict(params=jax.random.PRNGKey(0)),
                           jnp.asarray(batch["mels"]), train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(learning_rate))
    opt_state = tx.init(params)

    N, M = batch["N"], batch["M"]

    def loss_fn(p, bs, mels, labels):
        (emb, logits), updates = model.apply(
            {"params": p, "batch_stats": bs}, mels, train=True,
            mutable=["batch_stats"])
        if use_ce:
            loss, acc = disc_ce_loss(logits, labels, feeder.n_classes)
        else:
            S = similarity_matrix(emb, p["w"], p["b"], N, M)
            loss = ge2e_loss(S, N, M, loss_type)
            acc = jnp.mean((jnp.argmax(S, -1) ==
                            jnp.repeat(jnp.arange(N), M)).astype(jnp.float32))
        return loss, (acc, updates["batch_stats"])

    @jax.jit
    def step(p, bs, opt, mels, labels):
        (loss, (acc, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, bs, mels, labels)
        updates, new_opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), new_bs, new_opt, loss, acc

    ckpt_dir = os.path.join(base_dir, f"disc_{kind}")
    mgr = CheckpointManager(ckpt_dir, max_to_keep=5)
    loss_w, acc_w = ValueWindow(100), ValueWindow(100)
    for i in range(1, train_steps + 1):
        b = next(it)
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state, jnp.asarray(b["mels"]),
            jnp.asarray(b["labels"]))
        loss_w.append(float(loss))
        acc_w.append(float(acc))
        if i % 50 == 0 or i < 3:
            log(f"disc[{kind}] step {i}: loss={loss_w.average:.4f} "
                f"acc={acc_w.average:.3f}")
        if i % checkpoint_interval == 0 or i == train_steps:
            mgr.save(i, {"params": params, "batch_stats": batch_stats})
    mgr.close()
    log(f"Discriminator training done -> {ckpt_dir}")
    return ckpt_dir, params


def emt_disc_train(cfg: Config, input_path: str, base_dir: str, *,
                   train_steps: int = 2000, batch_size: int = 32,
                   learning_rate: float = 1e-4, eval_interval: int = 10,
                   checkpoint_interval: int = 20, n_classes: int = 4,
                   test_size: float = 0.05, seed: int = 1234):
    """Standalone CNN+GRU emotion classifier trainer (emt_disc/train.py:11-82).

    Reference recipe: Adam 1e-4 on softmax CE over emt labels, val loss/acc
    every 10 batches, checkpoint every 20; here the feeder's train/val split
    mirrors the Tacotron feeder's seed-1234 convention.
    """
    from .model import EmtDisc

    feeder = DiscFeeder(cfg, input_path, kind="emt", seed=seed)
    # seed-1234 held-out split per class (tacotron feeder convention)
    rng = np.random.default_rng(seed)
    val_rows = []
    for c, rows in feeder.by_class.items():
        # keep >=1 training row per class; a 1-row class trains only (no
        # val) — re-adding its val row to training would leak the split
        n_val = (max(1, min(int(len(rows) * test_size), len(rows) - 1))
                 if len(rows) > 1 else 0)
        idx = rng.permutation(len(rows))
        val_rows += [rows[i] for i in idx[:n_val]]
        feeder.by_class[c] = [rows[i] for i in idx[n_val:]]

    model = EmtDisc(config=cfg, n_classes=n_classes)
    it = feeder.batches(N=min(n_classes, len(feeder.classes)),
                        M=max(1, batch_size // max(1, len(feeder.classes))))
    batch = next(it)
    variables = model.init(dict(params=jax.random.PRNGKey(0)),
                           jnp.asarray(batch["mels"]), train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    def loss_fn(p, bs, mels, labels, train):
        (emb, logits), updates = model.apply(
            {"params": p, "batch_stats": bs}, mels, train=train,
            mutable=["batch_stats"])
        loss, acc = disc_ce_loss(logits, labels, n_classes)
        return loss, (acc, updates.get("batch_stats", bs))

    @jax.jit
    def step(p, bs, opt, mels, labels):
        (loss, (acc, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, bs, mels, labels, True)
        updates, new_opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), new_bs, new_opt, loss, acc

    @jax.jit
    def eval_step(p, bs, mels, labels):
        loss, (acc, _) = loss_fn(p, bs, mels, labels, False)
        return loss, acc

    def _eval():
        mels = np.stack([feeder._load_crop(r) for r in val_rows])
        labels = np.asarray([int(float(r[8])) for r in val_rows], np.int32)
        return eval_step(params, batch_stats, jnp.asarray(mels),
                         jnp.asarray(labels))

    ckpt_dir = os.path.join(base_dir, "emt_disc")
    mgr = CheckpointManager(ckpt_dir, max_to_keep=20)
    loss_w, acc_w = ValueWindow(eval_interval), ValueWindow(eval_interval)
    for i in range(1, train_steps + 1):
        b = next(it)
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state, jnp.asarray(b["mels"]),
            jnp.asarray(b["labels"]))
        loss_w.append(float(loss))
        acc_w.append(float(acc))
        if i % eval_interval == 0:
            vl, va = _eval()
            log(f"emt_disc batches {i} | tr loss {loss_w.average:5.3f} | "
                f"val loss {float(vl):5.3f} | tr acc {acc_w.average*100:4.1f}% "
                f"| val acc {float(va)*100:4.1f}%")
        if i % checkpoint_interval == 0 or i == train_steps:
            mgr.save(i, {"params": params, "batch_stats": batch_stats})
    mgr.close()
    log(f"emt_disc training done -> {ckpt_dir}")
    return ckpt_dir, params


def load_pretrained_disc(ckpt_dir: str, template_params=None) -> dict:
    """Load a trained disc checkpoint for import into the Tacotron model.

    Returns {"params": <ReferenceEncoder subtree>, "batch_stats": <matching
    batch_stats subtree or {}>} regardless of whether the checkpoint stored
    the full DiscriminatorModel tree (disc_train's format) or a bare
    encoder subtree. `template_params` is unused (kept for signature
    stability) — the checkpoint's own structure is restored."""
    mgr = CheckpointManager(ckpt_dir)
    restored = mgr.restore()
    mgr.close()
    params = restored.get("params", restored)
    bs = restored.get("batch_stats") or {}
    if isinstance(params, dict) and "pretrained_ref_enc" in params:
        params = params["pretrained_ref_enc"]
        bs = bs.get("pretrained_ref_enc", {}) if isinstance(bs, dict) else {}
    return {"params": params, "batch_stats": bs}


def disc_test(cfg: Config, ckpt_dir: str, map_path: str, out_dir: str, *,
              kind: str = "emt", n_classes: Optional[int] = None,
              crop_frames: int = 128, batch_size: int = 100):
    """Classify synthesized (or real) mels with a trained discriminator and
    report accuracy + a confusion matrix (reference spk_disc/model.py
    test_disc, ~:193-260).

    `map_path` rows are either synthesis maps `mel_path|text|emt|spk` (from
    run_style_transfer / run_eval) or full train.txt rows; mel paths in train
    rows resolve under `<data_dir>/<dataset>/mels/`.
    """
    from ..eval.analyze import confusion_matrix, plot_confusion_matrix

    with open(map_path, encoding="utf-8") as f:
        rows = [line.strip().split("|") for line in f if line.strip()]
    data_dir = os.path.dirname(map_path)
    # "accent" reuses the emt column (the emt_label doubles as accent id)
    label_col = (3 if kind == "spk" else 2) if rows and rows[0][0].endswith(
        ".npy") else (9 if kind == "spk" else 8)

    def mel_path(r):
        if r[0].endswith(".npy"):
            if os.path.isabs(r[0]) or os.path.exists(r[0]):
                return r[0]
            return os.path.join(data_dir, r[0])
        return os.path.join(data_dir, r[0], "mels", r[2])

    labels = [int(float(r[label_col])) for r in rows]
    n_cls = n_classes or max(labels) + 1
    model = DiscriminatorModel(config=cfg, output_classes=n_cls,
                               discriminator=True)
    dummy = jnp.zeros((1, crop_frames, cfg.audio.num_mels), jnp.float32)
    variables = model.init(dict(params=jax.random.PRNGKey(0)), dummy,
                           train=False)
    mgr = CheckpointManager(ckpt_dir)
    restored = mgr.restore({"params": variables["params"],
                            "batch_stats": variables.get("batch_stats", {})})
    mgr.close()

    apply_fn = jax.jit(lambda v, m: model.apply(v, m, train=False))
    pad_val = -cfg.audio.max_abs_value
    preds, correct = [], 0
    for start in range(0, len(rows), batch_size):
        chunk = rows[start:start + batch_size]
        mels = []
        for r in chunk:
            mel = np.load(mel_path(r))[:crop_frames]
            if len(mel) < crop_frames:
                mel = np.pad(mel, ((0, crop_frames - len(mel)), (0, 0)),
                             constant_values=pad_val)
            mels.append(mel)
        _, logits = apply_fn(restored, jnp.asarray(np.stack(mels), jnp.float32))
        preds.extend(np.argmax(np.asarray(logits), -1).tolist())
    correct = sum(int(p == l) for p, l in zip(preds, labels))
    acc = correct / max(len(labels), 1)

    os.makedirs(out_dir, exist_ok=True)
    cm = confusion_matrix(labels, preds, n_cls)
    plot_confusion_matrix(cm, os.path.join(out_dir, f"confusion_{kind}.png"))
    with open(os.path.join(out_dir, f"disc_test_{kind}.csv"), "w",
              encoding="utf-8") as f:
        f.write("mel,true,pred\n")
        for r, l, p in zip(rows, labels, preds):
            f.write(f"{mel_path(r)},{l},{p}\n")
    log(f"disc-test[{kind}]: acc={acc:.3f} over {len(labels)} samples "
        f"-> {out_dir}")
    return acc, cm
