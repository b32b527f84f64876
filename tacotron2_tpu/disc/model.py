"""GE2E-style emotion/speaker discriminator on the shared ReferenceEncoder.

Parity with reference code/spk_disc/{model.py,utils.py}: a ReferenceEncoder
(the same module the Tacotron model uses — so trained weights import directly
into the `pretrained_ref_enc_{emt,spk}` subtree) followed by either
- a plain CE classifier head ('discriminator' mode, model.py:63-69), or
- the GE2E similarity-matrix loss (softmax/contrast) over N×M grouped batches
  (utils.py:129-174) with learned scale w (init 10) and bias b (init −5).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from ..models.tacotron.modules import ReferenceEncoder, glorot


def normalize(x, axis=-1):
    return x / jnp.sqrt(jnp.sum(x ** 2, axis=axis, keepdims=True) + 1e-6)


class DiscriminatorModel(nn.Module):
    """ReferenceEncoder → normalized embedding (+ optional CE head)."""

    config: Config
    output_classes: int
    discriminator: bool = True   # CE head vs pure GE2E embedding

    def setup(self):
        gst = self.config.gst
        # names match the Tacotron import subtree (tacotron/train.py:280-285)
        self.encoder = ReferenceEncoder(tuple(gst.reference_filters),
                                        gst.reference_depth,
                                        name="pretrained_ref_enc")
        if self.discriminator:
            self.dense = nn.Dense(self.output_classes, kernel_init=glorot,
                                  name="pretrained_ref_enc_dense")
        else:
            self.w = self.param("w", nn.initializers.constant(10.0), (1,))
            self.b = self.param("b", nn.initializers.constant(-5.0), (1,))

    def __call__(self, mels, *, train: bool = False):
        emb = normalize(self.encoder(mels, train=train))
        if self.discriminator:
            return emb, self.dense(emb)
        return emb, None


class EmtDisc(nn.Module):
    """Standalone CNN+GRU emotion classifier (reference emt_disc/networks.py:5-37).

    Structurally a full-size ReferenceEncoder (6x conv2d stride-2 [32,32,64,
    64,128,128] + BN/relu, GRU(128), dense(128, tanh) on the last GRU
    output) followed by a dense logit head — but WITHOUT the embedding
    normalization the GE2E discriminators apply, and trained with plain CE
    (emt_disc/train.py:29-36, Adam 1e-4).
    """

    config: Config
    n_classes: int = 4           # emt4 corpus (networks.py:35 dense(emb, 4))

    def setup(self):
        # full-size filter stack regardless of the gst config (networks.py:11)
        self.encoder = ReferenceEncoder((32, 32, 64, 64, 128, 128), 128,
                                        name="emt_disc")
        self.logit_head = nn.Dense(self.n_classes, kernel_init=glorot,
                                   name="emt_disc_logit")

    def __call__(self, mels, *, train: bool = False):
        emb = self.encoder(mels, train=train)     # [N, 128] (dense tanh out)
        return emb, self.logit_head(emb)


def similarity_matrix(embedded, w, b, N: int, M: int) -> jnp.ndarray:
    """GE2E eq.(9) similarity [N·M, N] with own-center exclusion (utils.py:129-153)."""
    P = embedded.shape[-1]
    e = embedded.reshape(N, M, P)
    center = normalize(e.mean(axis=1))                                 # [N, P]
    center_except = normalize(
        (e.sum(axis=1, keepdims=True) - e) / max(M - 1, 1))            # [N, M, P]

    # S[j·M+m, i] = e[j,m]·center[i], except i==j uses leave-one-out center
    sim_all = jnp.einsum("jmp,ip->jmi", e, center)                     # [N, M, N]
    sim_self = jnp.einsum("jmp,jmp->jm", e, center_except)             # [N, M]
    eye = jnp.eye(N)[:, None, :]                                       # [N, 1, N]
    S = sim_all * (1 - eye) + sim_self[:, :, None] * eye
    S = jnp.abs(w) * S + b
    return S.reshape(N * M, N)


def ge2e_loss(S, N: int, M: int, loss_type: str = "softmax") -> jnp.ndarray:
    """GE2E eq.(6)/(7) (utils.py:156-174)."""
    S_correct = jnp.concatenate([S[i * M:(i + 1) * M, i:i + 1]
                                 for i in range(N)], axis=0)           # [NM, 1]
    if loss_type == "softmax":
        return -jnp.sum(S_correct[:, 0] -
                        jnp.log(jnp.sum(jnp.exp(S), axis=1) + 1e-6))
    if loss_type == "contrast":
        sig = jax.nn.sigmoid(S)
        mask = jnp.kron(jnp.eye(N), jnp.ones((M, 1)))                  # [NM, N]
        sig_others = sig * (1 - mask)
        return jnp.sum(1 - jax.nn.sigmoid(S_correct[:, 0]) +
                       jnp.max(sig_others, axis=1))
    raise ValueError("loss type should be softmax or contrast")


def disc_ce_loss(logits, labels, n_classes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain classifier loss + accuracy (model.py:63-69)."""
    oh = jax.nn.one_hot(labels, n_classes)
    loss = jnp.mean(-jnp.sum(oh * jax.nn.log_softmax(logits), axis=-1))
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return loss, acc
