"""Golden fixture for TF-discriminator-checkpoint ingestion parity.

Runs the reference discriminator graph (spk_disc/model.py: ReferenceEncoder
= 6x conv2d(3x3, stride 2, SAME) + BN(inference) + relu -> GRU(128) ->
dense(128, tanh)) in TensorFlow 2 using the ACTUAL shipped checkpoint
weights (code/spk_disc/pretrained_model_{emt,spk}_disc/), on a fixed input,
and saves input + final embedding + conv trace to
tests/fixtures/golden_disc.npz.

tests/test_reference_parity.py::test_tf_disc_checkpoint_ingestion then
asserts the flax ReferenceEncoder with tf_import-converted weights
reproduces the embedding allclose.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
import tensorflow as tf  # noqa: E402

tf.config.set_visible_devices([], "GPU")

from tacotron2_tpu.disc.tf_import import read_tf_checkpoint  # noqa: E402

CKPTS = {
    "emt": "/root/reference/code/spk_disc/pretrained_model_emt_disc",
    "spk": "/root/reference/code/spk_disc/pretrained_model_spk_disc",
}
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "golden_disc.npz")


def reference_encoder_tf(x, v, scope):
    """TF2 re-execution of the reference ReferenceEncoder (modules.py:9-64)
    at inference: conv2d SAME stride 2 + BN(moving stats, eps 1e-3) + relu,
    GRU over flattened features, dense tanh on the last output."""
    p = f"Tacotron_model/inference/{scope}"
    h = tf.constant(x[..., None], tf.float32)
    for i in range(6):
        h = tf.nn.conv2d(h, v[f"{p}/conv2d_{i}/conv2d/kernel"],
                         strides=[1, 2, 2, 1], padding="SAME")
        h = h + v[f"{p}/conv2d_{i}/conv2d/bias"]
        bn = f"{p}/conv2d_{i}/batch_normalization"
        h = (h - v[f"{bn}/moving_mean"]) / tf.sqrt(
            v[f"{bn}/moving_variance"] + 1e-3)
        h = h * v[f"{bn}/gamma"] + v[f"{bn}/beta"]
        h = tf.nn.relu(h)
    B, T = h.shape[0], h.shape[1]
    flat = tf.reshape(h, [B, T, h.shape[2] * h.shape[3]])

    gk = tf.constant(v[f"{p}/rnn/gru_cell/gates/kernel"], tf.float32)
    gb = tf.constant(v[f"{p}/rnn/gru_cell/gates/bias"], tf.float32)
    ck = tf.constant(v[f"{p}/rnn/gru_cell/candidate/kernel"], tf.float32)
    cb = tf.constant(v[f"{p}/rnn/gru_cell/candidate/bias"], tf.float32)
    state = tf.zeros([B, 128])
    for t in range(int(T)):
        xt = flat[:, t, :]
        gates = tf.sigmoid(tf.concat([xt, state], -1) @ gk + gb)
        r, u = tf.split(gates, 2, axis=-1)
        c = tf.tanh(tf.concat([xt, r * state], -1) @ ck + cb)
        state = u * state + (1 - u) * c

    emb = tf.tanh(state @ v[f"{p}/dense/kernel"] + v[f"{p}/dense/bias"])
    return h.numpy(), emb.numpy()


def main():
    rng = np.random.default_rng(7)
    x = rng.uniform(-4, 4, (2, 32, 80)).astype(np.float32)
    out = {"input": x}
    for kind, ckpt in CKPTS.items():
        v = read_tf_checkpoint(ckpt)
        scope = f"refnet_{kind}"
        conv_out, emb = reference_encoder_tf(x, v, scope)
        out[f"{kind}/conv_out"] = conv_out
        out[f"{kind}/embedding"] = emb
        out[f"{kind}/w"] = v["w"]
        out[f"{kind}/b"] = v["b"]
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: "
          f"emt emb[0,:4]={out['emt/embedding'][0, :4]}")


if __name__ == "__main__":
    main()
