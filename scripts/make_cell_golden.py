"""TF2-oracle golden fixtures for the decoder-cell math (VERDICT r3 item 4).

The reference's Tacotron core is TF1-contrib graph code that cannot execute
here, but its cell formulas are reproducible op-for-op in TF2 — the same
method used for the Griffin-Lim / disc-encoder fixtures. This script builds
independent TF2 oracles with FIXED weights for:

  1. zoneout-LSTM inference step  (reference tacotron/models/modules.py:187-248)
     — the LSTM itself is `tf.raw_ops.LSTMBlockCell` (TF's own fused i,c,f,o
     cell, semantics of the TF1 `tf.nn.rnn_cell.LSTMCell` the reference
     wraps, forget_bias=1), then the eval-mode zoneout EMA mix.
  2. LocationSensitiveAttention energy + smoothing + window/monotonic
     constraint masking              (reference tacotron/models/attention.py:37-227)
  3. GST MultiheadAttention, mlp + dot scoring
                                     (reference tacotron/models/multihead_attention.py:5-132)
  4. MoL + Gaussian discretized NLL  (reference wavenet_vocoder/models/mixture.py:18-77,
                                      gaussian.py:5-38; Normal CDF via erf)

Outputs tests/fixtures/golden_cells.npz, consumed by
tests/test_reference_parity.py. Regenerate: python scripts/make_cell_golden.py
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
import tensorflow as tf  # noqa: E402

tf.config.set_visible_devices([], "GPU")

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "golden_cells.npz")
rng = np.random.default_rng(20260821)
data = {}


def f32(*shape, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


# ------------------------------------------------------- 1. zoneout-LSTM step
B, IN, U = 4, 24, 32
x = f32(B, IN)
c0, h0 = f32(B, U, scale=0.5), f32(B, U, scale=0.5)
# kernel [(IN+U), 4U] in i, j(=cell candidate), f, o block order — the layout
# of both the TF1 LSTMCell and LSTMBlockCell (icfo)
lstm_kernel = f32(IN + U, 4 * U, scale=0.3)
lstm_bias = f32(4 * U, scale=0.1)
_i, cs, _f, _o, _ci, _co, h_blk = tf.raw_ops.LSTMBlockCell(
    x=tf.constant(x), cs_prev=tf.constant(c0), h_prev=tf.constant(h0),
    w=tf.constant(lstm_kernel), wci=tf.zeros([U]), wcf=tf.zeros([U]),
    wco=tf.zeros([U]), b=tf.constant(lstm_bias),
    forget_bias=1.0, cell_clip=-1.0, use_peephole=False)
zc, zh = 0.1, 0.1   # reference tacotron_zoneout_rate
# eval-mode zoneout (modules.py:243-245): EMA mix of new and previous state
c_eval = (1 - zc) * cs + zc * c0
h_eval = (1 - zh) * h_blk + zh * h0
data.update(lstm_x=x, lstm_c0=c0, lstm_h0=h0, lstm_kernel=lstm_kernel,
            lstm_bias=lstm_bias, lstm_zoneout=np.float32(zc),
            lstm_new_c=cs.numpy(), lstm_new_h=h_blk.numpy(),
            lstm_eval_c=c_eval.numpy(), lstm_eval_h=h_eval.numpy())


# ---------------------------------------------- 2. location-sensitive attention
Ba, T, M, Q, A, F, K = 3, 17, 20, 16, 12, 8, 31
memory = f32(Ba, T, M)
query = f32(Ba, Q)
cum = np.abs(f32(Ba, T)).astype(np.float32)          # cumulative alignments
lengths = np.array([17, 12, 9], np.int32)
prev_max = np.array([3, 7, 8], np.int32)
w_query = f32(Q, A, scale=0.4)
w_memory = f32(M, A, scale=0.4)
conv_k = f32(K, 1, F, scale=0.3)                     # [kernel, in=1, filters]
conv_b = f32(F, scale=0.1)
w_loc = f32(F, A, scale=0.4)
v_a = f32(A, scale=0.5)
b_a = f32(A, scale=0.1)

keys = tf.matmul(tf.constant(memory), tf.constant(w_memory))      # [B,T,A]
q_p = tf.matmul(tf.constant(query), tf.constant(w_query))[:, None, :]
f_loc = tf.nn.conv1d(tf.constant(cum)[:, :, None], tf.constant(conv_k),
                     stride=1, padding="SAME") + conv_b
loc = tf.matmul(f_loc, tf.constant(w_loc))
# energy (attention.py:37-71): reduce_sum(v_a * tanh(keys + q + loc + b_a), 2)
energy = tf.reduce_sum(v_a * tf.tanh(keys + q_p + loc + b_a), axis=2)

mask = tf.sequence_mask(lengths, T)
NEG = tf.fill(tf.shape(energy), np.float32(-np.inf))
masked_energy = tf.where(mask, energy, NEG)
align_softmax = tf.nn.softmax(masked_energy, axis=-1)
# smoothing normalization (attention.py:72-93): sigmoid/sum(sigmoid); the
# memory mask zeroes padded positions (sigmoid(-inf) = 0)
sig = tf.where(mask, tf.sigmoid(energy), tf.zeros_like(energy))
align_smooth = sig / tf.reduce_sum(sig, axis=-1, keepdims=True)

# synthesis constraints (attention.py:202-215), applied to the raw energy
win = 7
idx = tf.range(T)[None, :]
p = tf.constant(prev_max)[:, None]
NEGC = tf.fill(tf.shape(energy), np.float32(-2.0 ** 32 + 1))
mono_forbid = tf.logical_or(idx < p, idx >= p + win)
e_mono = tf.where(mono_forbid, NEGC, energy)
e_mono = tf.where(mask, e_mono, NEG)
align_mono = tf.nn.softmax(e_mono, axis=-1)
back = win // 2 + (win % 2)
winf = tf.logical_or(idx < p - back, idx >= p + win // 2)
e_win = tf.where(winf, NEGC, energy)
e_win = tf.where(mask, e_win, NEG)
align_win = tf.nn.softmax(e_win, axis=-1)

context = tf.einsum("bt,btm->bm", align_softmax, tf.constant(memory))
data.update(lsa_memory=memory, lsa_query=query, lsa_cum=cum,
            lsa_lengths=lengths, lsa_prev_max=prev_max, lsa_win=np.int32(win),
            lsa_w_query=w_query, lsa_w_memory=w_memory, lsa_conv_k=conv_k,
            lsa_conv_b=conv_b, lsa_w_loc=w_loc, lsa_v_a=v_a, lsa_b_a=b_a,
            lsa_energy=energy.numpy(), lsa_align_softmax=align_softmax.numpy(),
            lsa_align_smooth=align_smooth.numpy(),
            lsa_align_mono=align_mono.numpy(),
            lsa_align_win=align_win.numpy(), lsa_context=context.numpy())


# ------------------------------------------------------ 3. GST multihead attn
Bg, Tq, Tv, Dq, Dv, NU, H = 3, 1, 10, 14, 18, 24, 4
g_query = f32(Bg, Tq, Dq)
g_value = f32(Bg, Tv, Dv)
wq = f32(Dq, NU, scale=0.4)
bq = f32(NU, scale=0.1)
wk = f32(Dv, NU, scale=0.4)
bk = f32(NU, scale=0.1)
hd = NU // H
mh_v = f32(hd, scale=0.5)
mh_g = np.float32(math.sqrt(1.0 / hd) * 1.3)
mh_b = f32(hd, scale=0.1)

q = tf.matmul(tf.constant(g_query), tf.constant(wq)) + bq      # conv1d k=1
k = tf.matmul(tf.constant(g_value), tf.constant(wk)) + bk
qs = tf.transpose(tf.reshape(q, [Bg, Tq, H, hd]), [0, 2, 1, 3])
ks = tf.transpose(tf.reshape(k, [Bg, Tv, H, hd]), [0, 2, 1, 3])
vs = tf.tile(tf.constant(g_value)[:, None], [1, H, 1, 1])
# dot scoring (multihead_attention.py:78-89)
qk = tf.matmul(qs, ks, transpose_b=True) * (hd ** -0.5)
ctx_dot = tf.matmul(tf.nn.softmax(qk), vs)
# mlp scoring (multihead_attention.py:91-123): Tq=1 broadcast add
normed_v = mh_g * mh_v * tf.math.rsqrt(tf.reduce_sum(tf.square(mh_v)))
add = tf.reduce_sum(normed_v * tf.tanh(ks + qs + mh_b), [-1], keepdims=True)
w_mlp = tf.nn.softmax(tf.transpose(add, [0, 1, 3, 2]))
ctx_mlp = tf.matmul(w_mlp, vs)


def combine(xx):
    return tf.reshape(tf.transpose(xx, [0, 2, 1, 3]), [Bg, Tq, H * Dv])


data.update(mh_query=g_query, mh_value=g_value, mh_wq=wq, mh_bq=bq,
            mh_wk=wk, mh_bk=bk, mh_v=mh_v, mh_g=mh_g, mh_b=mh_b,
            mh_ctx_dot=combine(ctx_dot).numpy(),
            mh_ctx_mlp=combine(ctx_mlp).numpy())


# --------------------------------------------------- 4. MoL / Gaussian NLL
Bm, Tm, NR = 2, 50, 10
y = np.clip(f32(Bm, Tm, scale=0.4), -1, 1)[..., None].astype(np.float32)
mol_params = f32(Bm, Tm, 3 * NR)            # [B, T, 3*nr] channels-last
# make a few bins extreme to hit the edge cases
y[0, :3, 0] = [-1.0, 1.0, -0.9999]
num_classes, lsm = 65536, -32.23619130191664

yh = tf.constant(mol_params)
logit_probs = yh[:, :, :NR]
means = yh[:, :, NR:2 * NR]
log_scales = tf.maximum(yh[:, :, 2 * NR:], lsm)
yt = tf.constant(y) * tf.ones([1, 1, NR])
centered = yt - means
inv_stdv = tf.exp(-log_scales)
plus_in = inv_stdv * (centered + 1.0 / (num_classes - 1))
min_in = inv_stdv * (centered - 1.0 / (num_classes - 1))
cdf_plus, cdf_min = tf.sigmoid(plus_in), tf.sigmoid(min_in)
log_cdf_plus = plus_in - tf.math.softplus(plus_in)
log_one_minus_cdf_min = -tf.math.softplus(min_in)
cdf_delta = cdf_plus - cdf_min
mid_in = inv_stdv * centered
log_pdf_mid = mid_in - log_scales - 2.0 * tf.math.softplus(mid_in)
log_probs = tf.where(
    yt < -0.999, log_cdf_plus,
    tf.where(yt > 0.999, log_one_minus_cdf_min,
             tf.where(cdf_delta > 1e-5,
                      tf.math.log(tf.maximum(cdf_delta, 1e-12)),
                      log_pdf_mid - np.log((num_classes - 1) / 2.0))))
log_probs = log_probs + tf.nn.log_softmax(logit_probs, -1)
mol_nll = -tf.reduce_logsumexp(log_probs, axis=-1)      # per-sample [B, T]

# keep the predicted mean near the target: in the far tail (|z| >~ 4) the
# f32 CDF difference is catastrophic-cancellation noise in ANY backend and
# pointwise parity is meaningless there
gauss_params = np.stack(
    [y[..., 0] + 0.3 * f32(Bm, Tm), f32(Bm, Tm, scale=0.8) - 1.0],
    axis=-1).astype(np.float32)
lsg = -16.11809565095832
# 256 classes for the Gaussian case: at 65536 the CDF difference needs ~5
# extra significant digits below the CDF value and f32 cancellation turns
# the tail bins into backend-dependent noise; the formula is identical at
# any num_classes (gaussian.py:5 takes it as an argument)
gauss_classes = 256
mean_g = gauss_params[:, :, 0]
log_scale_g = np.maximum(gauss_params[:, :, 1], lsg)
scale_g = np.exp(log_scale_g)


def normal_cdf(v):
    return 0.5 * (1.0 + tf.math.erf((v - mean_g) / (scale_g * np.sqrt(2.0))))


ys = tf.constant(y[..., 0])
cdf_p = normal_cdf(ys + 1.0 / (gauss_classes - 1))
cdf_m = normal_cdf(ys - 1.0 / (gauss_classes - 1))
gauss_nll = -tf.math.log(tf.maximum(cdf_p - cdf_m, 1e-12))

data.update(mol_y=y, mol_params=mol_params, mol_nll=mol_nll.numpy(),
            mol_num_classes=np.int64(num_classes), mol_lsm=np.float64(lsm),
            gauss_params=gauss_params, gauss_nll=gauss_nll.numpy(),
            gauss_classes=np.int64(gauss_classes), gauss_lsm=np.float64(lsg))

np.savez_compressed(OUT, **data)
print(f"wrote {OUT}: {sorted(data)}")
