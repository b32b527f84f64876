"""Analytic speed-of-light accounting for the benched kernels.

For each BASELINE workload this module provides FLOPs (and, where the roof
question is live, HBM bytes) per step from the model dimensions — no
measurement. bench.py divides measured step times by these to report
achieved TFLOP/s, % of peak, and which roof binds (BASELINE.json
"per-chip speed-of-light targets"; VERDICT r2 item 1).

Conventions: 1 MAC = 2 FLOPs; counts are *useful* math unless a field says
`actual` (kernels that trade redundant FLOPs for layout, like the fused
decoder's block-diagonal context matmul, report both). Peaks are the chip's
bf16 matmul peak and HBM bandwidth; mixed-precision workloads are compared
against the bf16 roof (stated in the emitted dict).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import Config

# chip peaks by jax device_kind prefix
_CHIP_PEAKS = {
    # (bf16 TFLOP/s, HBM GB/s)
    "TPU v5 lite": (197.0, 819.0),   # v5e
    "TPU v5": (459.0, 1228.0),       # v5p
    "TPU v4": (275.0, 1228.0),
    "TPU v6 lite": (918.0, 1640.0),  # v6e
}


def chip_peaks(device_kind: str):
    for prefix, peaks in _CHIP_PEAKS.items():
        if device_kind.startswith(prefix):
            return peaks
    return (197.0, 819.0)  # assume v5e


def _res_block_flops_per_sample(cfg: Config) -> int:
    """One gated residual block, one sample (wavenet.py:705-716)."""
    wn = cfg.wavenet
    C, G, S, Ci = (wn.residual_channels, wn.gate_channels,
                   wn.skip_out_channels, wn.cin_channels)
    macs = wn.kernel_size * C * G + max(Ci, 0) * G + (G // 2) * S + (G // 2) * C
    return 2 * macs


def _head_flops_per_sample(cfg: Config) -> int:
    wn = cfg.wavenet
    S = wn.skip_out_channels
    return 2 * (S * S + S * wn.out_channels)


def wavenet_sampler_step(cfg: Config, B: int) -> Dict:
    """Fused incremental sampler (ops/wavenet_kernel.py): one autoregressive
    step over B streams. Weights are VMEM/HBM-resident; the HBM traffic per
    step is the windowed delay-line fetch + conditioning row."""
    wn = cfg.wavenet
    L = len(wn.dilations)
    flops = B * (L * _res_block_flops_per_sample(cfg)
                 + _head_flops_per_sample(cfg)
                 + 2 * wn.residual_channels)        # first 1x1
    # HBM-resident delay lines (dilations > threshold): one [B, C] line
    # read+write per such layer per step (bf16), plus cond row [B, Ci]
    n_hbm = sum(1 for d in wn.dilations if d > 32)
    bytes_per_step = B * (n_hbm * wn.residual_channels * 2 * 2
                          + wn.cin_channels * 4)
    return dict(flops_per_step=flops, hbm_bytes_per_step=bytes_per_step,
                note="weights resident; FLOP-bound at B>=128")


def wavenet_train_step(cfg: Config, B: int, T: int) -> Dict:
    """Teacher-forced train step: stack fwd + bwd(2x fwd) + head/upsample.
    With the fused stack kernels the bwd reads the bf16 saved activations
    (x, tanh a, sigmoid b per layer)."""
    wn = cfg.wavenet
    L = len(wn.dilations)
    n = B * T
    stack_fwd = n * L * _res_block_flops_per_sample(cfg)
    head = n * _head_flops_per_sample(cfg)
    fwd = stack_fwd + head
    total = 3 * fwd
    acts_bytes = n * L * 3 * wn.residual_channels * 2      # saved bf16
    bytes_total = (2 * acts_bytes                          # write + read
                   + 6 * n * wn.residual_channels * 4      # x0/dx/skip f32
                   + 2 * n * wn.cin_channels * 4)
    return dict(flops_per_step=total, hbm_bytes_per_step=bytes_total,
                note="fwd + 2x bwd; saved-activation traffic included")


def tacotron_decode_step(cfg: Config, B: int, T_in: int, M: int = 1024
                         ) -> Dict:
    """Fused autoregressive decoder (ops/tacotron_decoder_kernel.py), one
    step over B rows. `actual` includes the block-diagonal context matmul's
    B-fold redundancy and the banded-conv expansion; `useful` is the
    reference math (attention.py:94-227, Architecture_wrappers.py:197-267)."""
    tc, au = cfg.tacotron, cfg.audio
    U, A, P = tc.decoder_lstm_units, tc.attention_dim, tc.prenet_layers[-1]
    r, mels = tc.outputs_per_step, au.num_mels
    FO = r * mels + r
    Tp = ((T_in + 127) // 128) * 128
    prenet = mels * P + P * P
    lstm = (P + M + U) * 4 * U + 2 * U * 4 * U
    att_useful = U * A + tc.attention_kernel * Tp * A + Tp * A + Tp * M
    # r4 kernel: energy reduction is a VPU lane reduce (useful work only)
    # and the context is a batched dot_general (no B-fold block-diagonal);
    # the only remaining expansion is the banded location-conv matmul,
    # which at Tp <= 256 is already MXU-minimal (contraction cannot go
    # below one 128-deep pass)
    att_actual = U * A + Tp * (Tp * A) + Tp * A + Tp * M
    proj = (U + M) * FO
    useful = 2 * B * (prenet + lstm + att_useful + proj)
    actual = 2 * B * (prenet + lstm + att_actual + proj)
    return dict(flops_per_step=useful, actual_flops_per_step=actual,
                note="actual = banded-conv expansion (energy reduce on VPU, "
                     "context via batched dot_general since r4)")


def griffin_lim_audio_second(cfg: Config) -> Dict:
    """G-L inversion of ONE audio-second of mel (BASELINE config[0]):
    mel->linear pinv matmul + (iters+1) iSTFT + iters STFT, as the
    window-support-trimmed DFT matmuls (ops/stft.py)."""
    a = cfg.audio
    frames = a.sample_rate // a.effective_hop
    bins = a.n_fft // 2 + 1
    it = a.griffin_lim_iters
    mel2lin = 2 * frames * a.num_mels * bins
    # trimmed DFT: [frames, win] x [win, bins] for re and im
    stft = 2 * frames * a.win_size * bins * 2
    total = mel2lin + stft * (2 * it + 1)
    return dict(flops_per_step=total,
                note=f"{it} iterations, trimmed-window DFT matmuls")


def fused_train_decoder_flops(cfg: Config, B: int, T_out: int, T_in: int,
                              M: int = 1024) -> int:
    """EXACT matmul-FLOP count of the fused BPTT train decoder
    (ops/tacotron_train_kernel.py): per-step fwd + data-grad bwd, summed
    over S = T_out/r steps. Weight gradients are computed OUTSIDE the
    kernel by XLA from the blocked per-step outputs, so they are already
    in `cost_analysis()` — this counts only what XLA cannot see (the
    custom-call interior). Shapes transcribed from the kernel bodies
    (fwd: train_kernel.py step; bwd: the reverse-grid kernel)."""
    from ..ops.tacotron_train_kernel import _ctx_group

    tc, au = cfg.tacotron, cfg.audio
    U, A, P = tc.decoder_lstm_units, tc.attention_dim, tc.prenet_layers[-1]
    r, mels = tc.outputs_per_step, au.num_mels
    FO = r * mels + r
    Tp = ((T_in + 127) // 128) * 128
    S = T_out // r
    g = _ctx_group(B)
    fwd = (mels * P + P * P                 # prenet
           + (P + M + U) * 4 * U            # LSTM1 (3 split matmuls)
           + 2 * U * 4 * U                  # LSTM2
           + U * A                          # wq
           + Tp * (Tp * A)                  # banded loc conv
           + (Tp * A) * Tp                  # vmat energy reduction
           + g * Tp * M                     # grouped block-masked context
           + (U + M) * FO)                  # frame/stop projection
    bwd = (FO * U + FO * M                  # dproj -> dout2, dctx
           + g * Tp * M                     # grouped dalign
           + U * A + Tp * (Tp * A)          # e2 recompute (wq + band)
           + (Tp * A) * Tp                  # de2 = denergy @ vmat_t
           + Tp * (Tp * A)                  # T1 accumulation (contract B)
           + (Tp * A) * Tp                  # den_rep eyerep matmul
           + A * U                          # dh2_att
           + (Tp * A) * Tp                  # dcum = de2 @ band_t
           + 2 * (4 * U) * U                # LSTM2 dz matmuls
           + (4 * U) * (P + M + U)          # LSTM1 dz matmuls
           + P * P + P * mels)              # prenet bwd data grads
    return 2 * B * S * (fwd + bwd)


def tacotron_train_step(cfg: Config, B: int, T_out: int, T_in: int) -> Dict:
    """Teacher-forced train step: encoder convs + BiLSTM + fused decoder
    (fwd+bwd) + postnet, 3x fwd for the bwd-heavy parts."""
    tc, au = cfg.tacotron, cfg.audio
    mels = au.num_mels
    steps = T_out // tc.outputs_per_step
    E, K = tc.enc_conv_channels, tc.enc_conv_kernel_size
    enc_conv = T_in * (tc.embedding_dim * E * K
                       + (tc.enc_conv_num_layers - 1) * E * E * K)
    enc_lstm = T_in * 2 * (E + tc.encoder_lstm_units) * 4 * tc.encoder_lstm_units
    dec = tacotron_decode_step(cfg, 1, T_in)["flops_per_step"] / 2 * steps
    post = T_out * (mels * tc.postnet_channels * tc.postnet_kernel_size
                    + (tc.postnet_num_layers - 1)
                    * tc.postnet_channels ** 2 * tc.postnet_kernel_size)
    fwd = 2 * B * (enc_conv + enc_lstm + post) + 2 * B * dec
    return dict(flops_per_step=3 * fwd, note="3x fwd approximation")


def mfu_entry(workload: Dict, measured_s: float, device_kind: str) -> Dict:
    """Achieved TFLOP/s + % of bf16 peak + binding roof for a measured step
    time."""
    peak_tf, peak_gbs = chip_peaks(device_kind)
    flops = workload["flops_per_step"]
    tf = flops / measured_s / 1e12
    out = dict(flops_per_step=int(flops),
               achieved_tflops=round(tf, 1),
               pct_bf16_peak=round(100.0 * tf / peak_tf, 1))
    if "actual_flops_per_step" in workload:
        atf = workload["actual_flops_per_step"] / measured_s / 1e12
        out["actual_tflops"] = round(atf, 1)
        out["actual_pct_peak"] = round(100.0 * atf / peak_tf, 1)
    if "hbm_bytes_per_step" in workload:
        gbs = workload["hbm_bytes_per_step"] / measured_s / 1e9
        out["hbm_gb_per_s"] = round(gbs, 1)
        out["pct_hbm_peak"] = round(100.0 * gbs / peak_gbs, 1)
        out["bound"] = ("hbm" if gbs / peak_gbs >
                        (out.get("actual_tflops", tf)) / peak_tf else "flops")
    if "note" in workload:
        out["note"] = workload["note"]
    return out
