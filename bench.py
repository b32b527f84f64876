"""Benchmark driver: prints ONE JSON line for the round's headline metric.

Headline (BASELINE north star): WaveNet vocoder synthesis throughput in
audio-seconds per wall-second per chip, using the fused Pallas sampling kernel
(ops/wavenet_kernel.py) at the reference's full model size (20 layers, 128
residual channels, Gaussian head, 16 kHz), B=256 streams with bf16 delay-line
cache/weights and dilations >32 resident in HBM behind W=8 windowed prefetch
(the measured-best config, scripts/bench_sampler_configs.py; a bit-exact
all-VMEM f32 run at B=32 is reported in detail). `vs_baseline` compares
against the pure-XLA lax.scan sampler on the same chip — the best non-kernel
TPU implementation (the reference's own tf.while_loop path has no published
number; its GPU incremental synthesis is O(0.1x) realtime).

Details include the Griffin-Lim inversion path (BASELINE config[0]) and
single-stream realtime factor.
"""

import json
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: the remote-compile tunnel makes the
    first Pallas/scan compile take minutes; caching makes repeat bench runs
    (and the driver's round-end run) start in seconds."""
    import jax
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def bench_vocoder(cfg, B=256, seconds=1.0, chunk=512, B_exact=32,
                  hbm_delay_threshold=32, window=8):
    """Headline: B=256 streams, bf16 delay-line cache/weights, dilations
    >32 resident in HBM with W=8 windowed prefetch (build_sampler_kernel_hbm)
    — the measured-best config; quantization bounded by the kernel parity
    tests. Detail includes the bit-exact all-VMEM f32 config at B_exact."""
    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.models.wavenet.model import WaveNet
    from tacotron2_tpu.models.wavenet.sampler import (extract_sampler_params,
                                                      incremental_sample)
    from tacotron2_tpu.ops.wavenet_kernel import build_sampler_kernel

    sr = cfg.audio.sample_rate
    T = (int(seconds * sr) // chunk) * chunk
    model = WaveNet(config=cfg)
    rng = np.random.default_rng(0)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
        jnp.zeros((B, chunk, 1)), None, train=False)
    sp = extract_sampler_params(variables["params"], cfg)

    def time_config(batch, cache_dtype, threshold=None):
        c_up = jnp.asarray(rng.uniform(0, 1, (batch, T, cfg.wavenet.cin_channels)),
                           jnp.float32)
        run = build_sampler_kernel(cfg, batch, T, chunk=chunk,
                                   cache_dtype=cache_dtype,
                                   weight_dtype=cache_dtype,
                                   hbm_delay_threshold=threshold,
                                   window=window)
        # sync via a 4-byte scalar fetch: on the tunneled dev backend,
        # block_until_ready does NOT drain the execution queue (measured
        # 1000x-wrong timings), and np.asarray of the full [B,T] samples
        # would add ~24 MB/iter of network transfer a production (local
        # PCIe) host never pays
        def sync(x):
            return float(jnp.sum(x[:, -1]))

        sync(run(sp, c_up, 7))  # compile
        iters = 3
        t0 = time.perf_counter()
        for i in range(iters):
            out = run(sp, c_up, 8 + i)
        sync(out)
        return (time.perf_counter() - t0) / iters

    fused_dt = time_config(B, jnp.bfloat16, hbm_delay_threshold)
    exact_dt = time_config(B_exact, jnp.float32)

    # XLA scan baseline: its 20-layer scan body takes ~5 min to XLA-compile on
    # this backend, so the live comparison is gated behind BENCH_FULL=1; the
    # default uses the measured per-step cost from that run (68.5 us/step at
    # B=4..8 on TPU v5e, see scripts/bench_vocoder.py).
    import os
    if os.environ.get("BENCH_FULL") == "1":
        T_scan = min(T, 2048)
        scan_fn = jax.jit(lambda p, cu, k: incremental_sample(p, cfg, cu, k)[0])
        np.asarray(scan_fn(variables["params"], c_up[:, :T_scan],
                           jax.random.PRNGKey(1)))
        t0 = time.perf_counter()
        np.asarray(scan_fn(variables["params"], c_up[:, :T_scan],
                           jax.random.PRNGKey(2)))
        scan_dt = (time.perf_counter() - t0) * (T / T_scan)
    else:
        scan_dt = 68.5e-6 * T

    return dict(
        fused_audio_s_per_s=B * T / fused_dt / sr,
        fused_us_per_step=fused_dt / T * 1e6,
        realtime_factor_per_stream=T / fused_dt / sr,
        exact_f32_audio_s_per_s=B_exact * T / exact_dt / sr,
        xla_scan_audio_s_per_s=B * T / scan_dt / sr,
        batch=B, batch_exact=B_exact, samples=T)


def bench_tacotron_decode(cfg, B=32, T_in=256, steps=500, M=1024):
    """Fused Pallas autoregressive mel decode (ops/tacotron_decoder_kernel.py)
    at full model size; returns mel audio-seconds/s per chip."""
    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.models.tacotron.decoder import Decoder
    from tacotron2_tpu.ops.tacotron_decoder_kernel import (
        build_decoder_kernel, extract_decoder_params)

    rng = np.random.default_rng(0)
    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2))
    mem_small = jnp.asarray(rng.normal(size=(2, 8, M)) * 0.1, jnp.float32)
    keys_small = jnp.zeros((2, 8, cfg.tacotron.attention_dim))
    variables = dec.init(rngs, 2, 1, keys_small, mem_small, None,
                         method=Decoder.autoregressive)
    dp = extract_decoder_params({"decoder": variables["params"]}, cfg)

    memory = jnp.asarray(rng.normal(size=(B, T_in, M)) * 0.1, jnp.float32)
    keys = jnp.asarray(rng.normal(size=(B, T_in, 128)) * 0.1, jnp.float32)
    mask = jnp.ones((B, T_in), bool)
    run = build_decoder_kernel(cfg, B, T_in, steps, M,
                               weight_dtype=jnp.bfloat16)

    def sync(x):        # f is [B, steps*r, mels]
        return float(jnp.sum(x[-1, :, 0]))

    f, _, _ = run(dp, keys, memory, mask, 7)
    sync(f)
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        f, s, a = run(dp, keys, memory, mask, 8 + i)
    sync(f)
    dt = (time.perf_counter() - t0) / iters
    r = cfg.tacotron.outputs_per_step
    frames_per_s = B * steps * r / dt
    sr, hop = cfg.audio.sample_rate, cfg.audio.effective_hop
    return dict(mel_audio_s_per_s=frames_per_s * hop / sr,
                us_per_step=dt / steps * 1e6, batch=B)


def bench_griffin_lim(cfg):
    import jax

    from tacotron2_tpu.data import audio as host_audio
    from tacotron2_tpu.ops import griffin_lim as gl

    sr = cfg.audio.sample_rate
    batch, dur = 8, 4.0
    t = np.linspace(0, dur, int(sr * dur), endpoint=False)
    wavs = np.stack([
        (0.5 * np.sin(2 * np.pi * (120 + 30 * k + 50 * t) * t)).astype(np.float32)
        for k in range(batch)])
    mels = np.stack([host_audio.mel_spectrogram(
        host_audio.preemphasis(w, cfg.audio.preemphasis), cfg.audio) for w in wavs])
    mels_j = jax.numpy.asarray(mels)
    np.asarray(gl.inv_mel_spectrogram(mels_j, cfg.audio))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(gl.inv_mel_spectrogram(mels_j, cfg.audio))
    dt = (time.perf_counter() - t0) / 3
    return batch * dur / dt


def main():
    _enable_compile_cache()
    import jax

    from tacotron2_tpu.config import get_config

    cfg = get_config("default")
    voc = bench_vocoder(cfg)
    taco = bench_tacotron_decode(cfg)
    gl_throughput = bench_griffin_lim(cfg)
    end_to_end = 1.0 / (1.0 / voc["fused_audio_s_per_s"]
                        + 1.0 / taco["mel_audio_s_per_s"])

    # training throughput (measured-best bf16 mixed-precision configs;
    # guarded — a transient compile failure must not sink the synthesis
    # headline)
    train_detail = {}
    try:
        import dataclasses

        from scripts.bench_train import (bench_tacotron_train,
                                         bench_wavenet_train)
        # Tacotron: fused Pallas teacher-forced decoder (fwd + custom_vjp
        # BPTT bwd, ops/tacotron_train_kernel.py) — the measured-best config
        tfu = cfg.replace(tacotron=dataclasses.replace(
            cfg.tacotron, use_fused_train_decoder=True,
            compute_dtype="bfloat16"))
        wbf = cfg.replace(wavenet=dataclasses.replace(
            cfg.wavenet, compute_dtype="bfloat16"))
        tt = bench_tacotron_train(tfu, 96, 400, 10)
        wt = bench_wavenet_train(wbf, 16, 10)
        train_detail = {
            "tacotron_train_audio_s_per_s": round(tt["audio_s_per_s"], 1),
            "tacotron_train_ms_per_step": round(tt["ms_per_step"], 1),
            "tacotron_train_decoder":
                "fused Pallas fwd+bwd (B=96, bf16 conv stacks)",
            "wavenet_train_audio_s_per_s": round(wt["audio_s_per_s"], 1),
            "wavenet_train_ms_per_step": round(wt["ms_per_step"], 1),
        }
    except Exception as e:  # pragma: no cover
        train_detail = {"train_bench_error": f"{type(e).__name__}"}

    print(json.dumps({
        "metric": "wavenet_synthesis_throughput",
        "value": round(voc["fused_audio_s_per_s"], 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(voc["fused_audio_s_per_s"] /
                             max(voc["xla_scan_audio_s_per_s"], 1e-9), 2),
        "detail": {
            "backend": jax.default_backend(),
            "model": "WaveNet 20L/128R Gaussian, fused Pallas sampler "
                     "(B=256, bf16 cache+weights, dilations >32 in HBM, "
                     "W=8 prefetch windows)",
            "us_per_step": round(voc["fused_us_per_step"], 2),
            "realtime_factor_per_stream": round(
                voc["realtime_factor_per_stream"], 2),
            "batch": voc["batch"],
            "exact_f32_audio_s_per_s": round(voc["exact_f32_audio_s_per_s"], 2),
            "batch_exact": voc["batch_exact"],
            "xla_scan_audio_s_per_s": round(voc["xla_scan_audio_s_per_s"], 2),
            "griffin_lim_audio_s_per_s": round(gl_throughput, 1),
            "tacotron_decode_audio_s_per_s": round(
                taco["mel_audio_s_per_s"], 1),
            "tacotron_decode_us_per_step": round(taco["us_per_step"], 2),
            "end_to_end_audio_s_per_s": round(end_to_end, 1),
            **train_detail,
        },
    }))


if __name__ == "__main__":
    main()
