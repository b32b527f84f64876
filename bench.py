"""Benchmark driver: prints a compact (<1 kB) JSON headline line for the
round's metric, then the full detail as a `BENCH_DETAIL `-prefixed line
(also written to artifacts/bench_full.json), then the compact line once
more — robust to first-line, last-line, and tail-buffer parsers (VERDICT
r4 item 2: the single giant line came back `parsed: null` two rounds
running). Timed sections report min/med/max over >=3 repeats.

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

Robustness contract (round-1 postmortem: the driver's run timed out with no
output because bench setup pushed a 1.3 GB host array through the remote
device tunnel):
- ALL large bench inputs are generated on-device (jax.random under jit) —
  host->device traffic is a few KB of parameters.
- Sections run most-important-first, each guarded by try/except and a
  remaining-budget check; whatever is measured lands in `detail`, skipped
  sections are listed in `detail.skipped`.
- A watchdog THREAD (not SIGALRM — signal handlers cannot preempt a native
  call blocked on the device tunnel) prints the best-so-far JSON line and
  hard-exits when the budget (BENCH_BUDGET_S, default 420 s) expires.
- The persistent XLA compile cache (/tmp/jax_cache) is enabled so a run
  after a same-config warm-up compiles nothing.

Details include the Griffin-Lim inversion path (BASELINE config[0]),
single-stream realtime factor, and training throughput for both models.
"""

import json
import os
import sys
import threading
import time

# 550 s default: fits the 600 s driver timeout with startup+emit margin;
# per-process program-load variance on the tunneled backend ranges the
# full suite 340-520 s across validation runs
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "550"))
_T0 = time.time()


def _remaining():
    return BUDGET_S - (time.time() - _T0)


def _spread(sample_fn, repeats=3):
    """Repeat a timed measurement and quantify run-to-run variance
    (VERDICT r4 item 2: single-number sections made tunnel drift
    indistinguishable from regression). sample_fn(i) returns one timing;
    returns (median, {min, med, max}) — the median is the headline value,
    the spread is committed next to it."""
    vals = [float(sample_fn(i)) for i in range(repeats)]
    ss = sorted(vals)
    n = len(ss)
    med = ss[n // 2] if n % 2 else 0.5 * (ss[n // 2 - 1] + ss[n // 2])
    return med, dict(min=ss[0], med=med, max=ss[-1])


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


# --------------------------------------------------------------- emission

_state = {"detail": {"skipped": []}, "sections": {}}
_emit_lock = threading.Lock()
_emitted = False


def _compact_headline(detail):
    """The <1 kB summary of the round's key numbers (VERDICT r4 item 2: the
    driver's tail buffer truncated the single giant detail line to
    `parsed: null` for two rounds; every headline number must fit in a
    short, independently parseable line)."""
    h = {}
    for k in ("us_per_step", "tacotron_decode_us_per_step",
              "tacotron_decode_audio_s_per_s",
              "pipeline_fused_program_audio_s_per_s",
              "pipeline_audio_s_per_s",
              "tacotron_train_ms_per_step", "wavenet_train_ms_per_step",
              "end_to_end_audio_s_per_s", "xla_scan_audio_s_per_s",
              "elapsed_s"):
        if k in detail:
            h[k] = detail[k]
    for name, entry in detail.get("mfu", {}).items():
        pct = entry.get("pct_bf16_peak")
        if pct is not None:
            h[f"mfu_{name}_pct"] = pct
        useful = entry.get("useful_pct_bf16_peak")
        if useful is not None:
            h[f"mfu_{name}_useful_pct"] = useful
    dv = detail.get("decode_variants", {})
    for k in ("long_input_fused_block", "emt_attn_fused_block"):
        if k in dv and "us_per_step" in dv[k]:
            h[f"{k}_us"] = dv[k]["us_per_step"]
            if "us_per_step_spread" in dv[k]:
                h[f"{k}_us_spread"] = dv[k]["us_per_step_spread"]
    if detail.get("skipped"):
        h["skipped"] = detail["skipped"]
    return h


def _emit():
    """Emit results. Three lines, robust to ANY driver parsing strategy
    (first parseable line, last parseable line, or a tail buffer that
    drops the beginning of long lines):

      1. compact headline JSON (<1 kB) — the contract line,
      2. `BENCH_DETAIL {...}` — full detail, prefixed so a line-oriented
         parser never mistakes its (possibly truncated) body for the
         result line; also written to artifacts/bench_full.json,
      3. the compact headline line again (survives tail truncation).

    Headline ladder: fused vocoder > tacotron decode > Griffin-Lim. Safe to
    call exactly once from either the main path or the watchdog."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return
        _emitted = True
    s = _state["sections"]
    detail = _state["detail"]
    if "vocoder" in s:
        voc = s["vocoder"]
        metric, value = "wavenet_synthesis_throughput", voc["fused_audio_s_per_s"]
        vs = voc["fused_audio_s_per_s"] / max(voc["xla_scan_audio_s_per_s"], 1e-9)
    elif "tacotron_decode" in s:
        metric = "tacotron_decode_throughput"
        value = s["tacotron_decode"]["mel_audio_s_per_s"]
        vs = 1.0
    elif "griffin_lim" in s:
        metric, value, vs = "griffin_lim_throughput", s["griffin_lim"], 1.0
    else:
        metric, value, vs = "bench_failed", 0.0, 0.0
    compact = {
        "metric": metric,
        "value": round(value, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(vs, 2),
        "headline": _compact_headline(detail),
    }
    line = json.dumps(compact)
    if len(line) > 1000:  # hard contract: the result line stays short
        compact["headline"] = {"truncated": True,
                               "elapsed_s": detail.get("elapsed_s")}
        line = json.dumps(compact)
    print(line, flush=True)
    full = dict(compact)
    full["detail"] = detail
    try:
        path = os.environ.get("BENCH_DETAIL_PATH",
                              os.path.join(os.path.dirname(
                                  os.path.abspath(__file__)),
                                  "artifacts", "bench_full.json"))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(full, f, indent=1)
    except Exception:  # pragma: no cover - best-effort detail dump
        pass
    print("BENCH_DETAIL " + json.dumps(full), flush=True)
    print(line, flush=True)


def _start_watchdog():
    def fire():
        _state["detail"]["watchdog_fired_after_s"] = round(time.time() - _T0, 1)
        _emit()
        sys.stdout.flush()
        os._exit(0)

    t = threading.Timer(max(BUDGET_S - (time.time() - _T0), 5.0), fire)
    t.daemon = True
    t.start()
    return t


# --------------------------------------------------------------- sections


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
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
        jnp.zeros((B, chunk, 1)), None, train=False)
    sp = extract_sampler_params(variables["params"], cfg)

    # conditioning features generated ON DEVICE — a (B, T, cin) f32 host
    # array is ~1.3 GB and wedges the remote device tunnel (round-1 lesson)
    import functools

    @functools.partial(jax.jit, static_argnames="batch")
    def make_cond(key, batch):
        return jax.random.uniform(key, (batch, T, cfg.wavenet.cin_channels))

    def time_config(batch, cache_dtype, threshold=None, T_cfg=None,
                    iters=3):
        T_cfg = T_cfg or T
        c_up = make_cond(jax.random.PRNGKey(42), batch)[:, :T_cfg]
        run = build_sampler_kernel(cfg, batch, T_cfg, chunk=chunk,
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

        def one(i):
            t0 = time.perf_counter()
            out = run(sp, c_up, 8 + i)
            sync(out)
            return time.perf_counter() - t0

        if iters == 1:
            return one(0)
        med, spread = _spread(one, repeats=iters)
        return med, spread

    fused_dt, fused_spread = time_config(B, jnp.bfloat16,
                                         hbm_delay_threshold)
    res = dict(
        fused_audio_s_per_s=B * T / fused_dt / sr,
        fused_us_per_step=fused_dt / T * 1e6,
        fused_us_per_step_spread={k: round(v / T * 1e6, 2)
                                  for k, v in fused_spread.items()},
        realtime_factor_per_stream=T / fused_dt / sr,
        batch=B, samples=T)

    if os.environ.get("BENCH_EXACT") == "1" and _remaining() > 60:
        # bit-exact all-VMEM f32 config: a quality/parity detail, timed on a
        # short clip (~4x slower than the headline). Off by default: its
        # separate kernel program pays another erratic first-execution
        # penalty through the remote compile service (5-800 s observed),
        # and the number is already pinned by the kernel parity tests.
        T_exact = 7 * chunk
        exact_dt = time_config(B_exact, jnp.float32, T_cfg=T_exact, iters=1)
        res["exact_f32_audio_s_per_s"] = B_exact * T_exact / exact_dt / sr
        res["batch_exact"] = B_exact

    # XLA scan baseline: the frozen constant (68.5 us/step measured on this
    # chip, scripts/bench_vocoder.py) seeds vs_baseline; bench_scan_live()
    # re-measures it live at the END of the run (its 20-layer scan body
    # takes ~5 min to compile COLD on this backend — warm cache runs in
    # seconds — so it must not run before the headline sections).
    scan_dt = 68.5e-6 * T
    res["xla_scan_audio_s_per_s"] = B * T / scan_dt / sr
    res["_scan_ctx"] = (variables["params"], make_cond, B, T, sr)
    return res


def bench_scan_live(voc, cfg):
    """Live re-measure of the pure-XLA lax.scan sampler (VERDICT r2 item 5:
    vs_baseline should derive from a measurement taken this run). Updates
    the vocoder section in place; on any failure the frozen constant stands
    and detail says so."""
    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.models.wavenet.sampler import incremental_sample

    params, make_cond, B, T, sr = voc.pop("_scan_ctx")
    T_scan = min(T, 2048)
    c_scan = make_cond(jax.random.PRNGKey(43), B)[:, :T_scan]
    scan_fn = jax.jit(lambda p, cu, k: jnp.sum(
        incremental_sample(p, cfg, cu, k)[0][:, -1]))
    float(scan_fn(params, c_scan, jax.random.PRNGKey(1)))   # compile+warm
    t0 = time.perf_counter()
    float(scan_fn(params, c_scan, jax.random.PRNGKey(2)))
    scan_dt = (time.perf_counter() - t0) * (T / T_scan)
    voc["xla_scan_audio_s_per_s"] = B * T / scan_dt / sr
    voc["scan_us_per_step"] = scan_dt / T * 1e6
    return voc["xla_scan_audio_s_per_s"]


def bench_vocoder_mol(B=256, chunk=512, hbm_delay_threshold=32, window=8):
    """Paper-preset (22.05 kHz, MoL out_channels=30) fused sampler — the
    in-kernel mixture pick + logistic draw (_HeadPlan). Criterion from the
    round-2 plan: within ~1.5x of the Gaussian head's per-step cost."""
    import functools

    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.config import get_config
    from tacotron2_tpu.models.wavenet.model import WaveNet
    from tacotron2_tpu.models.wavenet.sampler import extract_sampler_params
    from tacotron2_tpu.ops.wavenet_kernel import build_sampler_kernel

    cfg = get_config("paper")
    sr = cfg.audio.sample_rate
    T = (sr // chunk) * chunk
    model = WaveNet(config=cfg)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
        jnp.zeros((B, chunk, 1)), None, train=False)
    sp = extract_sampler_params(variables["params"], cfg)
    c_up = jax.jit(lambda k: jax.random.uniform(
        k, (B, T, cfg.wavenet.cin_channels)))(jax.random.PRNGKey(42))
    run = build_sampler_kernel(cfg, B, T, chunk=chunk,
                               cache_dtype=jnp.bfloat16,
                               weight_dtype=jnp.bfloat16,
                               hbm_delay_threshold=hbm_delay_threshold,
                               window=window)

    def sync(x):
        return float(jnp.sum(x[:, -1]))

    sync(run(sp, c_up, 7))
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(sp, c_up, 8 + i)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    return dict(mol_paper_audio_s_per_s=B * T / dt / sr,
                mol_us_per_step=dt / T * 1e6)


def bench_tacotron_decode(cfg, B=64, T_in=256, steps=500, M=1024):
    """Fused Pallas autoregressive mel decode (ops/tacotron_decoder_kernel.py)
    at full model size; returns mel audio-seconds/s per chip.

    B=64 is the measured-best batch for the r4 kernel (16,083 mel audio-s/s
    vs 14,071 at B=48; B=96 exceeds VMEM at T=256). The r4 kernel freed the
    VMEM the r3 [Tp*A, Tp] vmat + [B, B*Tp] smask operands occupied, which
    is what made B=64 fit (r3 note: B=64 exceeded VMEM)."""
    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.models.tacotron.decoder import Decoder
    from tacotron2_tpu.ops.tacotron_decoder_kernel import (
        build_decoder_kernel, extract_decoder_params)

    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2))
    mem_small = jnp.zeros((2, 8, M))
    keys_small = jnp.zeros((2, 8, cfg.tacotron.attention_dim))
    variables = dec.init(rngs, 2, 1, keys_small, mem_small, None,
                         method=Decoder.autoregressive)
    dp = extract_decoder_params({"decoder": variables["params"]}, cfg)

    @jax.jit
    def make_inputs(key):
        k1, k2 = jax.random.split(key)
        memory = 0.1 * jax.random.normal(k1, (B, T_in, M))
        keys = 0.1 * jax.random.normal(k2, (B, T_in, 128))
        return memory, keys

    memory, keys = make_inputs(jax.random.PRNGKey(3))
    mask = jnp.ones((B, T_in), bool)
    run = build_decoder_kernel(cfg, B, T_in, steps, M,
                               weight_dtype=jnp.bfloat16)

    def sync(x):        # f is [B, steps*r, mels]
        return float(jnp.sum(x[-1, :, 0]))

    f, _, _ = run(dp, keys, memory, mask, 7)
    sync(f)

    def one(i):
        t0 = time.perf_counter()
        f, s, a = run(dp, keys, memory, mask, 8 + i)
        sync(f)
        return time.perf_counter() - t0

    dt, spread = _spread(one, repeats=3)
    r = cfg.tacotron.outputs_per_step
    frames_per_s = B * steps * r / dt
    sr, hop = cfg.audio.sample_rate, cfg.audio.effective_hop
    return dict(mel_audio_s_per_s=frames_per_s * hop / sr,
                us_per_step=dt / steps * 1e6,
                us_per_step_spread={k: round(v / steps * 1e6, 2)
                                    for k, v in spread.items()},
                batch=B)


def bench_decode_variants(cfg, B=32, T_in=400, K=256, M=1024, n_blocks=2):
    """The two decode paths beyond the monolithic kernel's envelope
    (VERDICT r2 item 4): long-input blocked fused decode (T_in > 256) and
    the emt_attn variant's scan-block path."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_tpu.models.tacotron.decoder import Decoder
    from tacotron2_tpu.ops.tacotron_decoder_kernel import (
        build_decoder_block_kernel, extract_decoder_params,
        init_decoder_state)

    r = cfg.tacotron.outputs_per_step
    hop, sr = cfg.audio.effective_hop, cfg.audio.sample_rate
    rng = np.random.default_rng(0)
    out = {}

    def sync(x):
        return float(jnp.sum(x[-1, :, 0]))

    # --- long-input blocked fused decode ---------------------------------
    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2))
    variables = dec.init(rngs, 2, 1, jnp.zeros((2, 8, 128)),
                         jnp.zeros((2, 8, M)), None,
                         method=Decoder.autoregressive)
    dp = extract_decoder_params({"decoder": variables["params"]}, cfg)
    memory = jnp.asarray(rng.normal(size=(B, T_in, M)) * 0.1, jnp.float32)
    keys = jnp.asarray(rng.normal(size=(B, T_in, 128)) * 0.1, jnp.float32)
    mask = jnp.ones((B, T_in), bool)
    run = build_decoder_block_kernel(cfg, B, T_in, K, M,
                                     weight_dtype=jnp.bfloat16)
    st = init_decoder_state(cfg, B, T_in, M)
    f, _, _, st = run(dp, keys, memory, mask, st, 7)
    sync(f)

    def one_long(i):
        st = init_decoder_state(cfg, B, T_in, M)
        t0 = time.perf_counter()
        for j in range(n_blocks):
            f, _, _, st = run(dp, keys, memory, mask, st, 8 + i * 16 + j)
        sync(f)
        return (time.perf_counter() - t0) / (n_blocks * K)

    dt, spread = _spread(one_long, repeats=3)
    out["long_input_fused_block"] = dict(
        t_in=T_in, batch=B, us_per_step=round(dt * 1e6, 1),
        us_per_step_spread={k: round(v * 1e6, 1)
                            for k, v in spread.items()},
        mel_audio_s_per_s=round(B * r * hop / sr / dt, 1))

    # --- emt_attn decode: fused block kernel + scan-block comparison -----
    cfg_e = cfg.replace(gst=dataclasses.replace(
        cfg.gst, emt_attn=True, emt_attn_type="simple"))
    dec_e = Decoder(config=cfg_e)
    Tref = 4
    emt_mem = jnp.asarray(
        rng.normal(size=(B, Tref, 2 * cfg.gst.reference_depth)) * 0.1,
        jnp.float32)
    ref_spk = jnp.asarray(rng.normal(size=(B, cfg.gst.reference_depth))
                          * 0.1, jnp.float32)
    Te = 128
    mem_e, keys_e = memory[:, :Te], keys[:, :Te]
    mask_e = mask[:, :Te]
    var_e = dec_e.init(rngs, B, 1, keys_e, mem_e, mask_e,
                       emt_memory=emt_mem, ref_spk=ref_spk,
                       method=Decoder.autoregressive)

    @jax.jit
    def block(params, carry, seed):
        ar = dict(dropout=jax.random.fold_in(seed, 0),
                  zoneout=jax.random.fold_in(seed, 1))
        fr, stp, al, _, new = dec_e.apply(
            {"params": params}, B, K, keys_e, mem_e, mask_e,
            emt_memory=emt_mem, ref_spk=ref_spk, initial_state=carry,
            return_state=True, method=Decoder.autoregressive, rngs=ar)
        return fr, new

    bound = dec_e.bind({"params": var_e["params"]})
    carry0 = bound._initial_carry(B, mem_e,
                                  cfg.tacotron.compute_dtype == "bfloat16")
    f, carry = block(var_e["params"], carry0, jax.random.PRNGKey(5))
    float(jnp.sum(f[:, -1, 0]))

    def one_scan(i):
        carry = carry0
        t0 = time.perf_counter()
        for j in range(n_blocks):
            f, carry = block(var_e["params"], carry,
                             jax.random.PRNGKey(6 + i * 16 + j))
        float(jnp.sum(f[:, -1, 0]))
        return (time.perf_counter() - t0) / (n_blocks * K)

    dt, spread = _spread(one_scan, repeats=3)
    out["emt_attn_scan_block"] = dict(
        t_in=Te, batch=B, us_per_step=round(dt * 1e6, 1),
        us_per_step_spread={k: round(v * 1e6, 1)
                            for k, v in spread.items()},
        mel_audio_s_per_s=round(B * r * hop / sr / dt, 1))

    # fused-block emt decode (in-kernel SimpleBahdanau + context_emt feed)
    dp_e = extract_decoder_params({"decoder": var_e["params"]}, cfg_e)
    run_e = build_decoder_block_kernel(cfg_e, B, Te, K, M,
                                       weight_dtype=jnp.bfloat16,
                                       emt_T=Tref)
    st = init_decoder_state(cfg_e, B, Te, M)
    f, _, _, st = run_e(dp_e, keys_e, mem_e, mask_e, st, 7, emt_mem, ref_spk)
    sync(f)

    def one_emt(i):
        st = init_decoder_state(cfg_e, B, Te, M)
        t0 = time.perf_counter()
        for j in range(n_blocks):
            f, _, _, st = run_e(dp_e, keys_e, mem_e, mask_e, st,
                                8 + i * 16 + j, emt_mem, ref_spk)
        sync(f)
        return (time.perf_counter() - t0) / (n_blocks * K)

    dt, spread = _spread(one_emt, repeats=3)
    out["emt_attn_fused_block"] = dict(
        t_in=Te, batch=B, us_per_step=round(dt * 1e6, 1),
        us_per_step_spread={k: round(v * 1e6, 1)
                            for k, v in spread.items()},
        mel_audio_s_per_s=round(B * r * hop / sr / dt, 1))

    # in-kernel MULTIHEAD emt decode (r5: per-head mlp-scorer passes +
    # attn_emt_out Dense; closes the last scan-only decode variant)
    cfg_m = cfg.replace(gst=dataclasses.replace(
        cfg.gst, emt_attn=True, emt_attn_type="multihead"))
    dec_m = Decoder(config=cfg_m)
    var_m = dec_m.init(rngs, B, 1, keys_e, mem_e, mask_e,
                       emt_memory=emt_mem, ref_spk=None,
                       method=Decoder.autoregressive)
    dp_m = extract_decoder_params({"decoder": var_m["params"]}, cfg_m)
    run_m = build_decoder_block_kernel(cfg_m, B, Te, K, M,
                                       weight_dtype=jnp.bfloat16,
                                       emt_T=Tref)
    st = init_decoder_state(cfg_m, B, Te, M)
    f, _, _, st = run_m(dp_m, keys_e, mem_e, mask_e, st, 7, emt_mem, None)
    sync(f)

    def one_mh(i):
        st = init_decoder_state(cfg_m, B, Te, M)
        t0 = time.perf_counter()
        for j in range(n_blocks):
            f, _, _, st = run_m(dp_m, keys_e, mem_e, mask_e, st,
                                8 + i * 16 + j, emt_mem, None)
        sync(f)
        return (time.perf_counter() - t0) / (n_blocks * K)

    dt, spread = _spread(one_mh, repeats=3)
    out["emt_attn_multihead_fused_block"] = dict(
        t_in=Te, batch=B, us_per_step=round(dt * 1e6, 1),
        us_per_step_spread={k: round(v * 1e6, 1)
                            for k, v in spread.items()},
        mel_audio_s_per_s=round(B * r * hop / sr / dt, 1))
    return out




def bench_pipeline(cfg, n_utts=256, taco_batch=64, steps=108):
    """MEASURED chained text->wav pipeline (VERDICT r3 item 3): the actual
    production objects — TacotronSynthesizer (fused decode, host mel
    readback, stop-length trim) -> WaveNetSynthesizer (clip + [0,1] interp,
    upsample, fused sampler, host wav readback) — in one timed pass with
    every handoff included. Mirrors the reference chain
    synthesize.py:33-45 (tacotron eval synthesis -> wavenet synthesis).

    Weights are randomly initialized (timing only); the stop-projection
    bias is pinned to -30 so random stops cannot truncate the decode, and
    every taco chunk uses the same padded text batch so one fused program
    serves all chunks. steps=54 keeps the sampler's padded T at 22016
    (the [T, B, C] time-major transpose inside the sampler wrapper wants a
    >256 MB VMEM scratch at T=25600 on v5e; ~22k is the proven envelope). Reports per-stage seconds so any gap vs the
    harmonic-mean estimate is self-diagnosing (host readbacks ride the
    tunnel here; a local PCIe host pays far less)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_tpu.data.eval_sentences import EVAL_SENTENCES
    from tacotron2_tpu.models.wavenet.model import WaveNet
    from tacotron2_tpu.synth.tacotron_synth import TacotronSynthesizer
    from tacotron2_tpu.synth.wavenet_synth import WaveNetSynthesizer
    from tacotron2_tpu.train.tacotron_step import TacotronTrainer

    au = cfg.audio
    r, hop, sr = cfg.tacotron.outputs_per_step, au.effective_hop, au.sample_rate
    rng = np.random.default_rng(0)
    texts = [EVAL_SENTENCES[i % len(EVAL_SENTENCES)]
             for i in range(taco_batch)]          # identical per chunk
    n_chunks = -(-n_utts // taco_batch)
    refs = [rng.uniform(-au.max_abs_value, au.max_abs_value,
                        (60, au.num_mels)).astype(np.float32)
            for _ in range(taco_batch)]

    # --- models (random init; init/compile excluded from the timed pass)
    trainer = TacotronTrainer(cfg)
    T_b = 8 * r
    init_batch = dict(
        inputs=np.ones((2, 16), np.int32),
        input_lengths=np.full((2,), 16, np.int32),
        mel_targets=np.zeros((2, T_b, au.num_mels), np.float32),
        stop_token_targets=np.zeros((2, T_b), np.float32),
        targets_lengths=np.full((2,), T_b, np.int32),
        ref_mel_emt=np.zeros((2, 12, au.num_mels), np.float32),
        ref_mel_spk=np.zeros((2, 12, au.num_mels), np.float32),
        emt_labels=np.zeros((2,), np.int32),
        spk_labels=np.zeros((2,), np.int32))
    state = trainer.init_state(jax.random.PRNGKey(0), init_batch)
    params = jax.device_get(state.params)

    def pin_stop_bias(tree):
        for k, v in tree.items():
            if k == "stop_projection":
                b = v["Dense_0"]["bias"]
                v["Dense_0"]["bias"] = np.full_like(np.asarray(b), -30.0)
            elif isinstance(v, dict):
                pin_stop_bias(v)
    pin_stop_bias(params)
    synth = TacotronSynthesizer(cfg, params, state.batch_stats,
                                model=trainer.model)

    wn_model = WaveNet(config=cfg)
    # init WITH conditioning so the upsample network's params exist
    # (x length = frames * hop so the upsampled cond matches)
    init_frames = 2
    wn_vars = wn_model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
        jnp.zeros((1, init_frames * hop, 1)),
        jnp.zeros((1, init_frames, cfg.wavenet.cin_channels)), train=False)
    wn_synth = WaveNetSynthesizer(cfg, wn_vars["params"])

    # build the sampler program ONCE outside the timed pass —
    # fused_incremental_sample constructs a fresh jit executable per call,
    # which on the tunneled backend pays a fresh server-side program load
    from tacotron2_tpu.models.wavenet.sampler import extract_sampler_params
    from tacotron2_tpu.ops.wavenet_kernel import build_sampler_kernel

    chunk_sz = cfg.wavenet.sampler_chunk
    T_audio = steps * cfg.tacotron.outputs_per_step * hop
    T_pad = ((T_audio + chunk_sz - 1) // chunk_sz) * chunk_sz
    sampler_run = build_sampler_kernel(
        cfg, n_utts, T_pad, chunk=chunk_sz,
        cache_dtype=jnp.bfloat16, weight_dtype=jnp.bfloat16,
        hbm_delay_threshold=cfg.wavenet.sampler_hbm_delay_threshold or None,
        window=cfg.wavenet.sampler_window)
    sampler_params = extract_sampler_params(wn_synth.params, cfg)

    # --- SINGLE-PROGRAM path FIRST (synth/pipeline.py): the serving
    # headline — the same chain compiled into ONE XLA program, paying the
    # tunnel's program-activation reload at most once per pass. Runs before
    # the per-stage chain so a tight budget still lands it.
    fused_prog = {}
    try:
        from tacotron2_tpu.synth.pipeline import TextToWavProgram
        all_texts = [texts[i % len(texts)] for i in range(n_utts)]
        inputs_a, lens_a = synth.prepare_inputs(all_texts)
        refs_a = synth._pad_refs([refs[i % len(refs)]
                                  for i in range(n_utts)])
        prog = TextToWavProgram(
            cfg, params, state.batch_stats, wn_synth.params,
            batch=n_utts, steps=steps, t_in=inputs_a.shape[1],
            t_ref=refs_a.shape[1], taco_chunk=taco_batch)
        prog(inputs_a, lens_a, refs_a, refs_a)   # compile + warm
        times = []
        for _ in range(3 if _remaining() > 250 else 2):
            t0 = time.perf_counter()
            out = prog(inputs_a, lens_a, refs_a, refs_a)
            wav_len = np.asarray(out[1])         # syncs the pass
            times.append(time.perf_counter() - t0)
        fp_audio_s = float(wav_len.sum()) / sr
        fused_prog = dict(
            fused_program_audio_s_per_s=round(fp_audio_s / min(times), 1),
            fused_program_total_s=round(min(times), 3),
            fused_program_pass_s=[round(t, 2) for t in times])
        # stream into the emitted detail NOW: if the watchdog fires during
        # the chained passes below, the serving headline still lands
        _state["detail"]["pipeline_fused_program_audio_s_per_s"] = \
            fused_prog["fused_program_audio_s_per_s"]
        if _remaining() > 150:
            # Griffin-Lim single-program route (vocoder-free default)
            prog_gl = TextToWavProgram(
                cfg, params, state.batch_stats, None,
                batch=n_utts, steps=steps, t_in=inputs_a.shape[1],
                t_ref=refs_a.shape[1], taco_chunk=taco_batch,
                vocoder="griffin_lim")
            prog_gl(inputs_a, lens_a, refs_a, refs_a)
            times_gl = []
            for _ in range(2):
                t0 = time.perf_counter()
                out = prog_gl(inputs_a, lens_a, refs_a, refs_a)
                wl = np.asarray(out[1])
                times_gl.append(time.perf_counter() - t0)
            fused_prog["fused_program_gl_audio_s_per_s"] = round(
                float(wl.sum()) / sr / min(times_gl), 1)
            _state["detail"]["pipeline_fused_program_gl_audio_s_per_s"] = \
                fused_prog["fused_program_gl_audio_s_per_s"]
    except Exception as e:  # pragma: no cover
        fused_prog = {"fused_program_error": f"{type(e).__name__}: {e}"[:200]}

    if _remaining() < 150:
        # not enough budget for the per-stage chain's program loads; the
        # single-program number above is the more production-relevant one
        return dict(**fused_prog, pipeline_chain_skipped="budget")

    # one warm call builds/caches the fused decode program + dec params
    _inputs0, _lens0 = synth.prepare_inputs(texts)
    _refs0 = synth._pad_refs(refs)
    synth._fused_synth(_inputs0, _lens0, _refs0, _refs0, steps)

    def _taco_stage():
        # STAGE-MAJOR schedule: all memory passes, then all decode-kernel
        # calls, then all postnets — 3 program activations instead of
        # 3 x n_chunks (on this tunnel each program switch costs ~1-2 s of
        # server-side reload; a production host pipelines the same way to
        # keep each program hot)
        inputs, input_lengths = synth.prepare_inputs(texts)
        refs_p = synth._pad_refs(refs)
        ins = (jnp.asarray(inputs), jnp.asarray(input_lengths),
               jnp.asarray(refs_p), jnp.asarray(refs_p))
        mems = [synth._jit_memory(synth.params, synth.batch_stats, *ins)
                for _ in range(n_chunks)]
        B, t_in, M = mems[0][1].shape
        run = synth._fused_cache[(B, t_in, M, steps)]
        outs = []
        for keys, memory, mask, _, _ in mems:
            synth._fused_seed += 1
            outs.append(run(synth._dec_params, keys, memory, mask,
                            synth._fused_seed))
        mels_d, stops_l = [], []
        for frames, stops, _ in outs:
            _, mel_out = synth._jit_postnet(synth.params, synth.batch_stats,
                                            frames)
            mels_d.append(mel_out)
            stops_l.append(stops)
        mels_dev = jnp.concatenate(mels_d, axis=0)[:n_utts]
        float(jnp.sum(mels_dev[:, -1]))  # tunnel sync: scalar fetch
        return mels_dev, stops_l

    def _wavenet_stage(mels_dev=None):
        # mels stay ON DEVICE between the stages, as a TPU-native
        # production pipeline would keep them (the reference hands off via
        # disk; this tunnel's host link is ~2 MB/s, so a host mel hop here
        # measures the tunnel, not the framework — the full wav readback
        # is timed separately below).
        # clip + [0,1] interp on device (wavenet_feeder.interp_to_unit)
        if mels_dev is None:
            mels_dev = _wavenet_stage.last_mels
        lo = -au.max_abs_value if au.symmetric_mels else 0.0
        c01 = (jnp.clip(mels_dev, lo, au.max_abs_value) - lo) \
            / (au.max_abs_value - lo)
        # ConvT upsample staged in 32-utterance chunks (the 2-D transposed
        # conv at B=256 wants a >512 MB VMEM scratch on v5e); the fused
        # sampler then runs the full batch
        ups = [wn_synth._upsample(wn_synth.params, c01[i:i + 32])
               for i in range(0, c01.shape[0], 32)]
        c_up = jnp.concatenate(ups, axis=0)
        if T_pad != c_up.shape[1]:
            c_up = jnp.pad(c_up, ((0, 0), (0, T_pad - c_up.shape[1]),
                                  (0, 0)))
        samples = sampler_run(sampler_params, c_up, 11)[:, :T_audio]
        float(jnp.sum(samples[:, -1]))   # tunnel sync: scalar fetch
        return samples

    def one_pass():
        stage = {}
        t0 = time.perf_counter()
        mels_dev, stops_l = _taco_stage()
        _wavenet_stage.last_mels = mels_dev
        stage["tacotron_s"] = time.perf_counter() - t0
        t1 = time.perf_counter()
        samples = _wavenet_stage(mels_dev)
        stage["wavenet_s"] = time.perf_counter() - t1
        # stop-length recovery fetches only the [B, steps] stop probs
        # (27 KB per chunk)
        lengths = [L for st in stops_l
                   for L in synth.get_output_lengths(np.asarray(st))]
        stage["total_s"] = time.perf_counter() - t0
        return samples, lengths, stage

    one_pass()                      # compile + program-load warmup
    # the tunneled backend's program-residency effects are erratic
    # (server-side eviction between passes was measured to inflate one
    # stage 7x); report the best of 3 passes with all pass times.
    # Budget-adaptive: on a tight run (cold program loads ate the budget)
    # drop to 2 passes and skip the steady re-measure so the training
    # section still gets its slot — the decomposition is documented from
    # prior full runs and PARITY; the chained headline always lands.
    tight = _remaining() < 250
    passes = [one_pass() for _ in range(2 if tight else 3)]
    samples, lengths, stage = min(passes, key=lambda p_: p_[2]["total_s"])
    hop_ = cfg.audio.effective_hop
    audio_s = sum(lengths) * hop_ / sr

    # steady-state decomposition: run each stage twice BACK-TO-BACK and
    # time the second — measured on this tunnel, switching between the
    # decode and sampler programs costs a ~5-10 s server-side program
    # reload per switch (0.27 s vs 5.2 s for the identical sampler call),
    # a cost a locally-attached host does not pay. The chained number
    # above includes it; this shows what the same chain does with
    # resident programs.
    steady = {}
    if not tight and _remaining() > 200:
        for name, fn in (("tacotron", lambda: _taco_stage()),
                         ("wavenet", lambda: _wavenet_stage())):
            fn()
            t0 = time.perf_counter()
            fn()
            steady[name] = time.perf_counter() - t0
    steady_total = sum(steady.values()) or None
    t0 = time.perf_counter()
    wav_host = np.asarray(samples)              # full [B, T] wav readback
    readback_s = time.perf_counter() - t0

    return dict(
        **fused_prog,
        pipeline_audio_s_per_s=audio_s / stage["total_s"],
        audio_s=round(audio_s, 1), n_utts=len(lengths),
        utt_seconds=round(lengths[0] * hop_ / sr, 3),
        tacotron_s=round(stage["tacotron_s"], 3),
        wavenet_s=round(stage["wavenet_s"], 3),
        total_s=round(stage["total_s"], 3),
        host_readback_s=round(readback_s, 3),
        host_readback_mb=round(wav_host.nbytes / 1e6, 1),
        pass_total_s=[round(p_[2]["total_s"], 2) for p_ in passes],
        **({"steady_tacotron_s": round(steady["tacotron"], 3),
            "steady_wavenet_s": round(steady["wavenet"], 3),
            "steady_audio_s_per_s": round(audio_s / steady_total, 1)}
           if steady else {"steady_skipped": "budget"}),
        with_readback_audio_s_per_s=round(
            audio_s / (stage["total_s"] + readback_s), 1))


def bench_griffin_lim(cfg, batch=32, dur=4.0):
    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.ops import griffin_lim as gl
    from tacotron2_tpu.ops import stft as dstft

    sr = cfg.audio.sample_rate

    @jax.jit
    def make_mels(key):
        # synthetic but spectrally plausible conditioning, generated on device
        t = jnp.arange(int(sr * dur)) / sr
        f0 = 120.0 + 30.0 * jnp.arange(batch)[:, None]
        wavs = 0.5 * jnp.sin(2 * jnp.pi * (f0 + 50 * t[None]) * t[None])
        wavs = wavs + 0.01 * jax.random.normal(key, wavs.shape)
        return dstft.mel_spectrogram(wavs, cfg.audio)

    mels = make_mels(jax.random.PRNGKey(0))

    def sync(y):
        return float(jnp.sum(y[:, -1]))

    # window-support-trimmed XLA path (ops/stft.py): f32 = reference-parity
    # math, bf16 = production option (gl_compute_dtype). The fused Pallas
    # kernel is excluded: measured 2.8 audio-s/s (dynamic-indexed VMEM
    # matmuls run at VPU speed) vs the XLA path's hundreds.
    import dataclasses
    out = {}
    for name, dtype in (("f32", None), ("bf16", "bfloat16")):
        acfg = dataclasses.replace(cfg.audio, gl_compute_dtype=dtype)
        try:
            sync(gl.inv_mel_spectrogram(mels, acfg))  # compile+sync
            t0 = time.perf_counter()
            for _ in range(3):
                y = gl.inv_mel_spectrogram(mels, acfg)
            sync(y)
            dt = (time.perf_counter() - t0) / 3
            out[name] = batch * dur / dt
        except Exception as e:  # pragma: no cover
            out[name + "_error"] = f"{type(e).__name__}: {e}"[:160]
    return out


def bench_training(cfg):
    import dataclasses

    from scripts.bench_train import (bench_tacotron_train,
                                     bench_wavenet_train)
    from tacotron2_tpu.utils import roofline as R
    dk = _device_kind()
    # Tacotron: fused Pallas teacher-forced decoder (fwd + custom_vjp
    # BPTT bwd, ops/tacotron_train_kernel.py) — the measured-best config
    out = {}
    tfu = cfg.replace(tacotron=dataclasses.replace(
        cfg.tacotron, use_fused_train_decoder=True,
        compute_dtype="bfloat16"))
    tt = bench_tacotron_train(tfu, 96, 400, 10)
    out.update(
        tacotron_train_audio_s_per_s=round(tt["audio_s_per_s"], 1),
        tacotron_train_ms_per_step=round(tt["ms_per_step"], 1),
        tacotron_train_ms_spread=tt["ms_per_step_spread"],
        tacotron_train_decoder="fused Pallas fwd+bwd (B=96, bf16 conv stacks)")
    # measurement-grade FLOPs (VERDICT r3 item 7): XLA cost_analysis of the
    # compiled step + exact hand-counted matmuls of the Pallas custom-call
    # interior (invisible to XLA) — replaces the "3x fwd approximation"
    kern = R.fused_train_decoder_flops(tfu, 96, 400, tt["t_in"])
    wl = dict(flops_per_step=tt["xla_flops_per_step"] + kern,
              note="XLA cost_analysis + counted fused-decoder kernel matmuls")
    if not tt["xla_flops_per_step"]:
        wl = R.tacotron_train_step(tfu, 96, 400, tt["t_in"])  # fallback
    _state["detail"].setdefault("mfu", {})["tacotron_train"] = R.mfu_entry(
        wl, tt["ms_per_step"] / 1e3, dk)
    if _remaining() > 60:
        # WaveNet: fused Pallas train-stack kernels (whole-stack streaming
        # fwd + custom_vjp bwd, ops/wavenet_train_kernel.py) — 2.7x the XLA
        # path (scripts/check_train_stack.py)
        wbf = cfg.replace(wavenet=dataclasses.replace(
            cfg.wavenet, compute_dtype="bfloat16",
            use_fused_train_stack=True))
        wt = bench_wavenet_train(wbf, 16, 10)
        out.update(
            wavenet_train_audio_s_per_s=round(wt["audio_s_per_s"], 1),
            wavenet_train_ms_per_step=round(wt["ms_per_step"], 1),
            wavenet_train_ms_spread=wt["ms_per_step_spread"],
            wavenet_train_stack="fused Pallas fwd+bwd (B=16, bf16)")
        _state["detail"]["mfu"]["wavenet_train"] = R.mfu_entry(
            R.wavenet_train_step(wbf, 16, wt["crop_samples"]),
            wt["ms_per_step"] / 1e3, dk)
    else:
        _state["detail"]["skipped"].append("wavenet_train")
    return out


def _device_kind():
    import jax
    try:
        return jax.devices()[0].device_kind
    except Exception:  # pragma: no cover
        return "TPU v5 lite"


def _timed(name, fn):
    t0 = time.time()
    try:
        return fn()
    finally:
        _state["detail"].setdefault("section_s", {})[name] = round(
            time.time() - t0, 1)


def main():
    _enable_compile_cache()
    _start_watchdog()
    import jax

    from tacotron2_tpu.config import get_config

    cfg = get_config("default")
    detail = _state["detail"]
    detail["backend"] = jax.default_backend()
    sections = _state["sections"]

    # --- headline: fused vocoder sampler ---------------------------------
    try:
        voc = _timed('vocoder', lambda: bench_vocoder(cfg))
        sections["vocoder"] = voc
        detail.update(
            model="WaveNet 20L/128R Gaussian, fused Pallas sampler "
                  "(B=256, bf16 cache+weights, dilations >32 in HBM, "
                  "W=8 prefetch windows)",
            us_per_step=round(voc["fused_us_per_step"], 2),
            realtime_factor_per_stream=round(
                voc["realtime_factor_per_stream"], 2),
            batch=voc["batch"],
            xla_scan_audio_s_per_s=round(voc["xla_scan_audio_s_per_s"], 2),
            xla_scan_source="frozen constant (68.5 us/step)")
        from tacotron2_tpu.utils import roofline as R
        detail.setdefault("mfu", {})["wavenet_sampler"] = R.mfu_entry(
            R.wavenet_sampler_step(cfg, voc["batch"]),
            voc["fused_us_per_step"] / 1e6, _device_kind())
        if "exact_f32_audio_s_per_s" in voc:
            detail["exact_f32_audio_s_per_s"] = round(
                voc["exact_f32_audio_s_per_s"], 2)
            detail["batch_exact"] = voc["batch_exact"]
    except Exception as e:  # pragma: no cover
        detail["vocoder_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- tacotron fused decode -------------------------------------------
    # runs before the MoL section: it reuses warm programs and lands the
    # second-most-important number, while MoL compiles a second large kernel
    # whose first execution through the remote-compile service is erratic
    if _remaining() > 75:
        try:
            taco = _timed('taco', lambda: bench_tacotron_decode(cfg))
            sections["tacotron_decode"] = taco
            detail["tacotron_decode_audio_s_per_s"] = round(
                taco["mel_audio_s_per_s"], 1)
            detail["tacotron_decode_us_per_step"] = round(
                taco["us_per_step"], 2)
            from tacotron2_tpu.utils import roofline as R
            detail.setdefault("mfu", {})["tacotron_decode"] = R.mfu_entry(
                R.tacotron_decode_step(cfg, taco["batch"], 256),
                taco["us_per_step"] / 1e6, _device_kind())
        except Exception as e:  # pragma: no cover
            detail["tacotron_decode_error"] = f"{type(e).__name__}: {e}"[:200]
    else:
        detail["skipped"].append("tacotron_decode")

    # --- decode variants: long-input fused block + emt_attn --------------
    # runs EARLY (right after the decode headline): the r5 watchdog-emit
    # analysis showed trailing sections never reach the driver's emitted
    # record (watchdog fires at ~550 s), and the blocked-kernel energy-mode
    # evidence must land in BENCH_rN, not only in local full runs
    if _remaining() > 90:
        try:
            dv = _timed('decode_variants', lambda: bench_decode_variants(cfg))
            detail["decode_variants"] = dv
        except Exception as e:  # pragma: no cover
            detail["decode_variants_error"] = f"{type(e).__name__}: {e}"[:200]
    else:
        detail["skipped"].append("decode_variants")

    # --- Griffin-Lim (BASELINE config[0]) --------------------------------
    if _remaining() > 45:
        try:
            glt = _timed('gl', lambda: bench_griffin_lim(cfg))
            for k, v in glt.items():
                detail[f"griffin_lim_{k}"] = (round(v, 1)
                                              if isinstance(v, float) else v)
            floats = {k: v for k, v in glt.items() if isinstance(v, float)}
            if not floats:  # per-config errors are already in detail
                raise RuntimeError("all G-L configs failed")
            best_name = max(floats, key=floats.get)
            best = floats[best_name]
            sections["griffin_lim"] = best
            detail["griffin_lim_audio_s_per_s"] = round(best, 1)
            # which dtype produced the headline (f32 = reference-parity math,
            # bf16 = production option) — ADVICE r2: label the winner
            detail["griffin_lim_best_config"] = best_name
            from tacotron2_tpu.utils import roofline as R
            detail.setdefault("mfu", {})["griffin_lim"] = R.mfu_entry(
                R.griffin_lim_audio_second(cfg), 1.0 / best, _device_kind())
        except Exception as e:  # pragma: no cover
            detail["griffin_lim_error"] = f"{type(e).__name__}: {e}"[:200]
    else:
        detail["skipped"].append("griffin_lim")

    # --- paper-preset MoL fused sampler ----------------------------------
    if _remaining() > 210:
        try:
            mol = _timed('mol', bench_vocoder_mol)
            detail["mol_paper_audio_s_per_s"] = round(
                mol["mol_paper_audio_s_per_s"], 1)
            detail["mol_us_per_step"] = round(mol["mol_us_per_step"], 2)
        except Exception as e:  # pragma: no cover
            detail["mol_error"] = f"{type(e).__name__}: {e}"[:200]
    else:
        detail["skipped"].append("vocoder_mol")

    if "vocoder" in sections and "tacotron_decode" in sections:
        detail["end_to_end_audio_s_per_s"] = round(
            1.0 / (1.0 / sections["vocoder"]["fused_audio_s_per_s"]
                   + 1.0 / sections["tacotron_decode"]["mel_audio_s_per_s"]),
            1)
    if "griffin_lim" in sections and "tacotron_decode" in sections:
        # text -> mel -> Griffin-Lim waveform (the vocoder-free pipeline)
        detail["end_to_end_gl_audio_s_per_s"] = round(
            1.0 / (1.0 / sections["griffin_lim"]
                   + 1.0 / sections["tacotron_decode"]["mel_audio_s_per_s"]),
            1)

    # --- live XLA-scan baseline (before training: its program is warm in
    # ~2 s after a cache warm-up, while the training section's per-process
    # program load can eat minutes of budget on a slow tunnel day; a COLD
    # scan compile still can't wedge the emission — the watchdog emits
    # best-so-far with the frozen constant) -------------------------------
    if ("vocoder" in sections and "_scan_ctx" in sections["vocoder"]
            and _remaining() > 60
            and os.environ.get("BENCH_SCAN_LIVE", "1") == "1"):
        try:
            live = _timed('scan_live', lambda: bench_scan_live(
                sections["vocoder"], cfg))
            detail["xla_scan_audio_s_per_s"] = round(live, 2)
            detail["xla_scan_source"] = "measured this run"
            detail["scan_us_per_step"] = round(
                sections["vocoder"]["scan_us_per_step"], 2)
        except Exception as e:  # pragma: no cover
            detail["scan_live_error"] = f"{type(e).__name__}: {e}"[:160]
    sections.get("vocoder", {}).pop("_scan_ctx", None)

    # --- training throughput (both models, bf16 configs) -----------------
    # runs BEFORE the pipeline section: on a cold-program day the chained
    # pipeline's per-stage program loads can eat the whole remaining budget
    # (measured 347 s once), and the train numbers + MFU matter more
    if _remaining() > 90:
        try:
            detail.update(_timed('train', lambda: bench_training(cfg)))
        except Exception as e:  # pragma: no cover
            detail["train_bench_error"] = f"{type(e).__name__}: {e}"[:200]
    else:
        detail["skipped"].append("training")

    # --- MEASURED chained pipeline (vs the harmonic estimate above).
    # Fused-single-program first with streaming emission, so even a
    # watchdog cut mid-section lands the serving headline ----------------
    if _remaining() > 60:
        try:
            pipe = _timed('pipeline', lambda: bench_pipeline(cfg))
            if "pipeline_audio_s_per_s" in pipe:
                detail["pipeline_audio_s_per_s"] = round(
                    pipe["pipeline_audio_s_per_s"], 1)
            if "fused_program_audio_s_per_s" in pipe:
                # ONE-XLA-program text->wav (synth/pipeline.py): no
                # inter-stage program switches at all
                detail["pipeline_fused_program_audio_s_per_s"] = \
                    pipe["fused_program_audio_s_per_s"]
            detail["pipeline_detail"] = {
                k: v for k, v in pipe.items() if k != "pipeline_audio_s_per_s"}
            if ("end_to_end_audio_s_per_s" in detail
                    and "pipeline_audio_s_per_s" in pipe):
                detail["pipeline_vs_estimate"] = round(
                    pipe["pipeline_audio_s_per_s"]
                    / detail["end_to_end_audio_s_per_s"], 3)
            # gap diagnosis (VERDICT r3 item 3): on this tunneled backend
            # every ACTIVATION of a different program costs ~1-2 s of
            # server-side reload (the identical sampler call measures
            # 0.27 s warm vs 5.2 s after a program switch; the decode
            # kernel 4.6 ms in its own timing loop vs ~2 s embedded in the
            # chain). The per-section benches amortize this inside
            # single-program timing loops; a chained multi-program pass
            # exposes it on every hop. steady_*_s / wavenet_s show the
            # per-stage floor once a program is resident — a
            # locally-attached production host pays neither the reloads
            # nor the 2 MB/s readback link. The single-program path
            # (fused_program_*) is the production serving answer to it.
            detail["pipeline_note"] = (
                "gap vs estimate = tunnel program-activation reloads "
                "(~1-2 s/switch) + 2 MB/s host link; see steady_*_s and "
                "pipeline_detail for the decomposition")
        except Exception as e:  # pragma: no cover
            detail["pipeline_error"] = f"{type(e).__name__}: {e}"[:200]
    else:
        detail["skipped"].append("pipeline")

    # (decode variants section moved before Griffin-Lim — see note there)

    detail["elapsed_s"] = round(time.time() - _T0, 1)
    if not detail["skipped"]:
        del detail["skipped"]
    _emit()


if __name__ == "__main__":
    main()
