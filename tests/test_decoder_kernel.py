"""Fused Tacotron decoder kernel parity vs the flax scan path.

Runs the Pallas TPU interpreter on CPU. Prenet dropout is disabled via config
(dropout_rate=0) so both paths are deterministic and comparable exactly; the
always-on dropout path itself reuses the PRNG recipe already covered by the
vocoder kernel tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.config import get_config
from tacotron2_tpu.models.tacotron.decoder import Decoder
from tacotron2_tpu.ops.tacotron_decoder_kernel import (
    DecoderParams, build_decoder_block_kernel, build_decoder_kernel,
    extract_decoder_params, init_decoder_state)

B, T_IN, M, STEPS = 4, 20, 256, 6


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("default")
    cfg = cfg.with_overrides("tacotron.dropout_rate=0.0")
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.normal(size=(B, T_IN, M)), jnp.float32)
    lengths = jnp.asarray([T_IN, T_IN - 3, T_IN - 7, 5], jnp.int32)
    mask = jnp.arange(T_IN)[None, :] < lengths[:, None]

    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2))
    # keys are an input to both paths (compute_keys runs outside the loop),
    # so any fixed [B, T, A] tensor exercises the kernel
    keys = jnp.asarray(
        rng.normal(size=(B, T_IN, cfg.tacotron.attention_dim)) * 0.3,
        jnp.float32)
    variables = dec.init(rngs, B, STEPS, keys, memory, mask,
                         method=Decoder.autoregressive)
    params = variables["params"]
    return cfg, params, keys, memory, mask


def _flax_out(cfg, params, keys, memory, mask):
    dec = Decoder(config=cfg)
    return dec.apply(
        {"params": params}, B, STEPS, keys, memory, mask,
        method=Decoder.autoregressive,
        rngs=dict(dropout=jax.random.PRNGKey(7),
                  zoneout=jax.random.PRNGKey(8)))


def test_fused_decoder_matches_scan(setup):
    cfg, params, keys, memory, mask = setup
    frames_ref, stops_ref, aligns_ref, _ = _flax_out(
        cfg, params, keys, memory, mask)

    dp = extract_decoder_params({"decoder": params}, cfg)
    run = build_decoder_kernel(cfg, B, T_IN, STEPS, M,
                               weight_dtype=jnp.float32, interpret=True)
    frames, stops, aligns = run(dp, keys, memory, mask, 3)

    np.testing.assert_allclose(np.asarray(frames), np.asarray(frames_ref),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(stops), np.asarray(stops_ref),
                               rtol=0, atol=2e-5)
    # alignments are emitted bf16 (plot-only artifact)
    np.testing.assert_allclose(np.asarray(aligns), np.asarray(aligns_ref),
                               rtol=0, atol=8e-3)


def test_fused_decoder_no_alignments(setup):
    cfg, params, keys, memory, mask = setup
    dp = extract_decoder_params({"decoder": params}, cfg)
    run = build_decoder_kernel(cfg, B, T_IN, STEPS, M,
                               weight_dtype=jnp.float32,
                               emit_alignments=False, interpret=True)
    frames, stops, aligns = run(dp, keys, memory, mask, 3)
    assert aligns is None
    frames_ref, stops_ref, _, _ = _flax_out(cfg, params, keys, memory, mask)
    np.testing.assert_allclose(np.asarray(frames), np.asarray(frames_ref),
                               rtol=0, atol=2e-4)


def test_fused_decoder_dropout_active(setup):
    """With dropout ON (the always-on prenet dropout) the kernel produces
    finite frames that differ from the dropout-off trajectory. (Interpret-mode
    PRNG is not seed-faithful, so seed sensitivity is asserted on hardware by
    scripts/bench_tacotron.py, not here.)"""
    cfg, params, keys, memory, mask = setup
    cfg_drop = get_config("default")  # dropout_rate=0.5
    dp = extract_decoder_params({"decoder": params}, cfg_drop)
    run = build_decoder_kernel(cfg_drop, B, T_IN, STEPS, M,
                               weight_dtype=jnp.float32,
                               emit_alignments=False, interpret=True)
    f1, _, _ = run(dp, keys, memory, mask, 3)
    assert np.isfinite(np.asarray(f1)).all()
    frames_off, _, _, _ = _flax_out(cfg, params, keys, memory, mask)
    assert not np.allclose(np.asarray(f1), np.asarray(frames_off), atol=1e-3)


@pytest.mark.slow
def test_fused_pipeline_matches_model_synthesis():
    """Full integration: synthesis_memory -> fused kernel -> postnet_pass
    reproduces model.apply(synthesis=True) when dropout is off (r=2 path)."""
    import dataclasses as dc

    import sys
    sys.path.insert(0, "tests")
    from test_tacotron_model import make_batch, tiny_config

    from tacotron2_tpu.models.tacotron.model import Tacotron

    cfg = tiny_config()
    cfg = cfg.replace(tacotron=dc.replace(
        cfg.tacotron, dropout_rate=0.0, prenet_layers=(16, 16)))
    batch = make_batch(B=2, T_in=10, T_out=12)
    steps = 4
    model = Tacotron(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2),
                teacher_forcing=jax.random.PRNGKey(3))
    variables = model.init(rngs, batch["inputs"], batch["input_lengths"],
                           batch["mel_targets"], batch["ref_mel_emt"],
                           batch["ref_mel_spk"], train=True)
    vars_infer = {"params": variables["params"],
                  "batch_stats": variables["batch_stats"]}

    out_ref = model.apply(
        vars_infer, batch["inputs"], batch["input_lengths"],
        ref_mel_emt=batch["ref_mel_emt"], ref_mel_spk=batch["ref_mel_spk"],
        synthesis=True, max_steps=steps, train=False,
        rngs=dict(dropout=jax.random.PRNGKey(7),
                  zoneout=jax.random.PRNGKey(8)))

    keys, memory, mask = model.apply(
        vars_infer, batch["inputs"], batch["input_lengths"],
        batch["ref_mel_emt"], batch["ref_mel_spk"],
        method=Tacotron.synthesis_memory)
    dp = extract_decoder_params(variables["params"], cfg)
    run = build_decoder_kernel(cfg, 2, int(memory.shape[1]), steps,
                               int(memory.shape[2]),
                               weight_dtype=jnp.float32, interpret=True)
    frames, stops, aligns = run(dp, keys, memory, mask, 5)
    _, mel_out = model.apply(vars_infer, frames, method=Tacotron.postnet_pass)

    np.testing.assert_allclose(np.asarray(mel_out),
                               np.asarray(out_ref.mel_outputs),
                               rtol=0, atol=3e-4)
    np.testing.assert_allclose(np.asarray(stops),
                               np.asarray(out_ref.stop_token_prediction),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(aligns),
                               np.asarray(out_ref.alignments),
                               rtol=0, atol=8e-3)


def test_early_stop_block_matches_full_run(setup):
    """Kernel with early_stop_block: identical outputs up to each stream's
    stop, stop prob 1.0 in the skipped tail, and full parity when no stream
    stops. Stops are forced deterministically by pinning the stop
    projection's bias (sigmoid(+-10))."""
    cfg, params, keys, memory, mask = setup
    dp = extract_decoder_params({"decoder": params}, cfg)
    r = cfg.tacotron.outputs_per_step
    steps = 24
    run_full = build_decoder_kernel(cfg, B, T_IN, steps, M,
                                    weight_dtype=jnp.float32, interpret=True)
    run_blk = build_decoder_kernel(cfg, B, T_IN, steps, M,
                                   weight_dtype=jnp.float32,
                                   early_stop_block=8, interpret=True)
    # force every stream to predict <stop> from step 0: stop bias +10
    dp_stop = dp._replace(proj_b=dp.proj_b.at[-r:].set(10.0))
    f_full, s_full, _ = run_full(dp_stop, keys, memory, mask, 3)
    f_blk, s_blk, _ = run_blk(dp_stop, keys, memory, mask, 3)
    # first block computed identically
    np.testing.assert_allclose(f_blk[:, :8 * r], f_full[:, :8 * r],
                               atol=1e-5)
    # skipped steps read as stopped (host length recovery unaffected)
    assert np.all(np.asarray(s_blk[:, 8 * r:]) == 1.0)
    # no-stop model: block path must equal the full path everywhere
    dp_nostop = dp._replace(proj_b=dp.proj_b.at[-r:].set(-10.0))
    f_full2, s_full2, _ = run_full(dp_nostop, keys, memory, mask, 5)
    f_blk2, s_blk2, _ = run_blk(dp_nostop, keys, memory, mask, 5)
    np.testing.assert_allclose(f_blk2, f_full2, atol=1e-5)
    np.testing.assert_allclose(s_blk2, s_full2, atol=1e-5)


def test_block_kernel_matches_monolithic(setup):
    """Chained K-step block kernels (tiled attention operands + explicit
    carry) reproduce the monolithic kernel's full run when dropout is off."""
    cfg, params, keys, memory, mask = setup
    dp = extract_decoder_params({"decoder": params}, cfg)
    steps, k = 12, 4
    run_full = build_decoder_kernel(cfg, B, T_IN, steps, M,
                                    weight_dtype=jnp.float32, interpret=True)
    f_full, s_full, a_full = run_full(dp, keys, memory, mask, 3)

    run_blk = build_decoder_block_kernel(cfg, B, T_IN, k, M,
                                         weight_dtype=jnp.float32,
                                         interpret=True)
    state = init_decoder_state(cfg, B, T_IN, M)
    fs, ss, als = [], [], []
    for i in range(steps // k):
        f, s_, a_, state = run_blk(dp, keys, memory, mask, state, 3 + i)
        fs.append(np.asarray(f))
        ss.append(np.asarray(s_))
        als.append(np.asarray(a_))
    np.testing.assert_allclose(np.concatenate(fs, 1), np.asarray(f_full),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.concatenate(ss, 1), np.asarray(s_full),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.concatenate(als, 2), np.asarray(a_full),
                               rtol=0, atol=8e-3)


def test_block_kernel_long_input_matches_scan():
    """T_in beyond the monolithic kernel's 256 ceiling (Tp=384 here): the
    blocked kernel matches the flax scan path."""
    cfg = get_config("default")
    cfg = cfg.with_overrides("tacotron.dropout_rate=0.0")
    rng = np.random.default_rng(1)
    B2, T2, M2, steps, k = 2, 300, 256, 8, 4
    memory = jnp.asarray(rng.normal(size=(B2, T2, M2)) * 0.3, jnp.float32)
    lengths = jnp.asarray([T2, T2 - 60], jnp.int32)
    mask = jnp.arange(T2)[None, :] < lengths[:, None]
    keys = jnp.asarray(
        rng.normal(size=(B2, T2, cfg.tacotron.attention_dim)) * 0.3,
        jnp.float32)
    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2))
    variables = dec.init(rngs, B2, steps, keys, memory, mask,
                         method=Decoder.autoregressive)
    params = variables["params"]
    f_ref, s_ref, a_ref, _ = dec.apply(
        {"params": params}, B2, steps, keys, memory, mask,
        method=Decoder.autoregressive,
        rngs=dict(dropout=jax.random.PRNGKey(7),
                  zoneout=jax.random.PRNGKey(8)))

    dp = extract_decoder_params({"decoder": params}, cfg)
    run_blk = build_decoder_block_kernel(cfg, B2, T2, k, M2,
                                         weight_dtype=jnp.float32,
                                         interpret=True)
    state = init_decoder_state(cfg, B2, T2, M2)
    fs, ss, als = [], [], []
    for i in range(steps // k):
        f, s_, a_, state = run_blk(dp, keys, memory, mask, state, 3 + i)
        fs.append(np.asarray(f))
        ss.append(np.asarray(s_))
        als.append(np.asarray(a_))
    np.testing.assert_allclose(np.concatenate(fs, 1), np.asarray(f_ref),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.concatenate(ss, 1), np.asarray(s_ref),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.concatenate(als, 2), np.asarray(a_ref),
                               rtol=0, atol=8e-3)


def test_scan_block_decode_matches_full_scan(setup):
    """Decoder.autoregressive with initial_state/return_state chained over
    blocks (the host-side early-exit path, _scan_block_synth) equals the
    one-shot scan when dropout is off."""
    cfg, params, keys, memory, mask = setup
    dec = Decoder(config=cfg)
    apply_rngs = dict(dropout=jax.random.PRNGKey(3),
                      zoneout=jax.random.PRNGKey(4))
    steps, k = 12, 4
    f_full, s_full, a_full, _ = dec.apply(
        {"params": params}, B, steps, keys, memory, mask,
        method=Decoder.autoregressive, rngs=apply_rngs)
    carry = None
    fs, ss, als = [], [], []
    for _ in range(steps // k):
        f, s_, a_, _, carry = dec.apply(
            {"params": params}, B, k, keys, memory, mask,
            initial_state=carry, return_state=True,
            method=Decoder.autoregressive, rngs=apply_rngs)
        fs.append(f)
        ss.append(s_)
        als.append(a_)
    np.testing.assert_allclose(np.concatenate(fs, 1), f_full, atol=1e-5)
    np.testing.assert_allclose(np.concatenate(ss, 1), s_full, atol=1e-5)
    np.testing.assert_allclose(np.concatenate(als, 2), a_full, atol=1e-5)


def test_block_kernel_emt_attn_matches_scan():
    """emt_attn='simple' in-kernel (SimpleBahdanau over the emt-ref
    sequence + context_emt/ref_spk LSTM feed): the blocked kernel matches
    Decoder.autoregressive with the same emt operands."""
    import dataclasses as dc

    from tacotron2_tpu.ops.tacotron_decoder_kernel import (
        block_kernel_vmem_bytes)

    cfg = get_config("default")
    cfg = cfg.with_overrides("tacotron.dropout_rate=0.0")
    cfg = cfg.replace(gst=dc.replace(cfg.gst, emt_attn=True,
                                     emt_attn_type="simple",
                                     reference_depth=8))
    B2, T2, M2, steps, k = 2, 20, 64, 8, 4
    Te, E, R = 3, 2 * 8, 8
    rng = np.random.default_rng(2)
    memory = jnp.asarray(rng.normal(size=(B2, T2, M2)) * 0.3, jnp.float32)
    lengths = jnp.asarray([T2, T2 - 5], jnp.int32)
    mask = jnp.arange(T2)[None, :] < lengths[:, None]
    keys = jnp.asarray(
        rng.normal(size=(B2, T2, cfg.tacotron.attention_dim)) * 0.3,
        jnp.float32)
    emt_memory = jnp.asarray(rng.normal(size=(B2, Te, E)) * 0.4, jnp.float32)
    ref_spk = jnp.asarray(rng.normal(size=(B2, R)) * 0.4, jnp.float32)

    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2))
    variables = dec.init(rngs, B2, steps, keys, memory, mask,
                         emt_memory=emt_memory, ref_spk=ref_spk,
                         method=Decoder.autoregressive)
    params = variables["params"]
    f_ref, s_ref, a_ref, _ = dec.apply(
        {"params": params}, B2, steps, keys, memory, mask,
        emt_memory=emt_memory, ref_spk=ref_spk,
        method=Decoder.autoregressive,
        rngs=dict(dropout=jax.random.PRNGKey(7),
                  zoneout=jax.random.PRNGKey(8)))

    dp = extract_decoder_params({"decoder": params}, cfg)
    assert dp.l1_we is not None and dp.l1_wr is not None
    run_blk = build_decoder_block_kernel(cfg, B2, T2, k, M2,
                                         weight_dtype=jnp.float32,
                                         emt_T=Te, interpret=True)
    state = init_decoder_state(cfg, B2, T2, M2)
    fs, ss = [], []
    for i in range(steps // k):
        f, s_, a_, state = run_blk(dp, keys, memory, mask, state, 3 + i,
                                   emt_memory, ref_spk)
        fs.append(np.asarray(f))
        ss.append(np.asarray(s_))
    np.testing.assert_allclose(np.concatenate(fs, 1), np.asarray(f_ref),
                               rtol=0, atol=3e-4)
    np.testing.assert_allclose(np.concatenate(ss, 1), np.asarray(s_ref),
                               rtol=0, atol=3e-5)
    assert block_kernel_vmem_bytes(cfg, B2, T2, k, M2) > 0


@pytest.mark.parametrize("energy_mode,context_mode", [
    ("vmat", "blockdiag"),   # the r3 all-matmul forms
    ("dot", "batched"),      # thin-matmul energy reduce
])
def test_energy_context_mode_parity(setup, energy_mode, context_mode):
    """The r5 ablation modes (scripts/bench_decode_ablate.py) are pure
    compute-layout changes: every (energy_mode, context_mode) combination
    must match the default ('vpu', 'batched') kernel bit-for-bit up to
    float association, in both the monolithic and blocked kernels."""
    cfg, params, keys, memory, mask = setup
    dp = extract_decoder_params({"decoder": params}, cfg)

    base = build_decoder_kernel(cfg, B, T_IN, STEPS, M,
                                weight_dtype=jnp.float32, interpret=True)
    f0, s0, a0 = base(dp, keys, memory, mask, 3)
    run = build_decoder_kernel(cfg, B, T_IN, STEPS, M,
                               weight_dtype=jnp.float32,
                               energy_mode=energy_mode,
                               context_mode=context_mode, interpret=True)
    f1, s1, a1 = run(dp, keys, memory, mask, 3)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                               rtol=0, atol=8e-3)

    base_b = build_decoder_block_kernel(cfg, B, T_IN, STEPS, M,
                                        weight_dtype=jnp.float32,
                                        interpret=True)
    st = init_decoder_state(cfg, B, T_IN, M)
    fb0, sb0, ab0, _ = base_b(dp, keys, memory, mask, st, 3)
    run_b = build_decoder_block_kernel(cfg, B, T_IN, STEPS, M,
                                       weight_dtype=jnp.float32,
                                       energy_mode=energy_mode,
                                       context_mode=context_mode,
                                       interpret=True)
    st = init_decoder_state(cfg, B, T_IN, M)
    fb1, sb1, ab1, _ = run_b(dp, keys, memory, mask, st, 3)
    np.testing.assert_allclose(np.asarray(fb1), np.asarray(fb0),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sb1), np.asarray(sb0),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ab1), np.asarray(ab0),
                               rtol=0, atol=8e-3)


def test_block_kernel_emt_multihead_matches_scan():
    """emt_attn='multihead' in-kernel (GST MultiheadStyleAttention, mlp
    scorer, run as per-head Bahdanau passes + the attn_emt_out Dense): the
    blocked kernel matches Decoder.autoregressive. ref_spk is None — the
    multihead feed adds ref_spk and the 128-wide context_emt elementwise,
    which requires reference_depth=128; the tiny test model exercises the
    context_emt-only branch (decoder.py:104-106)."""
    import dataclasses as dc

    cfg = get_config("default")
    cfg = cfg.with_overrides("tacotron.dropout_rate=0.0")
    cfg = cfg.replace(gst=dc.replace(cfg.gst, emt_attn=True,
                                     emt_attn_type="multihead",
                                     reference_depth=8, num_heads=2,
                                     style_att_dim=8,
                                     style_att_type="mlp_attention"))
    B2, T2, M2, steps, k = 2, 20, 64, 8, 4
    Te, V = 3, 2 * 8
    rng = np.random.default_rng(3)
    memory = jnp.asarray(rng.normal(size=(B2, T2, M2)) * 0.3, jnp.float32)
    lengths = jnp.asarray([T2, T2 - 5], jnp.int32)
    mask = jnp.arange(T2)[None, :] < lengths[:, None]
    keys = jnp.asarray(
        rng.normal(size=(B2, T2, cfg.tacotron.attention_dim)) * 0.3,
        jnp.float32)
    emt_memory = jnp.asarray(rng.normal(size=(B2, Te, V)) * 0.4, jnp.float32)

    dec = Decoder(config=cfg)
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                zoneout=jax.random.PRNGKey(2))
    variables = dec.init(rngs, B2, steps, keys, memory, mask,
                         emt_memory=emt_memory,
                         method=Decoder.autoregressive)
    params = variables["params"]
    f_ref, s_ref, a_ref, _ = dec.apply(
        {"params": params}, B2, steps, keys, memory, mask,
        emt_memory=emt_memory,
        method=Decoder.autoregressive,
        rngs=dict(dropout=jax.random.PRNGKey(7),
                  zoneout=jax.random.PRNGKey(8)))

    dp = extract_decoder_params({"decoder": params}, cfg)
    assert dp.mh_q_w is not None and dp.mh_out_w is not None
    run_blk = build_decoder_block_kernel(cfg, B2, T2, k, M2,
                                         weight_dtype=jnp.float32,
                                         emt_T=Te, interpret=True)
    state = init_decoder_state(cfg, B2, T2, M2)
    assert state.ctx_emt.shape == (B2, 128)
    fs, ss = [], []
    for i in range(steps // k):
        f, s_, a_, state = run_blk(dp, keys, memory, mask, state, 3 + i,
                                   emt_memory, None)
        fs.append(np.asarray(f))
        ss.append(np.asarray(s_))
    np.testing.assert_allclose(np.concatenate(fs, 1), np.asarray(f_ref),
                               rtol=0, atol=3e-4)
    np.testing.assert_allclose(np.concatenate(ss, 1), np.asarray(s_ref),
                               rtol=0, atol=3e-5)
