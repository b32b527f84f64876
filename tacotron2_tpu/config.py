"""Configuration tree for the TPU-native Tacotron-2 framework.

Replaces the reference's `tf.contrib.training.HParams` singleton
(/root/reference/code/hparams.py:12-402) with a typed, immutable dataclass tree:

  Config
  ├── audio:    AudioConfig      (hparams.py:50-135  — DSP / mel extraction)
  ├── tacotron: TacotronConfig   (hparams.py:138-195 — model dims, attention, decoder)
  ├── gst:      StyleConfig      (hparams.py:107-115, 311-318 — GST / reference encoders)
  ├── wavenet:  WaveNetConfig    (hparams.py:198-253 — vocoder)
  ├── train:    TrainConfig      (hparams.py:256-365 — schedules, optimizers, splits)
  └── data:     DataConfig       (feeder / preprocessing knobs)

CLI override protocol mirrors `hparams.parse("a=1,b=2")` (reference train.py:35) via
`Config.parse_overrides("audio.sample_rate=22050,tacotron.outputs_per_step=2")`.
Presets: `default_config()` (hparams.py) and `paper_config()` (paper_hparams.py:
22.05 kHz, no GST, MoL WaveNet out_channels=30, legacy scalings off).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence


def _tuple(*xs):
    return field(default_factory=lambda: tuple(xs))


@dataclass(frozen=True)
class AudioConfig:
    """DSP parameters. Reference: hparams.py:50-135, datasets/audio.py."""

    num_mels: int = 80
    num_freq: int = 1025          # n_fft // 2 + 1
    sample_rate: int = 16000
    n_fft: int = 2048
    hop_size: int = 200
    win_size: int = 800
    frame_shift_ms: Optional[float] = None
    magnitude_power: float = 2.0

    rescale: bool = True
    rescaling_max: float = 0.999

    trim_silence: bool = True
    trim_fft_size: int = 2048
    trim_hop_size: int = 512
    trim_top_db: float = 40.0

    preemphasize: bool = True
    preemphasis: float = 0.97

    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    fmin: float = 55.0
    fmax: float = 7600.0

    signal_normalization: bool = True
    allow_clipping_in_normalization: bool = True
    symmetric_mels: bool = True
    max_abs_value: float = 4.0

    power: float = 1.5            # Griffin-Lim magnitude sharpening
    griffin_lim_iters: int = 60
    gl_on_device: bool = True     # reference GL_on_GPU (hparams.py:135)
    # None/"float32" = reference-parity math; "bfloat16" runs the G-L DFT
    # matmuls in bf16 (~2x MXU rate on TPU; the f32 magnitude projection
    # re-anchors each iteration so error does not accumulate)
    gl_compute_dtype: Optional[str] = None

    clip_mels_length: bool = False
    max_mel_frames: int = 900

    silence_threshold: int = 2    # wavenet preprocessing trim (mulaw domain)
    wavenet_pad_sides: int = 1
    normalize_for_wavenet: bool = True
    clip_for_wavenet: bool = True

    @property
    def effective_hop(self) -> int:
        if self.hop_size is None:  # pragma: no cover - parity with get_hop_size
            return int(self.frame_shift_ms / 1000 * self.sample_rate)
        return self.hop_size


@dataclass(frozen=True)
class StyleConfig:
    """Global-style-token + reference-encoder parameters.

    Reference: hparams.py:107-115 (GST), 311-318 (style heads), modules.py:9-107.
    """

    use_gst: bool = True
    num_gst: int = 10
    num_heads: int = 4
    style_embed_depth: int = 256
    reference_filters: Sequence[int] = _tuple(32, 32, 64, 64, 128, 128)
    reference_depth: int = 128
    style_att_type: str = "mlp_attention"   # {dot_attention, mlp_attention}
    style_att_dim: int = 128

    # Fork additions: dual ref encoders + style heads (hparams.py:311-318)
    se_concat: bool = True             # concat style emb to encoder outs (else add)
    use_style_emb_disc: bool = True
    style_emb_disc_refnet: bool = True  # classify ref-enc embedding (else GST out)
    use_orthog_loss: bool = True
    n_emt: int = 4                     # emotion classes
    n_spk: int = 8                     # speaker classes
    spk_emb_dim: int = 1024            # external speaker-embedding dim

    # Tacotron_emt_attn variant knobs (tacotron_emt_attn.py:29-285)
    emt_attn: bool = False             # decoder attends over emt-ref timesteps
    emt_attn_type: str = "simple"      # {simple, multihead, style_tokens}
    # 0.1*||E_spk||_F penalty replacing orthogonality in the emt_attn
    # variant (tacotron_emt_attn.py:691-695, --l2_spk_emb flag train.py:154)
    l2_spk_emb: bool = False
    emt_ref_gru: str = "gru"           # {gru, gru_multi, none}
    adain: bool = False                # ReferenceEncoderAdaIn variant


@dataclass(frozen=True)
class TacotronConfig:
    """Spectrogram-predictor architecture. Reference: hparams.py:138-195."""

    outputs_per_step: int = 1      # reduction factor r
    stop_at_any: bool = False
    batch_norm_position: str = "after"   # {'before','after'} relu
    clip_outputs: bool = True
    lower_bound_decay: float = 0.1

    embedding_dim: int = 512

    enc_conv_num_layers: int = 3
    enc_conv_kernel_size: int = 5
    enc_conv_channels: int = 512
    encoder_lstm_units: int = 256

    smoothing: bool = False
    attention_dim: int = 128
    attention_filters: int = 32
    attention_kernel: int = 31
    cumulative_weights: bool = True

    synthesis_constraint: bool = True
    synthesis_constraint_type: str = "window"  # {'window','monotonic'}
    attention_win_size: int = 7

    prenet_layers: Sequence[int] = _tuple(256, 256)
    decoder_layers: int = 2
    decoder_lstm_units: int = 1024
    max_iters: int = 1000
    # early-exit synthesis decode: stop after each K-step block once every
    # stream fired its stop condition (reference dynamic_decode semantics,
    # custom_decoder.py:107-139). 0 = always run max_iters steps.
    early_stop_block: int = 64
    # block size of the BLOCKED fused decode kernel (long-input / emt_attn
    # paths): each block is one device roundtrip, so bigger blocks amortize
    # per-call dispatch (measured ~9 ms through the tunneled backend:
    # K=64 -> 260 us/step, K=256 -> 117 us/step) at coarser early-exit
    # granularity
    fused_block_steps: int = 256
    # rematerialize decoder-step activations in backward (jax.checkpoint):
    # the TPU replacement for the reference's swap_memory CPU offload
    # (hparams.py:262, tacotron.py:354) — enables long-utterance training
    # batches that would otherwise exceed HBM
    remat_decoder: bool = False
    # mixed-precision decoder training: run the decode scan (prenet, LSTMs,
    # attention, projections) in bfloat16 — the scan re-streams ~54 MB of
    # decoder weights from HBM every step, so halving bytes is ~1.3x on the
    # train step. Master params, cumulative alignments, BatchNorm stacks
    # (encoder/postnet), and all losses stay float32.
    compute_dtype: str = "float32"      # {float32, bfloat16}
    # run autoregressive synthesis through the fused Pallas decode kernels
    # (ops/tacotron_decoder_kernel.py, ~6.6x the XLA scan at B=32): the
    # monolithic whole-decode kernel up to 256 chars, the blocked kernel
    # (tile-local operands + carried state, in-kernel simple emt_attn)
    # beyond that; scan fallback for other emt_attn types / non-TPU
    use_fused_decoder: bool = True
    # fused-decoder weight storage ('bfloat16' = MXU-native rate, 'float32'
    # matches the scan path bit-for-bit up to op order)
    fused_decoder_dtype: str = "bfloat16"
    # run the TEACHER-FORCED decode (training fwd+bwd via custom_vjp, GTA and
    # teacher-forced eval fwd) through the fused Pallas train kernels
    # (ops/tacotron_train_kernel.py) — keeps the ~27 MB of decoder weights
    # VMEM-resident across all T_out/r steps instead of re-streaming them
    # from HBM per scan step. Single-chip only (the kernel is not
    # shard_map-wrapped yet); falls back to the scan for emt_attn/smoothing.
    use_fused_train_decoder: bool = False
    # fused train-decoder weight storage + residual precision
    fused_train_dtype: str = "bfloat16"

    postnet_num_layers: int = 5
    postnet_kernel_size: int = 5
    postnet_channels: int = 512

    cbhg_kernels: int = 8
    cbhg_conv_channels: int = 128
    cbhg_pool_size: int = 2
    cbhg_projection: int = 256
    cbhg_projection_kernel_size: int = 3
    cbhg_highwaynet_layers: int = 4
    cbhg_highway_units: int = 128
    cbhg_rnn_units: int = 128

    mask_encoder: bool = True
    mask_decoder: bool = False
    cross_entropy_pos_weight: float = 1.0
    predict_linear: bool = False
    unpaired_loss_derate: float = 0.1

    zoneout_rate: float = 0.1
    dropout_rate: float = 0.5


@dataclass(frozen=True)
class WaveNetConfig:
    """Vocoder architecture. Reference: hparams.py:198-253."""

    input_type: str = "raw"        # {'raw','mulaw','mulaw-quantize'}
    quantize_channels: int = 2 ** 16
    use_bias: bool = True
    # fused-sampler delay-line cache precision: 'float32' (bit-exact vs the
    # XLA scan) or 'bfloat16' (halves VMEM -> B=64/chip, ~1.5x throughput;
    # drift bounded by tests/test_pallas_kernels.py)
    sampler_cache_dtype: str = "float32"
    # fused-sampler weight storage: 'bfloat16' engages the MXU's native bf16
    # rate (drift-bounded by tests); 'float32' is bit-exact
    sampler_weight_dtype: str = "float32"
    # keep delay lines of dilations above this threshold in HBM with windowed
    # prefetch (build_sampler_kernel_hbm) — frees ~88% of the VMEM cache and
    # unlocks synthesis batch 256/chip; 0/None disables (all-VMEM kernel,
    # whose [sum(d), B, 2R] delay buffer caps B at ~32 on v5e). Default is
    # the measured-best production point (r4: the old all-VMEM default made
    # the production synthesizer OOM at B=256 where the bench config ran)
    sampler_hbm_delay_threshold: int = 32
    # HBM prefetch window (rows per DMA); shrunk automatically until it
    # divides every HBM-resident dilation with d/W >= 4. The measured best
    # point is B=256, threshold 32, window 8 — 1,404 audio-s/s/chip
    # (scripts/bench_sampler_configs.py)
    sampler_window: int = 8
    sampler_chunk: int = 512       # conditioning DMA chunk (samples)
    legacy: bool = True            # sqrt(0.5) skip scaling
    residual_legacy: bool = True   # sqrt(0.5) residual scaling

    log_scale_min: float = -32.23619130191664       # log(1e-14)
    log_scale_min_gauss: float = -16.11809565095832  # log(1e-7)
    cdf_loss: bool = False

    out_channels: int = 2          # 2 = Gaussian; 10*3 = MoL; 256 = softmax
    layers: int = 20
    stacks: int = 2
    residual_channels: int = 128
    gate_channels: int = 256
    skip_out_channels: int = 128
    kernel_size: int = 3

    cin_channels: int = 80         # local conditioning (mel); -1 disables
    upsample_type: str = "SubPixel"  # {'1D','2D','Resize','SubPixel','NearestNeighbor'}
    upsample_activation: str = "Relu"
    # NOTE: the reference ships upsample_scales=[11,25] (=275) alongside
    # hop_size=200 (hparams.py:88,241) — mutually inconsistent; its WaveNet
    # path was disabled (train.py:82). We default to (8, 25) = 200 = hop.
    upsample_scales: Sequence[int] = _tuple(8, 25)
    freq_axis_kernel_size: int = 3
    leaky_alpha: float = 0.4
    nn_init: bool = True
    nn_scaler: float = 0.3

    gin_channels: int = -1
    use_speaker_embedding: bool = False
    n_speakers: int = 5

    dropout: float = 0.05
    weight_normalization: bool = False
    init_scale: float = 1.0
    # Salimans-Kingma data-dependent init forward pass at fresh-training
    # start (reference modules.py:110-126, train.py:287-298); only takes
    # effect with weight_normalization=True
    data_dependent_init: bool = True
    # rematerialize each gated residual block in the backward pass
    # (jax.checkpoint): activations of the 11k-sample training crops are
    # HBM-bandwidth-bound; recompute beats spilling at batch >8 — the
    # TPU-native analog of the reference's swap_memory offload
    # (hparams.py:326).
    remat_conv_stack: bool = False
    # run the training-time gated residual stack through the fused Pallas
    # fwd+bwd kernels (ops/wavenet_train_kernel.py): whole-stack streaming
    # with VMEM-resident weights, in-kernel dropout PRNG, halo-carried
    # dilated convs. Falls back to the XLA path off-TPU, under an active
    # mesh, at init, or for unsupported configs (gin, kernel_size != 3).
    use_fused_train_stack: bool = False
    # mixed-precision training: compute the residual stack in bfloat16
    # (params and the distribution head stay float32). The stack is
    # HBM-bandwidth-bound at training crop lengths; halving activation
    # bytes measures ~1.45x (B=8) to ~2x (B=32) on the conv stack.
    compute_dtype: str = "float32"      # {float32, bfloat16}

    @property
    def dilations(self) -> tuple:
        """Per-layer dilation schedule: 1,2,4,...,2^(layers/stacks-1), repeated.

        Reference: wavenet.py receptive-field computation (wavenet.py:54-71).
        """
        assert self.layers % self.stacks == 0
        layers_per_stack = self.layers // self.stacks
        return tuple(2 ** (i % layers_per_stack) for i in range(self.layers))

    @property
    def receptive_field(self) -> int:
        return (self.kernel_size - 1) * sum(self.dilations) + 1


@dataclass(frozen=True)
class TrainConfig:
    """Optimization + schedules. Reference: hparams.py:256-365."""

    # Reproducibility (hparams.py:258-259)
    tacotron_random_seed: int = 5339
    tacotron_data_random_state: int = 1234
    wavenet_random_seed: int = 5339
    wavenet_data_random_state: int = 1234

    tacotron_batch_size: int = 96
    tacotron_synthesis_batch_size: int = 1
    tacotron_test_size: Optional[float] = 0.05
    tacotron_test_batches: Optional[int] = None

    tacotron_decay_learning_rate: bool = True
    tacotron_start_decay: int = 15000
    tacotron_decay_steps: int = 10000
    tacotron_decay_rate: float = 0.5
    tacotron_initial_learning_rate: float = 1e-3
    tacotron_final_learning_rate: float = 1e-4

    tacotron_adam_beta1: float = 0.9
    tacotron_adam_beta2: float = 0.999
    tacotron_adam_epsilon: float = 1e-6

    tacotron_reg_weight: float = 1e-6
    tacotron_scale_regularization: bool = False
    tacotron_clip_gradients: bool = True

    tacotron_natural_eval: bool = True
    tacotron_teacher_forcing_mode: str = "constant"  # {'constant','scheduled'}
    tacotron_teacher_forcing_ratio: float = 1.0
    tacotron_teacher_forcing_init_ratio: float = 1.0
    tacotron_teacher_forcing_final_ratio: Optional[float] = 0.0
    tacotron_teacher_forcing_start_decay: int = 10000
    tacotron_teacher_forcing_decay_steps: int = 40000
    tacotron_teacher_forcing_decay_alpha: Optional[float] = None
    tacotron_fine_tuning: bool = False

    wavenet_batch_size: int = 8
    # reference used 10*2 (hparams.py:332); 32 saturates the fused TPU
    # sampler's batch scaling (184 audio-s/s/chip at B=32 vs 65 at B=8)
    wavenet_synthesis_batch_size: int = 32
    wavenet_test_size: Optional[float] = None
    wavenet_test_batches: Optional[int] = 1

    wavenet_lr_schedule: str = "exponential"  # {'exponential','noam'}
    wavenet_learning_rate: float = 1e-3
    wavenet_warmup: float = 4000.0
    wavenet_decay_rate: float = 0.5
    wavenet_decay_steps: int = 200000

    wavenet_adam_beta1: float = 0.9
    wavenet_adam_beta2: float = 0.999
    wavenet_adam_epsilon: float = 1e-6

    wavenet_clip_gradients: bool = True
    wavenet_ema_decay: float = 0.9999
    wavenet_gradient_max_norm: float = 100.0
    wavenet_gradient_max_value: float = 5.0

    max_time_sec: Optional[float] = None
    max_time_steps: int = 11000     # wavenet random crop length
    wavenet_natural_eval: bool = False
    train_with_gta: bool = True

    checkpoint_interval: int = 250
    eval_interval: int = 5000
    # how many of the fixed eval sentences (hparams.py:370-395) to
    # synthesize at each train-time eval interval
    eval_num_sentences: int = 5
    summary_interval: int = 250
    # nat-GAN disc-only warmup iterations at step 0 (train.py:378-380:
    # 200 paired / 300 unpaired)
    nat_gan_pretrain_steps: int = 200
    nat_gan_pretrain_steps_unpaired: int = 300
    max_checkpoints_to_keep: int = 50
    tacotron_train_steps: int = 300000
    wavenet_train_steps: int = 500000


@dataclass(frozen=True)
class DataConfig:
    """Feeder / preprocessing knobs. Reference: tacotron/feeder.py, preprocess.py."""

    cleaners: str = "english_cleaners"
    batches_per_group: int = 64       # bucketing group size (feeder.py:302-330)
    remove_long_samples: bool = False
    max_text_len: int = 300
    # reference-mel selection (feeder.py:374-444)
    intercross: bool = False
    intercross_both: bool = False
    unpaired: bool = False
    unpaired_percent: float = 0.5


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding (replaces tower DP, SURVEY §2.4)."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallelism: int = -1      # -1: all devices on the data axis
    model_parallelism: int = 1      # channel-shard WaveNet stack when >1


@dataclass(frozen=True)
class Config:
    audio: AudioConfig = field(default_factory=AudioConfig)
    gst: StyleConfig = field(default_factory=StyleConfig)
    tacotron: TacotronConfig = field(default_factory=TacotronConfig)
    wavenet: WaveNetConfig = field(default_factory=WaveNetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # ---------------------------------------------------------------- override
    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def with_overrides(self, overrides: str | dict | None) -> "Config":
        """Apply dotted overrides: "audio.sample_rate=22050,tacotron.max_iters=500".

        Mirrors `hparams.parse` (reference train.py:35) but namespaced.
        """
        if not overrides:
            return self
        if isinstance(overrides, str):
            items = {}
            for part in overrides.split(","):
                part = part.strip()
                if not part:
                    continue
                k, _, v = part.partition("=")
                items[k.strip()] = v.strip()
            overrides = items

        cfg = self
        for dotted, raw in overrides.items():
            section, _, name = dotted.partition(".")
            if not name:
                raise KeyError(f"override must be 'section.name=value': {dotted}")
            sub = getattr(cfg, section)
            if not hasattr(sub, name):
                raise KeyError(f"unknown config field {dotted}")
            value = _coerce(raw, getattr(sub, name))
            cfg = dataclasses.replace(cfg, **{section: dataclasses.replace(sub, **{name: value})})
        return cfg

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    def debug_string(self) -> str:
        """Parity with hparams_debug_string (hparams.py:404-407)."""
        flat = []
        for section in dataclasses.fields(self):
            sub = getattr(self, section.name)
            for f in dataclasses.fields(sub):
                flat.append(f"  {section.name}.{f.name}: {getattr(sub, f.name)}")
        return "Hyperparameters:\n" + "\n".join(sorted(flat))


def _coerce(raw: Any, current: Any) -> Any:
    """Coerce a CLI string to the type of the existing field value."""
    if not isinstance(raw, str):
        return raw
    if raw.lower() in ("none", "null"):
        return None
    if isinstance(current, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, (tuple, list)):
        inner = current[0] if len(current) else 1
        return tuple(type(inner)(x) for x in raw.strip("[]()").split("+"))
    return raw


# --------------------------------------------------------------------- presets

def default_config() -> Config:
    """The reference's hparams.py defaults (16 kHz, GST on, Gaussian WaveNet)."""
    return Config()


def paper_config() -> Config:
    """The reference's paper_hparams.py: 22.05 kHz, no GST, MoL WaveNet.

    Reference: code/paper_hparams.py (frozen T2-paper reproduction config).
    """
    cfg = Config()
    return cfg.replace(
        audio=dataclasses.replace(
            cfg.audio, sample_rate=22050, hop_size=275, win_size=1100,
            fmin=125.0, fmax=7600.0,
        ),
        gst=dataclasses.replace(cfg.gst, use_gst=False, use_style_emb_disc=False,
                                use_orthog_loss=False),
        wavenet=dataclasses.replace(
            cfg.wavenet, out_channels=30, input_type="raw",
            legacy=False, residual_legacy=False,
            upsample_scales=(5, 5, 11),
        ),
    )


PRESETS = {"default": default_config, "paper": paper_config}


def get_config(preset: str = "default", overrides: str | dict | None = None) -> Config:
    """Preset + machine overrides + env override + CLI overrides.

    Two machine-level hooks replace the reference's hostname-keyed dev-box
    config switches (train.py:170-180), applied before explicit overrides:
    - `TACO_MACHINES`: path to a JSON file `{hostname: overrides}`; the entry
      whose key equals `socket.gethostname()` (or "*" as fallback) applies.
      Values use the same dotted syntax as --hparams (string or dict).
    - `TACO_HPARAMS`: dotted overrides applied directly.
    """
    import json
    import os
    cfg = PRESETS[preset]()
    machines_path = os.environ.get("TACO_MACHINES")
    if machines_path and os.path.exists(machines_path):
        import socket
        with open(machines_path, encoding="utf-8") as f:
            machines = json.load(f)
        entry = machines.get(socket.gethostname(), machines.get("*"))
        if entry:
            cfg = cfg.with_overrides(entry)
    env = os.environ.get("TACO_HPARAMS")
    if env:
        cfg = cfg.with_overrides(env)
    return cfg.with_overrides(overrides)
