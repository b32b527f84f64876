"""Command-line interface mirroring the reference's four entry points.

  python -m tacotron2_tpu.cli preprocess --dataset ... --in-dir ... --out-dir ...
  python -m tacotron2_tpu.cli train --model {Tacotron,WaveNet,Tacotron-2} ...
  python -m tacotron2_tpu.cli synthesize --model {Tacotron,WaveNet,Tacotron-2} ...
  python -m tacotron2_tpu.cli disc-train ...        (GE2E spk/emt discriminators)

Reference: code/preprocess.py:104-129, code/train.py:92-206 (incl. the
Tacotron-2 sequencer with crash-resumable state_log, train.py:16-90),
code/synthesize.py:47-96. Config overrides use `--hparams sec.name=value,...`
mirroring `hparams.parse`.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from .config import get_config
from .utils import infolog_init, log

STATE_ORDER = ["taco", "GTA", "wave"]


def save_seq(path, completed):
    """Crash-resumable stage file (reference train.py:16-22)."""
    with open(path, "w") as f:
        f.write(" ".join("1" if s in completed else "0" for s in STATE_ORDER))


def read_seq(path):
    if os.path.exists(path):
        with open(path) as f:
            flags = f.read().split()
        return {s for s, fl in zip(STATE_ORDER, flags) if fl == "1"}
    return set()


def cmd_preprocess(args):
    from .data.preprocess import build_from_path, write_metadata
    cfg = get_config(args.preset, args.hparams)
    meta_path = args.metadata or os.path.join(
        args.in_dir, f"metadata_{args.dataset}.txt")
    rows = build_from_path(cfg, meta_path, args.in_dir, args.out_dir,
                           args.dataset, n_jobs=args.n_jobs, serial=args.serial,
                           write_audio=args.write_audio,
                           write_linear=args.write_linear, limit=args.limit)
    write_metadata(rows, args.out_dir, cfg)


def cmd_wavenet_preprocess(args):
    from .data.preprocess import wavenet_build_from_path, write_wavenet_metadata
    cfg = get_config(args.preset, args.hparams)
    rows = wavenet_build_from_path(cfg, args.in_dir, args.out_dir,
                                   n_jobs=args.n_jobs, serial=args.serial,
                                   limit=args.limit)
    write_wavenet_metadata(rows, args.out_dir, cfg)


def cmd_create_metadata(args):
    from .data.preprocess import create_metadata
    create_metadata(args.in_dir, args.out_path, layout=args.layout,
                    emt_label=args.emt_label, sex=args.sex)


def cmd_vctk_accent(args):
    from .data.preprocess import vctk_accent_relabel
    vctk_accent_relabel(args.train_path, args.speaker_info, args.out_path)


def cmd_train(args):
    from .parallel.mesh import maybe_initialize_distributed
    if maybe_initialize_distributed():
        import jax
        log(f"jax.distributed initialized: process {jax.process_index()}"
            f"/{jax.process_count()}, {jax.device_count()} global devices")
    cfg = get_config(args.preset, args.hparams)
    log_dir = os.path.join(args.base_dir, f"logs-{args.model}")
    os.makedirs(log_dir, exist_ok=True)
    infolog_init(os.path.join(log_dir, "train.log"), args.model,
                 args.slack_url)
    log(cfg.debug_string() if args.verbose else f"Training {args.model}")

    profile_kwargs = dict(profile_start=args.profile_start,
                          profile_end=args.profile_end)
    feeder_kwargs = dict(emt_only=args.emt_only,
                         intercross_both=args.intercross_both,
                         unpaired=args.unpaired,
                         remove_long_samples=args.remove_long_samps,
                         test_inputs=args.test_inputs,
                         test_max_len=args.test_max_len)
    trainer_kwargs = dict(emt_only=args.emt_only, adv_emb_disc=args.adv_emb_disc,
                          nat_gan=args.nat_gan, use_unpaired=args.unpaired,
                          opt_ref_no_mo=args.opt_ref_no_mo,
                          pretrained_emb_disc=args.pretrained_emb_disc,
                          pretrained_emb_disc_all=args.pretrained_emb_disc_all)

    if args.model == "Tacotron":
        from .train.tacotron_train import tacotron_train
        tacotron_train(cfg, args.input_path, log_dir,
                       train_steps=args.train_steps, restore=args.restore,
                       batch_size=args.batch_size,
                       feeder_kwargs=feeder_kwargs,
                       trainer_kwargs=trainer_kwargs,
                       pretrained_disc_emt=args.pretrained_disc_emt,
                       pretrained_disc_spk=args.pretrained_disc_spk,
                       save_output_vars=args.save_output_vars,
                       **profile_kwargs)
    elif args.model == "WaveNet":
        from .train.wavenet_train import wavenet_train
        wavenet_train(cfg, args.input_path, log_dir,
                      train_steps=args.train_steps, restore=args.restore,
                      gta=not args.no_gta, batch_size=args.batch_size,
                      **profile_kwargs)
    elif args.model == "Tacotron-2":
        _train_sequencer(cfg, args, log_dir, feeder_kwargs, trainer_kwargs)
    else:
        raise ValueError(f"Unknown model {args.model}")


def _train_sequencer(cfg, args, log_dir, feeder_kwargs, trainer_kwargs):
    """3-stage pipeline: taco-train → GTA synth → wavenet-train
    (reference train.py:43-90) with state_log resume."""
    from .synth.tacotron_synth import TacotronSynthesizer, run_gta_synthesis
    from .train.checkpoint import CheckpointManager
    from .train.tacotron_step import TacotronTrainer
    from .train.tacotron_train import tacotron_train
    from .train.wavenet_train import wavenet_train

    state_path = os.path.join(args.base_dir, "state_log")
    done = read_seq(state_path)
    out_dir = os.path.join(args.base_dir, "tacotron_output")

    if "taco" not in done:
        log("#" * 28 + "\nTacotron Train\n" + "#" * 28)
        tacotron_train(cfg, args.input_path, log_dir,
                       train_steps=args.train_steps, restore=args.restore,
                       batch_size=args.batch_size, feeder_kwargs=feeder_kwargs,
                       trainer_kwargs=trainer_kwargs)
        done.add("taco")
        save_seq(state_path, done)
        time.sleep(0.5)

    if "GTA" not in done:
        log("#" * 28 + "\nGTA Synthesis\n" + "#" * 28)
        import jax

        from .data.feeder import TacotronFeeder  # noqa: F401 (batch build)
        trainer = TacotronTrainer(cfg, **trainer_kwargs)
        # restore latest taco checkpoint
        mgr = CheckpointManager(os.path.join(log_dir, "taco_pretrained"))
        from .data.feeder import TacotronFeeder
        feeder = TacotronFeeder(cfg, args.input_path, **feeder_kwargs)
        first = next(feeder.train_batches(args.batch_size or
                                          cfg.train.tacotron_batch_size))
        state = trainer.init_state(jax.random.PRNGKey(0), first)
        state = mgr.restore(state)
        mgr.close()
        synth = TacotronSynthesizer(cfg, state.params, state.batch_stats,
                                    model=trainer.model)
        run_gta_synthesis(synth, args.input_path, out_dir,
                          batch_size=args.batch_size or 32)
        done.add("GTA")
        save_seq(state_path, done)
        time.sleep(0.5)

    if "wave" not in done:
        log("#" * 28 + "\nWaveNet Train\n" + "#" * 28)
        wavenet_train(cfg, os.path.join(out_dir, "gta", "map.txt"), log_dir,
                      train_steps=args.wavenet_train_steps or args.train_steps,
                      restore=args.restore, gta=True,
                      batch_size=args.wavenet_batch_size)
        done.add("wave")
        save_seq(state_path, done)
    log("Tacotron-2 pipeline complete", slack=True)


def _restore_tacotron(cfg, args):
    """Restore the latest Tacotron checkpoint into a fresh train state
    (shared by synthesize/serve). Returns (trainer, state, ref, ref_spk)."""
    import jax
    import numpy as np

    from .train.checkpoint import CheckpointManager
    from .train.tacotron_step import TacotronTrainer

    trainer = TacotronTrainer(cfg)
    mgr = CheckpointManager(args.checkpoint or
                            os.path.join(args.base_dir, "logs-Tacotron",
                                         "taco_pretrained"))
    # Initialize with a dummy mini-batch matching train shapes
    ref = np.load(args.ref_mel_emt) if args.ref_mel_emt else \
        np.zeros((40, cfg.audio.num_mels), np.float32)
    ref_spk = np.load(args.ref_mel_spk) if args.ref_mel_spk else ref
    dummy = dict(
        inputs=np.zeros((1, 16), np.int32),
        input_lengths=np.asarray([16], np.int32),
        mel_targets=np.zeros((1, 32, cfg.audio.num_mels), np.float32),
        ref_mel_emt=ref[None], ref_mel_spk=ref_spk[None])
    state = trainer.init_state(jax.random.PRNGKey(0), dummy)
    state = mgr.restore(state)
    mgr.close()
    return trainer, state, ref, ref_spk


def _restore_wavenet_ema(cfg, args):
    """Restore WaveNet EMA weights (the reference synthesizes from the EMA
    shadow, wavenet_vocoder/synthesizer.py:14-60)."""
    import jax
    import numpy as np

    from .train.checkpoint import CheckpointManager
    from .train.wavenet_step import WaveNetTrainer

    wn_trainer = WaveNetTrainer(cfg)
    wn_mgr = CheckpointManager(args.wavenet_checkpoint or
                               os.path.join(args.base_dir, "logs-WaveNet",
                                            "wave_pretrained"))
    hop = cfg.audio.effective_hop
    dummy = dict(x=np.zeros((1, 4 * hop, 1), np.float32),
                 c=np.zeros((1, 4, cfg.wavenet.cin_channels), np.float32),
                 y=np.zeros((1, 4 * hop), np.float32),
                 input_lengths=np.asarray([4 * hop], np.int32))
    wn_state = wn_trainer.init_state(jax.random.PRNGKey(0), dummy)
    wn_state = wn_mgr.restore(wn_state)
    wn_mgr.close()
    return wn_state.ema_params


def cmd_synthesize(args):
    cfg = get_config(args.preset, args.hparams)
    log_dir = os.path.join(args.base_dir, f"logs-{args.model}")
    out_dir = args.output_dir or os.path.join(args.base_dir, "tacotron_output")

    sentences = None
    if args.text_list:
        with open(args.text_list, encoding="utf-8") as f:
            sentences = [line.strip() for line in f if line.strip()]
    elif args.sentence:
        sentences = [args.sentence]
    else:
        sentences = DEFAULT_SENTENCES

    if args.model in ("Tacotron", "Tacotron-2"):
        from .synth.tacotron_synth import (TacotronSynthesizer, run_eval,
                                           run_gta_synthesis,
                                           run_style_embs,
                                           run_style_transfer,
                                           run_synthesis_multiple,
                                           run_synthesis_random)

        trainer, state, ref, ref_spk = _restore_tacotron(cfg, args)
        synth = TacotronSynthesizer(cfg, state.params, state.batch_stats,
                                    model=trainer.model)

        if args.mode == "gta":
            map_path = run_gta_synthesis(synth, args.input_path, out_dir,
                                         limit=args.limit)
        elif args.mode == "synthesis":
            input_dir = args.input_dir or os.path.dirname(args.input_path or "")
            map_path = run_style_transfer(
                synth, args.synth_metadata or args.input_path, input_dir,
                out_dir, flip_spk_emt=args.flip_spk_emt, limit=args.limit)
        elif args.mode == "synthesis_random":
            input_dir = args.input_dir or os.path.dirname(args.input_path or "")
            map_path = run_synthesis_random(
                synth, args.input_path, input_dir, out_dir,
                paired=args.paired)
        elif args.mode == "synthesis_multiple":
            input_dir = args.input_dir or os.path.dirname(args.input_path or "")
            map_path = run_synthesis_multiple(
                synth, args.input_path, input_dir, out_dir,
                flip_spk_emt=args.flip_spk_emt)
        elif args.mode == "style_embs":
            input_dir = args.input_dir or os.path.dirname(args.input_path or "")
            map_path = run_style_embs(
                synth, args.input_path, input_dir, out_dir,
                n_spk=args.n_spk, n_per_spk=args.n_per_spk)
        else:
            refs = [ref] * len(sentences)
            refs_spk = [ref_spk] * len(sentences)
            map_path = run_eval(synth, sentences, refs, refs_spk, out_dir)
        log(f"tacotron synthesis done -> {map_path}")
        if args.mode in ("synthesis_random", "synthesis_multiple",
                         "style_embs"):
            return

    if args.model in ("WaveNet", "Tacotron-2"):
        from .synth.wavenet_synth import WaveNetSynthesizer, run_synthesis

        map_path = args.mels_map or os.path.join(
            out_dir, "gta" if args.mode == "gta" else "eval", "map.txt")
        synth_wn = WaveNetSynthesizer(cfg, _restore_wavenet_ema(cfg, args))
        wav_out = os.path.join(out_dir, "wavenet")
        paths = run_synthesis(synth_wn, map_path, wav_out, limit=args.limit)
        log(f"wavenet synthesis done: {len(paths)} wavs -> {wav_out}")


def _make_serve_fn(args):
    """Build the single-program serving closure: returns (run, out_dir)
    where run(sentences) synthesizes through a shape-bucketed
    TextToWavProgram and returns the written wav paths."""
    import time as _time

    import numpy as np

    from .data import audio as host_audio
    from .synth.pipeline import TextToWavProgram
    from .text import text_to_sequence

    import dataclasses

    import jax

    cfg = get_config(args.preset, args.hparams)
    if args.serve_batch % 128 != 0:
        # the HBM-delay sampler layout wants the batch lane-aligned to 128;
        # small serving buckets use the all-VMEM delay lines instead
        cfg = cfg.replace(wavenet=dataclasses.replace(
            cfg.wavenet, sampler_hbm_delay_threshold=0))
    # off-TPU (CI / CPU smoke) the Pallas kernels run in interpret mode
    interpret = jax.default_backend() != "tpu"
    out_dir = os.path.join(args.output_dir or
                           os.path.join(args.base_dir, "tacotron_output"),
                           "serve")
    os.makedirs(out_dir, exist_ok=True)
    _, state, ref, ref_spk = _restore_tacotron(cfg, args)
    wn_params = (_restore_wavenet_ema(cfg, args)
                 if args.vocoder == "wavenet" else None)

    buckets = sorted(int(b) for b in args.buckets.split(","))
    programs = {}

    def program_for(seq_len: int) -> TextToWavProgram:
        t_in = next((b for b in buckets if b >= seq_len), None)
        assert t_in is not None, \
            f"cleaned text length {seq_len} exceeds largest bucket " \
            f"{buckets[-1]} (raise --buckets)"
        if t_in not in programs:
            t0 = _time.time()
            programs[t_in] = TextToWavProgram(
                cfg, state.params, state.batch_stats, wn_params,
                batch=args.serve_batch, steps=args.steps, t_in=t_in,
                t_ref=args.t_ref, vocoder=args.vocoder,
                interpret=interpret)
            log(f"serve: built bucket t_in={t_in} batch={args.serve_batch} "
                f"steps={args.steps} in {_time.time() - t0:.1f}s")
        return programs[t_in]

    import glob as _glob

    # resume numbering past existing wavs so a restarted server never
    # silently overwrites previous output
    counter = [len(_glob.glob(os.path.join(out_dir, "speech-*.wav")))]

    def run(sentences):
        seq_len = max(len(text_to_sequence(s, cfg.data.cleaners))
                      for s in sentences)
        prog = program_for(seq_len)
        refs = [ref[:args.t_ref]] * len(sentences)
        refs_s = [ref_spk[:args.t_ref]] * len(sentences)
        t0 = _time.time()
        wavs = prog.synthesize(sentences, refs, refs_s)
        dt = _time.time() - t0
        paths = []
        for w in wavs:
            path = os.path.join(out_dir, f"speech-{counter[0]:05d}.wav")
            host_audio.save_wav(np.asarray(w, np.float32), path,
                                cfg.audio.sample_rate)
            paths.append(path)
            counter[0] += 1
        audio_s = sum(len(w) for w in wavs) / cfg.audio.sample_rate
        log(f"serve: {len(wavs)} utts in {dt:.2f}s "
            f"({audio_s / max(dt, 1e-9):.2f}x realtime) -> {out_dir}")
        return paths

    return run, out_dir


def cmd_serve(args):
    """Single-program serving: text → wav through ONE compiled XLA program
    per (batch, t_in) shape bucket (synth/pipeline.TextToWavProgram) — the
    productized form of the reference's live mode (code/synthesize.py:47-96),
    with no host round-trip between the decoder and the vocoder.

    Sentences come from --text-list / --sentence, or interactively from
    stdin when neither is given. Wavs land in <out>/serve/."""
    run, _ = _make_serve_fn(args)
    if args.text_list:
        with open(args.text_list, encoding="utf-8") as f:
            sentences = [line.strip() for line in f if line.strip()]
        run(sentences)
    elif args.sentence:
        run([args.sentence])
    else:
        print("serve: type a sentence, empty line to exit")
        while True:
            try:
                line = input("> ").strip()
            except EOFError:
                break
            if not line:
                break
            run([line])


def cmd_live(args):
    """Interactive synthesis loop (reference synthesize.py 'live' mode,
    playing each result through aplay when available). With --pipeline, each
    line runs through the warm single-program serving path
    (TextToWavProgram) instead of re-restoring checkpoints per line."""
    import glob
    import shutil
    import subprocess
    args.mode = "eval"
    player = shutil.which("aplay") or shutil.which("play")
    serve_run = _make_serve_fn(args)[0] if getattr(args, "pipeline",
                                                   False) else None
    print("live mode: type a sentence, empty line to exit"
          + ("" if player else " (no audio player found; wavs saved only)"))
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            break
        if serve_run is not None:
            paths = serve_run([line])
            if player and paths:
                subprocess.run([player, paths[-1]], check=False)
            continue
        args.sentence = line
        args.text_list = None
        cmd_synthesize(args)
        if player:
            out_dir = args.output_dir or os.path.join(args.base_dir,
                                                      "tacotron_output")
            wavs = sorted(glob.glob(os.path.join(out_dir, "eval", "wavs",
                                                 "*.wav")), key=os.path.getmtime)
            if wavs:
                subprocess.run([player, wavs[-1]], check=False)


def cmd_disc_train(args):
    from .disc.train import disc_train
    cfg = get_config(args.preset, args.hparams)
    disc_train(cfg, args.input_path, args.base_dir, kind=args.kind,
               train_steps=args.train_steps, n_per_class=args.n_per_class,
               loss_type=args.loss_type,
               remove_long_samps=args.remove_long_samps,
               stacks_dir=args.stacks_dir)


def cmd_emt_disc_train(args):
    from .disc.train import emt_disc_train
    cfg = get_config(args.preset, args.hparams)
    emt_disc_train(cfg, args.input_path, args.base_dir,
                   train_steps=args.train_steps,
                   batch_size=args.batch_size,
                   n_classes=args.n_classes)


def cmd_disc_preprocess(args):
    from .disc.data_preprocess import build_speaker_stacks
    cfg = get_config(args.preset, args.hparams)
    build_speaker_stacks(args.corpus_dir, args.output_dir, cfg.audio,
                         n_mels=args.n_mels, tisv_frame=args.tisv_frame,
                         top_db=args.top_db, edges_only=args.edges_only,
                         test_fraction=args.test_fraction,
                         n_jobs=args.n_jobs)


def cmd_fixed_eval_set(args):
    from .data.feeder import create_fixed_eval_set
    create_fixed_eval_set(args.input_path, args.out_path,
                          n_texts=args.n_texts,
                          n_refs_per_class=args.n_refs_per_class,
                          min_frames=args.min_frames)


def cmd_disc_test(args):
    from .disc.train import disc_test
    cfg = get_config(args.preset, args.hparams)
    disc_test(cfg, args.checkpoint, args.map_path,
              args.output_dir or os.path.join(args.base_dir, "disc_test"),
              kind=args.kind, n_classes=args.n_classes)


from .data.eval_sentences import \
    EVAL_SENTENCES as DEFAULT_SENTENCES  # noqa: E402 (hparams.py:370-395)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tacotron2_tpu")
    p.add_argument("--base-dir", default="runs")
    p.add_argument("--preset", default="default", choices=["default", "paper"])
    p.add_argument("--hparams", default="",
                   help="dotted overrides: audio.sample_rate=22050,...")
    sub = p.add_subparsers(dest="command", required=True)

    pp = sub.add_parser("preprocess")
    pp.add_argument("--dataset", required=True)
    pp.add_argument("--in-dir", required=True)
    pp.add_argument("--out-dir", required=True)
    pp.add_argument("--metadata", default=None)
    pp.add_argument("--n-jobs", type=int, default=os.cpu_count())
    pp.add_argument("--serial", action="store_true")
    pp.add_argument("--write-audio", action="store_true")
    pp.add_argument("--write-linear", action="store_true")
    pp.add_argument("--limit", type=int, default=None)
    pp.set_defaults(func=cmd_preprocess)

    wp = sub.add_parser("wavenet-preprocess",
                        help="wav folder -> audio/mel npy + map.txt "
                             "(non-GTA vocoder training)")
    wp.add_argument("--in-dir", required=True)
    wp.add_argument("--out-dir", required=True)
    wp.add_argument("--n-jobs", type=int, default=os.cpu_count())
    wp.add_argument("--serial", action="store_true")
    wp.add_argument("--limit", type=int, default=None)
    wp.set_defaults(func=cmd_wavenet_preprocess)

    cm = sub.add_parser("create-metadata",
                        help="corpus layout -> metadata_<ds>.txt manifest")
    cm.add_argument("--in-dir", required=True)
    cm.add_argument("--out-path", required=True)
    cm.add_argument("--layout", default="ljspeech",
                    choices=["ljspeech", "folders", "emt4", "jessa", "emth",
                             "librispeech", "vctk"])
    cm.add_argument("--emt-label", type=int, default=0)
    cm.add_argument("--sex", default="U")
    cm.set_defaults(func=cmd_create_metadata)

    va = sub.add_parser("vctk-accent-relabel",
                        help="rewrite a VCTK train.txt with accent-index "
                             "labels (reference metadata.py:232-261)")
    va.add_argument("--train-path", required=True)
    va.add_argument("--speaker-info", required=True)
    va.add_argument("--out-path", required=True)
    va.set_defaults(func=cmd_vctk_accent)

    tr = sub.add_parser("train")
    tr.add_argument("--model", default="Tacotron",
                    choices=["Tacotron", "WaveNet", "Tacotron-2"])
    tr.add_argument("--input-path", required=True,
                    help="train.txt (Tacotron) or map.txt (WaveNet)")
    tr.add_argument("--train-steps", type=int, default=None)
    tr.add_argument("--wavenet-train-steps", type=int, default=None)
    tr.add_argument("--batch-size", type=int, default=None)
    tr.add_argument("--wavenet-batch-size", type=int, default=None)
    tr.add_argument("--restore", action="store_true")
    tr.add_argument("--no-gta", action="store_true")
    tr.add_argument("--slack-url", default=None)
    tr.add_argument("--verbose", action="store_true")
    tr.add_argument("--profile-start", type=int, default=None,
                    help="step at which to start a jax.profiler device trace")
    tr.add_argument("--profile-end", type=int, default=None)
    # fork feature flags (reference train.py:94-158)
    tr.add_argument("--pretrained-disc-emt", default=None,
                    help="emotion discriminator checkpoint to graft into "
                         "pretrained_ref_enc_emt (TF .ckpt dir or orbax)")
    tr.add_argument("--pretrained-disc-spk", default=None,
                    help="speaker discriminator checkpoint for "
                         "pretrained_ref_enc_spk")
    for flag in ["emt-only", "intercross-both", "unpaired", "adv-emb-disc",
                 "nat-gan", "opt-ref-no-mo", "pretrained-emb-disc",
                 "pretrained-emb-disc-all", "remove-long-samps",
                 "test-inputs", "test-max-len", "save-output-vars"]:
        tr.add_argument(f"--{flag}", action="store_true")
    tr.set_defaults(func=cmd_train)

    sy = sub.add_parser("synthesize")
    sy.add_argument("--model", default="Tacotron-2",
                    choices=["Tacotron", "WaveNet", "Tacotron-2"])
    sy.add_argument("--mode", default="eval",
                    choices=["eval", "gta", "synthesis", "synthesis_random",
                             "synthesis_multiple", "style_embs"])
    sy.add_argument("--synth-metadata", default=None,
                    help="synthesis-mode metadata file (train.txt schema + "
                         "ref columns 12/14)")
    sy.add_argument("--input-dir", default=None,
                    help="preprocessed data root for ref mel resolution")
    sy.add_argument("--flip-spk-emt", action="store_true")
    sy.add_argument("--paired", action="store_true")
    sy.add_argument("--n-spk", type=int, default=8)
    sy.add_argument("--n-per-spk", type=int, default=8)
    sy.add_argument("--checkpoint", default=None)
    sy.add_argument("--wavenet-checkpoint", default=None)
    sy.add_argument("--input-path", default=None, help="train.txt for gta mode")
    sy.add_argument("--mels-map", default=None)
    sy.add_argument("--output-dir", default=None)
    sy.add_argument("--text-list", default=None)
    sy.add_argument("--sentence", default=None)
    sy.add_argument("--ref-mel-emt", default=None)
    sy.add_argument("--ref-mel-spk", default=None)
    sy.add_argument("--limit", type=int, default=None)
    sy.set_defaults(func=cmd_synthesize)

    def add_serve_args(sp):
        sp.add_argument("--vocoder", default="wavenet",
                        choices=["wavenet", "griffin_lim"])
        sp.add_argument("--serve-batch", type=int, default=8,
                        help="program batch (the serving shape bucket's "
                             "stream count; short batches are padded)")
        sp.add_argument("--steps", type=int, default=250,
                        help="max decoder steps per bucket (frames = "
                             "steps × outputs_per_step)")
        sp.add_argument("--t-ref", type=int, default=64)
        sp.add_argument("--buckets", default="64,128,256",
                        help="padded-text shape buckets; each compiles one "
                             "program on first use")

    sv = sub.add_parser("serve",
                        help="single-program text->wav serving "
                             "(one compiled XLA program per shape bucket)")
    sv.add_argument("--checkpoint", default=None)
    sv.add_argument("--wavenet-checkpoint", default=None)
    sv.add_argument("--output-dir", default=None)
    sv.add_argument("--text-list", default=None)
    sv.add_argument("--sentence", default=None)
    sv.add_argument("--ref-mel-emt", default=None)
    sv.add_argument("--ref-mel-spk", default=None)
    add_serve_args(sv)
    sv.set_defaults(func=cmd_serve)

    lv = sub.add_parser("live")
    for a in sy._actions[1:]:
        if a.dest not in ("help", "command"):
            lv.add_argument(*a.option_strings, default=a.default,
                            **({"action": "store_true"} if isinstance(
                                a, argparse._StoreTrueAction) else
                               {"type": a.type} if a.type else {}))
    lv.add_argument("--pipeline", action="store_true",
                    help="route lines through the warm single-program "
                         "serving path (TextToWavProgram)")
    add_serve_args(lv)
    lv.set_defaults(func=cmd_live, model="Tacotron", mode="eval")

    dt = sub.add_parser("disc-train")
    dt.add_argument("--input-path", default=None,
                    help="train.txt metadata (omit when using --stacks-dir)")
    dt.add_argument("--kind", default="emt",
                    choices=["emt", "spk", "accent"])
    dt.add_argument("--train-steps", type=int, default=10000)
    dt.add_argument("--n-per-class", type=int, default=8)
    dt.add_argument("--loss-type", default="softmax",
                    choices=["softmax", "contrast", "ce"])
    dt.add_argument("--remove-long-samps", action="store_true")
    dt.add_argument("--stacks-dir", default=None,
                    help="train on TI-SV speaker stacks from disc-preprocess "
                         "instead of train.txt metadata")
    dt.set_defaults(func=cmd_disc_train)

    et = sub.add_parser("emt-disc-train",
                        help="standalone CNN+GRU emotion classifier "
                             "(reference emt_disc/train.py)")
    et.add_argument("--input-path", required=True)
    et.add_argument("--train-steps", type=int, default=2000)
    et.add_argument("--batch-size", type=int, default=32)
    et.add_argument("--n-classes", type=int, default=4)
    et.set_defaults(func=cmd_emt_disc_train)

    dp = sub.add_parser("disc-preprocess",
                        help="extract TI-SV per-speaker log-mel stacks from "
                             "a <corpus>/<speaker>/**/*.wav layout "
                             "(reference spk_disc/data_preprocess.py)")
    dp.add_argument("--corpus-dir", required=True)
    dp.add_argument("--output-dir", required=True)
    dp.add_argument("--n-mels", type=int, default=40)
    dp.add_argument("--tisv-frame", type=int, default=140)
    dp.add_argument("--top-db", type=float, default=20.0)
    dp.add_argument("--edges-only", action="store_true",
                    help="keep only the first/last window per voiced "
                         "interval (VCTK variant) instead of every window")
    dp.add_argument("--test-fraction", type=float, default=0.1)
    dp.add_argument("--n-jobs", type=int, default=None)
    dp.set_defaults(func=cmd_disc_preprocess)

    dx = sub.add_parser("disc-test",
                        help="classify synthesized mels with a trained "
                             "discriminator (reference spk_disc test_disc)")
    dx.add_argument("--checkpoint", required=True)
    dx.add_argument("--map-path", required=True,
                    help="synthesis map.txt or train.txt")
    dx.add_argument("--kind", default="emt",
                    choices=["emt", "spk", "accent"])
    dx.add_argument("--n-classes", type=int, default=None)
    dx.add_argument("--output-dir", default=None)
    dx.set_defaults(func=cmd_disc_test)

    fe = sub.add_parser("fixed-eval-set",
                        help="build a reproducible style-transfer eval "
                             "manifest (reference create_test_samps_fixed)")
    fe.add_argument("--input-path", required=True, help="train.txt")
    fe.add_argument("--out-path", required=True)
    fe.add_argument("--n-texts", type=int, default=5)
    fe.add_argument("--n-refs-per-class", type=int, default=5)
    fe.add_argument("--min-frames", type=int, default=200)
    fe.set_defaults(func=cmd_fixed_eval_set)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
