"""Ablation probe: where do the non-conv-stack milliseconds of the WaveNet
train step go? Times the full jitted train step under single-knob ablations
(dropout off, weight-norm reparam off, no-EMA, bigger batch) on the real chip.

Usage: python scripts/profile_wn_ablate.py [--which all|base|nodrop|nown|b32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_train import _enable_compile_cache, bench_wavenet_train  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="all")
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args(argv)

    _enable_compile_cache()
    import dataclasses

    from tacotron2_tpu.config import Config
    base = Config()
    base = base.replace(wavenet=dataclasses.replace(
        base.wavenet, compute_dtype="bfloat16"))

    runs = {
        "base_b16": (base, 16),
        "nodrop_b16": (base.replace(wavenet=dataclasses.replace(
            base.wavenet, dropout=0.0)), 16),
        "nown_b16": (base.replace(wavenet=dataclasses.replace(
            base.wavenet, weight_normalization=False)), 16),
        "b32": (base, 32),
    }
    sel = {"all": list(runs), "base": ["base_b16"], "nodrop": ["nodrop_b16"],
           "nown": ["nown_b16"], "b32": ["b32"]}[args.which]
    for name in sel:
        cfg, B = runs[name]
        t0 = time.time()
        try:
            r = bench_wavenet_train(cfg, B, args.steps)
            print(json.dumps(dict(name=name, **{k: round(v, 2) if isinstance(v, float) else v
                                                for k, v in r.items()})), flush=True)
        except Exception as e:
            print(json.dumps(dict(name=name, error=f"{type(e).__name__}: {e}"[:200],
                                  elapsed_s=round(time.time() - t0, 1))), flush=True)


if __name__ == "__main__":
    main()
