"""Model zoo: Tacotron (spectrogram predictor) and WaveNet (vocoder).

`create_model(name, config)` mirrors the reference registries
(tacotron/models/__init__.py:5-11, wavenet_vocoder/models/__init__.py).
The reference's `Tacotron_emt_attn` variant is a config switch
(`config.gst.emt_attn`) on the single Tacotron module, not a second class.
"""

from __future__ import annotations


def create_model(name: str, config):
    if name in ("Tacotron", "Tacotron_emt_attn"):
        from .tacotron.model import Tacotron
        if name == "Tacotron_emt_attn":
            import dataclasses
            config = config.replace(gst=dataclasses.replace(config.gst, emt_attn=True))
        return Tacotron(config=config)
    if name == "WaveNet":
        from .wavenet.model import WaveNet
        return WaveNet(config=config)
    raise ValueError(f"Unknown model: {name}")
