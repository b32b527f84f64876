"""WaveNet vocoder: gated dilated-conv stack + fast cached sampler."""

from .model import WaveNet, WaveNetOutput  # noqa: F401
