"""Tacotron spectrogram predictor (flax): encoder, LSA decoder, style heads."""

from .model import Tacotron, TacotronOutput  # noqa: F401
