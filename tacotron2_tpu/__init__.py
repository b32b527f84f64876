"""tacotron2_tpu: a TPU-native (JAX/XLA/Pallas/pjit) two-stage TTS framework.

A from-scratch rebuild of the capabilities of mwhitehill/Tacotron-2 (reference
mounted at /root/reference): a Tacotron-2 spectrogram predictor with
emotion/speaker style disentanglement (dual reference encoders, GST, adversarial
style heads) and a WaveNet vocoder with fast cached autoregressive synthesis —
designed TPU-first: pjit/shard_map over a ('data', 'model') mesh, lax.scan
decode loops, Pallas kernels for the hot inner steps.
"""

__version__ = "0.1.0"

from .config import Config, default_config, get_config, paper_config  # noqa: F401
