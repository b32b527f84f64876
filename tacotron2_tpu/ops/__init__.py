"""TPU-native compute ops: STFT/mel, Griffin-Lim, μ-law, Pallas kernels."""
