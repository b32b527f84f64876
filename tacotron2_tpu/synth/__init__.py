"""Synthesis drivers: text→mel (Tacotron) and mel→waveform (WaveNet/G-L)."""
