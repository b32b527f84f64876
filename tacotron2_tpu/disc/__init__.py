"""Auxiliary emotion/speaker discriminators (GE2E-style) — reference spk_disc/."""
