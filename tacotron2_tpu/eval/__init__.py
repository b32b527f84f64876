"""Offline model-quality evaluation harness (reference code/single_use/)."""
