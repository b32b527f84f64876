"""Host-side data layer: audio DSP, preprocessing, manifest building, feeders."""
