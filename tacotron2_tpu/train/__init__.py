"""Training drivers: optimizers/schedules, pjit train steps, host loops."""
