"""Observability + host utilities: logging, plotting, rolling windows."""

from .infolog import ValueWindow, init as infolog_init, log  # noqa: F401
