"""Structured run logging: stdout + append-only file + optional webhook.

Parity with reference code/infolog.py:13-47 (init/log with slack-url thread)
and code/tacotron/utils/__init__.py ValueWindow (rolling loss averages).
The webhook post is best-effort and non-blocking, like the reference's
daemon-thread sender; it is gated off in zero-egress environments.
"""

from __future__ import annotations

import atexit
import json
import threading
from datetime import datetime
from typing import Optional
from urllib.request import Request, urlopen

_format = "%Y-%m-%d %H:%M:%S.%f"
_file = None
_run_name = None
_webhook_url = None


def init(filename: str, run_name: str, webhook_url: Optional[str] = None):
    global _file, _run_name, _webhook_url
    _close_logfile()
    _file = open(filename, "a", encoding="utf-8")
    _file.write("\n-----------------------------------------------------------------\n")
    _file.write(f"Starting new {run_name} training run\n")
    _file.write("-----------------------------------------------------------------\n")
    _run_name = run_name
    _webhook_url = webhook_url


def log(msg: str, end: str = "\n", slack: bool = False):
    print(msg, end=end, flush=True)
    if _file is not None:
        _file.write(f"[{datetime.now().strftime(_format)[:-3]}] {msg}{end}")
        _file.flush()
    if slack and _webhook_url is not None:
        _send_webhook(msg)


def _send_webhook(msg: str):
    def worker():
        try:
            body = json.dumps({"text": f"{_run_name}: {msg}"}).encode()
            req = Request(_webhook_url, data=body,
                          headers={"Content-Type": "application/json"})
            urlopen(req, timeout=10)
        except Exception:
            pass  # best-effort, never break training on logging

    threading.Thread(target=worker, daemon=True).start()


def _close_logfile():
    global _file
    if _file is not None:
        _file.close()
        _file = None


atexit.register(_close_logfile)


class ValueWindow:
    """Rolling average over the last N values (reference util/__init__.py:1-22)."""

    def __init__(self, window_size: int = 100):
        self._window_size = window_size
        self._values = []

    def append(self, x):
        self._values = self._values[-(self._window_size - 1):] + [float(x)]

    @property
    def sum(self):
        return sum(self._values)

    @property
    def count(self):
        return len(self._values)

    @property
    def average(self):
        return self.sum / max(1, self.count)

    def reset(self):
        self._values = []
