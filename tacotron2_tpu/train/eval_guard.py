"""Consecutive-failure guard for the periodic eval paths.

The train-loop evals (losses, synthesis, generation) swallow exceptions so a
transient failure can never kill a long run — matching the reference's
behavior, whose eval lives in the same process-wide try/except as training
(reference tacotron/train.py:525-716). But a SYSTEMATICALLY broken eval
(e.g. a bad restore, a corrupted eval split) would then rot silently for the
whole run. This guard counts consecutive failures per eval kind and raises
loudly once `limit` in a row have failed (VERDICT r3 weak #7).
"""

from __future__ import annotations


class EvalFailureGuard:
    """Tracks consecutive failures of one eval path; raises after `limit`."""

    def __init__(self, name: str, limit: int = 3):
        self.name = name
        self.limit = max(1, limit)
        self.consecutive = 0

    def success(self) -> None:
        self.consecutive = 0

    def failure(self, step: int, exc: BaseException, log=print) -> None:
        """Record one failure; re-raise once the consecutive limit is hit."""
        self.consecutive += 1
        log(f"{self.name} failed at step {step} "
            f"({self.consecutive}/{self.limit} consecutive): {exc}")
        if self.consecutive >= self.limit:
            raise RuntimeError(
                f"{self.name} failed {self.consecutive} times in a row "
                f"(last at step {step}) — the eval path is broken, aborting "
                f"so the run does not rot silently") from exc
