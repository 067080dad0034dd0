"""Sink-side resilience: retry with exponential backoff + circuit
breaker (SURVEY.md §2.7; ``src/utils/retry.py:15-50``,
``src/utils/circuit_breaker.py:27-110``).

These wrap the ``foreachBatch`` commit — driver-side control flow, so
plain Python is the right tool (no DataFrame work here).
"""

from __future__ import annotations

import time
from collections.abc import Callable


def retry_with_backoff(
    fn: Callable[[], None],
    max_attempts: int = 5,
    initial_delay: float = 1.0,
    max_delay: float = 60.0,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """Exponential backoff 1→60 s, 5 attempts (retry.py:15-50)."""
    delay = initial_delay
    for attempt in range(1, max_attempts + 1):
        try:
            fn()
            return
        except Exception:
            if attempt == max_attempts:
                raise
            sleep(delay)
            delay = min(delay * 2, max_delay)


class CircuitBreaker:
    """CLOSED → OPEN after *failure_threshold* consecutive failures;
    OPEN → HALF_OPEN after *recovery_timeout* seconds; HALF_OPEN
    closes on success, re-opens on failure (circuit_breaker.py:27-110).
    """

    def __init__(
        self,
        failure_threshold: int = 5,
        recovery_timeout: float = 60.0,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.failure_threshold = failure_threshold
        self.recovery_timeout = recovery_timeout
        self._clock = clock
        self.state = "CLOSED"
        self.failures = 0
        self._opened_at = 0.0

    def call(self, fn: Callable[[], None]) -> None:
        if self.state == "OPEN":
            if self._clock() - self._opened_at >= self.recovery_timeout:
                self.state = "HALF_OPEN"
            else:
                raise RuntimeError("circuit breaker OPEN")
        try:
            fn()
        except Exception:
            self.failures += 1
            if self.state == "HALF_OPEN" or self.failures >= self.failure_threshold:
                self.state = "OPEN"
                self._opened_at = self._clock()
            raise
        else:
            self.failures = 0
            self.state = "CLOSED"
