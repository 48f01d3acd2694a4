"""Stall watchdog: convert indefinite device-readback hangs into clean,
resumable failures.

The axon TPU backend has been observed to go down mid-run (see
``.claude/skills/verify/SKILL.md``): the next host readback then blocks
forever inside the runtime's C extension, where Python-level interruption
cannot reach it (signals are not delivered until the blocked call returns,
and ``block_until_ready`` is a no-op on that platform). A daemon thread is
the only reliable escape hatch: if no progress beat arrives within
``timeout_s`` seconds, the watchdog prints a diagnostic and calls
``os._exit`` with a distinctive code, so orchestrators (``run_demo.py``) fail
fast with a resume hint instead of hanging until *their* caller's timeout.

The reference pipeline has no equivalent: a wedged accelerator call in
``/root/reference/scripts/train_model.py`` hangs the whole demo
(``run_demo.py`` there waits on the subprocess forever).

Usage::

    with Watchdog(1800, what="training epoch progress") as wd:
        for chunk in work:
            run(chunk)
            wd.beat()          # proof of progress — resets the timer

The timeout must cover the slowest *legitimate* gap between beats; for
device code that includes first-compile time (remote Mosaic kernel compiles
have been observed at 5-15 minutes cold), hence the generous 1800 s default
used by the production pipeline.
"""

import os
import sys
import threading
import time

# Distinctive exit code so callers can tell "stalled" from ordinary failure.
STALL_EXIT_CODE = 117


def maybe_watchdog(timeout_s, what: str = "device progress"):
    """Arm a watchdog from a CLI flag value, with uniform semantics across
    every entry point: ``None`` or ``0`` means disabled (returns ``None``),
    a positive value arms and returns a started :class:`Watchdog`, and a
    negative value is rejected loudly (``--watchdog -5`` is always a
    mistake, never a silent no-op)."""
    if timeout_s is None or timeout_s == 0:
        return None
    if timeout_s < 0:
        raise ValueError(
            f"watchdog timeout must be positive or 0 to disable, "
            f"got {timeout_s}")
    return Watchdog(timeout_s, what=what).start()


class Watchdog:
    """Daemon-thread stall detector with an injectable exit for tests."""

    def __init__(self, timeout_s: float, what: str = "device progress",
                 exit_code: int = STALL_EXIT_CODE, _exit=os._exit):
        if timeout_s <= 0:
            raise ValueError(f"timeout_s must be positive, got {timeout_s}")
        self.timeout_s = float(timeout_s)
        self.what = what
        self.exit_code = exit_code
        self._exit = _exit
        self._last = time.monotonic()
        self._stopped = threading.Event()
        self._thread = None

    def start(self) -> "Watchdog":
        if self._thread is None:
            self._last = time.monotonic()
            self._thread = threading.Thread(
                target=self._watch, name="stall-watchdog", daemon=True)
            self._thread.start()
        return self

    def beat(self) -> None:
        """Record progress; resets the stall timer."""
        self._last = time.monotonic()

    def stop(self) -> None:
        """Disarm permanently (idempotent); the thread exits on its own."""
        self._stopped.set()

    def __enter__(self) -> "Watchdog":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def _watch(self) -> None:
        # Poll at a fraction of the timeout so a stall is detected within
        # ~1.25x timeout_s at worst, without busy-waiting.
        poll = max(0.05, min(self.timeout_s / 4.0, 5.0))
        while not self._stopped.wait(poll):
            idle = time.monotonic() - self._last
            if idle > self.timeout_s:
                print(f"\nWATCHDOG: no {self.what} for {idle:.0f}s "
                      f"(limit {self.timeout_s:.0f}s) — the device backend "
                      f"has likely stalled. Exiting {self.exit_code}; "
                      f"rerun with --resume to continue from the last "
                      f"checkpoint.", file=sys.stderr, flush=True)
                self._exit(self.exit_code)
                return  # only reached with an injected (test) exit
