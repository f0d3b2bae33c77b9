"""Preemption-safe training: SIGTERM → checkpoint → clean exit.

TPU fleets run on preemptible/spot capacity: the scheduler delivers
SIGTERM with a grace window before killing the VM. The reference has no
persistence at all (only result CSVs — SURVEY.md §5), so this is part
of the TPU-native checkpoint/resume superset built around
``train/checkpoint.py``:

- ``GracefulShutdown`` latches the signal into a bool that the training
  loop polls at batch boundaries (``train_and_evaluate(should_stop=…)``).
- The loop finishes the in-flight step, stops, and the experiment saves
  a checkpoint of the mid-epoch state before exiting; the partial epoch
  is *counted as complete* (its remaining batches are skipped on
  resume) — trained work is never lost, and a resumed run still totals
  ``--epochs`` epochs. The CLI exits with code 143 (128+SIGTERM) so
  supervisors see a termination, restart the command, and the existing
  auto-resume path continues from the preemption checkpoint.

A second signal while the first is still draining (e.g. the operator
means it, or the checkpoint pull is slower than the grace window)
raises ``SystemExit(128+signum)`` immediately.
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable


class GracefulShutdown:
    """Context manager latching SIGTERM (by default) into a pollable bool.

    Python delivers signals to the main thread only; entered from any
    other thread this is a no-op (``triggered`` stays False) — the
    in-process experiment tests that run loops off-thread keep default
    signal behavior.

    Usable directly as the loop's ``should_stop`` callable::

        with GracefulShutdown() as stop:
            train_and_evaluate(..., should_stop=stop)
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._old = {}
        self._triggered = False
        self._installed = False

    def _handler(self, signum, frame):
        if self._triggered:
            raise SystemExit(128 + signum)  # second signal: die now
        self._triggered = True

    def __enter__(self) -> "GracefulShutdown":
        if threading.current_thread() is threading.main_thread():
            for s in self._signals:
                self._old[s] = signal.signal(s, self._handler)
            self._installed = True
        return self

    def __exit__(self, *exc) -> bool:
        if self._installed:
            for s, old in self._old.items():
                signal.signal(s, old)
            self._installed = False
        return False

    @property
    def triggered(self) -> bool:
        return self._triggered

    def __call__(self) -> bool:
        return self._triggered
