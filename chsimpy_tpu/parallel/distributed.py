"""Multi-host runtime glue.

The reference has no distributed backend (same-host fork pool only,
``chsimpy/experiment.py:197-216``).  Here multi-host runs use
``jax.distributed``: call :func:`initialize` once per host process, then
build meshes over ``jax.devices()`` as usual — the ensemble axis rides DCN
across hosts, the grid axes ride ICI within a slice.

Also provides a per-host heartbeat logger (the failure-visibility aid for
long pod runs; the reference's only health check is the per-step NaN
assert, which the stepper preserves on device)."""

from __future__ import annotations

import logging
import threading
import time
from typing import Optional

logger = logging.getLogger('chsimpy_tpu.distributed')


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed (no-op on single-process runs) and
    return a topology summary."""
    import jax
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return {
        'process_index': jax.process_index(),
        'process_count': jax.process_count(),
        'local_devices': jax.local_device_count(),
        'global_devices': jax.device_count(),
    }


class Heartbeat:
    """Background thread logging liveness + step progress per host."""

    def __init__(self, interval_s: float = 60.0, get_progress=None):
        self.interval_s = interval_s
        self.get_progress = get_progress
        self._stop = threading.Event()
        self._thread = None

    def start(self):
        def loop():
            import jax
            while not self._stop.wait(self.interval_s):
                msg = (f"heartbeat host={jax.process_index()}"
                       f"/{jax.process_count()}")
                if self.get_progress is not None:
                    try:
                        msg += f" progress={self.get_progress()}"
                    except Exception as e:
                        msg += f" progress_error={e}"
                logger.info(msg)
        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
