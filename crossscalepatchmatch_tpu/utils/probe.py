"""Device-backend reachability probe.

A downed accelerator tunnel makes jax.devices() HANG forever rather than
error, freezing any driver that touches the backend (observed on this
rig: multi-hour outages where backend discovery never returns).  Probing
in a subprocess with a hard timeout is the only reliable guard -- the
subprocess is killable, the in-process call is not.
"""

from __future__ import annotations

import subprocess
import sys


def backend_reachable(timeout: float = 90.0) -> bool:
    """True iff jax backend discovery completes within `timeout` seconds."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, capture_output=True)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False
