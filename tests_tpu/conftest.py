"""Real-TPU test harness (run `pytest tests_tpu/ -q` on a TPU host).

Unlike tests/, this does NOT force the CPU platform; tests skip themselves
when no TPU is attached.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _tpu_reachable(timeout: float = 90.0) -> bool:
    """Probe device discovery in a subprocess with a hard timeout.

    A downed device tunnel makes jax.devices() HANG forever rather than
    error; probing inline would hang pytest collection (the skipif marks
    call jax.default_backend()).  The subprocess is killable, we are not.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform == 'tpu'"],
            timeout=timeout, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


import jax

if not _tpu_reachable():
    # no TPU (or an unreachable one): resolve the backend to CPU so the
    # per-module skipif marks trigger instead of hanging
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
