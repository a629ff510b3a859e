"""Real-TPU test harness (run `pytest tests_tpu/ -q` on a TPU host).

Unlike tests/, this does NOT force the CPU platform; tests skip themselves
when no TPU is attached.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
