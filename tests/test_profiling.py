"""Smoke tests for the profiling utilities."""

import jax.numpy as jnp

from crossscalepatchmatch_tpu.utils.profiling import PhaseTimer, throughput


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a") as h:
        h.append(jnp.arange(10).sum())
    with t.phase("a") as h:
        h.append(jnp.arange(5).sum())
    with t.phase("b", sync=False):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    rep = t.report()
    assert "a" in rep and "%" in rep
    assert set(t.as_dict()) == {"a", "b"}


def test_throughput():
    m = throughput(10, 2.0, n_chips=4)
    assert m["pairs_per_s"] == 5.0
    assert m["pairs_per_s_per_chip"] == 1.25
