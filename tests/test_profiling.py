"""StageTimer observability utility."""

import jax.numpy as jnp

from cloudscape_tpu.utils.profiling import StageTimer


def test_stage_timer_accumulates():
    t = StageTimer()
    for _ in range(3):
        with t.stage("work", rays=100):
            x = jnp.ones((64, 64)).sum()
            t.fence(x)
    assert t.counts["work"] == 3
    assert t.rays["work"] == 300
    assert t.totals["work"] > 0
    assert t.mrays_per_sec("work") > 0
    rep = t.report()
    assert "work" in rep and "Mrays/s" in rep
    d = t.as_dict()
    assert d["work"]["calls"] == 3


def test_stage_timer_fence_kwarg():
    t = StageTimer()
    x = jnp.arange(10)
    with t.stage("fenced", fence=x):
        pass
    assert t.counts["fenced"] == 1
    assert t.mrays_per_sec("fenced") is None
