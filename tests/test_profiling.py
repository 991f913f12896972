"""Profiling subsystem tests: phase registry and trace no-op safety."""

import time

from stac_mjx_tpu.utils import profiling


def test_phase_accumulates():
    profiling.reset()
    with profiling.phase("unit_phase", log=False):
        time.sleep(0.01)
    with profiling.phase("unit_phase", log=False):
        time.sleep(0.01)
    rep = profiling.report()
    assert rep["unit_phase"]["count"] == 2
    assert rep["unit_phase"]["total_s"] >= 0.02


def test_device_trace_smoke(tmp_path):
    import jax
    import jax.numpy as jnp

    with profiling.device_trace(str(tmp_path)):
        with profiling.annotate("unit_span"):
            jax.block_until_ready(jnp.arange(8.0) * 2)
    # trace files land under the logdir when the profiler is supported
    assert tmp_path.exists()


def test_phase_registry_reset():
    profiling.reset()
    assert profiling.report() == {}
