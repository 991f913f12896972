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


def test_op_table_from_device_trace(tmp_path):
    """device_trace + op_table round-trip on the host backend: the parser
    returns the documented structure (op rows appear when the backend
    emits op events; the TPU path is exercised by bench.py's mfu leg)."""
    import jax
    import jax.numpy as jnp

    from stac_mjx_tpu.utils import profiling

    fn = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    jax.block_until_ready(fn(x))
    with profiling.device_trace(str(tmp_path)):
        jax.block_until_ready(fn(x))

    table = profiling.op_table(str(tmp_path), device_substr="CPU")
    assert set(table) == {"total_op_us", "ops", "copy_formatting_pct"}
    for row in table["ops"]:
        assert set(row) == {"op", "us", "pct", "category"}
    # an empty dir parses to the empty table, not an exception
    empty = profiling.op_table(str(tmp_path / "nope"))
    assert empty["ops"] == []
