"""Profiling hooks: XLA/TPU traces and per-phase wall-clock counters.

The reference has only an ad-hoc cProfile harness
(reference tests/profile_run.py:41-52) and wall-clock counters
(vihds/utils.py:50-63).  Here tracing is first-class: pass --profile_dir to
any CLI (or use the context manager) to capture a jax.profiler trace viewable
in TensorBoard / Perfetto / xprof.
"""

import contextlib
import os
import time

import jax


def enable_compile_cache(cache_dir=None, force=False):
    """Turn on JAX's persistent (on-disk) compilation cache for this process.

    The dominant fixed cost of every CLI run on TPU is the XLA compile of the
    fused training step (~3-8 min through the tunnel).  The in-process
    _STEP_CACHE (training.py) removes it across folds of one run; this
    removes it across PROCESSES: re-runs, resumed runs, and inference-graph
    nodes executed in worker processes all hit the on-disk cache and start
    in seconds.  Verified to work on the axon TPU platform.

    TPU-backend only: deserializing persisted XLA:CPU AOT executables can
    SEGFAULT on this image (XLA records compile-machine features like
    +prefer-no-gather that the loader rejects — observed as a crash inside
    ``compilation_cache.get_executable_and_time`` during the test suite), so
    on CPU this is a no-op unless ``force=True`` (tests only).

    Resolution order: explicit ``cache_dir`` arg > ``VIHDS_COMPILE_CACHE``
    env var > ``~/.cache/vihds_tpu/xla``.  Set the env var to ``off``/``0``
    to disable.  Safe to call more than once.
    """
    env = os.environ.get("VIHDS_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none", "disable"):
        return None
    if not force and jax.default_backend() != "tpu":
        return None
    path = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "vihds_tpu", "xla"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path


@contextlib.contextmanager
def trace(profile_dir):
    """Capture a device trace for the enclosed block (no-op when dir is None)."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Blocking wall-clock timing of jitted calls (use sparingly: forces a
    device sync)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_to_block_on=None):
        t0 = time.perf_counter()
        yield
        if result_to_block_on is not None:
            jax.block_until_ready(result_to_block_on)
        self.times.append(time.perf_counter() - t0)

    def summary(self):
        import numpy as np

        t = np.asarray(self.times)
        if t.size == 0:
            return {}
        return {
            "n": int(t.size),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
        }
