"""Debug / observability helpers.

Role of the reference's (absent) sanitizer story (SURVEY.md §5): the
framework equivalents are jit-disabled eager mode, NaN checking via
jax.checkify or the global debug_nans flag, and device profiling via
jax.profiler — wrapped here so the CLI can switch them on with flags.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def debug_mode(nan_checks: bool = True, disable_jit: bool = False):
    """Eager/NaN-guarded execution for debugging engine steps.

    With nan_checks, any NaN produced by a primitive raises immediately
    (jax_debug_nans); with disable_jit, everything runs op-by-op so Python
    tracebacks point at the exact source line.
    """
    import jax

    ctxs = []
    if nan_checks:
        ctxs.append(jax.debug_nans(True))
    if disable_jit:
        ctxs.append(jax.disable_jit())
    with contextlib.ExitStack() as stack:
        for c in ctxs:
            stack.enter_context(c)
        yield


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/vislam_tpu_trace"):
    """Capture a device profile (open with TensorBoard or xprof)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def checkify_step(step_fn):
    """Wrap a jitted step with checkify NaN/OOB error tracking.

    Returns fn with signature (*args) -> (error, out); call error.throw() to
    surface the first failure with its source location.
    """
    import jax
    from jax.experimental import checkify

    checked = checkify.checkify(
        step_fn, errors=checkify.float_checks | checkify.index_checks
    )
    return jax.jit(checked)
