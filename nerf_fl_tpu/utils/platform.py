"""Backend selection for the CLI entry points.

The axon TPU image forces its platform plugin via sitecustomize, so the
standard ``JAX_PLATFORMS`` env var is silently ignored; the only reliable
override is ``jax.config.update('jax_platforms', ...)`` BEFORE any backend
use.  ``apply_platform_env()`` routes the ``NERF_FL_TPU_PLATFORM`` env var
through that config knob so subprocess drivers (tools/quality_gate.py's
CPU preset, CI harnesses) can pin train.py/eval.py to a backend without
patching the scripts.  No-op when the var is unset.
"""
import os


def apply_platform_env() -> None:
    platform = os.environ.get("NERF_FL_TPU_PLATFORM")
    if not platform:
        return
    import jax
    jax.config.update("jax_platforms", platform)
