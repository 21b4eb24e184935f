"""Backend-aware ``jax.jit``: raises the TPU scoped-VMEM compile limit.

The fused DoG stencil's per-program VMEM working set (~20 MB at width
1920, 16-row strips) exceeds some libtpu versions' default scoped-vmem
stack limit of 16 MB (earlier toolchains defaulted higher — the same
program compiled unmodified in round 2). Narrower 8-row strips fit the
default limit but measure ~2x slower (1.63 vs 0.83 ms at 1080p,
interleaved minima), so the TPU path raises the limit per-compile via
``compiler_options`` instead of shrinking the kernel.

The flag is TPU-only — CPU's PJRT rejects unknown compile options — and
the backend is only knowable at call time (tests select CPU through
``jax.config.update("jax_platforms", "cpu")`` after import), so
``tpu_jit`` instantiates its underlying ``jax.jit`` lazily, one per
backend class. When a ``tpu_jit`` function is traced inside an outer
``jax.jit``, the inner compile options are inert (XLA inlines the call);
outermost entry points must therefore also be ``tpu_jit`` (the pipeline
jits are) or pass ``tpu_compiler_options()`` themselves (bench.py's
timing chains do).
"""

from __future__ import annotations

import functools

# 24 MiB: covers the DoG stencil's ~20.6 MB at the widest 16-row strip
# geometry (w <= 2048; wider images already drop to 8-row strips) while
# staying far under the v5e's 128 MB physical VMEM.
SCOPED_VMEM_LIMIT_KIB = 24576


def tpu_compiler_options() -> dict | None:
    """Compile options for the current default backend (None on CPU).

    Matched as ``!= "cpu"`` rather than ``== "tpu"`` deliberately: the
    tunneled TPU registers as the experimental "axon" platform, so an
    allowlist would silently skip the vmem raise there. This library has
    no GPU path, so every non-CPU backend it can run on is TPU-like."""
    import jax

    if jax.default_backend() == "cpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_LIMIT_KIB}


def trace_state_clean() -> bool:
    """True when no jax trace is active (top-level Python execution).

    jax 0.9 only exposes this through a private module; degrade to False
    (the conservative nested-call behavior) if an upgrade moves it, so
    callers keep working instead of crashing at call time."""
    try:
        from jax._src.core import trace_state_clean as _tsc
    except ImportError:  # moved/removed in a future jax
        return False
    return _tsc()


def tpu_jit(fn=None, **jit_kwargs):
    """``jax.jit`` that self-selects TPU compiler options at call time.

    Drop-in for ``functools.partial(jax.jit, static_argnames=...)`` use;
    exposes ``clear_cache()`` like a jit object (used by tests that
    monkeypatch module globals read at trace time).
    """
    if fn is None:
        return lambda f: tpu_jit(f, **jit_kwargs)

    jitted: dict[bool, object] = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        import jax

        # JAX rejects compiler_options on a jit traced inside another jit
        # (it can only apply to the outermost compile), so a nested call
        # dispatches the plain variant — the enclosing tpu_jit/bench chain
        # carries the options for the whole module.
        top = trace_state_clean()
        with_opts = top and jax.default_backend() != "cpu"
        if with_opts not in jitted:
            # setdefault: concurrent first calls may race building the jit
            # object; keep exactly one so clear_cache() sees every live jit.
            jitted.setdefault(with_opts, jax.jit(
                fn,
                compiler_options=tpu_compiler_options() if with_opts else None,
                **jit_kwargs,
            ))
        return jitted[with_opts](*args, **kwargs)

    def clear_cache():
        for j in jitted.values():
            j.clear_cache()
        jitted.clear()

    wrapper.clear_cache = clear_cache
    return wrapper
