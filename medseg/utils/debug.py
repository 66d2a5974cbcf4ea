"""Debug modes (SURVEY.md §5 "race detection / sanitizers" row).

The reference has no sanitizers (single-threaded torch). The rebuild relies on
JAX purity for data-race freedom and provides:

- ``nan_checks()``: enables ``jax_debug_nans`` so any NaN produced inside a
  jitted computation raises at the producing op (useful for loss blowups);
- ``strict_mode()``: adds ``jax_debug_infs`` and disables donation-unsafe
  rematerialization surprises by checking leaks.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def nan_checks():
    old = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


@contextlib.contextmanager
def strict_mode():
    old_nan = jax.config.read("jax_debug_nans")
    old_inf = jax.config.read("jax_debug_infs")
    old_leak = jax.config.read("jax_check_tracer_leaks")
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
    jax.config.update("jax_check_tracer_leaks", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nan)
        jax.config.update("jax_debug_infs", old_inf)
        jax.config.update("jax_check_tracer_leaks", old_leak)
