"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so GSPMD sharding correctness is
exercised without a real TPU slice (the reference has no distributed tests to
mirror — SURVEY.md §4 — this is a new capability of the TPU build).

This box's sitecustomize force-registers and eagerly initialises the axon TPU
backend at interpreter startup, before any conftest runs — env vars alone are
too late. `clear_backends` + `jax_num_cpu_devices` switches in-process.
"""

import jax

# Switch unconditionally WITHOUT querying the current backend first:
# jax.default_backend() would initialise the axon TPU client, which
# (a) wastes a chip claim per test run and (b) HANGS outright if the
# relay tunnel is down — the CPU suite must not depend on TPU health.
import jax.extend.backend as _jeb

_jeb.clear_backends()
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu" and len(jax.devices()) >= 8

jax.config.update("jax_default_matmul_precision", "highest")
