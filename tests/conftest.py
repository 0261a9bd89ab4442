"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so GSPMD sharding correctness is
exercised without a real TPU slice (the reference has no distributed tests to
mirror — SURVEY.md §4 — this is a new capability of the TPU build).

This box's sitecustomize registers and eagerly initialises the axon TPU
backend at interpreter startup, before any conftest runs — env vars set here
are too late. So on first import we re-exec pytest with the axon hook
disabled (PALLAS_AXON_POOL_IPS empty) and the CPU mesh configured.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
    "DIFFUSIONKIT_TPU_TEST_REEXEC"
):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize skips TPU registration
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["DIFFUSIONKIT_TPU_TEST_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
