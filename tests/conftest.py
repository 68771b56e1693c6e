"""Test configuration: force the CPU backend with float64/complex128.

The reference's numerical tolerances (1e-10 vs dense expm,
test_cheby.jl:8) require complex128, which TPU hardware does not
support; correctness tests therefore run on CPU with 8 virtual devices
so that multi-chip sharding is exercised without hardware
(SURVEY §4, "multi-chip bit-equality vs single-chip").
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
