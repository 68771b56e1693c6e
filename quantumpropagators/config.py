"""Global configuration for the quantumpropagators TPU-native framework.

The reference implementation (QuantumPropagators.jl) is complex128
end-to-end and verifies kernels against dense ``expm`` at 1e-10
(``/root/reference/test/test_cheby.jl:8``).  TPU hardware (v5e/v5p MXU) is
f32-native and does not support f64/c128 element types, so this framework
carries an explicit dtype policy instead of Julia's implicit promotion:

- On CPU (tests, validation): complex128 via ``jax_enable_x64``.
- On TPU: complex64 by default; the extended-precision path (double-word
  "df64" arithmetic in Pallas kernels) is available for kernels that need
  tighter error growth over long Chebyshev recurrences.

Nothing in this module forces a platform; call :func:`use_cpu_x64` early
(before any device computation) in test harnesses.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = [
    "use_cpu_x64",
    "default_real_dtype",
    "default_complex_dtype",
    "x64_enabled",
    "on_tpu",
]


def use_cpu_x64(n_virtual_devices: int | None = None) -> None:
    """Force the CPU backend with float64/complex128 enabled.

    Must be called before JAX initializes its backends (i.e. before the
    first ``jax.devices()`` / any computation).  Optionally sets up
    ``n_virtual_devices`` host CPU devices for testing multi-chip sharding
    without hardware.
    """
    if n_virtual_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        flag = f"--xla_force_host_platform_device_count={n_virtual_devices}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + flag).strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_real_dtype() -> jnp.dtype:
    return jnp.dtype(jnp.float64) if x64_enabled() else jnp.dtype(jnp.float32)


def default_complex_dtype() -> jnp.dtype:
    return jnp.dtype(jnp.complex128) if x64_enabled() else jnp.dtype(jnp.complex64)


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
