"""Shared constants and small vectorized ops of the render path.

TPU-native equivalents of the reference's Taichi helpers
(reference: modules/utils.py:12-92).  Everything here is pure XLA —
elementwise VPU math on whole ray batches, no per-thread kernels.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

# Trace-time gate for Pallas TPU kernels.  `jax.default_backend()` alone is
# wrong in this environment: the TPU PJRT plugin stays registered even when a
# program runs on a virtual CPU mesh (e.g. `dryrun_multichip`), so code traced
# for CPU devices would still emit `pallas_call`s that CPU cannot lower.
# Mesh-aware callers (parallel/) override the gate for the platform their
# devices actually are.
_PALLAS_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "tpu_pallas_override", default=None
)


def tpu_kernels_enabled() -> bool:
    """True iff Pallas TPU kernels should be emitted at this trace point."""
    ov = _PALLAS_OVERRIDE.get()
    if ov is not None:
        return ov
    return jax.default_backend() == "tpu"


@contextlib.contextmanager
def pallas_kernels(enabled: bool):
    """Force the Pallas gate on/off for code traced inside this context."""
    tok = _PALLAS_OVERRIDE.set(bool(enabled))
    try:
        yield
    finally:
        _PALLAS_OVERRIDE.reset(tok)


# reference: modules/utils.py:12-16
MAX_SAMPLES = 1024
NEAR_DISTANCE = 0.01
SQRT3 = 1.7320508075688772
SQRT3_MAX_SAMPLES = SQRT3 / 1024
SQRT3_2 = SQRT3 * 2


@jax.custom_vjp
def trunc_exp(x):
    """exp with input-clamped gradient (reference: modules/networks.py:17-29)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def calc_dt(t, exp_step_factor: float, grid_size: int, scale: float,
            resolution: int = MAX_SAMPLES):
    """Marching step size (reference: modules/utils.py:54-57).

    For ``exp_step_factor == 0`` (scale <= 0.5, all ETHZ configs) this is the
    constant ``SQRT3/resolution`` — the property the static-lattice ray march
    in ops/ray_march.py relies on.  ``resolution`` defaults to the
    reference's MAX_SAMPLES=1024 (bit-exact parity); lower values coarsen
    the marching quadrature proportionally (a speed/quality knob the
    reference hard-codes, modules/rendering.py:8).
    """
    return jnp.clip(
        t * exp_step_factor, SQRT3 / resolution, SQRT3_2 * scale / grid_size
    )


def _frexp_exponent(x):
    """ceil(log2(x)) for x > 0 via float bit twiddling, 0 for x == 0.

    Matches the reference's ``frexp_bit`` (modules/utils.py:60-75): the IEEE754
    exponent, plus one when the mantissa is not exactly 1.0.
    """
    x = jnp.asarray(x, jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    exponent = ((bits >> jnp.uint32(23)) & jnp.uint32(0xFF)).astype(jnp.int32) - 127
    mantissa_nonzero = (bits & jnp.uint32(0x7FFFFF)) != 0
    exponent = jnp.where(mantissa_nonzero, exponent + 1, exponent)
    return jnp.where(x != 0.0, exponent, 0)


def mip_from_absmax(mx, cascades: int):
    """Cascade index from max(|x|,|y|,|z|) — component form of
    :func:`mip_from_pos` for structure-of-arrays call sites."""
    exponent = _frexp_exponent(mx) + 1
    return jnp.clip(exponent, 0, cascades - 1)


def mip_from_pos(xyz, cascades: int):
    """Cascade index from sample position (reference: modules/utils.py:78-84)."""
    return mip_from_absmax(jnp.max(jnp.abs(xyz), axis=-1), cascades)


def mip_from_dt(dt, grid_size: int, cascades: int):
    """Cascade index from step size (reference: modules/utils.py:87-92)."""
    exponent = _frexp_exponent(dt * grid_size)
    return jnp.clip(exponent, 0, cascades - 1)
