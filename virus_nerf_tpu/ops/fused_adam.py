"""Fused Adam update as a Pallas TPU kernel.

``optax.adam`` lowers to an unfused chain of elementwise passes over the
hash table (~10 ms/step measured at the bench config vs ~1 ms of sgd — see
tools/PERF_NOTES.md).  This GradientTransformation computes the Adam moment
updates and the parameter delta in ONE Pallas pass per large leaf (reads
g/mu/nu, writes delta/mu/nu — ~300 MB of traffic for the full-size model,
sub-millisecond), falling back to plain jnp math for small leaves where
kernel launch overhead would dominate.

Semantics match ``optax.adam(lr, eps=...)`` exactly (b1/b2 defaults, bias
correction, eps outside the sqrt — the same update rule as the reference's
``torch.optim.Adam`` at training/trainer.py:49-57).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from virus_nerf_tpu.ops.common import tpu_kernels_enabled

_BLK = 131072  # f32 elements per grid step (0.5 MB per operand)


class FusedAdamState(NamedTuple):
    count: jax.Array  # () int32
    mu: optax.Params
    nu: optax.Params


def _adam_kernel(scal_ref, g_ref, mu_ref, nu_ref, d_ref, mu_o_ref, nu_o_ref,
                 *, b1: float, b2: float, eps: float):
    lr = scal_ref[0]
    bc1 = scal_ref[1]  # 1 - b1^t
    bc2 = scal_ref[2]  # 1 - b2^t
    g = g_ref[:]
    mu = b1 * mu_ref[:] + (1.0 - b1) * g
    nu = b2 * nu_ref[:] + (1.0 - b2) * g * g
    mhat = mu / bc1
    vhat = nu / bc2
    d_ref[:] = -lr * mhat / (jnp.sqrt(vhat) + eps)
    mu_o_ref[:] = mu
    nu_o_ref[:] = nu


def _adam_leaf_pallas(g, mu, nu, scal, b1, b2, eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = g.size
    n_pad = -(-n // _BLK) * _BLK
    pad = n_pad - n

    def prep(x):
        x = x.reshape(-1)
        return jnp.pad(x, (0, pad)) if pad else x

    gf, muf, nuf = prep(g), prep(mu), prep(nu)
    grid = (n_pad // _BLK,)
    blk = pl.BlockSpec((_BLK,), lambda i: (i,), memory_space=pltpu.VMEM)
    d, mu2, nu2 = pl.pallas_call(
        partial(_adam_kernel, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk, blk, blk,
        ],
        out_specs=(blk, blk, blk),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        ),
    )(scal, gf, muf, nuf)

    shape = g.shape
    return (
        d[:n].reshape(shape), mu2[:n].reshape(shape), nu2[:n].reshape(shape)
    )


def _adam_leaf_jnp(g, mu, nu, scal, b1, b2, eps):
    lr, bc1, bc2 = scal[0], scal[1], scal[2]
    mu2 = b1 * mu + (1.0 - b1) * g
    nu2 = b2 * nu + (1.0 - b2) * g * g
    d = -lr * (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
    return d, mu2, nu2


def fused_adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    min_pallas_size: int = 1 << 20,
) -> optax.GradientTransformation:
    """Adam with the big-leaf update fused into one Pallas pass.

    Drop-in for ``optax.adam(learning_rate, eps=eps)``; leaves smaller than
    ``min_pallas_size`` elements use the plain jnp formulation.  On CPU (no
    Mosaic backend) everything uses the jnp path.
    """

    def init(params):
        z = lambda p: jnp.zeros_like(p, jnp.float32)
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params),
        )

    def update(grads, state, params=None):
        # evaluated at trace time (not factory time) so mesh-aware callers
        # can override the gate for non-TPU device meshes
        on_tpu = tpu_kernels_enabled()
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        scal = jnp.stack(
            [
                jnp.float32(learning_rate),
                1.0 - jnp.float32(b1) ** t,
                1.0 - jnp.float32(b2) ** t,
            ]
        )

        def leaf(g, mu, nu):
            g = g.astype(jnp.float32)
            # Pallas only for big FLAT leaves: a 2-D (rows, F) leaf lives in
            # XLA's column-major narrow-table layout, and the kernel's
            # reshape(-1) would force a row-major relayout of g AND the
            # delta every step; the jnp formulation fuses into one
            # elementwise pass in the native layout instead.
            if on_tpu and g.ndim == 1 and g.size >= min_pallas_size:
                return _adam_leaf_pallas(g, mu, nu, scal, b1, b2, eps)
            return _adam_leaf_jnp(g, mu, nu, scal, b1, b2, eps)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        outs = [leaf(g, mu, nu) for g, mu, nu in zip(flat_g, flat_mu, flat_nu)]
        updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        mu = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
        nu = jax.tree_util.tree_unflatten(treedef, [o[2] for o in outs])
        return updates, FusedAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)
