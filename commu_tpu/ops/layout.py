"""Layout-anchoring helpers.

JAX has no way to pin the physical layout of an intermediate value, and
XLA's layout assignment sometimes settles on a buffer layout that makes one
producer cheap while every consumer pays a transposing copy (measured:
~17 ms/step of pathological [.., B, D, M] relayouts around the XL-memory
ring buffer at the training shape).  A Pallas call's operands and results
are ALWAYS standard-layout (minor dim on lanes), so routing a value through
a trivial Pallas transpose both (a) performs the logical transpose in VMEM
at copy bandwidth and (b) anchors the result's physical layout, letting the
ring buffer, its dynamic-update-slice and the kv projections all agree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _transpose_kernel(x_ref, o_ref):
    o_ref[...] = jnp.swapaxes(x_ref[...], -1, -2)


def transpose_last2(x: jnp.ndarray) -> jnp.ndarray:
    """[..., T, D] -> [..., D, T] as a standard-layout Pallas copy."""
    *lead, t, d = x.shape
    n = len(lead)

    def idx(*args):
        return args[:n] + (0, 0)

    return pl.pallas_call(
        _transpose_kernel,
        grid=tuple(lead),
        in_specs=[pl.BlockSpec((1,) * n + (t, d), idx,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) * n + (d, t), idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(tuple(lead) + (d, t), x.dtype),
        interpret=_interpret(),
    )(x)
