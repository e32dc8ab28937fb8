"""Device-side floor curve synthesis (JAX/XLA).

Floor1: the reference renders each curve with a serial Bresenham loop
(NVorbis/Floor1.cs:372 RenderLineMulti). Here every output bin is computed
independently from its bracketing *enabled* posts with the exact integer
closed form y = y0 + sign(dy) * floor(|dy| * (x - x0) / (x1 - x0)) — the
same values the spec's err-accumulation loop produces (spec 9.2.7) — so the
whole [frames, half] curve batch is one vectorized VPU pass.

Floor0: LSP product formula (spec 6.2.3; NVorbis/Floor0.cs:164) with the
per-order product unrolled (order is static per floor config).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..setup.floor import INVERSE_DB_TABLE

_BIG = np.int32(1 << 30)


@partial(jax.jit, static_argnames=("xs", "multiplier", "half"))
def floor1_curves(
    posts: jax.Array,  # [G, P] int32 — final post Y values, config x order
    step2: jax.Array,  # [G, P] bool — post-enabled flags
    used: jax.Array,  # [G] bool — floor present for this (frame, channel)
    *,
    xs: tuple[int, ...],  # static: post X positions, config order
    multiplier: int,  # static
    half: int,  # static: n // 2
) -> jax.Array:
    """Piecewise-linear floor curves -> [G, half] float32 (linear domain)."""
    P = len(xs)
    xs_np = np.asarray(xs, dtype=np.int64)
    sort_order = np.argsort(xs_np, kind="stable")
    xs_s = xs_np[sort_order].astype(np.int32)  # static sorted X
    # static bin -> base post: largest p with xs_s[p] <= x  (xs_s[0] == 0)
    base_p = (np.searchsorted(xs_s, np.arange(half), side="right") - 1).astype(
        np.int32
    )

    order = jnp.asarray(sort_order)
    y_s = jnp.take(posts, order, axis=1).astype(jnp.int32) * multiplier
    en_s = jnp.take(step2, order, axis=1)

    idx = jnp.arange(P, dtype=jnp.int32)
    # lo[p] = largest enabled q <= p ; hi[p] = smallest enabled q > p
    lo = jax.lax.cummax(jnp.where(en_s, idx, -1), axis=1)
    rmin = jax.lax.cummin(jnp.where(en_s, idx, _BIG), axis=1, reverse=True)
    hi = jnp.concatenate(
        [rmin[:, 1:], jnp.full((rmin.shape[0], 1), _BIG, dtype=rmin.dtype)], axis=1
    )

    bp = jnp.asarray(base_p)  # [half]
    lo_b = jnp.take(lo, bp, axis=1)  # [G, half]
    hi_b = jnp.take(hi, bp, axis=1)
    # posts[0] (x = 0) is always enabled for a used floor, so lo_b >= 0
    lo_b = jnp.maximum(lo_b, 0)
    has_hi = hi_b < P
    hi_c = jnp.where(has_hi, hi_b, 0)

    xs_j = jnp.asarray(xs_s)
    x0 = jnp.take(xs_j, lo_b)  # [G, half]
    x1 = jnp.take(xs_j, jnp.where(has_hi, hi_b, lo_b))
    y0 = jnp.take_along_axis(y_s, lo_b, axis=1)
    y1 = jnp.take_along_axis(y_s, hi_c, axis=1)

    x = jnp.arange(half, dtype=jnp.int32)[None, :]
    dy = y1 - y0
    adx = jnp.maximum(x1 - x0, 1)
    off = (jnp.abs(dy) * (x - x0)) // adx
    val = jnp.where(has_hi, y0 + jnp.sign(dy) * off, y0)
    val = jnp.minimum(val, 255)

    table = jnp.asarray(INVERSE_DB_TABLE.astype(np.float32))
    curve = jnp.take(table, val)
    return jnp.where(used[:, None], curve, 0.0)


@partial(
    jax.jit,
    static_argnames=(
        "order", "bark_map", "bark_map_size", "amplitude_bits", "amplitude_offset",
    ),
)
def floor0_curves(
    coefficients: jax.Array,  # [G, order] float32 LSP coefficients
    amplitude: jax.Array,  # [G] int32
    used: jax.Array,  # [G] bool
    *,
    order: int,
    bark_map: tuple[int, ...],  # static: [half] bark bin map for this blocksize
    bark_map_size: int,
    amplitude_bits: int,
    amplitude_offset: int,
) -> jax.Array:
    """LSP floor curves -> [G, half] float32 (linear domain)."""
    m = np.asarray(bark_map, dtype=np.float64)
    cos_w = jnp.asarray(
        np.cos(np.pi * m / bark_map_size).astype(np.float32)
    )  # [half]
    cos_c = jnp.cos(coefficients)  # [G, order]

    half = len(bark_map)
    ones = jnp.ones((coefficients.shape[0], half), dtype=jnp.float32)
    p = ones
    q = ones
    # unrolled static-order product (libvorbis computes these in f32 too)
    for j in range(order):
        t = 4.0 * jnp.square(cos_c[:, j : j + 1] - cos_w[None, :])
        if j % 2 == 1:
            p = p * t
        else:
            q = q * t
    if order % 2 == 1:
        p = p * (1.0 - jnp.square(cos_w))[None, :]
        q = q * 0.25
    else:
        p = p * ((1.0 - cos_w) * 0.5)[None, :]
        q = q * ((1.0 + cos_w) * 0.5)[None, :]

    denom = jnp.sqrt(p + q)
    denom = jnp.where(denom == 0.0, 1e-9, denom)
    amp_max = (1 << amplitude_bits) - 1
    amp = amplitude.astype(jnp.float32)[:, None]
    linear = jnp.exp(
        0.11512925
        * (amp * amplitude_offset / (amp_max * denom) - amplitude_offset)
    )
    return jnp.where(used[:, None], linear, 0.0)
