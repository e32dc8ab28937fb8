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
    hi = jnp.minimum(hi, P)  # keep the "none" sentinel matmul-exact

    # Gather-free expansion: TPU dynamic gathers are slow, so every
    # bin-indexed lookup becomes a one-hot contraction on the MXU. All
    # values involved are small integers — exact in float32.
    sel = jnp.asarray(
        (base_p[:, None] == np.arange(P)[None, :]).astype(np.float32)
    )  # [half, P] static: bin -> base post
    hp = jax.lax.Precision.HIGHEST
    lo_b = jnp.matmul(lo.astype(jnp.float32), sel.T, precision=hp).astype(
        jnp.int32
    )
    hi_b = jnp.matmul(hi.astype(jnp.float32), sel.T, precision=hp).astype(
        jnp.int32
    )
    # posts[0] (x = 0) is always enabled for a used floor, so lo_b >= 0
    lo_b = jnp.maximum(lo_b, 0)
    has_hi = hi_b < P
    hi_c = jnp.where(has_hi, hi_b, 0)

    pr = jnp.arange(P, dtype=jnp.int32)
    oh_lo = (lo_b[..., None] == pr).astype(jnp.float32)  # [G, half, P]
    oh_hi = (hi_c[..., None] == pr).astype(jnp.float32)
    xs_f = jnp.asarray(xs_s.astype(np.float32))
    y_f = y_s.astype(jnp.float32)
    x0 = jnp.einsum("ghp,p->gh", oh_lo, xs_f, precision=hp).astype(jnp.int32)
    x1 = jnp.where(
        has_hi,
        jnp.einsum("ghp,p->gh", oh_hi, xs_f, precision=hp).astype(jnp.int32),
        x0,
    )
    y0 = jnp.einsum("ghp,gp->gh", oh_lo, y_f, precision=hp).astype(jnp.int32)
    y1 = jnp.einsum("ghp,gp->gh", oh_hi, y_f, precision=hp).astype(jnp.int32)

    x = jnp.arange(half, dtype=jnp.int32)[None, :]
    dy = y1 - y0
    adx = jnp.maximum(x1 - x0, 1)
    off = (jnp.abs(dy) * (x - x0)) // adx
    val = jnp.where(has_hi, y0 + jnp.sign(dy) * off, y0)
    val = jnp.clip(val, 0, 255)

    # inverse-dB lookup as a 16x16 factored one-hot product:
    # table[v] == A[v >> 4] * B[v & 15] to within 1 float32 ulp
    a_tab = jnp.asarray(
        (10.0 ** (7.0 * 16.0 * np.arange(16, dtype=np.float64) / 256.0)).astype(
            np.float32
        )
    )
    b_tab = jnp.asarray(
        (
            10.0 ** ((7.0 * np.arange(16, dtype=np.float64) - 7.0 * 255.0) / 256.0)
        ).astype(np.float32)
    )
    h16 = jnp.arange(16, dtype=jnp.int32)
    oh_h = ((val >> 4)[..., None] == h16).astype(jnp.float32)
    oh_l = ((val & 15)[..., None] == h16).astype(jnp.float32)
    curve = jnp.einsum("ghp,p->gh", oh_h, a_tab, precision=hp) * jnp.einsum(
        "ghp,p->gh", oh_l, b_tab, precision=hp
    )
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
    exponent = 0.11512925 * (
        amp * amplitude_offset / (amp_max * denom) - amplitude_offset
    )
    # well-formed streams keep curves O(1); clamp so degenerate LSP input
    # (near-coincident roots) saturates instead of producing inf in f32
    linear = jnp.exp(jnp.minimum(exponent, 80.0))
    return jnp.where(used[:, None], linear, 0.0)
