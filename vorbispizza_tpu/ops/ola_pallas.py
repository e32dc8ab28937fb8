"""Pallas TPU overlap-add: per-hop DMA copies instead of per-sample gathers.

The output PCM between consecutive frame centers ("hop" [G_{f-1}, G_f)) is
the sum of two CONTIGUOUS slices of the windowed-frame flat buffer: the
previous frame's tail starting at its center, and the current frame's
window starting at center - hop_len (clamped; the masked/windowed zeros
make the taper regions correct). Hop lengths take one STATIC value per
(prev bucket, cur bucket) class — long-long n1/2, short-short n0/2,
transitions (n1+n0)/4 — so each class becomes one pallas_call with static
tile shapes, a grid over hops, scalar-prefetched source/destination offsets
and three async DMAs per hop. This replaces the XLA per-sample two-gather
assembly (ops/ola.gather_assemble), which is gather-throughput-bound on
TPU.

Only used for cut-free plans (no granule trims mid-stream); callers fall
back to the gather path otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass(frozen=True)
class HopClass:
    """Static geometry of one (prev bucket, cur bucket) hop class."""

    length: int  # hop length L
    prev_len: int  # prev-tail slice length  La = min(L, n_prev // 2)
    cur_off: int  # j0: first hop position covered by the current frame
    cur_len: int  # L - j0


def hop_class(n_prev: int, center_cur: int, left_end_cur: int, tail_prev: int):
    """Derive the static geometry: L = tail_prev + center_cur - left_end_cur."""
    L = tail_prev + center_cur - left_end_cur
    La = min(L, n_prev // 2)
    B = center_cur - L
    j0 = max(0, -B)
    return HopClass(length=L, prev_len=La, cur_off=j0, cur_len=L - j0), max(B, 0)


def _ola_kernel(src_a_ref, src_b_ref, dst_ref, flat_ref, prev_ref, out_ref,
                buf_a, buf_b, acc, sem_a, sem_b, sem_o, sem_i,
                *, C, L, La, j0, Lb):
    h = pl.program_id(0)

    # program 0 carries the accumulator forward (other classes' hops);
    # TPU grid programs execute sequentially, so later hops see the copy
    @pl.when(h == 0)
    def _():
        cp = pltpu.make_async_copy(prev_ref, out_ref, sem_i)
        cp.start()
        cp.wait()

    # hop offsets are 128-aligned by construction (pipeline._build_hops
    # gates on OLA_ALIGN); pl.multiple_of carries that proof to Mosaic,
    # whose lane-dim dynamic slices require provable tile divisibility
    cp_a = pltpu.make_async_copy(
        flat_ref.at[:, pl.ds(pl.multiple_of(src_a_ref[h], 128), La)],
        buf_a,
        sem_a,
    )
    cp_a.start()
    cp_b = pltpu.make_async_copy(
        flat_ref.at[:, pl.ds(pl.multiple_of(src_b_ref[h], 128), Lb)],
        buf_b,
        sem_b,
    )
    cp_b.start()
    cp_a.wait()
    cp_b.wait()
    acc[:] = jnp.zeros((C, L), dtype=jnp.float32)
    acc[:, :La] += buf_a[:]
    acc[:, j0:] += buf_b[:]
    cp_o = pltpu.make_async_copy(
        acc, out_ref.at[:, pl.ds(pl.multiple_of(dst_ref[h], 128), L)], sem_o
    )
    cp_o.start()
    cp_o.wait()


def ola_hop_class(flat, out, src_a, src_b, dst, cls: HopClass, *, interpret=False):
    """Run one hop class: out[:, dst[h]:dst[h]+L] = prev-slice + cur-slice.

    flat: [C, S] windowed frames (flat layout); out: [C, total] accumulator
    (hop classes partition the output; each call copies the accumulator
    forward and overwrites its own hops). Returns the updated out."""
    C = flat.shape[0]
    H = src_a.shape[0]
    L, La, j0, Lb = cls.length, cls.prev_len, cls.cur_off, cls.cur_len
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(H,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # flat
            pl.BlockSpec(memory_space=pltpu.ANY),  # prev accumulator
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((C, La), jnp.float32),
            pltpu.VMEM((C, Lb), jnp.float32),
            pltpu.VMEM((C, L), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    from functools import partial

    kernel = partial(_ola_kernel, C=C, L=L, La=La, j0=j0, Lb=Lb)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_a, src_b, dst, flat, out)
