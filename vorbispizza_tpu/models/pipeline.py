"""TPU batch decode pipeline: fused per-bucket synthesis + scatter-add OLA.

The flagship compute path of the framework. The host front end (frames.py)
emits dense per-bucket tensors; everything from there to PCM runs on device
as one XLA program per bucket:

    floor curves (ops/floor) -> coupling inverse (ops/coupling)
    -> spectrum = residue * floor -> IMDCT + window (ops/imdct, MXU matmul)
    -> priming/final masks -> scatter-add OLA (ops/ola) -> segment slice

Replaces the reference's serial packet loop + per-channel IMDCT + lapping
(NVorbis/StreamDecoder.cs:640-791) with frame-parallel device math; the
scalar decoder (decoder.py) is the behavioral anchor it is tested against.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..decoder import StreamDecoder, CLIP_MAX
from ..dsp.window import full_window
from ..frames import BatchUnsupported, BucketBatch, FramePlan, build_plan, extract_batch
from ..ogg.container import OggContainer
from ..ops.coupling import inverse_couple_batch
from ..ops.floor import floor0_curves, floor1_curves
from ..ops.imdct import imdct_window_batch
from ..ops.ola import build_gather_plan, gather_assemble
from ..setup.mode import window_geometry


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class BatchSynthesizer:
    """Per-stream-setup device synthesis. Bucket functions are jitted once
    per (bucket key, padded frame count) and cached."""

    def __init__(self, setup, channels: int):
        self.setup = setup
        self.channels = channels
        self._fns: dict = {}

    # -- one bucket: [F, C, half] tensors -> [F, C, n] windowed frames ----------

    def _bucket_fn(self, key):
        cached = self._fns.get(key)
        if cached is not None:
            return cached
        mode = self.setup.modes[key.mode_idx]
        mapping = self.setup.mappings[mode.mapping_idx]
        n = mode.n
        half = n // 2
        center = n // 2
        info = window_geometry(
            mode.blocksizes, mode.block_flag, key.prev_flag, key.next_flag
        )
        window = full_window(
            info.n, info.left_start, info.left_end, info.right_start, info.right_end
        ).astype(np.float32)
        coupling_steps = tuple(mapping.coupling_steps)

        def fn(residues, prime, final, floor_inputs, group_meta=None):
            F = residues.shape[0]
            # floor curves per channel group, then reassemble channel order
            parts = []
            chan_order = []
            for meta, inp in zip(group_meta, floor_inputs):
                nc = len(meta["channels"])
                chan_order.extend(meta["channels"])
                if meta["type"] == 1:
                    curves = floor1_curves(
                        inp["posts"].reshape(F * nc, -1),
                        inp["step2"].reshape(F * nc, -1),
                        inp["used"].reshape(F * nc),
                        xs=meta["xs"],
                        multiplier=meta["multiplier"],
                        half=half,
                    )
                else:
                    curves = floor0_curves(
                        inp["coefficients"].reshape(F * nc, -1),
                        inp["amplitude"].reshape(F * nc),
                        inp["used"].reshape(F * nc),
                        order=meta["order"],
                        bark_map=meta["bark_map"],
                        bark_map_size=meta["bark_map_size"],
                        amplitude_bits=meta["amplitude_bits"],
                        amplitude_offset=meta["amplitude_offset"],
                    )
                parts.append(curves.reshape(F, nc, half))
            floors = jnp.concatenate(parts, axis=1)
            inv = np.argsort(np.asarray(chan_order))
            floors = floors[:, inv, :]

            res = inverse_couple_batch(residues, coupling_steps)
            spectra = res * floors
            frames = imdct_window_batch(spectra, jnp.asarray(window))

            j = jnp.arange(n, dtype=jnp.int32)[None, :]
            keep = jnp.where(prime[:, None], j >= center, True) & jnp.where(
                final[:, None], j < center, True
            )
            return frames * keep[:, None, :].astype(frames.dtype)

        jitted = jax.jit(fn, static_argnames=("group_meta",))
        self._fns[key] = jitted
        return jitted

    @staticmethod
    def _group_meta(bucket: BucketBatch):
        metas = []
        inputs = []
        for g in bucket.floor_groups:
            if g.floor.floor_type == 1:
                metas.append(
                    dict_frozen(
                        type=1,
                        channels=tuple(g.channels),
                        xs=tuple(int(x) for x in g.floor.xs),
                        multiplier=g.floor.multiplier,
                    )
                )
                inputs.append(
                    {"posts": g.posts, "step2": g.step2, "used": g.used}
                )
            else:
                metas.append(
                    dict_frozen(
                        type=0,
                        channels=tuple(g.channels),
                        order=g.floor.order,
                        bark_map=tuple(int(v) for v in g.floor._maps[bucket.n]),
                        bark_map_size=g.floor.bark_map_size,
                        amplitude_bits=g.floor.amplitude_bits,
                        amplitude_offset=g.floor.amplitude_offset,
                    )
                )
                inputs.append(
                    {
                        "coefficients": g.coefficients,
                        "amplitude": g.amplitude,
                        "used": g.used,
                    }
                )
        return tuple(metas), inputs

    def synth_bucket(self, bucket: BucketBatch):
        """Windowed frames [Fp, C, n] for one bucket; rows are padded up to a
        multiple of 64 (zero contributions, never gathered)."""
        metas, inputs = self._group_meta(bucket)
        F = bucket.residues.shape[0]
        Fp = _round_up(max(F, 1), 64)
        pad = Fp - F

        def p(a):
            if pad == 0:
                return a
            width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, width)

        residues = p(bucket.residues)
        prime = p(bucket.prime)
        final = p(bucket.final)
        floor_inputs = tuple(
            {k: p(v) for k, v in inp.items()} for inp in inputs
        )
        fn = self._bucket_fn(bucket.key)
        return fn(residues, prime, final, floor_inputs, group_meta=metas)

    # -- full stream --------------------------------------------------------------

    def assemble(self, plan: FramePlan, buckets: list[BucketBatch]) -> jax.Array:
        """Synthesize all buckets, then gather-assemble the PCM -> [C, pcm].

        Overlap-add is realised as two gathers per output sample
        (ops/ola.build_gather_plan) — no scatter, no accumulator."""
        n_frames = len(plan.frames)
        flat_base = np.zeros(n_frames, dtype=np.int64)
        # nonzero support of each windowed frame: [left_start, right_end),
        # narrowed to [center, ...) for priming frames and [..., center) for
        # chain-final frames (their outer halves are masked to zero)
        sup_start = np.empty(n_frames, dtype=np.int64)
        sup_end = np.empty(n_frames, dtype=np.int64)
        for i, fr in enumerate(plan.frames):
            c = fr.info.n // 2
            sup_start[i] = c if fr.prime else fr.info.left_start
            sup_end[i] = c if fr.final else fr.info.right_end
        offsets = np.array([fr.offset for fr in plan.frames], dtype=np.int64)
        offsets_eff = offsets + sup_start
        sizes_eff = np.maximum(sup_end - sup_start, 0)
        flats = []
        base = 0
        for bucket in buckets:
            frames = self.synth_bucket(bucket)  # [Fp, C, n]
            Fp, C, n = frames.shape
            flats.append(frames.transpose(1, 0, 2).reshape(C, Fp * n))
            flat_base[bucket.frame_indices] = base + np.arange(
                len(bucket.frame_indices), dtype=np.int64
            ) * n
            base += Fp * n
        if not flats:
            return jnp.zeros((self.channels, 0), dtype=jnp.float32)
        flat = jnp.concatenate(flats, axis=1)

        idx_parts = []
        for chain, segments in zip(plan.chains, plan.chain_segments):
            ch = np.asarray(chain, dtype=np.int64)
            idx_parts.append(
                build_gather_plan(
                    offsets_eff[ch],
                    sizes_eff[ch],
                    flat_base[ch] + sup_start[ch],
                    segments,
                )
            )
        if not idx_parts:
            return flat[:, :0]
        a_idx = np.concatenate([p[0] for p in idx_parts])
        b_idx = np.concatenate([p[1] for p in idx_parts])
        b_valid = np.concatenate([p[2] for p in idx_parts])
        a_valid = np.concatenate([p[3] for p in idx_parts])
        return gather_assemble(
            flat,
            jnp.asarray(a_idx),
            jnp.asarray(b_idx),
            jnp.asarray(b_valid),
            jnp.asarray(a_valid),
        )


class _FrozenMeta(tuple):
    """Hashable static metadata for jit (a tuple of sorted key/value pairs
    exposing dict-style item access)."""

    def __getitem__(self, key):
        if isinstance(key, str):
            for k, v in tuple.__iter__(self):
                if k == key:
                    return v
            raise KeyError(key)
        return tuple.__getitem__(self, key)


def dict_frozen(**kwargs) -> _FrozenMeta:
    return _FrozenMeta(sorted(kwargs.items()))


# -- stream-level drivers -----------------------------------------------------------


def decode_stream_batch(provider, *, clip_samples: bool = True) -> np.ndarray:
    """Decode one logical stream entirely through the batch pipeline.

    Returns planar float32 PCM [channels, samples]. Raises BatchUnsupported
    for stream shapes the planner does not model (callers fall back to the
    scalar StreamDecoder)."""
    dec = StreamDecoder(provider)
    dec.initialize()
    setup = dec._setup
    plan = build_plan(provider, setup)
    buckets = extract_batch(plan, setup, dec.channels)
    synth = BatchSynthesizer(setup, dec.channels)
    pcm = np.array(synth.assemble(plan, buckets), dtype=np.float32)
    if clip_samples:
        np.clip(pcm, -CLIP_MAX, CLIP_MAX, out=pcm)
    return pcm


def decode_file_batch(source, *, clip_samples: bool = True) -> np.ndarray:
    """Open an Ogg file/stream and batch-decode its first Vorbis stream."""
    import io

    if isinstance(source, (str, bytes, bytearray)) and not isinstance(source, str):
        f = io.BytesIO(source)
    elif isinstance(source, str):
        f = open(source, "rb")
    else:
        f = source
    try:
        container = OggContainer(f)
        if not container.try_init():
            raise BatchUnsupported("no logical stream found")
        provider = container.providers[0]
        return decode_stream_batch(provider, clip_samples=clip_samples)
    finally:
        if isinstance(source, (str, bytes, bytearray)):
            f.close()
