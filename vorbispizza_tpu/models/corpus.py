"""Corpus decode: many streams through one chip with host/device overlap.

The BASELINE "1k-file corpus" configuration. Per-stream host front ends
(Ogg demux + C++ entropy decode, which releases the GIL) run on a thread
pool while the main thread dispatches the fused device program for streams
as they become ready — device dispatch is asynchronous, so transfers and
synthesis of stream k overlap the front end of stream k+1.

Streams produced by the same encoder settings share a parsed setup
(header.parse_setup_cached) and therefore one BatchSynthesizer and its
compiled programs (shapes are quantized in pipeline.assemble).
"""

from __future__ import annotations

import concurrent.futures as cf
import io
import threading

import numpy as np

from ..decoder import CLIP_MAX, StreamDecoder
from ..frames import (
    BatchUnsupported,
    BucketBatch,
    FloorGroup,
    FramePlan,
    SymBucket,
    build_plan,
    extract_batch,
)
from ..ogg.container import OggContainer
from .pipeline import BatchSynthesizer


_SYNTH_CACHE: dict = {}
_SYNTH_LOCK = threading.Lock()
_SYNTH_CACHE_MAX = 32


def _synthesizer_for(setup, channels: int) -> BatchSynthesizer:
    """Process-wide BatchSynthesizer cache keyed on channel count; every
    setup that flows through registers with the synthesizer (buckets name
    their setup via key.sid), so heterogeneous corpora share ONE
    synthesizer and its jitted-program cache per channel count — retracing
    per decode_corpus call costs seconds per program load on a remote
    accelerator, and cross-setup merged chunks need one synthesizer that
    knows every member setup."""
    with _SYNTH_LOCK:
        synth = _SYNTH_CACHE.get(channels)
        if synth is None:
            synth = BatchSynthesizer(setup, channels)
            if len(_SYNTH_CACHE) >= _SYNTH_CACHE_MAX:
                _SYNTH_CACHE.pop(next(iter(_SYNTH_CACHE)))
            _SYNTH_CACHE[channels] = synth
        else:
            synth.add_setup(setup)
        return synth


def _front_end_native(data: bytes):
    """All-native front end: C++ Ogg scan -> raw arrays -> vectorized plan
    -> C++ entropy decode over zero-copy spans. No per-packet Python
    objects or byte copies anywhere on this path. Returns None when the
    native path cannot model the stream (Python fallback)."""
    from .. import native
    from ..config import VorbisConfig
    from ..frames import build_plan_from_scan
    from ..setup.header import parse_comments, parse_ident, parse_setup_cached

    if not VorbisConfig.default.use_native_frontend or not native.available():
        return None
    res = native.scan_ogg_arrays(data)
    if res is None or len(res[1]) < 4:
        return None
    blob, offs, granules, flags, _serial = res
    try:
        ident = parse_ident(blob[offs[0] : offs[1]].tobytes())
        parse_comments(blob[offs[1] : offs[2]].tobytes())
        setup = parse_setup_cached(blob[offs[2] : offs[3]].tobytes(), ident)
        plan = build_plan_from_scan(blob, offs, granules, flags, setup)
    except BatchUnsupported:
        raise
    except Exception:
        return None  # headers the scanner mis-modeled: use the full path
    buckets = extract_batch(plan, setup, ident.channels, ident=ident)
    return setup, ident.channels, plan, buckets


def _front_end(source):
    if isinstance(source, (bytes, bytearray)):
        data = bytes(source)
    else:
        with open(source, "rb") as f:
            data = f.read()
    fast = _front_end_native(data)
    if fast is not None:
        return fast
    container = OggContainer(io.BytesIO(data))
    if not container.try_init():
        # typed per the reference's InvalidDataException contract so
        # corpus on_error policies can isolate the file
        from ..errors import InvalidDataError

        raise InvalidDataError("no logical stream found")
    provider = container.providers[0]
    dec = StreamDecoder(provider)
    dec.initialize()
    plan = build_plan(provider, dec._setup)
    buckets = extract_batch(plan, dec._setup, dec.channels, ident=dec._ident)
    return dec._setup, dec.channels, plan, buckets


def merge_streams(items):
    """Merge per-stream (plan, buckets) into ONE plan + bucket set.

    Frames from different streams are independent, so they concatenate
    along the frame axis; each stream gets a disjoint global-coordinate
    range (coordinate shift) and its chains stay self-contained. The whole
    corpus then decodes as a single fused device program — one execution and
    three host->device copies TOTAL, which matters when per-call latency to
    the accelerator is non-trivial.

    All streams must share the channel count (callers group by it) but NOT
    the setup: bucket keys carry their setup identity (BucketKey.sid), so
    buckets from different setups coexist as separate buckets of one
    merged plan and one fused program (the synthesizer resolves each
    bucket's mode/window/codebook statics through key.sid).
    Returns (plan, buckets, pcm_lengths)."""
    from ..frames import FrameSoA

    soa_parts: list = []
    n_frames = 0
    chains: list[list[int]] = []
    chain_segments: list[list[tuple[int, int]]] = []
    merged: dict = {}
    pcm_lengths: list[int] = []
    coord_base = 0
    for plan, buckets in items:
        frame_base = n_frames
        soa_parts.append((plan.soa(), coord_base))
        n_frames += plan.n_frames
        for chain in plan.chains:
            chains.append([i + frame_base for i in chain])
        for segs in plan.chain_segments:
            chain_segments.append(
                [(s + coord_base, e + coord_base) for s, e in segs]
            )
        for b in buckets:
            merged.setdefault(b.key, []).append((b, frame_base, coord_base))
        pcm_lengths.append(plan.pcm_length)
        coord_base += plan.total_len
    soa_m = FrameSoA(
        n=np.concatenate([s.n for s, _ in soa_parts]),
        left_start=np.concatenate([s.left_start for s, _ in soa_parts]),
        left_end=np.concatenate([s.left_end for s, _ in soa_parts]),
        right_end=np.concatenate([s.right_end for s, _ in soa_parts]),
        offset=np.concatenate([s.offset + cb for s, cb in soa_parts]),
        prime=np.concatenate([s.prime for s, _ in soa_parts]),
        final=np.concatenate([s.final for s, _ in soa_parts]),
    )

    out_buckets: list[BucketBatch] = []
    for key, parts in merged.items():
        first = parts[0][0]
        groups: list[FloorGroup] = []
        for gi, g0 in enumerate(first.floor_groups):
            g = FloorGroup(floor=g0.floor, channels=list(g0.channels))
            g.used = np.concatenate([p[0].floor_groups[gi].used for p in parts])
            if g0.floor.floor_type == 1:
                g.posts = np.concatenate(
                    [p[0].floor_groups[gi].posts for p in parts]
                )
                g.step2 = np.concatenate(
                    [p[0].floor_groups[gi].step2 for p in parts]
                )
                if all(
                    p[0].floor_groups[gi].ys is not None for p in parts
                ):
                    g.ys = np.concatenate(
                        [p[0].floor_groups[gi].ys for p in parts]
                    )
            else:
                g.coefficients = np.concatenate(
                    [p[0].floor_groups[gi].coefficients for p in parts]
                )
                g.amplitude = np.concatenate(
                    [p[0].floor_groups[gi].amplitude for p in parts]
                )
            groups.append(g)
        sym = None
        if first.sym is not None:
            # symbol payloads merge by frame-axis concatenation: per-group
            # streams stay in frame order, so the scatter indices derived
            # from part_counts + slots (ops/residue_sym.py) keep matching
            sym = SymBucket(
                layout=first.sym.layout,
                groups=first.sym.groups,
                syms=[
                    np.concatenate([p[0].sym.syms[gi] for p in parts])
                    for gi in range(len(first.sym.syms))
                ],
                slots=[
                    np.concatenate([p[0].sym.slots[gi] for p in parts])
                    for gi in range(len(first.sym.slots))
                ],
                part_counts=np.concatenate(
                    [p[0].sym.part_counts for p in parts]
                ),
            )
        out_buckets.append(
            BucketBatch(
                key=key,
                n=first.n,
                frame_indices=np.concatenate(
                    [b.frame_indices + fb for b, fb, _ in parts]
                ),
                offsets=np.concatenate(
                    [b.offsets + np.int32(cb) for b, _, cb in parts]
                ),
                prime=np.concatenate([b.prime for b, _, _ in parts]),
                final=np.concatenate([b.final for b, _, _ in parts]),
                residues=(
                    np.concatenate([b.residues for b, _, _ in parts])
                    if first.residues is not None
                    else None
                ),
                floor_groups=groups,
                sym=sym,
            )
        )
    plan_m = FramePlan(
        frames=[],  # merged plans are pure struct-of-arrays (soa_cache)
        total_len=max(coord_base, 1),
        chains=chains,
        chain_segments=chain_segments,
        buckets={b.key: list(b.frame_indices) for b in out_buckets},
        soa_cache=soa_m,
    )
    return plan_m, out_buckets, pcm_lengths


def _scalar_fallback(source, output: str, clip_samples: bool):
    """Exact streaming decode of one source (BatchUnsupported streams)."""
    import jax.numpy as jnp

    from ..reader import VorbisReader

    r = VorbisReader(
        source if isinstance(source, (str, bytes)) else bytes(source),
        clip_samples=clip_samples,
    )
    r.initialize()
    pcm = r.read_all(planar=True)
    if output == "s16":
        return np.clip(
            np.rint(pcm.astype(np.float64) * 32768.0), -32768, 32767
        ).astype(np.int16)
    if output == "device":
        return jnp.asarray(pcm)
    return pcm


def decode_corpus(
    sources,
    *,
    n_workers: int | None = None,
    clip_samples: bool = True,
    output: str = "f32",
    batched: bool = True,
    max_batch_bytes: int | None = None,
    devices=None,
    timer=None,
    on_error: str = "raise",
):
    """Decode many Ogg Vorbis sources (paths or bytes) -> list of planar
    PCM arrays, in input order.

    ``on_error``: what a MALFORMED source (VorbisError: bad headers,
    truncated setup, junk) does to the corpus. "raise" (default)
    propagates the first file's error — the per-file contract of the
    streaming API (reference InvalidDataException). "none" isolates
    failures production-style: the failed file's slot is None and every
    other file still decodes. Infrastructure errors (device loss, OOM)
    always propagate.

    ``output``:
      "f32"    — numpy float32 [C, samples] on host (clipped per
                 ``clip_samples``)
      "s16"    — numpy int16 [C, samples] on host (device-side quantize,
                 libvorbisfile ov_read-compatible; halves the transfer)
      "device" — leave PCM on device (jax f32 arrays in HBM) for
                 downstream TPU consumers (feature extraction, ASR, ...)

    ``batched``: merge streams sharing a setup config into fused device
    executions (merge_streams) — minimizes per-call accelerator latency.
    Merged transfers are capped at ``max_batch_bytes`` of residue data per
    execution: interconnects tend to have both a per-call latency floor
    (punishes many small transfers) and degraded throughput on very large
    single buffers, so mid-size batches win.

    ``devices``: a list of jax devices to round-robin merged executions
    over (stream-level data parallelism across chips; each chunk runs
    whole on one chip — no cross-chip dependencies exist between streams).

    ``timer``: an optional utils.profiling.DecodeTimer accumulating
    wall-clock per stage (front_end, merge, prepare, dispatch, collect) —
    the stage-attribution surface used by bench.py.

    Pipelining: front ends run on a thread pool; merged chunks are packed
    and DISPATCHED as soon as enough streams of one setup group complete
    (device transfers and execution are asynchronous, so chunk k's
    host->device copies and compute overlap chunk k+1's front end), and
    device->host copies start immediately after dispatch so they share the
    interconnect with later chunks instead of serializing at the end.

    Degradation note: a stream the batch planner rejects falls back to the
    float64 scalar decoder, whose s16 quantization can differ from the
    device-f32 batch path by ±1 LSB (the underlying f32 PCM differs at
    ~2e-7, which can flip a rounding decision) — a partially-degraded
    corpus is correct but not bit-stable against the all-batched output.
    """
    import contextlib

    from ..config import VorbisConfig

    cfg = VorbisConfig.default
    if n_workers is None:
        n_workers = cfg.corpus_workers
    if max_batch_bytes is None:
        max_batch_bytes = cfg.corpus_batch_bytes
    if output == "s16":
        fmt = {"dpack": "s16d", "planes": "s16p", "raw": "s16"}.get(
            cfg.s16_wire, "s16d"
        )
    else:
        fmt = "f32"

    class _NullTimer:
        @contextlib.contextmanager
        def stage(self, name):
            yield

        def count(self, name, value):
            pass

        def mark(self, name):
            pass

    t = timer if timer is not None else _NullTimer()
    if not hasattr(t, "mark"):  # older DecodeTimer-shaped objects:
        # wrap rather than mutate the caller's instance (slotted/frozen
        # timer types would reject the attribute anyway)
        class _MarkAdapter:
            def __init__(self, inner):
                self._inner = inner

            def __getattr__(self, name):
                return getattr(self._inner, name)

            def mark(self, name):
                pass

        t = _MarkAdapter(t)

    pulled_bytes = [0]
    _pull_lock = threading.Lock()

    def finish(arr, retry=None, cid=None, synth=None):
        if output == "device":
            return arr
        if output == "s16":
            if isinstance(arr, tuple) and arr[0] == "dpack":
                from ..ops.pcm_pack import (
                    PackOverflow,
                    pull_wire,
                    unpack_pcm,
                    wire_rows,
                )

                for attempt in (0, 1):
                    _, buf, nbt, out_len, total = arr[:5]
                    C = nbt // wire_rows(out_len)  # nbt = C * rows(L)
                    page0 = arr[5] if len(arr) > 5 else None
                    try:
                        t.mark(f"c{cid}.pull_wait")
                        # the LOCK is taken outside the stage: pulls
                        # serialize across collector threads, so with
                        # lock-wait excluded the stage sums to the true
                        # link occupancy (bench derives the per-rep
                        # transfer ceiling from it); wrapped the other
                        # way, three waiting threads count the same
                        # seconds three times (measured fraction 2.1)
                        with _pull_lock, t.stage("collect_pull"):
                            t.mark(f"c{cid}.pull0")
                            # the first page carries [nbytes][widx] +
                            # payload head (fixed-shape pages: no
                            # per-length device programs). Pulls are
                            # SERIALIZED across collector workers: the
                            # link is one pipe, and concurrent transfers
                            # thrash it — one full-bandwidth pull at a
                            # time while other workers unpack.
                            # (pulled_bytes increments ride the same
                            # lock: up to 3 collector threads run
                            # finish().)
                            moved = [0]
                            nb, wtab, cuts, data = pull_wire(
                                buf, nbt, C, page0, moved_out=moved
                            )
                            # actual page bytes (padding included): the
                            # hint-sized first page may overshoot the
                            # true payload, and those bytes cross the
                            # link whether or not they carry audio
                            pulled_bytes[0] += moved[0]
                        t.mark(f"c{cid}.pull_done")
                        if synth is not None and total > 0:
                            # teach the dispatch-side wire-size predictor
                            # this content family's payload/raw ratio
                            obs = nb / (total * C * 2)
                            old = getattr(synth, "_wire_ratio", None)
                            synth._wire_ratio = (
                                obs if old is None
                                else 0.7 * old + 0.3 * obs
                            )
                        break
                    except PackOverflow:
                        # soft-cap wire overflowed (near-incompressible
                        # PCM): re-run this chunk once with the full-cap
                        # pack program — wire bytes are identical
                        if retry is None or attempt:
                            raise
                        with t.stage("repack_full"):
                            arr = retry()
                with t.stage("collect_unpack"):
                    return unpack_pcm(data, wtab, C, out_len, cuts)[
                        :, :total
                    ]
            with _pull_lock:
                host = np.asarray(arr)
                pulled_bytes[0] += host.nbytes
            if host.ndim == 3:
                # byte planes [2, C, L] u8 -> int16, losslessly
                pcm = ((host[1].astype(np.int32) << 8) | host[0]) - 32768
                return pcm.astype(np.int16)
            return host
        with _pull_lock:
            pcm = np.array(arr, dtype=np.float32)
            pulled_bytes[0] += pcm.nbytes
        if clip_samples:
            np.clip(pcm, -CLIP_MAX, CLIP_MAX, out=pcm)
        return pcm

    from ..errors import VorbisError

    if on_error not in ("raise", "none"):
        raise ValueError(f"on_error must be 'raise' or 'none', got {on_error!r}")

    _FAILED = object()  # per-file failure sentinel (on_error="none")

    def front_end_or_none(source):
        # plan building can itself reject a stream (e.g. a granule cut past
        # an earlier cut on trimmed/malformed input); that stream must fall
        # back to the scalar path, not abort the whole corpus
        try:
            return _front_end(source)
        except BatchUnsupported:
            return None
        except VorbisError:
            if on_error == "raise":
                raise
            return _FAILED

    def scalar_or_failed(i):
        # the scalar anchor is the last resort for a batch-rejected
        # stream; a MALFORMED file fails here too and must not take the
        # corpus down under on_error="none"
        try:
            return _scalar_fallback(sources[i], output, clip_samples)
        except VorbisError:
            if on_error == "raise":
                raise
            return None

    outs = [None] * len(sources)
    if not batched:
        with cf.ThreadPoolExecutor(max_workers=n_workers) as pool:
            fronts = list(pool.map(front_end_or_none, sources))
        for i, front in enumerate(fronts):
            if front is _FAILED:
                continue  # on_error="none": slot stays None
            if front is None:
                outs[i] = scalar_or_failed(i)
                continue
            setup, channels, plan, buckets = front
            synth = _synthesizer_for(setup, channels)
            try:
                retry = (
                    (
                        lambda p=plan, b=buckets, s=synth: s.assemble(
                            p, b, output="s16df"
                        )
                    )
                    if fmt == "s16d"
                    else None
                )
                outs[i] = finish(
                    synth.assemble(plan, buckets, output=fmt),
                    retry,
                    synth=synth,
                )
            except BatchUnsupported:
                outs[i] = scalar_or_failed(i)
        return outs

    # Batched path: accumulate per-channel-count groups as front ends
    # complete; pack + DISPATCH a merged chunk the moment a group reaches
    # the transfer sweet spot, so transfers/compute pipeline behind the
    # remaining front ends. A small collector pool pulls + unpacks each
    # chunk's PCM as soon as its execution drains, so device->host bytes
    # and host unpack ride BEHIND later chunks' execution instead of
    # serializing at the end (per-pull latency on remote links makes the
    # serial version cost far more than its bytes).
    pending: list = []
    n_dispatched = 0
    collect_pool = cf.ThreadPoolExecutor(max_workers=3)
    # merge/prepare/dispatch run on ONE dedicated thread, in submission
    # order (chunk composition stays deterministic): the main loop keeps
    # consuming front-end futures while chunk k's prepare blocks on
    # device_put staging over a high-latency link — without this, every
    # chunk's h2d serializes against the remaining front ends
    dispatch_pool = cf.ThreadPoolExecutor(max_workers=1)
    dispatch_futs: list = []

    def dispatch(chunk, fronts_by_idx):
        nonlocal n_dispatched
        cid = n_dispatched
        t.mark(f"c{cid}.merge0")
        setup, channels = fronts_by_idx[chunk[0]][:2]
        synth = _synthesizer_for(setup, channels)
        for i in chunk[1:]:  # cross-setup chunk: register every setup
            synth.add_setup(fronts_by_idx[i][0])
        with t.stage("merge"):
            plan_m, buckets_m, pcm_lengths = merge_streams(
                [fronts_by_idx[i][2:4] for i in chunk]
            )
        for i in chunk:
            # merged copies exist now: release the per-stream plan/bucket
            # arrays so corpus memory stays bounded by chunk size
            del fronts_by_idx[i]
        if plan_m.n_frames == 0:
            # a chunk with no decodable audio frames at all (e.g. every
            # audio page of a corrupt member rejected, or a headers-only
            # stream): there is no fused program over an empty frame set;
            # the scalar anchor is authoritative for degenerate streams
            # (found by tools/fuzz corpus trials, seed 61010). Claim the
            # cid anyway so the next chunk's timeline marks stay unique.
            n_dispatched += 1
            for i in chunk:
                outs[i] = scalar_or_failed(i)
            return
        dev = devices[n_dispatched % len(devices)] if devices else None
        n_dispatched += 1
        try:
            with t.stage("prepare"):
                args = synth.prepare(plan_m, buckets_m, fmt, device=dev)
            t.count(
                "h2d_bytes",
                sum(int(a.size) * a.dtype.itemsize for a in args[1]),
            )
            t.mark(f"c{cid}.dispatch0")
            with t.stage("dispatch"):
                # async: the chunk is in flight before any d2h completes
                merged_out = synth.run(*args)
            t.mark(f"c{cid}.dispatched")
        except BatchUnsupported:
            # stream shapes the batch planner cannot model: decode each
            # stream of this chunk with the scalar anchor instead
            for i in chunk:
                outs[i] = scalar_or_failed(i)
            return
        fut = None
        if output != "device":
            if isinstance(merged_out, tuple):
                from ..ops.pcm_pack import start_page0, wire_header_bytes

                # launch the wire's first page now, sized to cover the
                # WHOLE predicted wire: its async copy streams behind
                # this chunk's execution, so by collect time the data has
                # usually LANDED and the pull costs ~1 ms instead of a
                # header round trip + a remainder round trip whose async
                # copy can only launch at collect time (measured
                # 2026-08-19, tools/pull_anatomy.py: hot corpus-shaped
                # pull 150-220 ms vs 1.2 ms once the copy has landed).
                # The payload size is content-dependent and only known on
                # device, so the hint is a learned per-synthesizer
                # payload/raw ratio (EWMA, updated in finish) with +2%
                # margin. The margin is deliberately THIN: an undershoot
                # falls back to the exact-sized 256 KB-quantized
                # remainder page (latency the pipeline overlaps), while
                # overshoot bytes cross the link for nothing — a +15%
                # margin measured ~3 MB of padding per 480 s corpus
                # (d2h 18.6 vs ~15.6 MB payload), and on this link bytes,
                # not round trips, are the budget (overlap hides latency,
                # not bytes). The honest d2h counter (pull_wire
                # moved_out) reports every page byte either way.
                fmt_nbt = merged_out[2]
                _hdr = wire_header_bytes(synth.channels)
                _ratio = getattr(synth, "_wire_ratio", None)
                _r = 0.34 if _ratio is None else min(
                    max(_ratio * 1.02, 0.02), 1.3
                )
                merged_out = merged_out + (
                    start_page0(
                        merged_out[1],
                        _hdr
                        + fmt_nbt
                        + int(_r * merged_out[4] * synth.channels * 2),
                    ),
                )

                def rerun_full(chunk=chunk, dev=dev):
                    # soft-cap overflow path: re-front-end this chunk's
                    # streams (their merged plan was released after
                    # dispatch) and re-run with the full-capacity pack.
                    # Chunk composition is deterministic, so the merged
                    # plan — and therefore the wire bytes — are identical.
                    fronts2 = [_front_end(sources[i]) for i in chunk]
                    synth2 = _synthesizer_for(fronts2[0][0], fronts2[0][1])
                    for f2 in fronts2[1:]:
                        synth2.add_setup(f2[0])
                    plan2, buckets2, _ = merge_streams(
                        [f2[2:4] for f2 in fronts2]
                    )
                    args2 = synth2.prepare(
                        plan2, buckets2, "s16df", device=dev
                    )
                    out2 = synth2.run(*args2)
                    return out2 + (start_page0(out2[1]),)

                fut = collect_pool.submit(
                    finish, merged_out, rerun_full, cid, synth
                )
            else:
                try:
                    merged_out.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
                fut = collect_pool.submit(finish, merged_out, None, cid)
        pending.append((chunk, pcm_lengths, merged_out, fut))

    fronts_by_idx: dict = {}
    acc: dict = {}  # channels -> [indices, residue_bytes]
    with t.stage("front_end"):
        with cf.ThreadPoolExecutor(max_workers=n_workers) as pool:
            futs = [pool.submit(front_end_or_none, src) for src in sources]
            # consume in SUBMISSION order (later futures keep computing in
            # the pool): chunk composition stays deterministic, so merged
            # shapes and per-stream output slices hit the jit caches on
            # repeated corpora instead of recompiling every run
            for i, fut in enumerate(futs):
                front = fut.result()
                if front is _FAILED:
                    continue  # on_error="none": slot stays None
                if front is None:
                    outs[i] = scalar_or_failed(i)
                    continue
                fronts_by_idx[i] = front
                # chunks group by CHANNEL COUNT only: buckets carry their
                # setup identity (key.sid), so streams of different setups
                # merge into one chunk / one fused program (heterogeneous
                # corpora would otherwise fragment into one program family
                # and one undersized chunk sequence per encoder setting)
                key = front[1]
                rec = acc.setdefault(key, [[], 0])
                rec[0].append(i)
                rec[1] += sum(b.batch_cost for b in front[3])
                if rec[1] >= max_batch_bytes:
                    dispatch_futs.append(
                        dispatch_pool.submit(
                            dispatch, sorted(rec[0]), fronts_by_idx
                        )
                    )
                    acc[key] = [[], 0]
    for key, (idxs, nbytes) in acc.items():
        if idxs:
            dispatch_futs.append(
                dispatch_pool.submit(dispatch, sorted(idxs), fronts_by_idx)
            )

    with t.stage("collect"):
        try:
            for f in dispatch_futs:
                f.result()  # ordered drain; propagates dispatch errors
            for chunk, pcm_lengths, merged_out, fut in pending:
                if output == "device":
                    c = 0
                    for i, ln in zip(chunk, pcm_lengths):
                        outs[i] = merged_out[:, c : c + ln]
                        c += ln
                else:
                    host = fut.result()
                    c = 0
                    for i, ln in zip(chunk, pcm_lengths):
                        outs[i] = host[:, c : c + ln]
                        c += ln
        finally:
            # a fut.result() exception must not leak the pools (in-flight
            # dispatches/pulls would keep running after decode_corpus
            # raises)
            dispatch_pool.shutdown(wait=True)
            collect_pool.shutdown(wait=True)
        t.count("d2h_bytes", pulled_bytes[0])
    return outs
