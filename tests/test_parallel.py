"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the ('stream', 'frame')-sharded decode step — including the
ppermute halo exchange for the overlap-add boundary — produces exactly the
same PCM as the unsharded ops pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorbispizza_tpu.dsp.window import full_window
from vorbispizza_tpu.ops.coupling import inverse_couple_batch
from vorbispizza_tpu.ops.floor import floor1_curves
from vorbispizza_tpu.ops.imdct import imdct_window_batch
from vorbispizza_tpu.parallel.mesh import make_mesh, shard_inputs, sharded_decode_step

N = 256
C = 2
XS = (0, 128, 16, 32, 64, 96, 192)  # valid floor1 X list (0 and 1<<rangebits first)
MULT = 2
STEPS = ((0, 1),)


def _random_inputs(rng, S, F):
    P = len(XS)
    residues = rng.standard_normal((S, F, C, N // 2)).astype(np.float32)
    posts = rng.integers(0, 128, size=(S, F, C, P)).astype(np.int32)
    step2 = rng.random((S, F, C, P)) < 0.7
    step2[..., :2] = True
    used = rng.random((S, F, C)) < 0.9
    return residues, posts, step2, used


def _reference(residues, posts, step2, used):
    """Unsharded computation with the same ops + numpy overlap-add."""
    S, F, _, half = residues.shape
    window = full_window(N, 0, N // 2, N // 2, N).astype(np.float32)
    P = len(XS)
    curves = np.asarray(
        floor1_curves(
            posts.reshape(-1, P), step2.reshape(-1, P), used.reshape(-1),
            xs=XS, multiplier=MULT, half=half,
        )
    ).reshape(S, F, C, half)
    res = np.asarray(
        inverse_couple_batch(residues.reshape(S * F, C, half), STEPS)
    ).reshape(S, F, C, half)
    frames = np.asarray(
        imdct_window_batch(jnp.asarray(res * curves), jnp.asarray(window))
    )
    pcm = np.zeros((S, F * half, C), dtype=np.float32)
    for f in range(F):
        prev = frames[:, f - 1, :, half:] if f > 0 else 0.0
        hop = prev + frames[:, f, :, :half]
        pcm[:, f * half : (f + 1) * half] = np.transpose(hop, (0, 2, 1))
    return np.clip(pcm, -0.99999994, 0.99999994)


@pytest.mark.parametrize("n_devices", [8, 4])
def test_sharded_step_matches_unsharded(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough virtual devices")
    mesh = make_mesh(n_devices)
    S = mesh.shape["stream"] * 2
    F = mesh.shape["frame"] * 4
    rng = np.random.default_rng(42)
    residues, posts, step2, used = _random_inputs(rng, S, F)
    window = full_window(N, 0, N // 2, N // 2, N)
    step = sharded_decode_step(
        mesh, n=N, channels=C, xs=XS, multiplier=MULT,
        coupling_steps=STEPS, window=window,
    )
    args = shard_inputs(mesh, residues, posts, step2, used)
    pcm, has_clipped = step(*args)
    ref = _reference(residues, posts, step2, used)
    assert np.asarray(pcm).shape == ref.shape
    np.testing.assert_allclose(np.asarray(pcm), ref, atol=2e-6)
    assert bool(has_clipped) == bool(np.any(np.abs(ref) >= 0.99999994))
