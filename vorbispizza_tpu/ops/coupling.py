"""Square-polar channel-coupling inverse, batched (JAX/XLA).

Elementwise truth table (spec 4.3.4 step 2; reference
NVorbis/Mapping.cs:235-268), applied to the whole [frames, channels, half]
residue batch at once. Steps run in reverse declaration order, as the spec
requires; the step list is static per mapping so the loop unrolls.
"""

from __future__ import annotations

import jax.numpy as jnp


def inverse_couple_batch(residues, coupling_steps):
    """residues [F, C, half]; coupling_steps: static tuple of (mag, ang)."""
    residues = jnp.asarray(residues)
    for m, a in reversed(coupling_steps):
        mag = residues[:, m, :]
        ang = residues[:, a, :]
        pos_m = mag > 0
        pos_a = ang > 0
        new_m = jnp.where(pos_a, mag, jnp.where(pos_m, mag + ang, mag - ang))
        new_a = jnp.where(pos_a, jnp.where(pos_m, mag - ang, mag + ang), mag)
        residues = residues.at[:, m, :].set(new_m).at[:, a, :].set(new_a)
    return residues
