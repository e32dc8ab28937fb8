"""Device-side (JAX/XLA/Pallas) synthesis kernels.

Everything downstream of the host entropy front end: floor curve synthesis,
square-polar coupling inverse, IMDCT, windowing, overlap-add, interleave.
The numpy modules in dsp/ and setup/ are the scalar correctness anchors
these kernels are verified against.
"""

from .imdct import imdct_window_batch, dct_iv_matrix
from .floor import floor1_curves, floor0_curves
from .coupling import inverse_couple_batch
from .ola import overlap_add

__all__ = [
    "imdct_window_batch",
    "dct_iv_matrix",
    "floor1_curves",
    "floor0_curves",
    "inverse_couple_batch",
    "overlap_add",
]
