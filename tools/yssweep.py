"""Size a coded-amplitude (pre-unwrap) floor1 wire.

_unwrap (setup/floor.py) turns the Huffman-decoded coded values ``ys``
into final posts + step2 flags; the batch wire currently ships the
OUTPUT (posts u8 + step2 bits = 2.18 MB of the 7.7 MB h2d budget).
The coded values are the bitstream's own prediction residuals --
mostly tiny -- and the cascade is static per setup (low/high neighbor
tables), so the device could run it instead. This sizes ys under the
nibble+escape scheme before any wire work.
"""
from __future__ import annotations

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from vorbispizza_tpu.setup import floor as fl
from vorbispizza_tpu import VorbisReader
from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal

captured: list[np.ndarray] = []
orig = fl.Floor1._unwrap

def hook(self, ys):
    captured.append(ys.copy())
    return orig(self, ys)

fl.Floor1._unwrap = hook

rate = 44100
nfiles = 6
nvals = 0
for seed in range(nfiles):
    data = encode_vorbis(
        make_signal(2, 15.0, rate=rate, kind="music", seed=seed),
        rate=rate, quality=0.5,
    )
    import io
    with VorbisReader(io.BytesIO(data)) as r:
        while True:
            pcm = r.read_samples(16384)
            if pcm is None or len(pcm) == 0:
                break

ys = np.concatenate([c for c in captured])
n = ys.size
print(f"captured {len(captured)} floor frames, {n:,} coded values")
for edge in (0, 1, 2, 3, 6, 7, 14, 15, 30, 62):
    print(f"  ys <= {edge:>3}: {100.0 * (ys <= edge).mean():.2f}%")
print(f"  max ys: {ys.max()}")
# nibble+escape: 4 bits each, code 15 = escape -> u8 exception
n_esc = int((ys >= 15).sum())
body = (n * 4 + 7) // 8
exc = ((n_esc + 63) // 64) * 64 * 5
print(f"nibble+escape: {body + exc:,} B for {n:,} vals "
      f"({(body+exc)/n*8:.2f} bits/val, esc {100*n_esc/n:.2f}%)")
# 3-bit + escape
n_esc3 = int((ys >= 7).sum())
body3 = (n * 3 + 7) // 8
exc3 = ((n_esc3 + 63) // 64) * 64 * 5
print(f"3bit+escape:   {body3 + exc3:,} B ({(body3+exc3)/n*8:.2f} bits/val, esc {100*n_esc3/n:.2f}%)")
# current wire equivalent for the same frames: 8 bits/post + 1 step2 bit
print(f"current posts+step2 equivalent: {(n * 9 + 7) // 8:,} B (9 bits/val)")
