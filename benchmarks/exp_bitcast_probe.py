"""One-shot probe: determine Mosaic's sublane packing for uint8->uint32
bitcast and uint32->bf16 bitcast, to derive the int4 SWAR plane row map.

Builds q uint8 [8, 128] with q[i, :] = i (row index in every byte), runs the
four-plane SWAR unpack, and prints which ORIGINAL byte row each bf16 sublane
of each plane came from.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, oa, ob, oc, od):
    p32 = pltpu.bitcast(q_ref[...], jnp.uint32)  # [2, 128]
    m = jnp.uint32(0x000F000F)
    magic = jnp.uint32(0x43004300)
    a = pltpu.bitcast((p32 & m) | magic, jnp.bfloat16)  # [4, 128]
    b = pltpu.bitcast(((p32 >> 8) & m) | magic, jnp.bfloat16)
    c = pltpu.bitcast(((p32 >> 4) & m) | magic, jnp.bfloat16)
    d = pltpu.bitcast(((p32 >> 12) & m) | magic, jnp.bfloat16)
    oa[...] = a - 128.0
    ob[...] = b - 128.0
    oc[...] = c - 128.0
    od[...] = d - 128.0


def main():
    # byte row i holds value: lo nibble = i, hi nibble = (i + 8) & 0xF
    rows = np.arange(8, dtype=np.uint8)
    vals = (rows & 0xF) | (((rows + 8) & 0xF) << 4)
    q = jnp.asarray(np.tile(vals[:, None], (1, 128)))
    outs = pl.pallas_call(
        _kernel,
        out_shape=[jax.ShapeDtypeStruct((4, 128), jnp.bfloat16)] * 4,
    )(q)
    outs = [np.asarray(o)[:, 0] for o in outs]
    for name, o in zip("abcd", outs):
        print(name, o.tolist())


if __name__ == "__main__":
    main()
