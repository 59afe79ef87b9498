"""Is the limb-shift primitive (_shift_up: concatenate + slice) the slow
path on this platform?  Compare chained bodies: plain fused arithmetic,
csave (2 shift_ups), ks_resolve (~6 shift_ups), and roll+mask variants of
the same, at [N, 22] limb shapes.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_kzg"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from kzg_rust_tpu.ops import limbs as L

ROWS = 262144  # ~ [64 x 4096] rows
NL = 22


def shift_up_roll(t, k):
    cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 1)
    return jnp.where(cols >= k, jnp.roll(t, k, axis=-1), 0)


def csave_roll(t, passes=2):
    for _ in range(passes):
        t = (t & L.MASK) + shift_up_roll(t >> L.BASE_BITS, 1)
    return t


def ks_roll(t):
    n = t.shape[-1]
    g = (t >= (L.MASK + 1)).astype(jnp.uint32)
    p = (t == L.MASK).astype(jnp.uint32)
    s = 1
    while s < n:
        g = g | (p & shift_up_roll(g, s))
        p = p & shift_up_roll(p, s)
        s *= 2
    return (t + shift_up_roll(g, 1)) & L.MASK


BODIES = {
    "fused mul+add": lambda t: (t * t + t) & 0x7FF,
    "csave(concat)": lambda t: L.csave(t * t) & 0x7FF,
    "csave(roll)": lambda t: csave_roll(t * t) & 0x7FF,
    "ks(concat)": lambda t: L.ks_resolve((t * t) & 0x1FFE) & 0x7FF,
    "ks(roll)": lambda t: ks_roll((t * t) & 0x1FFE) & 0x7FF,
    "geq_mod": lambda t: (t + L.geq_mod(L.__dict__.get('FieldSpec') and None or __import__('kzg_rust_tpu.ops.fields', fromlist=['FR']).FR, t & 0x7FF).astype(jnp.uint32)[..., None]) & 0x7FF,
}


def main():
    from kzg_rust_tpu.ops.fields import FR

    BODIES["geq_mod"] = lambda t: (
        t + L.geq_mod(FR, t & 0x7FF).astype(jnp.uint32)[..., None]
    ) & 0x7FF

    x = jnp.asarray(np.random.randint(0, 1 << 11, size=(ROWS, NL)), jnp.uint32)

    for name, body in BODIES.items():
        @partial(jax.jit, static_argnums=1)
        def chain(v, steps, body=body):
            def step(acc, _):
                return body(acc), None

            return lax.scan(step, v, None, length=steps)[0].reshape(-1)[:4]

        np.asarray(chain(x, 8))
        np.asarray(chain(x, 32))

        def t(steps):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(chain(x, steps))
                best = min(best, time.perf_counter() - t0)
            return best

        per = (t(32) - t(8)) / 24
        print(f"{name:14s}: {per*1e6:9.1f} us/step ({ROWS*NL/per/1e9:7.1f} Gelem/s)")


if __name__ == "__main__":
    main()
