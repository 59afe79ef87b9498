"""Does the minor-dim (limb-axis) width throttle elementwise throughput?
Equal element count, varying minor dim: [N, 22] vs [N, 40] vs [N, 128] vs
[N, 512].  If narrow minor dims run ~128/width slower per element, the
limb-tensor layout (limbs minor) caps VPU lane utilization and a
transposed (batch-minor) layout is the next kernel lever.
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

ELEMS = 1 << 21  # 2M elements


@partial(jax.jit, static_argnums=1)
def chain(x, steps):
    def step(acc, _):
        # mul + add + shift-ish mix resembling the limb kernels
        return (acc * acc + acc) & 0xFFF, None

    return lax.scan(step, x, None, length=steps)[0].reshape(-1)[:4]


def bench(minor):
    rows = ELEMS // minor
    x = jnp.asarray(np.random.randint(0, 1 << 11, size=(rows, minor)), jnp.uint32)
    np.asarray(chain(x, 16))
    np.asarray(chain(x, 64))

    def t(steps):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(x, steps))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t(64) - t(16)) / 48
    print(f"minor={minor:4d}: {per*1e6:9.1f} us/step -> {ELEMS/per/1e9:8.1f} Gelem/s")


def main():
    for minor in (22, 40, 64, 128, 256, 512):
        bench(minor)


if __name__ == "__main__":
    main()
