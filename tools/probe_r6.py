"""Is elementwise int32 multiply emulated on this TPU?  Compare multiply
throughput across dtypes at fixed element count, fetch-synced, using
chained ops so dispatch cost amortizes.
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

ROWS, COLS = 2048, 512  # 1M elements
STEPS_A, STEPS_B = 64, 256


@partial(jax.jit, static_argnums=(1, 2))
def mul_chain(x, steps, op):
    def step(acc, _):
        if op == "mul":
            return acc * acc, None
        if op == "add":
            return acc + acc, None
        if op == "mulmask":  # mul with 12-bit masked operands (our case)
            return (acc & 0xFFF) * (acc & 0xFFF), None
        return acc, None

    return lax.scan(step, x, None, length=steps)[0][:1, :1]


def _t(fn):
    t0 = time.perf_counter(); fn(); return time.perf_counter() - t0


def bench(dtype, op):
    if dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(np.random.rand(ROWS, COLS), dtype=dtype)
    else:
        x = jnp.asarray(
            np.random.randint(0, 1 << 11, size=(ROWS, COLS)), dtype=dtype
        )
    np.asarray(mul_chain(x, STEPS_A, op))
    np.asarray(mul_chain(x, STEPS_B, op))  # warm BOTH step counts
    ta = min(_t(lambda: np.asarray(mul_chain(x, STEPS_A, op))) for _ in range(3))
    tb = min(_t(lambda: np.asarray(mul_chain(x, STEPS_B, op))) for _ in range(3))
    per = (tb - ta) / (STEPS_B - STEPS_A)
    gops = ROWS * COLS / per / 1e9 if per > 0 else float("nan")
    print(f"{str(dtype.__name__ if hasattr(dtype,'__name__') else dtype):10s} {op:8s}: {per*1e6:9.2f} us/op -> {gops:8.2f} Gelem/s")


def main():
    for op in ("mul", "add"):
        for dt in (jnp.uint32, jnp.int32, jnp.float32, jnp.bfloat16, jnp.int16, jnp.uint16):
            try:
                bench(dt, op)
            except Exception as e:
                print(f"{dt} {op}: FAILED {type(e).__name__}")
    # conversion cost: i32 -> f32 -> multiply -> back
    x = jnp.asarray(np.random.randint(0, 1 << 11, size=(ROWS, COLS)), np.int32)

    @partial(jax.jit, static_argnums=1)
    def conv_chain(v, steps):
        def step(acc, _):
            f = acc.astype(jnp.float32)
            p = (f * f).astype(jnp.int32)
            return p & 0x7FF, None

        return lax.scan(step, v, None, length=steps)[0][:1, :1]

    np.asarray(conv_chain(x, STEPS_A)); np.asarray(conv_chain(x, STEPS_B))
    ta = min(_t(lambda: np.asarray(conv_chain(x, STEPS_A))) for _ in range(3))
    tb = min(_t(lambda: np.asarray(conv_chain(x, STEPS_B))) for _ in range(3))
    per = (tb - ta) / (STEPS_B - STEPS_A)
    print(f"i32->f32 mul->i32 roundtrip: {per*1e6:9.2f} us/op -> {ROWS*COLS/per/1e9:8.2f} Gelem/s")


if __name__ == "__main__":
    main()
