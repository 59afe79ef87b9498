"""MXU and memory-path throughput on the attached device, fetch-synced.
If matmuls hit real TFLOPs while elementwise ops sit at ~0.4 Gelem/s, the
VPU/memory path is the throttle; if both are ~1000x off spec, the attached
'TPU' executes like an emulator and no kernel can win here.
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


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def diff_time(fn, x, s1, s2):
    np.asarray(fn(x, s1))  # warm BOTH step counts before timing
    np.asarray(fn(x, s2))
    ta = min(_t(lambda: np.asarray(fn(x, s1))) for _ in range(3))
    tb = min(_t(lambda: np.asarray(fn(x, s2))) for _ in range(3))
    return (tb - ta) / (s2 - s1)


@partial(jax.jit, static_argnums=1)
def mm_chain(x, steps):
    def step(acc, _):
        return jnp.dot(acc, acc, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16
        ) * jnp.bfloat16(1e-3), None

    return lax.scan(step, x, None, length=steps)[0][:1, :1]


@partial(jax.jit, static_argnums=1)
def mm_chain_i8(x, steps):
    def step(acc, _):
        p = jax.lax.dot_general(
            acc, acc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (p & 0x7F).astype(jnp.int8), None

    return lax.scan(step, x, None, length=steps)[0][:1, :1]


@partial(jax.jit, static_argnums=1)
def copy_chain(x, steps):
    def step(acc, _):
        return acc + 1, None

    return lax.scan(step, x, None, length=steps)[0][:1, :1]


def main():
    n = 1024
    xb = jnp.asarray(np.random.rand(n, n), jnp.bfloat16)
    per = diff_time(mm_chain, xb, 16, 64)
    print(f"bf16 {n}x{n} matmul: {per*1e6:9.1f} us -> {2*n**3/per/1e12:7.2f} TFLOP/s")
    xi = jnp.asarray(np.random.randint(0, 100, (n, n)), jnp.int8)
    per = diff_time(mm_chain_i8, xi, 16, 64)
    print(f"int8 {n}x{n} matmul: {per*1e6:9.1f} us -> {2*n**3/per/1e12:7.2f} TOP/s")
    big = jnp.asarray(np.zeros((4096, 4096), jnp.float32))  # 64 MB
    per = diff_time(copy_chain, big, 4, 16)
    print(f"f32 64MB add-chain: {per*1e6:9.1f} us -> {2*big.size*4/per/1e9:7.1f} GB/s eff")


if __name__ == "__main__":
    main()
