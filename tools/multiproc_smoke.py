"""Two-process jax.distributed smoke test on CPU (multi-host analog).

Parent mode (no args): spawns two child processes, each a JAX process with
4 virtual CPU devices, joined through ``initialize_distributed`` — the
same entry point a real multi-host TPU deployment calls.  Each child then
runs, over the GLOBAL 8-device mesh with real cross-process gloo
collectives (VERDICT round-2 item 5):

1. a psum sanity check over the 2x4 (host, chip) mesh;
2. the REAL batch-verification kernels — blob-sharded stage 1 (device G1
   decompression + window chain + GLV subgroup checks) feeding the
   stage-2 RLC combination (``sharded_batch_stage2_kernel``), checked
   bit-exactly against the golden model on every process;
3. the domain-sharded barycentric kernel (``sharded_bary_kernel``),
   checked against the golden model.

This is BASELINE config 5's program shape (reference hot loop:
kzg.rs:661) with the all_gather combines crossing an OS-process boundary.

Usage: python tools/multiproc_smoke.py                   # parent
       python tools/multiproc_smoke.py <pid> <n> <port>  # child (internal)
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

def _free_port() -> int:
    """Pick an ephemeral port so concurrent runs never collide."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def child(process_id: int, num: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    # The ambient environment may register an accelerator PJRT plugin that
    # ignores the JAX_PLATFORMS env var (see tests/conftest.py); pin CPU
    # through jax.config as well.
    jax.config.update("jax_platforms", "cpu")
    # Cross-process CPU collectives need an explicit implementation.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    from kzg_rust_tpu.parallel.distributed import (
        CHIP_AXIS,
        HOST_AXIS,
        host_chip_mesh,
        initialize_distributed,
    )

    initialize_distributed(f"localhost:{port}", num_processes=num, process_id=process_id)
    import jax.numpy as jnp
    import numpy as np
    from kzg_rust_tpu.parallel._compat import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == num, jax.process_count()
    assert len(jax.devices()) == 4 * num, len(jax.devices())
    mesh = host_chip_mesh(num, 4)

    def local(x):
        return jax.lax.psum(x, (HOST_AXIS, CHIP_AXIS))

    fn = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=P((HOST_AXIS, CHIP_AXIS)),
            out_specs=P(),
            check_rep=False,
        )
    )
    # Each device contributes its global index + 1: sum = 8*9/2 = 36.
    glob = jnp.arange(1, 4 * num + 1, dtype=jnp.float32)
    arr = jax.device_put(
        glob, NamedSharding(mesh, P((HOST_AXIS, CHIP_AXIS)))
    )
    out = np.asarray(jax.jit(fn)(arr))
    expected = float(4 * num * (4 * num + 1) // 2)
    assert float(out.ravel()[0]) == expected, (out, expected)
    if process_id == 0:
        print(f"psum over 2x4 multi-process mesh OK: {float(out.ravel()[0])}")

    _real_kernels_cross_process(process_id, num)


def _real_kernels_cross_process(process_id: int, num: int) -> None:
    """The production sharded verification kernels over the global
    multi-process mesh, vs golden (VERDICT round-2 item 5)."""
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from kzg_rust_tpu.golden import curve as gc
    from kzg_rust_tpu.golden.field import R
    from kzg_rust_tpu.backends.golden_backend import GoldenBackend
    from kzg_rust_tpu.ops import curve as C
    from kzg_rust_tpu.ops import limbs as L
    from kzg_rust_tpu.ops import msm as M
    from kzg_rust_tpu.ops import verify_kernels as V
    from kzg_rust_tpu.ops.fields import FR
    from kzg_rust_tpu.parallel import sharded as S
    from kzg_rust_tpu.presets import Preset
    from kzg_rust_tpu.settings import KzgSettings
    from kzg_rust_tpu.utils.domain import compute_roots_of_unity

    # Persist compiled executables across the two child processes.
    from kzg_rust_tpu.utils.observability import enable_compile_cache

    enable_compile_cache()

    devs = jax.devices()
    ndev = len(devs)
    rng = random.Random(0x600D)  # same seed in every process: shared inputs

    def global_array(host_np, spec, mesh):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            host_np.shape, sharding, lambda idx: host_np[idx]
        )

    # --- stage 1 + stage 2 over the global blob-axis mesh (one blob/device)
    bmesh = Mesh(np.array(devs), (S.BLOBS_AXIS,))
    n = ndev
    commitments = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, R)) for _ in range(n)]
    proofs = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, R)) for _ in range(n)]
    comp_rows = []
    for i in range(n):
        comp_rows.append(gc.g1_compress(commitments[i]))
        comp_rows.append(gc.g1_compress(proofs[i]))
    comp = np.frombuffer(b"".join(comp_rows), dtype=np.uint8).reshape(2 * n, 48)
    comp_g = global_array(comp, P(S.BLOBS_AXIS, None), bmesh)
    bases, bases2, flags = S.sharded_batch_points_kernel(comp_g, bmesh)
    flags_h = np.asarray(jax.device_get(flags))
    assert flags_h[0] and flags_h[1], "stage 1 rejected valid points"

    r_powers = [rng.randrange(R) for _ in range(n)]
    r_times_z = [rng.randrange(R) for _ in range(n)]
    ys = [rng.randrange(R) for _ in range(n)]
    ry = sum(rp * y for rp, y in zip(r_powers, ys)) % R
    digits = V.stage2_digits(n, r_powers, r_times_z)
    dig_g = global_array(
        np.asarray(digits, dtype=np.int8), P(None, S.BLOBS_AXIS), bmesh
    )
    out = S.sharded_batch_stage2_kernel(
        bases,
        bases2,
        dig_g,
        V.build_generator_table(),
        jnp.asarray(M.recode_signed_digits([ry], 1), dtype=jnp.int32),
        bmesh,
    )
    lhs, rhs = C.proj_to_points(np.asarray(jax.device_get(out)))
    want_lhs = gc.g1_lincomb_naive(proofs, r_powers)
    want_rhs = gc.g1_sub(
        gc.g1_add(
            gc.g1_lincomb_naive(commitments, r_powers),
            gc.g1_lincomb_naive(proofs, r_times_z),
        ),
        gc.g1_mul(gc.G1_GENERATOR, ry),
    )
    assert lhs == want_lhs, "cross-process stage2 lhs mismatch"
    assert rhs == want_rhs, "cross-process stage2 rhs mismatch"

    # --- domain-sharded barycentric over the global domain-axis mesh
    dmesh = Mesh(np.array(devs), (S.DOMAIN_AXIS,))
    dn = 2 * ndev
    droots = compute_roots_of_unity(dn.bit_length() - 1)
    dsettings = KzgSettings(
        preset=Preset(name="mp16", field_elements_per_blob=dn),
        max_width=dn,
        roots_of_unity=droots,
        g1_values=[],
        g2_values=[],
    )
    devals = [[rng.randrange(R) for _ in range(dn)] for _ in range(2)]
    dxs = [rng.randrange(R) for _ in range(2)]
    rr = FR.mont_r
    roots_np = L.ints_to_limbs(FR.nlimbs, [(w * rr) % R for w in droots])
    evals_np = np.stack([L.ints_to_limbs(FR.nlimbs, e) for e in devals])
    xs_np = L.ints_to_limbs(FR.nlimbs, dxs)
    got_d = L.limbs_to_ints(
        np.asarray(
            jax.device_get(
                S.sharded_bary_kernel(
                    global_array(roots_np, P(S.DOMAIN_AXIS, None), dmesh),
                    global_array(evals_np, P(None, S.DOMAIN_AXIS, None), dmesh),
                    global_array(xs_np, P(None, None), dmesh),
                    dn,
                    dmesh,
                )
            )
        )
    )
    gb = GoldenBackend()
    want_d = [gb.barycentric_eval(dsettings, devals[i], dxs[i]) for i in range(2)]
    assert got_d == want_d, "cross-process domain-sharded barycentric mismatch"

    if process_id == 0:
        print(
            "cross-process real kernels OK: "
            f"stage1+stage2 (n={n} blobs over {ndev} devices x {num} processes) "
            f"and domain-sharded barycentric (width {dn}) match golden"
        )


def parent() -> None:
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=ROOT,
        )
        for i in range(2)
    ]
    ok = True
    for i, p in enumerate(procs):
        # Cold XLA-CPU compiles of the stage kernels can take several
        # minutes in each child; warm runs hit the persistent cache.
        out, _ = p.communicate(timeout=1500)
        if p.returncode != 0:
            ok = False
            print(f"--- child {i} rc={p.returncode}")
            print(out.decode(errors="replace")[-2000:])
        else:
            sys.stdout.write(out.decode(errors="replace"))
    print("MULTIPROC OK" if ok else "MULTIPROC FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if len(sys.argv) == 4:
        child(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
    else:
        parent()
