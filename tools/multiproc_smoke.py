"""Two-process jax.distributed smoke test on CPU (multi-host analog).

Parent mode (no args): spawns two child processes, each a JAX process with
4 virtual CPU devices, joined through ``initialize_distributed`` — the
same entry point a real multi-host TPU deployment calls — then each runs a
psum over the global 2x4 (host, chip) mesh and process 0 checks the value.

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
    from jax.experimental.shard_map import shard_map
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
        out, _ = p.communicate(timeout=420)
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
