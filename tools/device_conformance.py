"""Run the mainnet conformance suite on the REAL device and record an
artifact (VERDICT round-2 item 8).

Executes ``pytest tests/test_conformance.py`` with
``KZG_TPU_TEST_REAL_DEVICE=1`` — which forces the jax backend's DEVICE
branch for every operation (tests/conftest.py defaults
KZG_TPU_EVAL/KZG_TPU_PROVER to ``device``) — and writes
``DEVICE_CONFORMANCE_r{N}.json`` at the repo root with the pass count, wall
time, and placement proof (the attached device), so the device branch's
mainnet-width conformance is a committed per-round artifact instead of a
one-off prose claim.

Usage: python tools/device_conformance.py <round> [pytest-target]
"""

from __future__ import annotations

import datetime
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    target = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "tests/test_conformance.py tests/test_conformance_minimal.py"
    )  # space-separated pytest targets: mainnet 208 + generated minimal 28

    env = dict(os.environ)
    env["KZG_TPU_TEST_REAL_DEVICE"] = "1"
    env.setdefault("KZG_TPU_BACKEND", "jax")

    # Placement proof: what device the forced-device run executes on.
    probe = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; "
            "from kzg_rust_tpu.utils.observability import enable_compile_cache; "
            "enable_compile_cache(); "
            "print(jax.default_backend()); print(jax.devices())",
        ],
        capture_output=True,
        cwd=ROOT,
        env=env,
        timeout=900,
    )
    probe_lines = probe.stdout.decode(errors="replace").strip().splitlines()
    backend = probe_lines[0] if probe_lines else "unknown"
    devices = probe_lines[1] if len(probe_lines) > 1 else "unknown"

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *target.split(), "-q", "--no-header"],
        capture_output=True,
        cwd=ROOT,
        env=env,
    )
    wall = time.time() - t0
    tail = proc.stdout.decode(errors="replace").strip().splitlines()[-5:]
    summary = tail[-1] if tail else ""
    m = re.search(r"(\d+) passed", summary)
    passed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", summary)
    failed = int(m.group(1)) if m else 0

    out = {
        "round": rnd,
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "target": target,
        "backend": backend,
        "devices": devices,
        "placement_env": {
            "KZG_TPU_TEST_REAL_DEVICE": "1",
            "KZG_TPU_EVAL": "device (conftest default under TEST_REAL_DEVICE)",
            "KZG_TPU_PROVER": "device (conftest default under TEST_REAL_DEVICE)",
        },
        "passed": passed,
        "failed": failed,
        "returncode": proc.returncode,
        "wall_s": round(wall, 1),
        "summary": summary,
        "ok": proc.returncode == 0 and failed == 0 and passed > 0,
    }
    path = os.path.join(ROOT, f"DEVICE_CONFORMANCE_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
