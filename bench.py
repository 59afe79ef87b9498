"""Round benchmark: north-star metric, production path + forced-device path.

Measures ``verify_blob_kzg_proof_batch`` throughput (blobs/s) on the mainnet
preset — the reference's headline benchmark (reference:
benches/kzg_benches.rs:93-126, Throughput::Elements) at its largest
criterion batch size (n=64) — TWICE (VERDICT round-2 item 1):

1. through the product's default ``auto`` placement -> ``value`` (the
   driver-recorded headline).  ``auto`` measures the host<->device link once
   and picks the device pipeline exactly when this batch's link cost fits
   the host budget (backends/jax_backend.py cost model); on this
   environment's tunneled chip (~23-31 ms RTT, ~80 MB/s upload —
   SCALING.md "Link placement") that correctly selects the native host
   engine: one n=64 batch cannot cross this link faster than the host
   verifies it outright.
2. with the measured VERIFY path FORCED to the TPU (``KZG_TPU_EVAL=device``;
   the prover that merely *generates* the batch is pinned to the host
   engine where it exists, ``auto`` otherwise — it is not under
   measurement), in a child
   process with a deadline so a degraded tunnel cannot hang the bench ->
   ``device_*`` fields for n=4096, n=512 and n=64, probed in THAT order
   (largest first — the saturated n=4096 anchor of the crossover must land
   in the driver artifact even when the tunnel degrades; VERDICT round-4
   item 2) with per-size rep counts scaled to the remaining deadline.
   ``device*_compute_ms`` is end-to-end minus the MODELED link cost (RTT
   crossings + upload at the small-probe bandwidth), with the modeled
   term emitted beside it as ``device*_link_model_ms``.  Since round 5's
   interleaved upload schedule, transfer overlaps chunk compute, so the
   subtraction can floor at 0 (meaning only "transfer-dominated e2e");
   the slope-measured per-stage kernel times (SCALING.md "round 5":
   4,257 blobs/s/chip at n=4096) are the true per-chip compute numbers.

The parent additionally measures the HOST engine at n=512 and n=4096
(``host_n{512,4096}_*``, tiled batches, spacing policy as above) so the
SCALING.md crossover quotes host and device at identical batch sizes from
one round-stamped artifact (VERDICT round-4 item 1).

Statistics policy (frozen; VERDICT round-3 item 2, criterion-style
distribution reporting per reference benches/kzg_benches.rs:25-130):
every placement reports BOTH the best-of and the median (plus p90) over its
samples.  ``value`` stays the best-of for round-over-round continuity of the
driver channel; ``median_blobs_per_s`` / ``vs_baseline_median`` are the
selection-bias-free statistics and are what round-over-round comparisons
should use.  REPEATS is FROZEN at 40 — sampling more contention windows
inflates a best-of monotonically, so it must not be raised; the median is
the contention-robust statistic either way.

``vs_baseline``: the reference publishes no numbers (BASELINE.json
``"published": {}``) and no Rust toolchain exists here to measure it, so the
denominator is a documented estimate of blst-backed single-thread batch
verification on server-class x86: ~2.5 ms/blob in large batches => ~400
blobs/s (public c-kzg-4844 / blst criterion results).  vs_baseline > 1 means
faster than that estimate.
"""

from __future__ import annotations

import json
import os
import random
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

BASELINE_BLOBS_PER_S = 400.0  # documented estimate, see module docstring
BATCH_N = 64  # reference's largest criterion batch size
# The bench host's effective CPU speed oscillates 2-6x on a seconds scale
# (hypervisor contention); sampling many windows with a spacing sleep makes
# the MEDIAN reflect the machine's typical speed and the best-of its ceiling.
# FROZEN at 40 (see module docstring) — do not raise.
REPEATS = 40
SPACING_S = 0.35
# Host-side at-scale sizes (VERDICT round-4 item 1: the crossover must
# quote host and device numbers at IDENTICAL n from a round-stamped
# artifact).  Large batches tile the same 64 distinct blob/proof pairs
# (identical per-blob verification work — every blob is independently
# hashed/evaluated and the RLC powers are distinct per lane regardless),
# so generation stays ~1 s.  Repeat counts scale down with per-rep cost to
# bound added wall time (same spacing policy; these are NEW fields with
# their own frozen counts, the n=64 headline channel keeps REPEATS=40).
HOST_SCALE_NS = {512: 25, 4096: 12}
DEVICE_REPEATS = 5
DEVICE_REPEATS_4096 = 3  # the 537 MB uploads make tail reps expensive
# Probed LARGEST FIRST (VERDICT round-4 item 2): n=4096 is the saturated
# per-chip anchor the whole horizontal story rests on, so it must land in
# the driver artifact even when a degraded tunnel eats the deadline —
# round 4 probed it last and truncated.  The cumulative-JSON salvage means
# later (smaller, cheaper) sizes degrade gracefully instead.
DEVICE_BATCH_NS = (4096, 512, 64)
# The tunnel's first dispatch has been observed to take ~9 minutes (device
# discovery + warm-up); give the forced-device child a generous deadline but
# never let it hang the bench channel.  A COLD compile cache adds full XLA
# compiles of every batch shape on top of discovery, so the deadline scales
# with measured cache coldness instead of silently erasing the round's TPU
# evidence (VERDICT round-3 item 9).
DEVICE_TIMEOUT_S = float(os.environ.get("KZG_BENCH_DEVICE_TIMEOUT", "1500"))
COLD_CACHE_EXTRA_S = float(os.environ.get("KZG_BENCH_COLD_EXTRA", "1800"))


def _enable_compile_cache():
    from kzg_rust_tpu.utils.observability import enable_compile_cache

    enable_compile_cache()


def _cache_is_cold() -> bool:
    """True when the persistent compile cache has no entries yet."""
    from kzg_rust_tpu.utils.observability import compile_cache_dir

    d = compile_cache_dir()
    try:
        return not any(os.scandir(d))
    except OSError:
        return True


def random_blob(rng: random.Random, n_fe: int) -> bytes:
    # Canonical field elements: zero the top byte (reference: benches:14-23).
    return b"".join(b"\x00" + rng.randbytes(31) for _ in range(n_fe))


def _build_batch(batch_n: int = BATCH_N):
    """BATCH_N distinct (blob, commitment, proof) triples; larger batches
    are produced by :func:`_tile` — per-blob verification work is identical
    for repeated triples (each blob is independently hashed and evaluated;
    the RLC challenge powers differ per lane either way), and tiling keeps
    generation at ~1 s instead of ~3 min of prover time at n=4096, which
    round 4 spent inside the device probe's deadline (VERDICT item 2)."""
    from kzg_rust_tpu import Blob, Kzg

    settings = Kzg.load_trusted_setup_file(
        os.path.join(ROOT, "data", "trusted_setup.txt")
    )
    n_fe = settings.preset.field_elements_per_blob
    rng = random.Random(0xBEEF)
    blobs, commitments, proofs = [], [], []
    for _ in range(batch_n):
        blob = Blob(random_blob(rng, n_fe))
        c = Kzg.blob_to_kzg_commitment(blob, settings)
        p = Kzg.compute_blob_kzg_proof(blob, c, settings)
        blobs.append(blob)
        commitments.append(c)
        proofs.append(p)
    return settings, blobs, commitments, proofs


def _tile(seq, n: int):
    """Repeat the 64 distinct triples out to ``n`` elements."""
    reps = (n + len(seq) - 1) // len(seq)
    return (list(seq) * reps)[:n]


def _last_json_line(text: str):
    """The last parseable JSON object among ``text``'s lines, or None —
    used for both the child's normal output and the partial output
    salvaged from a deadline kill (the child emits cumulative fields
    after every probed batch size)."""
    for ln in reversed(text.strip().splitlines()):
        try:
            return json.loads(ln)
        except json.JSONDecodeError:
            continue
    return None


def _stats(samples):
    """Per-sample wall times -> (best, median, p90) seconds."""
    s = sorted(samples)
    return s[0], statistics.median(s), s[min(len(s) - 1, int(0.9 * len(s)))]


def device_probe() -> None:
    """Child mode: forced-device measurement, cumulative JSON lines on
    stdout (the parent parses the LAST complete line).  Deadline-aware
    (VERDICT round-4 item 2): sizes run LARGEST FIRST so the saturated
    anchor lands even on a degraded tunnel, generation tiles 64 distinct
    triples instead of proving 4096 blobs, and the rep count per size
    scales down when the remaining deadline budget is thin."""
    t_start = time.perf_counter()
    child_deadline = float(os.environ.get("KZG_BENCH_CHILD_DEADLINE_S", "0")) or None
    os.environ["KZG_TPU_BACKEND"] = "jax"
    os.environ["KZG_TPU_EVAL"] = "device"
    _enable_compile_cache()
    # Proof/commitment GENERATION stays on the host engine when it exists
    # (not under measurement); KZG_TPU_PROVER=host HARD-FAILS without the
    # native runtime, so fall back to 'auto' there (auto never raises —
    # it uses whatever prover is available) rather than erase the round's
    # device evidence on a host whose best-effort C++ build failed.
    from kzg_rust_tpu import hostcrypto

    os.environ["KZG_TPU_PROVER"] = (
        "host" if hostcrypto._nat() is not None else "auto"
    )
    import jax

    from kzg_rust_tpu import Kzg
    from kzg_rust_tpu.backends.jax_backend import (
        AUTO_RTT_CROSSINGS,
        link_profile,
    )

    backend = jax.default_backend()
    if backend == "cpu":
        print(json.dumps({"device_error": "no accelerator attached (cpu backend)"}))
        return
    out = {"device": str(jax.devices()[0])}
    settings, blobs, commitments, proofs = _build_batch(BATCH_N)
    rtt, bw = link_profile()
    out["device_link_rtt_ms"] = round(rtt * 1e3, 3)
    out["device_h2d_MBps"] = round(bw / 1e6, 1)
    print(json.dumps(out), flush=True)  # salvageable even if the first size stalls

    def remaining() -> float:
        if child_deadline is None:
            return float("inf")
        return child_deadline - (time.perf_counter() - t_start)

    for bn in DEVICE_BATCH_NS:
        b, c, p = _tile(blobs, bn), _tile(commitments, bn), _tile(proofs, bn)
        # Warm-up: compile + upload paths for this batch shape; also the
        # per-rep cost estimate for deadline-aware rep scaling.
        t0 = time.perf_counter()
        assert Kzg.verify_blob_kzg_proof_batch(b, c, p, settings) is True
        warm_s = time.perf_counter() - t0
        target = DEVICE_REPEATS_4096 if bn >= 4096 else DEVICE_REPEATS
        # Spend at most half the remaining budget on this size's reps so
        # the smaller (cheaper) sizes still fit behind it.
        reps = max(1, min(target, int(0.5 * remaining() / max(warm_s, 1e-3))))
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            ok = Kzg.verify_blob_kzg_proof_batch(b, c, p, settings)
            samples.append(time.perf_counter() - t0)
            assert ok is True
            if remaining() < 2 * samples[-1]:
                break  # keep enough budget to emit + start the next size
        best, med, p90 = _stats(samples)
        upload = bn * (settings.preset.bytes_per_blob + 96)
        link_cost = AUTO_RTT_CROSSINGS * rtt + upload / bw
        pre = "device" if bn == BATCH_N else f"device_n{bn}"
        out[f"{pre}_blobs_per_s"] = round(bn / best, 2)
        out[f"{pre}_e2e_ms"] = round(best * 1e3, 2)
        out[f"{pre}_median_ms"] = round(med * 1e3, 2)
        out[f"{pre}_p90_ms"] = round(p90 * 1e3, 2)
        out[f"{pre}_reps"] = len(samples)
        # Since the round-5 interleaved upload schedule, transfer OVERLAPS
        # chunk compute, so "e2e minus modeled link" is no longer an upper
        # bound on device compute — when the modeled link cost alone
        # exceeds the measured e2e the subtraction floors at 0 and means
        # only "e2e is transfer-dominated".  The modeled link term is
        # emitted beside it so the field stays interpretable; the per-chip
        # compute anchor is the slope-measured kernel-sum table
        # (SCALING.md round 5, tools/probe_scale.py).
        out[f"{pre}_link_model_ms"] = round(link_cost * 1e3, 2)
        out[f"{pre}_compute_ms"] = round(max(best - link_cost, 0.0) * 1e3, 2)
        # Emit the accumulated fields after EVERY size: if a later size
        # stalls past the parent deadline on a degraded tunnel, the parent
        # still parses the last complete line instead of losing the whole
        # round's device evidence.
        print(json.dumps(out), flush=True)


def _guard_parent_against_stuck_accelerator() -> str | None:
    """The parent's ``auto`` placement touches the accelerator backend once
    (link profile) — and a wedged tunnel has been observed to BLOCK that
    first contact for 30+ minutes with no error (worse than the ~9-minute
    cold discovery), which would blank the whole bench artifact.  Probe the
    backend init in a daemon thread with a deadline; on timeout pin the
    parent to the host engine (the correct production choice on any link
    that slow) — the device child still probes with its own deadline.
    Returns a note for the output when the guard fired."""
    import threading

    done = threading.Event()

    def probe():
        try:
            import jax

            jax.default_backend()
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    timeout = float(os.environ.get("KZG_BENCH_INIT_TIMEOUT", "600"))
    if done.wait(timeout):
        return None
    from kzg_rust_tpu import hostcrypto

    if hostcrypto._nat() is not None:
        os.environ["KZG_TPU_EVAL"] = "host"
        os.environ["KZG_TPU_PROVER"] = "host"
        return f"host (accelerator init exceeded {timeout:.0f}s; native engine pinned)"
    os.environ["KZG_TPU_BACKEND"] = "golden"
    return f"golden (accelerator init exceeded {timeout:.0f}s; no native engine)"


def main() -> None:
    os.environ.setdefault("KZG_TPU_BACKEND", "jax")
    _enable_compile_cache()
    device_cold = _cache_is_cold()
    guard_note = _guard_parent_against_stuck_accelerator()

    from kzg_rust_tpu import Kzg

    settings, blobs, commitments, proofs = _build_batch()

    # Warm-up (compile + cache all jitted paths).
    assert Kzg.verify_blob_kzg_proof_batch(blobs, commitments, proofs, settings) is True

    samples = []
    for i in range(REPEATS):
        if i:
            time.sleep(SPACING_S)
        t0 = time.perf_counter()
        ok = Kzg.verify_blob_kzg_proof_batch(blobs, commitments, proofs, settings)
        samples.append(time.perf_counter() - t0)
        assert ok is True
    best, med, p90 = _stats(samples)
    blobs_per_s = BATCH_N / best
    median_blobs_per_s = BATCH_N / med

    out = {
        "metric": f"verify_blob_kzg_proof_batch throughput (n={BATCH_N}, mainnet)",
        "value": round(blobs_per_s, 2),
        "unit": "blobs/s",
        "vs_baseline": round(blobs_per_s / BASELINE_BLOBS_PER_S, 4),
        "median_blobs_per_s": round(median_blobs_per_s, 2),
        "vs_baseline_median": round(median_blobs_per_s / BASELINE_BLOBS_PER_S, 4),
        "best_ms": round(best * 1e3, 2),
        "median_ms": round(med * 1e3, 2),
        "p90_ms": round(p90 * 1e3, 2),
        "repeats": REPEATS,
        "placement_auto": guard_note or os.environ.get("KZG_TPU_EVAL", "auto"),
    }

    # Host engine at scale, same placement, tiled batches (VERDICT round-4
    # item 1: the crossover's host side must exist as a round-stamped
    # artifact at the SAME batch sizes the device anchor is quoted at).
    for bn, reps in sorted(HOST_SCALE_NS.items()):
        b, c, p = _tile(blobs, bn), _tile(commitments, bn), _tile(proofs, bn)
        assert Kzg.verify_blob_kzg_proof_batch(b, c, p, settings) is True
        samples = []
        for i in range(reps):
            if i:
                time.sleep(SPACING_S)
            t0 = time.perf_counter()
            ok = Kzg.verify_blob_kzg_proof_batch(b, c, p, settings)
            samples.append(time.perf_counter() - t0)
            assert ok is True
        hb, hm, hp90 = _stats(samples)
        out[f"host_n{bn}_blobs_per_s"] = round(bn / hb, 2)
        out[f"host_n{bn}_median_blobs_per_s"] = round(bn / hm, 2)
        out[f"host_n{bn}_best_ms"] = round(hb * 1e3, 2)
        out[f"host_n{bn}_median_ms"] = round(hm * 1e3, 2)
        out[f"host_n{bn}_p90_ms"] = round(hp90 * 1e3, 2)
        out[f"host_n{bn}_reps"] = reps

    # Forced-device measurement in a deadlined child (a degraded tunnel must
    # not hang the bench channel; the child's compile cache is shared).  A
    # cold cache gets a larger deadline — the child pays full XLA compiles
    # before its first dispatch.  The child learns its own deadline so it
    # can scale per-size rep counts to the remaining budget.
    deadline = DEVICE_TIMEOUT_S + (COLD_CACHE_EXTRA_S if device_cold else 0.0)
    try:
        child_env = dict(os.environ, KZG_BENCH_CHILD_DEADLINE_S=str(deadline - 30.0))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--device-probe"],
            capture_output=True,
            timeout=deadline,
            cwd=ROOT,
            env=child_env,
        )
        parsed = _last_json_line(proc.stdout.decode(errors="replace"))
        if parsed is None:
            tail = proc.stderr.decode(errors="replace")[-300:]
            parsed = {"device_error": f"probe rc={proc.returncode}: {tail}"}
        elif proc.returncode != 0:
            # The child emits cumulative lines (link profile first), so a
            # crash mid-probe still parses — record that it crashed rather
            # than passing the partial fields off as a clean run.
            tail = proc.stderr.decode(errors="replace")[-300:]
            parsed["device_probe_rc"] = f"rc={proc.returncode}: {tail}"
    except subprocess.TimeoutExpired as te:
        # The child prints cumulative fields after every batch size;
        # salvage the last complete line from the partial output.
        partial = te.stdout.decode(errors="replace") if te.stdout else ""
        parsed = _last_json_line(partial)
        if parsed is None:
            parsed = {"device_error": f"probe exceeded {deadline:.0f}s deadline"}
        else:
            parsed["device_probe_truncated"] = f"deadline {deadline:.0f}s"
    if device_cold:
        parsed["device_cache_cold"] = True
    out.update(parsed)

    print(json.dumps(out))


if __name__ == "__main__":
    if "--device-probe" in sys.argv:
        device_probe()
    else:
        main()
