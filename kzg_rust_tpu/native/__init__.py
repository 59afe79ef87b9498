"""ctypes loader + Python wrappers for the native host-crypto runtime.

The shared object (built from ``native/kzg_native.cpp``) provides the
host-side counterpart of blst for this build (reference: the C+asm blst
crate behind every ``unsafe`` block in src/utils.rs): point (de)serial-
ization, single scalar multiplications, the pairing check, and batched
barycentric evaluation.  The pure-Python golden model remains the oracle
and the fallback — everything here returns bit-identical results, and
``available()`` is False (all wrappers unusable) when no compiler or
prebuilt library exists.

Point convention matches the golden model: affine int tuples, ``None`` for
infinity; G2 coordinates are Fp2 pairs.  The boundary serializes to
canonical big-endian bytes (48 B/Fp, 32 B/Fr).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

from ..messages import (
    G2_UNCOMPRESS_RC_ERRORS,
    MSG_EXPECT_48,
    MSG_G2_EXPECT_96,
    MSG_INVALID_BYTES32,
    PROVER_RC_ERRORS,
    VERIFY_RC_ERRORS,
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "kzg_native.cpp")
_ABI_VERSION = 6

_lib = None
_lib_lock = threading.Lock()
_load_failed = False

P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001


def _cache_dir() -> str:
    d = os.path.expanduser(os.environ.get("KZG_TPU_CACHE_DIR", "~/.cache/kzg_rust_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str | None:
    """Compile the shared object into the cache dir, keyed by source hash.
    Best-effort: any failure (missing source/compiler, unwritable cache
    dir) returns None and the golden path takes over."""
    try:
        if not os.path.exists(_SRC):
            return None
        with open(_SRC, "rb") as fh:
            digest = hashlib.sha256(fh.read()).hexdigest()[:16]
        out = os.path.join(_cache_dir(), f"libkzg_native-{digest}.so")
    except OSError:
        return None
    if os.path.exists(out):
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-march=native", "-fPIC", "-std=c++17", "-pthread",
        "-shared", "-o", tmp, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, OSError):
        return None
    os.replace(tmp, out)
    return out


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("KZG_TPU_NATIVE", "1") == "0":
            _load_failed = True
            return None
        path = os.environ.get("KZG_TPU_NATIVE_LIB") or _build()
        if path is None:
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
            if lib.kzg_native_abi_version() != _ABI_VERSION:
                _load_failed = True
                return None
        except Exception:
            # missing file (OSError), missing symbol (AttributeError), or
            # any other probe failure: fall back to the pure-Python path
            _load_failed = True
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Byte codecs (golden int tuples <-> boundary bytes)
# ---------------------------------------------------------------------------


def _g1_to_bytes(p):
    if p is None:
        return b"\x00" * 96, 1
    return p[0].to_bytes(48, "big") + p[1].to_bytes(48, "big"), 0


def _g1_from_bytes(buf, inf: int):
    if inf:
        return None
    b = bytes(buf)
    return (int.from_bytes(b[:48], "big"), int.from_bytes(b[48:], "big"))


def _g2_to_bytes(p):
    if p is None:
        return b"\x00" * 192, 1
    (x0, x1), (y0, y1) = p
    return (
        x0.to_bytes(48, "big") + x1.to_bytes(48, "big")
        + y0.to_bytes(48, "big") + y1.to_bytes(48, "big")
    ), 0


def _g2_from_bytes(buf, inf: int):
    if inf:
        return None
    b = bytes(buf)
    return (
        (int.from_bytes(b[:48], "big"), int.from_bytes(b[48:96], "big")),
        (int.from_bytes(b[96:144], "big"), int.from_bytes(b[144:], "big")),
    )


# ---------------------------------------------------------------------------
# Wrappers (signatures mirror golden/curve.py + golden/pairing.py)
# ---------------------------------------------------------------------------


def g1_uncompress(data: bytes):
    """48-byte ZCash-format decode (reference: blst_p1_uncompress at
    utils.rs:291); raises BadArgs like golden.curve.g1_uncompress."""
    from ..errors import BadArgs

    lib = _load()
    if len(data) != 48:
        raise BadArgs(MSG_EXPECT_48)
    out = (ctypes.c_uint8 * 96)()
    inf = ctypes.c_int()
    rc = lib.kzg_g1_uncompress(bytes(data), out, ctypes.byref(inf))
    if rc:
        raise BadArgs("g1_uncompress: malformed point encoding")
    return _g1_from_bytes(out, inf.value)


def g1_uncompress_batch(datas):
    """Parallel decode of many 48-byte points; raises BadArgs on the first
    malformed one."""
    from ..errors import BadArgs

    lib = _load()
    n = len(datas)
    if n == 0:
        return []
    joined = b"".join(bytes(d) for d in datas)
    if len(joined) != 48 * n:
        raise BadArgs(MSG_EXPECT_48)
    out = (ctypes.c_uint8 * (96 * n))()
    infs = (ctypes.c_uint8 * n)()
    errs = (ctypes.c_uint8 * n)()
    bad = lib.kzg_g1_uncompress_batch(joined, n, out, infs, errs)
    if bad:
        raise BadArgs("g1_uncompress: malformed point encoding")
    res = []
    for i in range(n):
        res.append(_g1_from_bytes(out[96 * i : 96 * (i + 1)], infs[i]))
    return res


def g2_uncompress(data: bytes):
    """96-byte ZCash-format G2 decode (reference: blst_p2_uncompress at
    kzg.rs:876): native Fp2 sqrt (eprint 2012/685 alg 9) instead of the
    golden Tonelli-Shanks — same points, same error strings (differential:
    tests/test_native.py)."""
    from ..errors import BadArgs

    lib = _load()
    if len(data) != 96:
        raise BadArgs(MSG_G2_EXPECT_96)
    out = (ctypes.c_uint8 * 192)()
    inf = ctypes.c_int()
    rc = lib.kzg_g2_uncompress(bytes(data), out, ctypes.byref(inf))
    if rc:
        raise BadArgs(G2_UNCOMPRESS_RC_ERRORS.get(rc, f"g2_uncompress failed ({rc})"))
    return _g2_from_bytes(out, inf.value)


def g1_compress(p) -> bytes:
    lib = _load()
    xy, inf = _g1_to_bytes(p)
    out = (ctypes.c_uint8 * 48)()
    lib.kzg_g1_compress(xy, inf, out)
    return bytes(out)


def g1_in_subgroup(p) -> bool:
    lib = _load()
    xy, inf = _g1_to_bytes(p)
    return lib.kzg_g1_in_subgroup(xy, inf) == 1


def g1_subgroup_batch(points) -> bool:
    """True iff every point is in G1 (infinity passes)."""
    lib = _load()
    n = len(points)
    if n == 0:
        return True
    bufs, infs = [], []
    for p in points:
        xy, inf = _g1_to_bytes(p)
        bufs.append(xy)
        infs.append(inf)
    return lib.kzg_g1_subgroup_batch(b"".join(bufs), bytes(infs), n) == 1


def g1_mul(p, k: int):
    lib = _load()
    k %= R
    if p is None or k == 0:
        return None
    xy, inf = _g1_to_bytes(p)
    out = (ctypes.c_uint8 * 96)()
    oinf = ctypes.c_int()
    lib.kzg_g1_mul(xy, inf, k.to_bytes(32, "big"), out, ctypes.byref(oinf))
    return _g1_from_bytes(out, oinf.value)


def _g1_addsub(p, q, negate: int):
    lib = _load()
    pxy, pinf = _g1_to_bytes(p)
    qxy, qinf = _g1_to_bytes(q)
    out = (ctypes.c_uint8 * 96)()
    oinf = ctypes.c_int()
    lib.kzg_g1_add(pxy, pinf, qxy, qinf, negate, out, ctypes.byref(oinf))
    return _g1_from_bytes(out, oinf.value)


def g1_add(p, q):
    return _g1_addsub(p, q, 0)


def g1_sub(p, q):
    return _g1_addsub(p, q, 1)


def g2_mul(p, k: int):
    lib = _load()
    k %= R
    if p is None or k == 0:
        return None
    b, inf = _g2_to_bytes(p)
    out = (ctypes.c_uint8 * 192)()
    oinf = ctypes.c_int()
    lib.kzg_g2_mul(b, inf, k.to_bytes(32, "big"), out, ctypes.byref(oinf))
    return _g2_from_bytes(out, oinf.value)


def _g2_addsub(p, q, negate: int):
    lib = _load()
    pb, pinf = _g2_to_bytes(p)
    qb, qinf = _g2_to_bytes(q)
    out = (ctypes.c_uint8 * 192)()
    oinf = ctypes.c_int()
    lib.kzg_g2_add(pb, pinf, qb, qinf, negate, out, ctypes.byref(oinf))
    return _g2_from_bytes(out, oinf.value)


def g2_add(p, q):
    return _g2_addsub(p, q, 0)


def g2_sub(p, q):
    return _g2_addsub(p, q, 1)


def g1_lincomb_naive(points, scalars):
    """Runtime-base lincomb, reference semantics (utils.rs:329-342)."""
    lib = _load()
    n = len(points)
    if n != len(scalars):
        raise ValueError("g1_lincomb: points/scalars length mismatch")
    if n == 0:
        return None
    bufs, infs, sb = [], [], []
    for p, s in zip(points, scalars):
        xy, inf = _g1_to_bytes(p)
        bufs.append(xy)
        infs.append(inf)
        sb.append((s % R).to_bytes(32, "big"))
    out = (ctypes.c_uint8 * 96)()
    oinf = ctypes.c_int()
    rc = lib.kzg_g1_lincomb(
        b"".join(bufs), bytes(infs), b"".join(sb), n, out, ctypes.byref(oinf)
    )
    if rc:
        raise ValueError("g1_lincomb: bad point bytes")
    return _g1_from_bytes(out, oinf.value)


def pairings_verify(a1, a2, b1, b2) -> bool:
    """e(a1, a2) == e(b1, b2) (reference: pairings_verify, utils.rs:189-214)."""
    lib = _load()
    a1b, a1i = _g1_to_bytes(a1)
    b1b, b1i = _g1_to_bytes(b1)
    a2b, a2i = _g2_to_bytes(a2)
    b2b, b2i = _g2_to_bytes(b2)
    rc = lib.kzg_pairings_verify(a1b, a1i, a2b, a2i, b1b, b1i, b2b, b2i)
    if rc < 0:
        raise ValueError("pairings_verify: bad point bytes")
    return rc == 1


# ---------------------------------------------------------------------------
# Barycentric evaluation context
# ---------------------------------------------------------------------------


class BaryCtx:
    """Holds the converted roots-of-unity table for repeated evaluations.

    Mirrors evaluate_polynomial_in_evaluation_form (reference:
    kzg.rs:346-389) minus the in-domain short-circuit, which the caller
    handles (kzg.rs:360-362).
    """

    def __init__(self, roots_of_unity: list[int]):
        lib = _load()
        n = len(roots_of_unity)
        blob = b"".join(w.to_bytes(32, "big") for w in roots_of_unity)
        lib.kzg_bary_ctx_new.restype = ctypes.c_void_p
        handle = lib.kzg_bary_ctx_new(n, blob)
        if not handle:
            raise ValueError("bary_ctx: bad roots")
        self._handle = handle
        self._n = n
        self._lib = lib

    def eval_batch(self, blobs_bytes: bytes, nb: int, xs: list[int]) -> list[int]:
        """blobs_bytes: nb*n*32 raw field-element bytes; xs: canonical ints.
        Returns ys; raises BadArgs on non-canonical blob elements."""
        from ..errors import BadArgs

        xs_b = b"".join(x.to_bytes(32, "big") for x in xs)
        ys = (ctypes.c_uint8 * (32 * nb))()
        rc = self._lib.kzg_bary_eval_batch(
            ctypes.c_void_p(self._handle), blobs_bytes, nb, xs_b, ys
        )
        if rc == 2:
            raise BadArgs(MSG_INVALID_BYTES32)
        if rc:
            raise BadArgs(f"barycentric evaluation failed (code {rc})")
        out = bytes(ys)
        return [int.from_bytes(out[32 * i : 32 * (i + 1)], "big") for i in range(nb)]

    def __del__(self):
        try:
            self._lib.kzg_bary_ctx_free(ctypes.c_void_p(self._handle))
        except Exception:
            pass


def sha256(data: bytes) -> bytes:
    """Native SHA-256 (differential-tested against hashlib)."""
    lib = _load()
    out = (ctypes.c_uint8 * 32)()
    lib.kzg_sha256(data, ctypes.c_uint64(len(data)), out)
    return bytes(out)


# ---------------------------------------------------------------------------
# Fused batch verification context
# ---------------------------------------------------------------------------


class VerifyCtx:
    """One-call native verify_blob_kzg_proof_batch hot section (reference:
    kzg.rs:637-693 + :579-627): point validation, Fiat-Shamir challenges,
    barycentric evaluations, RLC combination and the single pairing check,
    all inside one GIL-free native region."""

    # rc-code -> message contract lives in kzg_rust_tpu.messages (one
    # source of truth across golden/device/native; tests/test_messages.py).
    _ERRORS = VERIFY_RC_ERRORS

    def __init__(self, roots_of_unity, g2_s, g2_gen, fs_domain: bytes, rc_domain: bytes):
        lib = _load()
        n = len(roots_of_unity)
        roots = b"".join(w.to_bytes(32, "big") for w in roots_of_unity)
        g2s_b, g2s_inf = _g2_to_bytes(g2_s)
        g2g_b, g2g_inf = _g2_to_bytes(g2_gen)
        lib.kzg_verify_ctx_new.restype = ctypes.c_void_p
        handle = lib.kzg_verify_ctx_new(
            n, roots, g2s_b, g2s_inf, g2g_b, g2g_inf, bytes(fs_domain), bytes(rc_domain)
        )
        if not handle:
            raise ValueError("verify_ctx: bad inputs")
        self._handle = handle
        self._lib = lib

    def verify(self, blobs_bytes: bytes, nb: int, comms: bytes, proofs: bytes) -> bool:
        """blobs_bytes: nb*n*32; comms/proofs: nb*48 compressed points.
        Raises BadArgs on invalid inputs (same cases as the piecewise path)."""
        from ..errors import BadArgs

        ok = ctypes.c_int()
        rc = self._lib.kzg_verify_blob_batch(
            ctypes.c_void_p(self._handle), blobs_bytes, nb, comms, proofs,
            ctypes.byref(ok),
        )
        if rc:
            raise BadArgs(self._ERRORS.get(rc, f"verify_blob_batch failed ({rc})"))
        return ok.value == 1

    def verify_scatter(self, blobs, nb: int, comms: bytes, proofs: bytes) -> bool:
        """Zero-copy variant: ``blobs`` is a sequence of nb per-blob byte
        buffers (each n*32); only their pointers cross the boundary."""
        from ..errors import BadArgs

        ptrs = (ctypes.c_char_p * nb)(*blobs)
        ok = ctypes.c_int()
        rc = self._lib.kzg_verify_blob_batch_ptrs(
            ctypes.c_void_p(self._handle), ptrs, nb, comms, proofs,
            ctypes.byref(ok),
        )
        if rc:
            raise BadArgs(self._ERRORS.get(rc, f"verify_blob_batch failed ({rc})"))
        return ok.value == 1

    def verify_single(self, comm48: bytes, z32: bytes, y32: bytes, proof48: bytes) -> bool:
        """Fused verify_kzg_proof (reference: kzg.rs:429-443): decode +
        validation + the pairing equation in one native call."""
        from ..errors import BadArgs

        ok = ctypes.c_int()
        rc = self._lib.kzg_verify_single(
            ctypes.c_void_p(self._handle), comm48, z32, y32, proof48,
            ctypes.byref(ok),
        )
        if rc:
            raise BadArgs(self._ERRORS.get(rc, f"verify_single failed ({rc})"))
        return ok.value == 1

    def verify_blob_single(self, blob_bytes: bytes, comm48: bytes, proof48: bytes) -> bool:
        """Fused verify_blob_kzg_proof (reference: kzg.rs:547-569):
        challenge + barycentric + pairing in one native call."""
        from ..errors import BadArgs

        ok = ctypes.c_int()
        rc = self._lib.kzg_verify_blob_single(
            ctypes.c_void_p(self._handle), blob_bytes, comm48, proof48,
            ctypes.byref(ok),
        )
        if rc:
            raise BadArgs(self._ERRORS.get(rc, f"verify_blob_single failed ({rc})"))
        return ok.value == 1

    def __del__(self):
        try:
            self._lib.kzg_verify_ctx_free(ctypes.c_void_p(self._handle))
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Fused prover context
# ---------------------------------------------------------------------------


class ProverCtx:
    """One-call native prover ops over a persistent Lagrange-setup context:
    blob_to_kzg_commitment, compute_kzg_proof, compute_blob_kzg_proof
    (reference: kzg.rs:396-406, :446-544).  The MSM is the same Pippenger
    bucket method the batch verifier uses; results are bit-identical to the
    golden model (differential-tested in tests/test_native.py)."""

    _ERRORS = PROVER_RC_ERRORS  # shared contract, see kzg_rust_tpu.messages

    def __init__(self, roots_of_unity, g1_lagrange, fs_domain: bytes):
        lib = _load()
        n = len(roots_of_unity)
        if len(g1_lagrange) != n:
            raise ValueError("prover_ctx: |g1_lagrange| != |roots|")
        roots = b"".join(w.to_bytes(32, "big") for w in roots_of_unity)
        pts = bytearray(96 * n)
        infs = bytearray(n)
        for i, p in enumerate(g1_lagrange):
            b, inf = _g1_to_bytes(p)
            pts[96 * i : 96 * (i + 1)] = b
            infs[i] = inf
        lib.kzg_prover_ctx_new.restype = ctypes.c_void_p
        handle = lib.kzg_prover_ctx_new(
            n, roots, bytes(pts), bytes(infs), bytes(fs_domain)
        )
        if not handle:
            raise ValueError("prover_ctx: bad inputs")
        self._handle = handle
        self._lib = lib

    def _raise(self, rc: int, what: str):
        from ..errors import BadArgs

        raise BadArgs(self._ERRORS.get(rc, f"{what} failed ({rc})"))

    def commit(self, blob_bytes: bytes):
        """blob -> commitment point (reference: kzg.rs:396-406)."""
        out = (ctypes.c_uint8 * 96)()
        inf = ctypes.c_int()
        rc = self._lib.kzg_prover_commit(
            ctypes.c_void_p(self._handle), blob_bytes, out, ctypes.byref(inf)
        )
        if rc:
            self._raise(rc, "prover_commit")
        return _g1_from_bytes(out, inf.value)

    def prove(self, blob_bytes: bytes, z32: bytes):
        """compute_kzg_proof -> (proof point, y int)
        (reference: kzg.rs:446-457)."""
        out = (ctypes.c_uint8 * 96)()
        inf = ctypes.c_int()
        y = (ctypes.c_uint8 * 32)()
        rc = self._lib.kzg_prover_prove(
            ctypes.c_void_p(self._handle), blob_bytes, z32, out,
            ctypes.byref(inf), y,
        )
        if rc:
            self._raise(rc, "prover_prove")
        return _g1_from_bytes(out, inf.value), int.from_bytes(bytes(y), "big")

    def blob_proof(self, blob_bytes: bytes, comm48: bytes):
        """compute_blob_kzg_proof -> proof point
        (reference: kzg.rs:533-544)."""
        out = (ctypes.c_uint8 * 96)()
        inf = ctypes.c_int()
        rc = self._lib.kzg_prover_blob_proof(
            ctypes.c_void_p(self._handle), blob_bytes, comm48, out,
            ctypes.byref(inf),
        )
        if rc:
            self._raise(rc, "prover_blob_proof")
        return _g1_from_bytes(out, inf.value)

    def __del__(self):
        try:
            self._lib.kzg_prover_ctx_free(ctypes.c_void_p(self._handle))
        except Exception:
            pass
