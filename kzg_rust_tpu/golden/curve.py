"""Golden-model BLS12-381 group arithmetic and ZCash-format serialization.

Re-creates the blst point surface the reference uses (SURVEY.md section 2.3:
``blst_p1_*``, ``blst_p2_*``, compress/uncompress, subgroup checks,
``blst_p1s_mult_pippenger``) with pure Python integers.

Point representation: affine tuples, ``None`` == point at infinity.
  * G1: ``(x, y)`` with ``x, y`` in Fp;  curve  y^2 = x^3 + 4.
  * G2: ``((x0,x1), (y0,y1))`` over Fp2; curve  y^2 = x^3 + 4(1+u).

Golden code is allowed to branch on data (it runs on host); the TPU kernels
in ``kzg_rust_tpu.ops`` are the branch-free re-expressions.
"""

from __future__ import annotations

from ..errors import BadArgs
from . import field as f
from .field import P, R

# Generators (standard BLS12-381 values; reference stores the same points as
# Montgomery-form Jacobian limbs in src/consts.rs:47-154).
G1_GENERATOR = (
    0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
)
G2_GENERATOR = (
    (
        0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
        0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
    ),
    (
        0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
        0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
    ),
)

_B_G1 = 4
_B_G2 = (4, 4)  # 4 * (1 + u)


# ---------------------------------------------------------------------------
# G1 arithmetic (affine with branching; host-side oracle only)
# ---------------------------------------------------------------------------


def g1_is_inf(p) -> bool:
    return p is None


def g1_neg(p):
    if p is None:
        return None
    return (p[0], (-p[1]) % P)


def g1_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        # doubling
        lam = (3 * x1 * x1 * pow(2 * y1, -1, P)) % P
    else:
        lam = ((y2 - y1) * pow(x2 - x1, -1, P)) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def g1_double(p):
    return g1_add(p, p)


def g1_mul(p, k: int):
    """Scalar multiplication (reference: utils.rs:126-140 uses 256-bit blst_p1_mult)."""
    k %= R
    result = None
    base = p
    while k:
        if k & 1:
            result = g1_add(result, base)
        base = g1_add(base, base)
        k >>= 1
    return result


def g1_sub(p, q):
    # reference: utils.rs:162-172 (cneg + add)
    return g1_add(p, g1_neg(q))


def g1_eq(p, q) -> bool:
    return p == q


def g1_is_on_curve(p) -> bool:
    if p is None:
        return True
    x, y = p
    return (y * y - (x * x * x + _B_G1)) % P == 0


def g1_in_subgroup(p) -> bool:
    """Subgroup check: [r]P == infinity (reference: blst_p1_in_g1 at utils.rs:303)."""
    if p is None:
        return True
    if not g1_is_on_curve(p):
        return False
    return g1_mul_unsafe(p, R) is None


def g1_mul_unsafe(p, k: int):
    """Scalar mult without reducing k mod r (for subgroup checks)."""
    result = None
    base = p
    while k:
        if k & 1:
            result = g1_add(result, base)
        base = g1_add(base, base)
        k >>= 1
    return result


# ---------------------------------------------------------------------------
# G2 arithmetic
# ---------------------------------------------------------------------------


def g2_is_inf(p) -> bool:
    return p is None


def g2_neg(p):
    if p is None:
        return None
    return (p[0], f.fp2_neg(p[1]))


def g2_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if f.fp2_eq(x1, x2):
        if f.fp2_is_zero(f.fp2_add(y1, y2)):
            return None
        lam = f.fp2_mul(
            f.fp2_mul_fp(f.fp2_sqr(x1), 3),
            f.fp2_inv(f.fp2_mul_fp(y1, 2)),
        )
    else:
        lam = f.fp2_mul(f.fp2_sub(y2, y1), f.fp2_inv(f.fp2_sub(x2, x1)))
    x3 = f.fp2_sub(f.fp2_sub(f.fp2_sqr(lam), x1), x2)
    y3 = f.fp2_sub(f.fp2_mul(lam, f.fp2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_mul(p, k: int):
    k %= R
    result = None
    base = p
    while k:
        if k & 1:
            result = g2_add(result, base)
        base = g2_add(base, base)
        k >>= 1
    return result


def g2_sub(p, q):
    # reference: utils.rs:174-183
    return g2_add(p, g2_neg(q))


def g2_is_on_curve(p) -> bool:
    if p is None:
        return True
    x, y = p
    return f.fp2_eq(f.fp2_sqr(y), f.fp2_add(f.fp2_mul(f.fp2_sqr(x), x), _B_G2))


# ---------------------------------------------------------------------------
# ZCash-format (de)serialization - reference: blst compress/uncompress,
# called at utils.rs:221-310 and kzg.rs:859-887.
# ---------------------------------------------------------------------------

_FLAG_COMPRESSED = 0x80
_FLAG_INFINITY = 0x40
_FLAG_SIGN = 0x20


def g1_compress(p) -> bytes:
    """48-byte compressed encoding (reference: bytes_from_g1, utils.rs:221)."""
    if p is None:
        return bytes([0xC0] + [0] * 47)
    x, y = p
    out = bytearray(x.to_bytes(48, "big"))
    out[0] |= _FLAG_COMPRESSED
    if y > (P - 1) // 2:
        out[0] |= _FLAG_SIGN
    return bytes(out)


def g1_uncompress(data: bytes):
    """Decode 48 bytes; on-curve check included, no subgroup check.

    Mirrors blst_p1_uncompress semantics (used at utils.rs:291, kzg.rs:861).
    Raises BadArgs on any malformed encoding.
    """
    if len(data) != 48:
        raise BadArgs("g1_uncompress: expected 48 bytes")
    flags = data[0]
    if not flags & _FLAG_COMPRESSED:
        raise BadArgs("g1_uncompress: uncompressed bit not set")
    if flags & _FLAG_INFINITY:
        # All other bits must be zero.
        if flags != (_FLAG_COMPRESSED | _FLAG_INFINITY) or any(data[1:]):
            raise BadArgs("g1_uncompress: bad infinity encoding")
        return None
    x = int.from_bytes(bytes([flags & 0x1F]) + data[1:], "big")
    if x >= P:
        raise BadArgs("g1_uncompress: x out of range")
    y2 = (x * x * x + _B_G1) % P
    y = f.fp_sqrt(y2)
    if y is None:
        raise BadArgs("g1_uncompress: point not on curve")
    sign = bool(flags & _FLAG_SIGN)
    if (y > (P - 1) // 2) != sign:
        y = (-y) % P
    return (x, y)


def g2_compress(p) -> bytes:
    """96-byte compressed encoding: x_c1 || x_c0 with flags on byte 0."""
    if p is None:
        return bytes([0xC0] + [0] * 95)
    (x0, x1), (y0, y1) = p
    out = bytearray(x1.to_bytes(48, "big") + x0.to_bytes(48, "big"))
    out[0] |= _FLAG_COMPRESSED
    # Sign: y lexicographically largest, ordering (c1, c0).
    neg = ((-y0) % P, (-y1) % P)
    if (y1, y0) > (neg[1], neg[0]):
        out[0] |= _FLAG_SIGN
    return bytes(out)


def g2_uncompress(data: bytes):
    """Decode 96 bytes (reference: blst_p2_uncompress at kzg.rs:876)."""
    if len(data) != 96:
        raise BadArgs("g2_uncompress: expected 96 bytes")
    flags = data[0]
    if not flags & _FLAG_COMPRESSED:
        raise BadArgs("g2_uncompress: uncompressed bit not set")
    if flags & _FLAG_INFINITY:
        if flags != (_FLAG_COMPRESSED | _FLAG_INFINITY) or any(data[1:]):
            raise BadArgs("g2_uncompress: bad infinity encoding")
        return None
    x1 = int.from_bytes(bytes([flags & 0x1F]) + data[1:48], "big")
    x0 = int.from_bytes(data[48:96], "big")
    if x0 >= P or x1 >= P:
        raise BadArgs("g2_uncompress: x out of range")
    x = (x0, x1)
    y2 = f.fp2_add(f.fp2_mul(f.fp2_sqr(x), x), _B_G2)
    y = f.fp2_sqrt(y2)
    if y is None:
        raise BadArgs("g2_uncompress: point not on curve")
    sign = bool(flags & _FLAG_SIGN)
    y0, y1 = y
    neg = ((-y0) % P, (-y1) % P)
    if ((y1, y0) > (neg[1], neg[0])) != sign:
        y = neg
    return (x, y)


# ---------------------------------------------------------------------------
# Multi-scalar multiplication - reference: utils.rs:329-410
# ---------------------------------------------------------------------------


def g1_lincomb_naive(points, scalars):
    """Per-point mult + add (reference: utils.rs:329-342, used in verification)."""
    acc = None
    for p, s in zip(points, scalars):
        acc = g1_add(acc, g1_mul(p, s))
    return acc


def g1_lincomb_pippenger(points, scalars, window: int = 8):
    """Bucket-method MSM (reference: blst_p1s_mult_pippenger, utils.rs:399)."""
    n = len(points)
    if n == 0:
        return None
    if n < 8:
        # reference: utils.rs:369-371 falls back to naive below 8 points
        return g1_lincomb_naive(points, scalars)
    nbits = 255
    nwin = (nbits + window - 1) // window
    acc = None
    for w in range(nwin - 1, -1, -1):
        if acc is not None:
            for _ in range(window):
                acc = g1_double(acc)
        buckets = [None] * (1 << window)
        shift = w * window
        for p, s in zip(points, scalars):
            d = (s >> shift) & ((1 << window) - 1)
            if d:
                buckets[d] = g1_add(buckets[d], p)
        running = None
        win_sum = None
        for d in range((1 << window) - 1, 0, -1):
            running = g1_add(running, buckets[d])
            win_sum = g1_add(win_sum, running)
        acc = g1_add(acc, win_sum)
    return acc
