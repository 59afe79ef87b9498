"""Multi-precision modular arithmetic on TPU-friendly limb tensors.

This is the foundation of the device compute path: every BLS12-381 field
element (Fp, 381 bits; Fr, 255 bits) is a vector of 12-bit limbs held in
``uint32`` lanes, and every arithmetic op is a fixed-shape, branch-free JAX
program that vectorizes over arbitrary leading batch dimensions.  It replaces
the blst scalar/field assembly the reference delegates to
(reference: src/utils.rs:10-123 fr helpers; SURVEY.md section 2.3).

Why 12-bit limbs in 32-bit lanes: TPUs have no 64-bit integer multiplier, so
limb products must fit in 32 bits together with long accumulation chains.
With ``b = 2^12`` a limb product is < 2^24 and a Montgomery (CIOS) column can
absorb 2 products per iteration for 32 iterations plus carries while staying
< 2^31 - comfortably inside a uint32 lane with no per-iteration
normalization.  Fp needs 32 limbs (384 bits), Fr needs 22 (264 bits); both
give a Montgomery radix R = b^n strictly greater than the modulus.

All values are canonical (< modulus) with limbs in ``[0, 2^12)`` at function
boundaries; Montgomery-form values are canonical representatives of
``x * R mod N``.  Carry propagation is an unrolled ripple along the (minor)
limb axis - sequential in the limb index but full-width across the batch,
which is exactly the layout the VPU wants.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

BASE_BITS = 12
BASE = 1 << BASE_BITS
MASK = BASE - 1


# ---------------------------------------------------------------------------
# Field specification
# ---------------------------------------------------------------------------


class FieldSpec:
    """Static per-field constants: modulus limbs and Montgomery parameters."""

    def __init__(self, name: str, modulus: int, nlimbs: int):
        if (1 << (BASE_BITS * nlimbs)) <= modulus:
            raise ValueError("nlimbs too small for modulus")
        self.name = name
        self.modulus = modulus
        self.nlimbs = nlimbs
        self.mod_limbs = int_to_limbs(nlimbs, modulus)  # np.uint32 [n]
        # -N^-1 mod b, the per-iteration Montgomery quotient multiplier.
        self.n0inv = int((-pow(modulus, -1, BASE)) % BASE)
        r = 1 << (BASE_BITS * nlimbs)
        self.mont_r = r % modulus
        self.one_mont = int_to_limbs(nlimbs, r % modulus)  # mont(1)
        self.r2 = int_to_limbs(nlimbs, (r * r) % modulus)  # to-mont factor
        self.one = int_to_limbs(nlimbs, 1)  # from-mont factor
        self.zero = int_to_limbs(nlimbs, 0)

    def __repr__(self):  # pragma: no cover
        return f"FieldSpec({self.name}, {self.nlimbs} limbs)"


# ---------------------------------------------------------------------------
# Host codecs (numpy; python ints <-> limb arrays)
# ---------------------------------------------------------------------------


def int_to_limbs(nlimbs: int, value: int) -> np.ndarray:
    """One python int -> [nlimbs] uint32 little-endian 12-bit limbs."""
    out = np.zeros(nlimbs, dtype=np.uint32)
    for k in range(nlimbs):
        out[k] = value & MASK
        value >>= BASE_BITS
    if value:
        raise ValueError("value does not fit in nlimbs")
    return out


def ints_to_limbs(nlimbs: int, values) -> np.ndarray:
    """Batch of python ints -> [B, nlimbs] uint32 limbs (vectorized)."""
    nbytes = 3 * (nlimbs // 2) if nlimbs % 2 == 0 else 3 * (nlimbs // 2) + 2
    buf = b"".join(int(v).to_bytes(nbytes, "little") for v in values)
    le = np.frombuffer(buf, dtype=np.uint8).reshape(len(values), nbytes)
    return bytes_le_to_limbs(nlimbs, le)


def bytes_le_to_limbs(nlimbs: int, le) -> np.ndarray:
    """[B, nbytes] little-endian uint8 -> [B, nlimbs] 12-bit limbs.

    Works for both numpy and jnp inputs (pure array ops), so the same codec
    runs on host for setup loading and on device for blob ingestion.
    Every 3 bytes encode exactly 2 limbs.
    """
    xp = jnp if isinstance(le, jnp.ndarray) else np
    b = le.shape[0]
    ngroups = (nlimbs + 1) // 2
    need = 3 * ngroups
    if le.shape[1] < need:
        pad = xp.zeros((b, need - le.shape[1]), dtype=le.dtype)
        le = xp.concatenate([le, pad], axis=1)
    g = le[:, : 3 * ngroups].reshape(b, ngroups, 3).astype(xp.uint32)
    even = g[:, :, 0] | ((g[:, :, 1] & 0xF) << 8)
    odd = (g[:, :, 1] >> 4) | (g[:, :, 2] << 4)
    limbs = xp.stack([even, odd], axis=2).reshape(b, 2 * ngroups)
    return limbs[:, :nlimbs]


def limbs_to_int(arr) -> int:
    """[n] limbs -> python int."""
    arr = np.asarray(arr, dtype=np.uint64)
    v = 0
    for k in range(arr.shape[-1] - 1, -1, -1):
        v = (v << BASE_BITS) | int(arr[k])
    return v


def limbs_to_ints(arr) -> list[int]:
    """[B, n] limbs -> list of python ints."""
    arr = np.asarray(arr)
    return [limbs_to_int(arr[i]) for i in range(arr.shape[0])]


# ---------------------------------------------------------------------------
# Carry machinery (device)
# ---------------------------------------------------------------------------


def carry_canonical(cols, nout: int):
    """Normalize accumulated columns (< 2^31 each) into 12-bit limbs.

    Unrolled ripple along the limb axis: sequential in limb index, full
    vector width across the batch.  ``nout >= cols.shape[-1]`` gives room for
    the trailing carry.
    """
    m = cols.shape[-1]
    carry = jnp.zeros(cols.shape[:-1], dtype=jnp.uint32)
    out = []
    for k in range(m):
        v = cols[..., k] + carry
        out.append(v & MASK)
        carry = v >> BASE_BITS
    for _ in range(m, nout):
        out.append(carry & MASK)
        carry = carry >> BASE_BITS
    return jnp.stack(out, axis=-1)


def raw_sub(x, y):
    """Limb-wise subtraction with borrow chain.

    Returns ``(diff, borrow)`` where ``diff = x - y mod b^n`` and ``borrow``
    is a uint32 0/1 flag (1 iff x < y).  Inputs must be normalized 12-bit
    limbs.
    """
    n = x.shape[-1]
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    borrow = jnp.zeros(x.shape[:-1], dtype=jnp.int32)
    out = []
    for k in range(n):
        d = xi[..., k] - yi[..., k] - borrow
        borrow = (d < 0).astype(jnp.int32)
        out.append((d + (borrow << BASE_BITS)).astype(jnp.uint32))
    return jnp.stack(out, axis=-1), borrow.astype(jnp.uint32)


def _mod_broadcast(spec: FieldSpec, shape, width: int):
    mod = np.zeros(width, dtype=np.uint32)
    mod[: spec.nlimbs] = spec.mod_limbs
    return jnp.broadcast_to(jnp.asarray(mod), shape[:-1] + (width,))


def cond_sub_mod(spec: FieldSpec, x):
    """x in [0, 2N) as normalized limbs [..., m>=n] -> canonical [..., n]."""
    mod = _mod_broadcast(spec, x.shape, x.shape[-1])
    d, borrow = raw_sub(x, mod)
    out = jnp.where((borrow != 0)[..., None], x, d)
    return out[..., : spec.nlimbs]


# ---------------------------------------------------------------------------
# Modular add / sub / neg (canonical in, canonical out)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=0)
def add_mod(spec: FieldSpec, a, b):
    s = carry_canonical(a + b, spec.nlimbs + 1)
    return cond_sub_mod(spec, s)


@partial(jax.jit, static_argnums=0)
def sub_mod(spec: FieldSpec, a, b):
    d, borrow = raw_sub(a, b)
    mod = _mod_broadcast(spec, d.shape, spec.nlimbs)
    wrapped = carry_canonical(d + mod, spec.nlimbs)
    return jnp.where((borrow != 0)[..., None], wrapped, d)


def neg_mod(spec: FieldSpec, a):
    zero = jnp.zeros_like(a)
    return sub_mod(spec, zero, a)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(mask, a, b):
    """where(mask, a, b) with the limb axis broadcast."""
    return jnp.where(mask[..., None], a, b)


def geq_const(spec: FieldSpec, a, bound_limbs) -> jnp.ndarray:
    """a >= bound (both canonical limb vectors); returns bool [...]."""
    bound = jnp.broadcast_to(jnp.asarray(bound_limbs), a.shape)
    _, borrow = raw_sub(a, bound)
    return borrow == 0


# ---------------------------------------------------------------------------
# Montgomery multiplication (CIOS)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product ``a * b * R^-1 mod N`` on canonical limb tensors.

    CIOS with lazy columns: per iteration only column 0 is resolved (its low
    12 bits are exactly cancelled by construction of m); all other columns
    accumulate raw products.  Column bound: 32 iterations x 2 products
    (< 2^25) + carries < 2^31, safe in uint32 lanes.
    """
    n = spec.nlimbs
    mod = jnp.asarray(spec.mod_limbs)
    n0 = np.uint32(spec.n0inv)
    t = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape), dtype=jnp.uint32)
    zero_col = jnp.zeros(t.shape[:-1] + (1,), dtype=jnp.uint32)
    for i in range(n):
        ai = a[..., i : i + 1]
        prod = ai * b
        t0 = t[..., 0] + prod[..., 0]
        m = ((t0 & MASK) * n0) & MASK
        tl = t + prod + m[..., None] * mod
        c0 = tl[..., 0] >> BASE_BITS
        t = jnp.concatenate([tl[..., 1:], zero_col], axis=-1)
        t = t.at[..., 0].add(c0)
    norm = carry_canonical(t, n + 1)
    return cond_sub_mod(spec, norm)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    return mont_mul(spec, a, jnp.asarray(spec.r2))


def from_mont(spec: FieldSpec, a):
    return mont_mul(spec, a, jnp.asarray(spec.one))


@partial(jax.jit, static_argnums=(0, 2))
def mont_pow_const(spec: FieldSpec, a, exponent: int):
    """a^e (Montgomery in/out) for a trace-time-constant exponent.

    Square-and-multiply driven by a constant bit table inside a fori_loop so
    the compiled graph stays one-body-sized even for 381-bit exponents.
    """
    if exponent == 0:
        return jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape)
    bits = [int(c) for c in bin(exponent)[2:]]
    bits_arr = jnp.asarray(np.array(bits, dtype=np.uint32))

    def body(i, acc):
        acc = mont_sqr(spec, acc)
        mul = mont_mul(spec, acc, a)
        return jnp.where((bits_arr[i] != 0)[..., None], mul, acc)

    # Start from mont(1) and fold in all bits (including the leading one).
    init = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape)
    return lax.fori_loop(0, len(bits), body, init)


def mont_inv(spec: FieldSpec, a):
    """a^-1 via Fermat (a^(N-2)); Montgomery in/out.  inv(0) == 0."""
    return mont_pow_const(spec, a, spec.modulus - 2)


@partial(jax.jit, static_argnums=(0, 2))
def batch_mont_inv(spec: FieldSpec, x, axis: int = -2):
    """Batched inversion: one Fermat inversion + blocked prefix/suffix scans.

    Replaces the reference's sequential Montgomery batch-inversion loop
    (reference: utils.rs:94-123).  The batch axis of length L is reshaped to
    [K, G] blocks; inner ``lax.scan``s run K sequential steps at full G-wide
    vector width, outer scans combine the G block products, and a single
    Fermat inversion handles the grand total - O(sqrt(L)) sequential depth
    with a trace-time-constant graph (``associative_scan`` compiles
    quadratically here and is avoided on purpose).

    ``inv(x_i) = (prod of x_j except i) * inv(prod of all)``.  Zeros in the
    input produce garbage in every output slot (the running product is
    zero) - callers uphold the reference's "error on zero product" contract
    on host.
    """
    nax = axis % x.ndim
    # Move the batch axis to the front: [L, ...rest, nlimbs].
    xf = jnp.moveaxis(x, nax, 0)
    length = xf.shape[0]
    one = jnp.asarray(spec.one_mont)

    # Block the batch axis into [K, G] (pad with mont(1): product-neutral).
    g = 1
    while g * g < length:
        g *= 2
    k = -(-length // g)
    pad = k * g - length
    if pad:
        pad_block = jnp.broadcast_to(one, (pad,) + xf.shape[1:])
        xf = jnp.concatenate([xf, pad_block], axis=0)
    y = xf.reshape((k, g) + xf.shape[1:])  # [K, G, ...rest, n]

    mul = lambda u, v: mont_mul(spec, u, v)
    one_g = jnp.broadcast_to(one, y.shape[1:])

    def inner(carry, row):
        nxt = mul(carry, row)
        return nxt, carry  # exclusive prefix

    tot_f, pre_excl = lax.scan(inner, one_g, y)  # tot_f: [G,...]; pre_excl: [K,G,...]
    tot_b, suf_excl = lax.scan(inner, one_g, y, reverse=True)

    one_r = jnp.broadcast_to(one, y.shape[2:])

    def outer(carry, blk):
        nxt = mul(carry, blk)
        return nxt, carry  # exclusive across blocks

    total, bpre_excl = lax.scan(outer, one_r, tot_f)  # [G, ...rest, n]
    _, bsuf_excl = lax.scan(outer, one_r, tot_b, reverse=True)

    tinv = mont_inv(spec, total)

    # inv(x[k,g]) = pre_excl * suf_excl * block_pre * block_suf * tinv
    out = mul(pre_excl, suf_excl)
    out = mul(out, mul(bpre_excl, bsuf_excl)[None])
    out = mul(out, tinv[None, None])

    out = out.reshape((k * g,) + xf.shape[1:])[:length]
    return jnp.moveaxis(out, 0, nax)
