"""Multi-precision modular arithmetic on TPU-friendly limb tensors.

This is the foundation of the device compute path: every BLS12-381 field
element (Fp, 381 bits; Fr, 255 bits) is a vector of 12-bit limbs held in
``uint32`` lanes, and every arithmetic op is a fixed-shape, branch-free JAX
program that vectorizes over arbitrary leading batch dimensions.  It replaces
the blst scalar/field assembly the reference delegates to
(reference: src/utils.rs:10-123 fr helpers; SURVEY.md section 2.3).

Why 12-bit limbs in 32-bit lanes: TPUs have no 64-bit integer multiplier, so
limb products must fit in 32 bits together with long accumulation chains.
With ``b = 2^12`` a limb product is < 2^24 and a full column of n products
stays < n * 2^24 < 2^31 - comfortably inside a uint32 lane with NO
intermediate normalization, which makes the whole multiply column-parallel.
Fp needs 32 limbs (384 bits), Fr needs 22 (264 bits); both give a Montgomery
radix R = b^n strictly greater than the modulus.

All values are canonical (< modulus) with limbs in ``[0, 2^12)`` at function
boundaries; Montgomery-form values are canonical representatives of
``x * R mod N``.  Two structural rules keep the compiled graphs sane:

* Multiplication is column-parallel SOS/REDC (``mont_mul``), not an iterated
  per-limb CIOS recurrence - a CIOS loop compiles to thousands of sliced HLO
  ops and defeats both XLA's compile-time and its vectorizer.
* Carries are resolved in O(log n) wide steps (carry-save passes + a
  Kogge-Stone carry-lookahead scan), never as an unrolled per-limb ripple.
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
        # Full-width -N^-1 mod R for the column-parallel REDC quotient.
        self.nprime_limbs = int_to_limbs(nlimbs, (-pow(modulus, -1, r)) % r)
        # Toeplitz int8 matrices for the two constant-operand column sums of
        # REDC (x nprime mod R, and x N), so they run on the MXU.
        self.nprime_mats = _toeplitz_mats(self.nprime_limbs, nlimbs)
        self.mod_mats = _toeplitz_mats(self.mod_limbs, 2 * nlimbs)
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
#
# Everything here is built from full-width tensor ops - no per-limb Python
# loops.  Unrolled ripple chains (one sliced op per limb) produce thousands
# of tiny HLO instructions that make XLA's fusion passes quadratically slow;
# the shift-based carry-save + Kogge-Stone carry-lookahead below resolves a
# full carry chain in O(log n) wide ops instead.
# ---------------------------------------------------------------------------


def _shift_up(t, k: int):
    """Shift limbs toward higher significance by k positions (zero fill)."""
    return jnp.concatenate([jnp.zeros_like(t[..., :k]), t[..., :-k]], axis=-1)


def csave(t, passes: int = 2):
    """Carry-save passes: digits < 2^31 -> digits <= 2^12 + 127 after two
    passes (each pass folds ``digit >> 12`` into the next limb; overflow out
    of the top limb is dropped, so callers must know the value fits)."""
    for _ in range(passes):
        t = (t & MASK) + _shift_up(t >> BASE_BITS, 1)
    return t


def ks_resolve(t):
    """Kogge-Stone carry resolution: digits <= 2^13 - 2 -> canonical 12-bit
    limbs (carry out of the top limb is dropped; value must fit).

    generate g_i = digit_i >= 2^12, propagate p_i = digit_i == 2^12 - 1;
    the prefix-combine of (g, p) yields every carry-in in log2(n) steps.
    """
    n = t.shape[-1]
    g = t >= BASE
    p = t == MASK
    shift = 1
    while shift < n:
        g = g | (p & _shift_up(g, shift))
        p = p & _shift_up(p, shift)
        shift *= 2
    carry_in = _shift_up(g.astype(jnp.uint32), 1)
    return (t + carry_in) & MASK


def normalize(cols):
    """Accumulated columns (< 2^31) -> canonical 12-bit limbs, same width."""
    return ks_resolve(csave(cols, 2))


def carry_canonical(cols, nout: int):
    """Normalize accumulated columns (< 2^31 each) into 12-bit limbs,
    padding the limb axis to ``nout`` first so trailing carries have room."""
    m = cols.shape[-1]
    if nout > m:
        pad = jnp.zeros(cols.shape[:-1] + (nout - m,), dtype=cols.dtype)
        cols = jnp.concatenate([cols, pad], axis=-1)
    return normalize(cols)


def raw_sub(x, y):
    """Limb-wise subtraction with a lookahead borrow chain.

    Returns ``(diff, borrow)`` where ``diff = x - y mod b^n`` and ``borrow``
    is a uint32 0/1 flag (1 iff x < y).  Inputs must be canonical 12-bit
    limbs.  Borrow generate/propagate mirrors the carry case: g = digit
    difference < 0, p = difference == 0.
    """
    n = x.shape[-1]
    t = x.astype(jnp.int32) - y.astype(jnp.int32)  # in (-2^12, 2^12)
    g = t < 0
    p = t == 0
    shift = 1
    while shift < n:
        g = g | (p & _shift_up(g, shift))
        p = p & _shift_up(p, shift)
        shift *= 2
    borrow_in = _shift_up(g.astype(jnp.int32), 1)
    diff = ((t - borrow_in) & MASK).astype(jnp.uint32)
    borrow_out = g[..., -1].astype(jnp.uint32)
    return diff, borrow_out


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
    # digits <= 2^13 - 2, value < 2N < b^n: one lookahead pass suffices.
    s = ks_resolve(a + b)
    return cond_sub_mod(spec, s)


def relaxed_add(a, b):
    """Lazy-reduction add: value ``a + b`` (NOT reduced mod N) with digits
    <= 2^12 + small after one carry-save pass — 3 wide ops instead of
    add_mod's ~30 (carry-lookahead + conditional subtract).

    Valid ONLY where the result feeds :func:`mont_mul` (whose column bounds
    absorb the relaxed digits and whose REDC re-canonicalizes: for R > 4N,
    inputs < 2N yield outputs < 2N before the final cond-sub — Walter's
    bound).  NEVER feed the result to ``raw_sub``/``sub_mod`` (their borrow
    chains assume canonical digits) or to ``eq``/``is_zero`` (digit-pattern
    comparisons).  Inputs: canonical or relaxed; chained use stays bounded
    (digits grow by at most the carried-in pass, <= 2^12 + 127).
    """
    t = a + b
    return (t & MASK) + _shift_up(t >> BASE_BITS, 1)


@partial(jax.jit, static_argnums=0)
def sub_mod(spec: FieldSpec, a, b):
    d, borrow = raw_sub(a, b)
    mod = _mod_broadcast(spec, d.shape, spec.nlimbs)
    # On borrow the wrap d + N overflows b^n by exactly the borrowed amount;
    # ks_resolve drops that top carry, yielding a - b + N exactly.
    wrapped = ks_resolve(d + mod)
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


@partial(jax.jit, static_argnums=0)
def geq_mod(spec: FieldSpec, a) -> jnp.ndarray:
    """a >= modulus (canonical limb vectors); returns bool [...]."""
    bound = jnp.broadcast_to(jnp.asarray(spec.mod_limbs), a.shape)
    _, borrow = raw_sub(a, bound)
    return borrow == 0


def geq_const(spec: FieldSpec, a, bound_limbs) -> jnp.ndarray:
    """a >= bound (both canonical limb vectors); returns bool [...]."""
    bound = jnp.broadcast_to(jnp.asarray(bound_limbs), a.shape)
    _, borrow = raw_sub(a, bound)
    return borrow == 0


# ---------------------------------------------------------------------------
# Montgomery multiplication (CIOS)
# ---------------------------------------------------------------------------


def _mul_cols_pad(a, b, nout: int):
    """Column sums as statically-shifted wide vector adds (one row product
    per limb of ``a``).  ~3n ops, but each fuses into the consumer - the
    fastest form on TPU, where XLA fuses the whole chain into VPU code."""
    n = a.shape[-1]
    nb = b.shape[-1]
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    total = jnp.zeros(shape + (nout,), jnp.uint32)
    for i in range(min(n, nout)):
        w = min(nb, nout - i)
        prod = a[..., i : i + 1] * b[..., :w]
        prod = jnp.broadcast_to(prod, shape + (w,))
        pad = [(0, 0)] * len(shape) + [(i, nout - i - w)]
        total = total + jnp.pad(prod, pad)
    return total


def _mul_cols_shear(a, b, nout: int):
    """Column sums via the pad-flatten-reshear trick: the [.., n, nb+n]
    padded product matrix, viewed flat and re-reshaped at row stride
    ``nb+n-1``, lines every anti-diagonal up in a column - one outer
    product, one pad, two reshapes, one reduction (~6 ops).  XLA-on-CPU
    barely fuses elementwise chains, so fewer/larger ops win there by ~18x
    over the pad-accumulate form (which it wins by 4x on TPU)."""
    n = a.shape[-1]
    nb = b.shape[-1]
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    prod = a[..., :, None] * b[..., None, :]  # [.., n, nb]
    prod = jnp.broadcast_to(prod, shape + (n, nb))
    f = jnp.pad(prod, [(0, 0)] * len(shape) + [(0, 0), (0, n)])
    flat = f.reshape(shape + (n * (nb + n),))[..., : n * (nb + n - 1)]
    cols = flat.reshape(shape + (n, nb + n - 1)).sum(axis=-2, dtype=jnp.uint32)
    if nout <= nb + n - 1:
        return cols[..., :nout]
    return jnp.pad(cols, [(0, 0)] * len(shape) + [(0, nout - (nb + n - 1))])


def _mul_cols(a, b, nout: int):
    if jax.default_backend() == "cpu":
        return _mul_cols_shear(a, b, nout)
    return _mul_cols_pad(a, b, nout)


def _toeplitz_mats(const_limbs: np.ndarray, nout: int):
    """Banded Toeplitz matrices for column sums against a CONSTANT operand:
    ``B[i, j] = c[j - i]``, split into 6-bit lo/hi int8 pieces so the
    product runs on the MXU as int8 x int8 -> int32 matmuls."""
    c = np.asarray(const_limbs, dtype=np.int64)
    k = c.shape[0]
    rows = nout  # support inputs up to nout limbs
    full = np.zeros((rows, nout), dtype=np.int64)
    for i in range(rows):
        w = min(k, nout - i)
        if w > 0:
            full[i, i : i + w] = c[:w]
    lo = (full & 0x3F).astype(np.int8)
    hi = (full >> 6).astype(np.int8)
    return lo, hi


def _mul_cols_const_mxu(x, mats, nout: int):
    """Column sums ``out[j] = sum_i x[i] * c[j-i]`` with a constant c, as
    four int8 MXU matmuls.  x digits must be <= 2^12 + 127 (canonical or
    csave'd); the combined column bound stays < 2^31.
    """
    b_lo, b_hi = mats
    nin = x.shape[-1]
    xi = x.astype(jnp.int32)
    x_lo = (xi & 0x7F).astype(jnp.int8)
    x_hi = (xi >> 7).astype(jnp.int8)
    blo = jnp.asarray(b_lo[:nin])
    bhi = jnp.asarray(b_hi[:nin])

    def mm(u, v):
        return jax.lax.dot_general(
            u,
            v,
            dimension_numbers=(((u.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    out = (
        mm(x_lo, blo)
        + (mm(x_lo, bhi) << 6)
        + ((mm(x_hi, blo)) << 7)
        + (mm(x_hi, bhi) << 13)
    )
    return out.astype(jnp.uint32)


# Above ~64k rows the SOS/REDC op chain goes memory-bound (its intermediate
# column tensors spill HBM between the ~100 wide ops); scanning the batch in
# VMEM-sized chunks keeps each chunk compute-bound.  Measured on the v5e
# (tools/probe_bary.py calibration + /tmp probe, 2026-08-20): 262144-row Fr
# multiply 2.49 ms monolithic vs 0.76 ms chunked at 16384 rows.
_CHUNK_ROWS = 16384
_CHUNK_MIN_ROWS = 65536


@partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product ``a * b * R^-1 mod N`` on canonical limb tensors.

    Column-parallel SOS/REDC rather than iterated CIOS: the per-limb CIOS
    recurrence compiles to thousands of sliced HLO ops, which is both
    XLA-compile-hostile and vector-unfriendly.  Here every step is a wide
    tensor op:

      T    = colsum(a (x) b)                       columns < n * 2^24 < 2^31
      m    = colsum_lo(csave(T_lo) (x) N') mod R   N' = -N^-1 mod R, full width
      U    = T + colsum(m (x) N)                   == 0 mod R by construction
      out  = (normalize(U) >> R-limbs)             one conditional subtract

    The quotient m is exact mod R because truncating columns >= n only drops
    multiples of R; its relaxed digits (<= 2^12 + 127) keep m < 1.04 R, so
    the result is < 1.2 N and a single cond-sub canonicalizes.

    Batches whose (static) row count is large and chunk-divisible run as a
    ``lax.scan`` over VMEM-sized row chunks (see _CHUNK_ROWS above) —
    ~3.3x faster in the memory-bound regime, bit-identical output.
    """
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    nrows = 1
    for s in shape:
        nrows *= s
    if (
        nrows >= _CHUNK_MIN_ROWS
        and nrows % _CHUNK_ROWS == 0
        and jax.default_backend() != "cpu"
    ):
        n = spec.nlimbs
        af = jnp.broadcast_to(a, shape + (n,)).reshape(
            nrows // _CHUNK_ROWS, _CHUNK_ROWS, n
        )
        bf = jnp.broadcast_to(b, shape + (n,)).reshape(
            nrows // _CHUNK_ROWS, _CHUNK_ROWS, n
        )

        def step(_, ab):
            return None, _mont_mul_monolithic(spec, ab[0], ab[1])

        out = lax.scan(step, None, (af, bf))[1]
        return out.reshape(shape + (n,))
    return _mont_mul_monolithic(spec, a, b)


def _mont_mul_monolithic(spec: FieldSpec, a, b):
    tcols = _mul_cols(a, b, 2 * spec.nlimbs)  # < 2^31
    return redc_cols(spec, tcols)


def redc_cols(spec: FieldSpec, tcols):
    """Montgomery-reduce accumulated product columns: ``tcols`` [..., 2n]
    with digits < 2^31 representing T < R*N -> canonical ``T * R^-1 mod N``.
    The REDC half of :func:`mont_mul`, exposed so column-accumulated SUMS
    (e.g. :func:`sum_mont_redc`) reduce in one pass instead of a tree of
    modular adds."""
    n = spec.nlimbs
    tlo = csave(tcols[..., :n], 2)  # digits <= 2^12 + 127
    if jax.default_backend() == "cpu":
        m = csave(_mul_cols(tlo, jnp.asarray(spec.nprime_limbs), n), 2)
        ucols = tcols + _mul_cols(m, jnp.asarray(spec.mod_limbs), 2 * n)
    else:
        # The two constant-operand column sums ride the MXU (int8 Toeplitz
        # matmuls); only the a x b product and carries stay on the VPU.
        m = csave(_mul_cols_const_mxu(tlo, spec.nprime_mats, n), 2)
        ucols = tcols + _mul_cols_const_mxu(m, spec.mod_mats, 2 * n)
    full = normalize(ucols)  # low n limbs are exactly zero
    return cond_sub_mod(spec, full[..., n:])


def sum_mont_redc(spec: FieldSpec, x, axis: int):
    """Sum Montgomery-form limb tensors along ``axis`` as ONE raw uint32
    column accumulation plus ONE Montgomery reduction.

    Raw digit sums are exact for up to 2^19 canonical terms (K * 4095 <
    2^31); the single REDC replaces a log-depth tree of modular adds (each
    a full carry-lookahead + conditional subtract).  NOTE the value
    algebra: inputs are x_i = v_i * R (Montgomery form); the output is
    ``sum(v_i)`` in CANONICAL form (the REDC strips the R) - callers fold
    the form change into an adjacent constant or multiply.
    """
    k = x.shape[axis]
    if k * (BASE - 1) >= (1 << 31):  # explicit: must survive python -O
        raise ValueError("sum_mont_redc: too many terms for raw accumulation")
    cols = jnp.sum(x, axis=axis, dtype=jnp.uint32)  # [..., n] digits < 2^31
    pad = jnp.zeros(cols.shape[:-1] + (spec.nlimbs,), jnp.uint32)
    return redc_cols(spec, jnp.concatenate([cols, pad], axis=-1))


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    return mont_mul(spec, a, jnp.asarray(spec.r2))


def from_mont(spec: FieldSpec, a):
    return mont_mul(spec, a, jnp.asarray(spec.one))


@partial(jax.jit, static_argnums=(0, 2))
def mont_pow_const(spec: FieldSpec, a, exponent: int):
    """a^e (Montgomery in/out) for a trace-time-constant exponent.

    4-bit fixed-window exponentiation: precompute a^0..a^15 once (14 muls),
    then per window 4 squarings + ONE table-gather multiply inside a
    fori_loop - ~5 sequential muls per 4 bits versus 8 for double-and-add,
    a ~1.55x cut in the sequential-mul depth that dominates Fermat
    inversion (r-2) and the decompression sqrt ((p+1)/4).  The compiled
    graph stays one-body-sized; the digit table is a trace-time constant.
    """
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape)
    if exponent == 0:
        return one
    if exponent < 16:  # tiny exponents: plain double-and-add, no table
        bits = [int(c) for c in bin(exponent)[2:]]
        acc = a
        for b in bits[1:]:
            acc = mont_sqr(spec, acc)
            if b:
                acc = mont_mul(spec, acc, a)
        return acc

    digits = []
    e = exponent
    while e:
        digits.append(e & 0xF)
        e >>= 4
    digits.reverse()  # MSB-first, leading digit nonzero
    dig_arr = jnp.asarray(np.array(digits, dtype=np.uint32))

    # Table a^0..a^15: [16, ...a.shape] (one add-shaped scan, 15 muls).
    def tstep(acc, _):
        nxt = mont_mul(spec, acc, a)
        return nxt, acc

    _, table = lax.scan(tstep, one, None, length=16)

    def body(i, acc):
        for _ in range(4):
            acc = mont_sqr(spec, acc)
        sel = table[dig_arr[i]]
        return mont_mul(spec, acc, sel)

    init = table[dig_arr[0]]
    return lax.fori_loop(1, len(digits), body, init)


def mont_inv(spec: FieldSpec, a):
    """a^-1 via Fermat (a^(N-2)); Montgomery in/out.  inv(0) == 0."""
    return mont_pow_const(spec, a, spec.modulus - 2)


@partial(jax.jit, static_argnums=(0, 2))
def batch_mont_inv(spec: FieldSpec, x, axis: int = -2):
    """Batched inversion via a pairwise PRODUCT TREE + one Fermat inversion.

    Replaces the reference's sequential Montgomery batch-inversion loop
    (reference: utils.rs:94-123).  Up-sweep: multiply adjacent pairs,
    halving the axis per level (log2 L levels).  One Fermat inversion of
    the root.  Down-sweep: each node's inverse times the sibling gives the
    child's inverse (``inv(c0) = c1 * inv(parent)``), doubling back to the
    leaves.  ~3L multiplies total in ~2 log2(L) + 1 sequential steps, every
    step a full-width tensor op.

    (Round-2 history: this was blocked prefix/suffix ``lax.scan``s with
    O(sqrt L) depth; chained-slope device profiling (tools/probe_bary.py)
    showed ~65 us of per-step overhead across ~260 sequential steps — the
    dominant term of the whole barycentric kernel.  The tree does the same
    work in ~24 steps.  jax.lax.associative_scan is still avoided: it
    compiles quadratically on this op.)

    ``inv(x_i) = (prod of x_j except i) * inv(prod of all)``.  Zeros in the
    input produce garbage in every output slot (the root product is zero,
    and Fermat maps 0 to 0) - callers uphold the reference's "error on zero
    product" contract on host.
    """
    nax = axis % x.ndim
    # Move the batch axis to the front: [L, ...rest, nlimbs].
    xf = jnp.moveaxis(x, nax, 0)
    length = xf.shape[0]
    one = jnp.asarray(spec.one_mont)

    m = 1
    while m < length:
        m *= 2
    if m != length:  # pad with mont(1): product-neutral
        pad_block = jnp.broadcast_to(one, (m - length,) + xf.shape[1:])
        xf = jnp.concatenate([xf, pad_block], axis=0)

    levels = []
    v = xf
    while v.shape[0] > 1:
        levels.append(v)
        v = mont_mul(spec, v[0::2], v[1::2])

    inv = mont_inv(spec, v)  # [1, ...rest, n] — the root inverse

    for lv in reversed(levels):
        a = mont_mul(spec, lv[1::2], inv)  # inverses of the even children
        b = mont_mul(spec, lv[0::2], inv)  # inverses of the odd children
        inv = jnp.stack([a, b], axis=1).reshape(lv.shape)

    return jnp.moveaxis(inv[:length], 0, nax)
