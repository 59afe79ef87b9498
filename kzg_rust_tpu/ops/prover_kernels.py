"""Fused single-dispatch prover kernels.

``blob_to_kzg_commitment`` and ``compute_kzg_proof`` as ONE jitted device
program each (reference call stacks: SURVEY.md sections 3.2-3.3).  Fusing
ingestion-side recoding, barycentric evaluation, quotient construction and
the fixed-base MSM into a single program matters doubly here: XLA fuses
across the stages, and - on a tunneled device - each host<->device round
trip costs tens of milliseconds, so one dispatch in + one result out is the
difference between kernel-bound and latency-bound.

Outputs are converted out of Montgomery form on device; hosts get canonical
limbs to decode with pure numpy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import limbs as L
from . import msm as M
from . import protocol_kernels as PK
from .fields import FP, FR
from .verify_kernels import blob_bytes_to_limbs


def _from_mont_point(pt):
    """[..., 3, l] Montgomery projective -> canonical limbs (same coords)."""
    return L.from_mont(FP, pt)


@partial(jax.jit, static_argnums=3)
def commit_kernel(table, inf_mask, blob_bytes, fold: int):
    """Blob bytes [n, 32] uint8 BE -> (commitment point [3, l] canonical
    projective, ok flag).  ingest -> check -> GLV decompose + recode ->
    gather -> mixed-add fold, one program (reference: kzg.rs:396-406 +
    utils.rs:367-410).
    ``ok`` is False iff any field element is non-canonical (result garbage).
    """
    evals_limbs = blob_bytes_to_limbs(blob_bytes)
    ok = ~jnp.any(L.geq_mod(FR, evals_limbs))
    d1, d2 = M.glv_digits_from_limbs(evals_limbs)
    return _from_mont_point(M._msm_core_glv(table, inf_mask, d1, d2, fold)), ok


@partial(jax.jit, static_argnums=(0, 7))
def proof_kernel(n: int, roots_m, inv_n_m, table, inf_mask, blob_bytes, z, fold: int):
    """The whole ``compute_kzg_proof_impl`` (reference: kzg.rs:461-528) as
    one program: blob ingestion + canonicality, in-domain detection, y
    evaluation, quotient construction (both cases via ``lax.cond`` - only
    one branch executes), digit recoding, and the proof MSM.

    blob_bytes [n, 32] uint8 BE / z [l] canonical Fr limbs.  Returns
    (proof [3, l], y [l], ok) - proof/y canonical (non-Montgomery), garbage
    when ``ok`` is False (non-canonical blob element).
    """
    evals = blob_bytes_to_limbs(blob_bytes)
    ok = ~jnp.any(L.geq_mod(FR, evals))
    mul = lambda u, v: L.mont_mul(FR, u, v)
    e_m = L.to_mont(FR, evals)
    z_m = L.to_mont(FR, z)
    one_m = jnp.asarray(FR.one_mont)

    hit = L.eq(jnp.broadcast_to(z_m, roots_m.shape), roots_m)  # [n]
    in_domain = jnp.any(hit)
    m_idx = jnp.argmax(hit).astype(jnp.int32)

    # y: stored eval when z is a domain point (reference: kzg.rs:360-362),
    # else barycentric.  The barycentric value is garbage when z is in
    # domain (zero denominator feeds the batched inversion) - discarded.
    d = L.sub_mod(FR, jnp.broadcast_to(z_m, roots_m.shape), roots_m)
    d_safe = L.select(hit, jnp.broadcast_to(one_m, d.shape), d)
    inv = L.batch_mont_inv(FR, d_safe, axis=0)
    terms = mul(mul(inv, roots_m), e_m)
    s = PK.sum_mod(FR, terms, axis=0)
    s = mul(s, inv_n_m)
    xn = L.mont_pow_const(FR, z_m, n)
    y_bary = mul(s, L.sub_mod(FR, xn, one_m))
    y_dom = e_m[m_idx]
    y_m = L.select(in_domain, y_dom, y_bary)

    def q_out(_):
        # q_i = (e_i - y) / (w_i - z)  (reference: kzg.rs:468-491).
        # (w - z) = -(z - w) and the barycentric above already inverted
        # (z - w) (this branch only runs out-of-domain, where d_safe == d),
        # so ONE negation replaces a second product-tree + Fermat batched
        # inversion — inv(-x) == -inv(x) (round-4 review finding).
        ii = L.neg_mod(FR, inv)
        return mul(L.sub_mod(FR, e_m, jnp.broadcast_to(y_m, e_m.shape)), ii)

    def q_in(_):
        # z == w_m (reference: kzg.rs:493-523)
        is_m = hit
        e_minus_y = L.sub_mod(FR, e_m, jnp.broadcast_to(y_m, e_m.shape))
        den1 = L.sub_mod(FR, roots_m, jnp.broadcast_to(z_m, roots_m.shape))
        den1 = L.select(is_m, jnp.broadcast_to(one_m, den1.shape), den1)
        inv1 = L.batch_mont_inv(FR, den1, axis=0)
        q = mul(e_minus_y, inv1)
        zmw = L.sub_mod(FR, jnp.broadcast_to(z_m, roots_m.shape), roots_m)
        den2 = mul(zmw, jnp.broadcast_to(z_m, roots_m.shape))
        den2 = L.select(is_m, jnp.broadcast_to(one_m, den2.shape), den2)
        inv2 = L.batch_mont_inv(FR, den2, axis=0)
        terms2 = mul(mul(e_minus_y, roots_m), inv2)
        terms2 = L.select(is_m, jnp.zeros_like(terms2), terms2)
        qm = PK.sum_mod(FR, terms2, axis=0)
        return L.select(is_m, jnp.broadcast_to(qm, q.shape), q)

    q_m = lax.cond(in_domain, q_in, q_out, None)
    q = L.from_mont(FR, q_m)
    d1, d2 = M.glv_digits_from_limbs(q)
    proof = _from_mont_point(M._msm_core_glv(table, inf_mask, d1, d2, fold))
    return proof, L.from_mont(FR, y_m), ok
