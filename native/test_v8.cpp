// Standalone unit test for the AVX-512 IFMA Fp engine (V8) — compares each
// layer against the scalar 6x64 path.  Build: make test_v8 && ./test_v8
#include "kzg_native.cpp"

#include <cstdio>
#include <cstdlib>
#include <array>

static u64 rng_state = 0x123456789abcdefULL;
static u64 rnd64() {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return rng_state;
}

static Fp rnd_fp() {
  Fp a;
  for (int i = 0; i < 6; ++i) a.v[i] = rnd64();
  a.v[5] &= 0x0fffffffffffffffULL;  // < 2^380 < p, close enough to uniform
  return a;
}

static bool fp_eq2(const Fp &a, const Fp &b) {
  return memcmp(a.v, b.v, sizeof(a.v)) == 0;
}

static void dump(const char *tag, const u64 *v, int n) {
  printf("%s:", tag);
  for (int i = n - 1; i >= 0; --i) printf(" %013llx", (unsigned long long)v[i]);
  printf("\n");
}

int main() {
  ensure_init();
#ifdef KZG_HAVE_ADX
  // 0. ADX mont_mul == generic CIOS mont_mul, both moduli, including
  //    edge inputs (0, 1, p-1, dense high limbs) and aliased outputs.
  {
    for (int t = 0; t < 200000; ++t) {
      u64 a6[6], b6[6], r_adx[6], r_cios[6];
      for (int i = 0; i < 6; ++i) {
        a6[i] = rnd64();
        b6[i] = rnd64();
      }
      // force < p (uniform enough: clamp top limb below p's top limb)
      a6[5] %= FP.mod[5];
      b6[5] %= FP.mod[5];
      if (t == 0) memset(a6, 0, sizeof(a6));
      if (t == 1) { memset(a6, 0, sizeof(a6)); a6[0] = 1; }
      if (t == 2) { sub_n<6>(FP.mod, a6, a6); }  // p - prev
      mont_mul_adx6(FP, a6, b6, r_adx);
      mont_mul_cios<6>(FP, a6, b6, r_cios);
      if (memcmp(r_adx, r_cios, sizeof(r_adx)) != 0) {
        printf("FAIL adx6 t=%d\n", t);
        dump("a", a6, 6);
        dump("b", b6, 6);
        dump("adx", r_adx, 6);
        dump("cios", r_cios, 6);
        return 1;
      }
      // aliased: r = r * r
      memcpy(r_cios, r_adx, sizeof(r_adx));
      mont_mul_adx6(FP, r_adx, r_adx, r_adx);
      mont_mul_cios<6>(FP, r_cios, r_cios, r_cios);
      if (memcmp(r_adx, r_cios, sizeof(r_adx)) != 0) {
        printf("FAIL adx6 aliased t=%d\n", t);
        return 1;
      }
      u64 a4[4], b4[4], s_adx[4], s_cios[4];
      for (int i = 0; i < 4; ++i) {
        a4[i] = rnd64();
        b4[i] = rnd64();
      }
      a4[3] %= FR.mod[3];
      b4[3] %= FR.mod[3];
      if (t == 0) memset(a4, 0, sizeof(a4));
      if (t == 2) sub_n<4>(FR.mod, a4, a4);
      mont_mul_adx4(FR, a4, b4, s_adx);
      mont_mul_cios<4>(FR, a4, b4, s_cios);
      if (memcmp(s_adx, s_cios, sizeof(s_adx)) != 0) {
        printf("FAIL adx4 t=%d\n", t);
        dump("a", a4, 4);
        dump("b", b4, 4);
        dump("adx", s_adx, 4);
        dump("cios", s_cios, 4);
        return 1;
      }
    }
    printf("PASS adx mont_mul (6-limb Fp + 4-limb Fr) vs generic CIOS\n");
  }
  // 0b. fixed-base G1 generator multiplication vs double-and-add ladder
  // (the G2 generator table was removed with its only production caller).
  {
    G1Jac g1 = {G1_GEN_X_M, G1_GEN_Y_M, FP_ONE_M};
    for (int t = 0; t < 64; ++t) {
      u8 k[32];
      for (int i = 0; i < 32; ++i) k[i] = (u8)rnd64();
      if (t == 0) memset(k, 0, 32);
      if (t == 1) { memset(k, 0, 32); k[31] = 1; }
      if (t == 2) memset(k, 0xff, 32);
      G1Aff a = g1_to_aff(g1_mul_gen(k));
      G1Aff b = g1_to_aff(g1_mul_jac(g1, k, 32));
      if (a.inf != b.inf ||
          (!a.inf && (!fp_eq(a.x, b.x) || !fp_eq(a.y, b.y)))) {
        printf("FAIL g1_mul_gen t=%d\n", t);
        return 1;
      }
    }
    printf("PASS fixed-base g1 generator mul vs ladder\n");
  }
  // 0c. GLV decomposition: k == k1 + lam*k2 (mod r), magnitudes < 2^130
  {
    static const u64 LAM[4] = {0xfffffffe00000001ULL, 0xa7780001fffcb7fcULL,
                               0x3339d80809a1d804ULL, 0x73eda753299d7d48ULL};
    Fr lam_m;
    to_mont<4>(FR, LAM, lam_m.v);
    for (int t = 0; t < 100000; ++t) {
      u64 k[4];
      for (int i = 0; i < 4; ++i) k[i] = rnd64();
      k[3] %= FR.mod[3];  // < r (coarse but inside range)
      if (t == 0) memset(k, 0, sizeof(k));
      if (t == 1) { memset(k, 0, sizeof(k)); k[0] = 1; }
      if (t == 2) {
        u64 onev[4] = {1, 0, 0, 0};
        sub_n<4>(FR.mod, onev, k);  // r - 1
      }
      u8 be[32];
      to_be<4>(k, 32, be);
      GlvSplit s;
      glv_decompose(be, s);
      if (s.k1[3] || s.k2[3] || (s.k1[2] >> 2) || (s.k2[2] >> 2)) {
        printf("FAIL glv magnitude t=%d\n", t);
        return 1;
      }
      Fr k1m, k2m, km, res;
      to_mont<4>(FR, s.k1, k1m.v);
      to_mont<4>(FR, s.k2, k2m.v);
      u64 kr[4] = {k[0], k[1], k[2], k[3]};
      while (cmp_n<4>(kr, FR.mod) >= 0) sub_n<4>(kr, FR.mod, kr);
      to_mont<4>(FR, kr, km.v);
      if (s.neg1) k1m = fr_neg(k1m);
      if (s.neg2) k2m = fr_neg(k2m);
      res = fr_add(k1m, fr_mul(lam_m, k2m));
      if (memcmp(res.v, km.v, sizeof(res.v)) != 0) {
        printf("FAIL glv identity t=%d\n", t);
        return 1;
      }
    }
    printf("PASS glv decomposition identity + bounds\n");
  }
  // 0d. interleaved two-stream SHA-256 == two independent streams
  {
    std::vector<u8> da(200000), db(200000);
    for (size_t i = 0; i < da.size(); ++i) {
      da[i] = (u8)rnd64();
      db[i] = (u8)rnd64();
    }
    // lengths crossing block/padding boundaries, incl. the 131152-byte
    // challenge-preimage size, split into irregular update chunks
    const size_t lens[] = {0, 1, 55, 56, 63, 64, 65, 127, 131152, 199999};
    for (size_t len : lens) {
      Sha256 ra, rb;
      Sha256x2 x2;
      size_t off = 0;
      int chunk_i = 0;
      const size_t chunks[] = {16, 16, 3, 64, 4096, 1, 131072};
      while (off < len) {
        size_t c = chunks[chunk_i++ % 7];
        if (c > len - off) c = len - off;
        ra.update(da.data() + off, c);
        rb.update(db.data() + off, c);
        x2.update(da.data() + off, db.data() + off, c);
        off += c;
      }
      u8 ea[32], eb[32], xa[32], xb[32];
      ra.final(ea);
      rb.final(eb);
      x2.final(xa, xb);
      if (memcmp(ea, xa, 32) != 0 || memcmp(eb, xb, 32) != 0) {
        printf("FAIL sha256x2 len=%zu\n", len);
        return 1;
      }
    }
    printf("PASS sha256x2 vs independent streams\n");
  }
#else
  printf("no ADX on this build (generic mont_mul in use)\n");
#endif
#ifndef KZG_HAVE_IFMA
  printf("no IFMA on this build\n");
  return 1;
#else
  std::call_once(FP52_INIT_FLAG, fp52_init);

  // 1. round trip fp -> 52 -> fp
  for (int t = 0; t < 100; ++t) {
    Fp a = rnd_fp();
    u64 a52[8];
    Fp back;
    fp52_from_fp(a.v, a52);
    fp52_to_fp(a52, back.v);
    if (!fp_eq2(a, back)) {
      printf("FAIL round-trip t=%d\n", t);
      dump("a", a.v, 6);
      dump("back", back.v, 6);
      return 1;
    }
  }
  printf("ok: fp52 round trip\n");

  // 2. v8_mm vs fp_mul (8 independent lanes)
  {
    Fp a[8], b[8];
    u64 pa[8][8], pb[8][8];  // [point][limb]
    for (int l = 0; l < 8; ++l) {
      a[l] = rnd_fp();
      b[l] = rnd_fp();
      fp52_from_fp(a[l].v, pa[l]);
      fp52_from_fp(b[l].v, pb[l]);
    }
    V8 va, vb;
    for (int i = 0; i < 8; ++i) {
      alignas(64) u64 rowa[8], rowb[8];
      for (int l = 0; l < 8; ++l) {
        rowa[l] = pa[l][i];
        rowb[l] = pb[l][i];
      }
      va.l[i] = _mm512_load_si512((const void *)rowa);
      vb.l[i] = _mm512_load_si512((const void *)rowb);
    }
    V8 vc = v8_mm(va, vb);
    for (int i = 0; i < 8; ++i) {
      alignas(64) u64 row[8];
      _mm512_store_si512((void *)row, vc.l[i]);
      for (int l = 0; l < 8; ++l) pa[l][i] = row[l];  // reuse pa as result
    }
    for (int l = 0; l < 8; ++l) {
      Fp got, want = fp_mul(a[l], b[l]);
      fp52_to_fp(pa[l], got.v);
      if (!fp_eq2(got, want)) {
        printf("FAIL v8_mm lane %d\n", l);
        dump("got", got.v, 6);
        dump("want", want.v, 6);
        return 1;
      }
    }
    printf("ok: v8_mm\n");
  }

  // 3. v8_madd: projective acc starts at infinity, add generator k times,
  //    compare against scalar Jacobian adds.  All 8 lanes identical input.
  {
    G1Aff gen = {G1_GEN_X_M, G1_GEN_Y_M, false};
    u64 gx[8], gy[8];
    fp52_from_fp(gen.x.v, gx);
    fp52_from_fp(gen.y.v, gy);
    V8 vx = v8_bcast(gx), vy = v8_bcast(gy);
    V8 X, Y, Z;
    for (int i = 0; i < 8; ++i) {
      X.l[i] = _mm512_setzero_si512();
      Y.l[i] = _mm512_set1_epi64(FP52_ONE_M[i]);
      Z.l[i] = _mm512_setzero_si512();
    }
    G1Jac ref = g1_jac_inf();
    for (int k = 1; k <= 5; ++k) {
      v8_madd(X, Y, Z, vx, vy);
      ref = g1_add_mixed(ref, gen);
      // extract lane 0, convert projective -> affine, compare with ref.
      u64 px[8], py[8], pz[8];
      for (int i = 0; i < 8; ++i) {
        alignas(64) u64 row[8];
        _mm512_store_si512((void *)row, X.l[i]);
        px[i] = row[0];
        _mm512_store_si512((void *)row, Y.l[i]);
        py[i] = row[0];
        _mm512_store_si512((void *)row, Z.l[i]);
        pz[i] = row[0];
      }
      Fp x, y, z;
      fp52_to_fp(px, x.v);
      fp52_to_fp(py, y.v);
      fp52_to_fp(pz, z.v);
      // affine from projective
      Fp zi = fp_inv(z);
      Fp ax = fp_mul(x, zi), ay = fp_mul(y, zi);
      G1Aff refa = g1_to_aff(ref);
      if (!fp_eq2(ax, refa.x) || !fp_eq2(ay, refa.y)) {
        printf("FAIL v8_madd k=%d\n", k);
        dump("ax", ax.v, 6);
        dump("refx", refa.x.v, 6);
        dump("ay", ay.v, 6);
        dump("refy", refa.y.v, 6);
        return 1;
      }
    }
    printf("ok: v8_madd (inf + k*G chain, doubling case included)\n");
  }

  // 4. v8_negp: add G then -G -> infinity (Z == 0)
  {
    G1Aff gen = {G1_GEN_X_M, G1_GEN_Y_M, false};
    u64 gx[8], gy[8];
    fp52_from_fp(gen.x.v, gx);
    fp52_from_fp(gen.y.v, gy);
    V8 vx = v8_bcast(gx), vy = v8_bcast(gy);
    V8 X, Y, Z;
    for (int i = 0; i < 8; ++i) {
      X.l[i] = _mm512_setzero_si512();
      Y.l[i] = _mm512_set1_epi64(FP52_ONE_M[i]);
      Z.l[i] = _mm512_setzero_si512();
    }
    v8_madd(X, Y, Z, vx, vy);
    V8 vyn = v8_negp(vy);
    v8_madd(X, Y, Z, vx, vyn);
    u64 pz[8];
    for (int i = 0; i < 8; ++i) {
      alignas(64) u64 row[8];
      _mm512_store_si512((void *)row, Z.l[i]);
      pz[i] = row[0];
    }
    Fp z;
    fp52_to_fp(pz, z.v);
    if (!fp_is_zero(z)) {
      printf("FAIL G + (-G) != inf\n");
      return 1;
    }
    printf("ok: v8_negp / cancellation to infinity\n");
  }

  // 5. flush conversion: projective (X:Y:Z) -> Jacobian (XZ, YZ^2, Z)
  {
    G1Aff gen = {G1_GEN_X_M, G1_GEN_Y_M, false};
    u64 gx[8], gy[8];
    fp52_from_fp(gen.x.v, gx);
    fp52_from_fp(gen.y.v, gy);
    V8 vx = v8_bcast(gx), vy = v8_bcast(gy);
    V8 X, Y, Z;
    for (int i = 0; i < 8; ++i) {
      X.l[i] = _mm512_setzero_si512();
      Y.l[i] = _mm512_set1_epi64(FP52_ONE_M[i]);
      Z.l[i] = _mm512_setzero_si512();
    }
    for (int k = 0; k < 5; ++k) v8_madd(X, Y, Z, vx, vy);
    u64 px[8], py[8], pz[8];
    for (int i = 0; i < 8; ++i) {
      alignas(64) u64 row[8];
      _mm512_store_si512((void *)row, X.l[i]);
      px[i] = row[0];
      _mm512_store_si512((void *)row, Y.l[i]);
      py[i] = row[0];
      _mm512_store_si512((void *)row, Z.l[i]);
      pz[i] = row[0];
    }
    Fp x, y, z;
    fp52_to_fp(px, x.v);
    fp52_to_fp(py, y.v);
    fp52_to_fp(pz, z.v);
    Fp z2 = fp_sqr(z);
    G1Jac j = {fp_mul(x, z), fp_mul(y, z2), z};
    G1Aff got = g1_to_aff(j);
    G1Jac ref = g1_jac_inf();
    for (int k = 0; k < 5; ++k) ref = g1_add_mixed(ref, gen);
    G1Aff want = g1_to_aff(ref);
    if (!fp_eq2(got.x, want.x) || !fp_eq2(got.y, want.y)) {
      printf("FAIL flush proj->jac conversion\n");
      return 1;
    }
    printf("ok: flush projective->Jacobian conversion\n");
  }

  // 6. g1_bucket_accum_v8 end-to-end vs scalar bucket accumulation.
  //    Build a small table of k*G points in 52-limb planes, random entries.
  {
    const int npts = 37, nbuckets = 8;
    std::vector<G1Aff> pts(npts);
    G1Jac acc = g1_jac_inf();
    G1Aff gen = {G1_GEN_X_M, G1_GEN_Y_M, false};
    for (int i = 0; i < npts; ++i) {
      acc = g1_add_mixed(acc, gen);
      pts[i] = g1_to_aff(acc);
    }
    const size_t stride = npts;
    std::vector<u64> tbl52(16 * stride);
    for (int i = 0; i < npts; ++i) {
      u64 x52[8], y52[8];
      fp52_from_fp(pts[i].x.v, x52);
      fp52_from_fp(pts[i].y.v, y52);
      for (int l = 0; l < 8; ++l) {
        tbl52[(size_t)l * stride + i] = x52[l];
        tbl52[(size_t)(8 + l) * stride + i] = y52[l];
      }
    }
    // random (bucket, idx, neg) pairs, counting-sorted by bucket
    const int ne = 200;
    std::vector<std::array<int, 3>> raw(ne);
    for (int e = 0; e < ne; ++e)
      raw[e] = {(int)(rnd64() % nbuckets), (int)(rnd64() % npts),
                (int)(rnd64() % 2)};
    std::vector<u64> entries;
    std::vector<G1Jac> want(nbuckets, g1_jac_inf());
    for (int b = 0; b < nbuckets; ++b)
      for (int e = 0; e < ne; ++e)
        if (raw[e][0] == b) {
          entries.push_back(((u64)b << 33) | ((u64)raw[e][2] << 32) |
                            (u64)raw[e][1]);
          G1Aff p = pts[raw[e][1]];
          if (raw[e][2]) p.y = fp_neg(p.y);
          want[b] = g1_add_mixed(want[b], p);
        }
    // Treat the 8 bucket ids as 2 windows x 4 buckets: bshift=2, rowlen=8,
    // slot = (b & 3) * 8 + (b >> 2).  Exercises first-store, overflow
    // merge (lane-boundary splits), and the plane readback.
    PlaneBuckets pbk;
    pbk.init(4 * 8);
    std::vector<std::pair<u32, G1Jac>> ovf;
    g1_bucket_accum_v8(tbl52.data(), stride, entries.data(), entries.size(),
                       pbk, 2, 8, ovf);
    for (auto &pr : ovf) pb_merge_jac(pbk, pr.first, pr.second);
    for (int b = 0; b < nbuckets; ++b) {
      const u32 slot = (u32)((b & 3) * 8 + (b >> 2));
      u64 px[8], py[8], pz[8];
      for (int i = 0; i < 8; ++i) {
        px[i] = pbk.plane(0, i)[slot];
        py[i] = pbk.plane(1, i)[slot];
        pz[i] = pbk.plane(2, i)[slot];
      }
      G1Jac gj;
      G1Aff ga = p52_to_jac(px, py, pz, &gj) ? g1_to_aff(gj)
                                             : G1Aff{FP_ZERO, FP_ZERO, true};
      G1Aff wa = g1_to_aff(want[b]);
      if (ga.inf != wa.inf ||
          (!ga.inf && (!fp_eq2(ga.x, wa.x) || !fp_eq2(ga.y, wa.y)))) {
        printf("FAIL bucket_accum bucket %d (inf %d vs %d)\n", b, ga.inf,
               wa.inf);
        return 1;
      }
    }
    printf("ok: g1_bucket_accum_v8 vs scalar (200 random entries)\n");
  }

  // 7. g1_uncompress_v8 vs g1_uncompress_impl: valid points (both y signs),
  //    infinity, malformed flags, off-curve x.
  {
    u8 comp[48 * 8];
    G1Jac acc = {G1_GEN_X_M, G1_GEN_Y_M, FP_ONE_M};
    G1Aff gen = {G1_GEN_X_M, G1_GEN_Y_M, false};
    for (int l = 0; l < 5; ++l) {
      g1_compress_impl(g1_to_aff(acc), comp + 48 * l);
      acc = g1_add_mixed(acc, gen);
    }
    memset(comp + 48 * 5, 0, 48);
    comp[48 * 5] = 0xC0;  // infinity
    memset(comp + 48 * 6, 0, 48);
    comp[48 * 6] = 0x00;  // missing compressed flag -> malformed
    memset(comp + 48 * 7, 0, 48);
    comp[48 * 7] = 0x80;
    comp[48 * 7 + 47] = 0x07;  // x = 7: x^3+4 is a non-residue -> off-curve
    G1Aff got[8];
    int rc[8];
    g1_uncompress_v8(comp, got, rc);
    for (int l = 0; l < 8; ++l) {
      G1Aff want;
      int wrc = g1_uncompress_impl(comp + 48 * l, want);
      if (rc[l] != wrc) {
        printf("FAIL uncompress_v8 rc lane %d: %d vs %d\n", l, rc[l], wrc);
        return 1;
      }
      if (!wrc && (got[l].inf != want.inf ||
                   (!want.inf && (!fp_eq2(got[l].x, want.x) ||
                                  !fp_eq2(got[l].y, want.y))))) {
        printf("FAIL uncompress_v8 point lane %d\n", l);
        return 1;
      }
    }
    printf("ok: g1_uncompress_v8 vs scalar (valid/inf/malformed/off-curve)\n");
  }

  // 8. g1_subgroup_v8 vs g1_subgroup: in-subgroup points, infinity, and an
  //    on-curve point OUTSIDE G1 (found by scanning x for a sqrt).
  {
    G1Aff pts[8];
    G1Jac acc = {G1_GEN_X_M, G1_GEN_Y_M, FP_ONE_M};
    G1Aff gen = {G1_GEN_X_M, G1_GEN_Y_M, false};
    for (int l = 0; l < 6; ++l) {
      pts[l] = g1_to_aff(acc);
      acc = g1_add_mixed(acc, gen);
    }
    pts[6] = {FP_ZERO, FP_ZERO, true};  // infinity
    // on-curve, not in G1: try x = 2, 3, ... until y^2 = x^3+4 has a root
    bool found = false;
    for (u64 xi = 2; xi < 40 && !found; ++xi) {
      u64 xv[6] = {xi, 0, 0, 0, 0, 0};
      Fp x;
      to_mont<6>(FP, xv, x.v);
      Fp y2 = fp_add(fp_mul(fp_sqr(x), x), FP_B4);
      Fp y;
      pow_mont<6>(FP, y2.v, FP.exp_sqrt, 48, y.v);
      if (fp_eq(fp_sqr(y), y2)) {
        pts[7] = {x, y, false};
        found = g1_subgroup(pts[7]) == false;  // want a non-G1 point
      }
    }
    if (!found) {
      printf("FAIL could not find on-curve non-G1 point\n");
      return 1;
    }
    bool ok[8];
    g1_subgroup_v8(pts, ok);
    for (int l = 0; l < 8; ++l)
      if (ok[l] != g1_subgroup(pts[l])) {
        printf("FAIL subgroup_v8 lane %d: %d vs %d\n", l, ok[l],
               g1_subgroup(pts[l]));
        return 1;
      }
    printf("ok: g1_subgroup_v8 vs scalar (G1 members/infinity/non-member)\n");
  }

  // variable-base vector MSM vs scalar Pippenger (random points incl.
  // infinity lanes and zero scalars)
  {
    for (int n : {8, 33, 64, 128, 300}) {
      std::vector<G1Aff> pts(n);
      std::vector<u8> scalars((size_t)32 * n);
      G1Jac g = {G1_GEN_X_M, G1_GEN_Y_M, FP_ONE_M};
      for (int i = 0; i < n; ++i) {
        if (i % 17 == 3) {
          pts[i] = {FP_ZERO, FP_ZERO, true};
        } else {
          u8 k[32];
          for (int j = 0; j < 32; ++j) k[j] = (u8)rnd64();
          k[0] = 0;  // < r
          pts[i] = g1_to_aff(g1_mul_jac(g, k, 32));
        }
        for (int j = 0; j < 32; ++j) scalars[32 * i + j] = (u8)rnd64();
        scalars[32 * i] = 0;  // < r
        if (i % 13 == 5) memset(&scalars[32 * i], 0, 32);
      }
      G1Aff a = g1_to_aff(g1_msm_pippenger(pts, scalars.data(), n));
      G1Aff b = g1_to_aff(g1_msm_var_v8(pts, scalars.data(), n));
      if (a.inf != b.inf || (!a.inf && (!fp_eq2(a.x, b.x) || !fp_eq2(a.y, b.y)))) {
        printf("FAIL msm_var_v8 vs scalar n=%d\n", n);
        return 1;
      }
    }
    printf("ok: g1_msm_var_v8 vs scalar Pippenger\n");
  }
  // fixed-base v8 MSM with a degenerate table (all points identical):
  // floods the batched-affine tree's exception path with doublings and
  // exact cancellations (scalars 1 and 31 put (G,+) and (G,-) in bucket 0).
  {
    const int n = 16, c = 5, nwin = 4;
    G1Jac g = {G1_GEN_X_M, G1_GEN_Y_M, FP_ONE_M};
    std::vector<G1Aff> tbl((size_t)n * nwin);
    for (int w = 0; w < nwin; ++w) {
      G1Aff a = g1_to_aff(g);
      for (int i = 0; i < n; ++i) tbl[(size_t)i * nwin + w] = a;
      for (int d = 0; d < c; ++d) g = g1_dbl(g);
    }
    const size_t stride52 = (size_t)n * nwin;
    std::vector<u64> tbl52(16 * stride52);
    for (size_t r = 0; r < stride52; ++r) {
      u64 x52[8], y52[8];
      fp52_from_fp(tbl[r].x.v, x52);
      fp52_from_fp(tbl[r].y.v, y52);
      for (int l = 0; l < 8; ++l) {
        tbl52[(size_t)l * stride52 + r] = x52[l];
        tbl52[(size_t)(8 + l) * stride52 + r] = y52[l];
      }
    }
    std::vector<u8> scalars((size_t)32 * n, 0);
    for (int i = 0; i < n; ++i) {
      u32 k;
      if (i == 0) k = 1;
      else if (i == 1) k = 31;       // digit -1 in window 0: cancels i==0
      else if (i <= 3) k = 5;        // duplicate bucket: doubling exception
      else k = (u32)(rnd64() & 0x3fff);
      scalars[32 * i + 30] = (u8)(k >> 8);
      scalars[32 * i + 31] = (u8)k;
    }
    G1Aff a = g1_to_aff(g1_msm_fixed(tbl, nwin, c, scalars.data(), n));
    G1Aff b = g1_to_aff(
        g1_msm_fixed(tbl, nwin, c, scalars.data(), n, tbl52.data(), stride52));
    if (a.inf != b.inf ||
        (!a.inf && (!fp_eq2(a.x, b.x) || !fp_eq2(a.y, b.y)))) {
      printf("FAIL msm_fixed degenerate-table exception path\n");
      return 1;
    }
    printf("ok: g1_msm_fixed exception path (doubling/cancellation)\n");
  }

  // fixed-base vector MSM (shift table + plane copy) vs scalar Pippenger;
  // n=20 hits the c=4 edge (bshift=0), n=600 a multi-lane reduce (c=9).
  {
    // n=64 duplicates one point everywhere: identical table points collide
    // in buckets, driving the batched-affine tree's exception path
    // (doublings and inverse pairs deferred to the Jacobian overflow list).
    for (int n : {20, 600, 64}) {
      const bool dup = n == 64;
      const int c = pippenger_window(n);
      const int nwin = (256 + c - 1) / c + 1;
      std::vector<G1Aff> pts(n);
      std::vector<u8> scalars((size_t)32 * n);
      G1Jac g = {G1_GEN_X_M, G1_GEN_Y_M, FP_ONE_M};
      for (int i = 0; i < n; ++i) {
        if (!dup && i % 19 == 7) {
          pts[i] = {FP_ZERO, FP_ZERO, true};
        } else if (dup && i > 0) {
          pts[i] = pts[0];
        } else {
          u8 k[32];
          for (int j = 0; j < 32; ++j) k[j] = (u8)rnd64();
          k[0] = 0;  // < r
          pts[i] = g1_to_aff(g1_mul_jac(g, k, 32));
        }
        for (int j = 0; j < 32; ++j) scalars[32 * i + j] = (u8)rnd64();
        scalars[32 * i] = 0;  // < r
        if (i % 11 == 2) memset(&scalars[32 * i], 0, 32);
      }
      std::vector<G1Aff> tbl((size_t)n * nwin);
      for (int i = 0; i < n; ++i) {
        if (pts[i].inf) {
          for (int w = 0; w < nwin; ++w) tbl[(size_t)i * nwin + w] = pts[i];
          continue;
        }
        G1Jac q = g1_from_aff(pts[i]);
        for (int w = 0; w < nwin; ++w) {
          tbl[(size_t)i * nwin + w] = g1_to_aff(q);
          for (int d = 0; d < c; ++d) q = g1_dbl(q);
        }
      }
      const size_t stride = (size_t)n * nwin;
      std::vector<u64> tbl52(16 * stride, 0);
      for (size_t i = 0; i < stride; ++i) {
        if (tbl[i].inf) continue;
        u64 x52[8], y52[8];
        fp52_from_fp(tbl[i].x.v, x52);
        fp52_from_fp(tbl[i].y.v, y52);
        for (int l = 0; l < 8; ++l) {
          tbl52[(size_t)l * stride + i] = x52[l];
          tbl52[(size_t)(8 + l) * stride + i] = y52[l];
        }
      }
      G1Aff a = g1_to_aff(g1_msm_pippenger(pts, scalars.data(), n));
      G1Aff b = g1_to_aff(g1_msm_fixed(tbl, nwin, c, scalars.data(), n,
                                       tbl52.data(), stride));
      if (a.inf != b.inf ||
          (!a.inf && (!fp_eq2(a.x, b.x) || !fp_eq2(a.y, b.y)))) {
        printf("FAIL msm_fixed_v8 vs scalar n=%d\n", n);
        return 1;
      }
    }
    printf("ok: g1_msm_fixed v8 vs scalar Pippenger\n");
  }

  printf("ALL V8 UNIT TESTS PASS\n");
  return 0;
#endif
}
