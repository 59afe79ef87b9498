#include "kzg_native.cpp"
#include <cstdio>
#include <chrono>

int main() {
  ensure_init();
#ifdef KZG_HAVE_IFMA
  std::call_once(FP52_INIT_FLAG, fp52_init);
  u64 one[8][8];
  for (int l = 0; l < 8; ++l) memcpy(one[l], FP52_ONE_M, sizeof(FP52_ONE_M));
  V8 a = v8_pack(one), b = a;
  const int N = 100000;
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < N; ++i) a = v8_mm(a, b);  // latency chain
  auto t1 = std::chrono::steady_clock::now();
  double ns = std::chrono::duration<double, std::nano>(t1 - t0).count() / N;
  printf("v8_mm latency-chain: %.1f ns/call (%.1f ns per lane-mul)\n", ns, ns / 8);
  // throughput: independent chains with DISTINCT states (identical chains
  // get CSE'd into one by the compiler, faking a 4x speedup)
  V8 c1 = a, c2 = v8_mm(a, a), c3 = v8_mm(c2, a), c4 = v8_mm(c3, a);
  t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < N / 4; ++i) {
    c1 = v8_mm(c1, b); c2 = v8_mm(c2, b); c3 = v8_mm(c3, b); c4 = v8_mm(c4, b);
  }
  t1 = std::chrono::steady_clock::now();
  ns = std::chrono::duration<double, std::nano>(t1 - t0).count() / N;
  printf("v8_mm 4-chain: %.1f ns/call (%.1f ns per lane-mul)\n", ns, ns / 8);
  V8 c5 = v8_mm(c4, a);
  t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < N / 2; ++i) {
    c4 = v8_mm(c4, b); c5 = v8_mm(c5, b);
  }
  t1 = std::chrono::steady_clock::now();
  ns = std::chrono::duration<double, std::nano>(t1 - t0).count() / N;
  printf("v8_mm 2-chain: %.1f ns/call (%.1f ns per lane-mul)\n", ns, ns / 8);
  c1 = v8_mm(v8_mm(c1, c2), v8_mm(v8_mm(c3, c4), c5));
  // scalar fp_mul for reference
  Fp x = FP_ONE_M;
  t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < N; ++i) x = fp_mul(x, FP_ONE_M);
  t1 = std::chrono::steady_clock::now();
  ns = std::chrono::duration<double, std::nano>(t1 - t0).count() / N;
  printf("scalar fp_mul chain: %.1f ns/call\n", ns);
  // v5 (Fr) for reference
  u64 fone[8][5];
  V5 fa, fb;
  for (int l = 0; l < 5; ++l) {
    fa.l[l] = _mm512_set1_epi64(FR52_ONE_M[l]);
    fb.l[l] = fa.l[l];
  }
  std::call_once(FR52_INIT_FLAG, fr52_init);
  t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < N; ++i) fa = v5_mm(fa, fb);
  t1 = std::chrono::steady_clock::now();
  ns = std::chrono::duration<double, std::nano>(t1 - t0).count() / N;
  printf("v5_mm latency-chain: %.1f ns/call (%.1f ns per lane-mul)\n", ns, ns / 8);
  // v5 throughput: 4 independent chains
  V5 f1 = fa, f2 = fa, f3 = fa, f4 = fa;
  t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < N / 4; ++i) {
    f1 = v5_mm(f1, fb); f2 = v5_mm(f2, fb); f3 = v5_mm(f3, fb); f4 = v5_mm(f4, fb);
  }
  t1 = std::chrono::steady_clock::now();
  ns = std::chrono::duration<double, std::nano>(t1 - t0).count() / N;
  printf("v5_mm 4-chain: %.1f ns/call (%.1f ns per lane-mul)\n", ns, ns / 8);
  fa = v5_mm(v5_mm(f1, f2), v5_mm(f3, f4));
  // v8_madd chain: the bucket accumulator's inner op (acc += gathered pt)
  {
    V8 X = a, Y = b, Z = a, gx = b, gy = a;
    const int M = N / 10;
    t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < M; ++i) v8_madd(X, Y, Z, gx, gy);
    t1 = std::chrono::steady_clock::now();
    ns = std::chrono::duration<double, std::nano>(t1 - t0).count() / M;
    printf("v8_madd chain: %.1f ns/call (%.2f x mm-latency, 12 muls)\n", ns,
           ns / 91.0);
    u64 s[8][8];
    v8_extract(X, s);
    if (s[0][0] == 0xdeadbeef) printf("!\n");
  }
  // v8_padd chain (reduction ladder op)
  {
    V8 X = a, Y = b, Z = a, x2 = b, y2 = a, z2 = b;
    const int M = N / 10;
    t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < M; ++i) v8_padd(X, Y, Z, x2, y2, z2);
    t1 = std::chrono::steady_clock::now();
    ns = std::chrono::duration<double, std::nano>(t1 - t0).count() / M;
    printf("v8_padd chain: %.1f ns/call (14 muls)\n", ns);
    u64 s[8][8];
    v8_extract(X, s);
    if (s[0][0] == 0xdeadbeef) printf("!\n");
  }
  // perblob pipeline split: blob byte->52-plane conversion vs bary eval
  {
    u64 rs = 0x9e3779b97f4a7c15ULL;
    auto rnd64 = [&rs]() {
      rs ^= rs << 13;
      rs ^= rs >> 7;
      rs ^= rs << 17;
      return rs;
    };
    const u32 n = 4096;
    std::vector<u8> blob(n * 32, 0);
    for (u32 i = 0; i < n; ++i)
      for (int j = 1; j < 32; ++j) blob[32 * i + j] = (u8)rnd64();
    std::vector<Fr> elems(n);
    std::vector<u64> planes[5];
    std::call_once(FR52_INIT_FLAG, fr52_init);
    // domain: real roots are unavailable here; bit pattern suffices for cost
    Fr52Domain D;
    D.n = n;
    for (int l = 0; l < 5; ++l) {
      D.root_planes[l].resize(n);
      for (u32 i = 0; i < n; ++i)
        D.root_planes[l][i] = rnd64() & 0x7ffffffffffffULL;
    }
    Fr52Scratch S;
    const int M = 50;
    double best_conv = 1e18, best_bary = 1e18;
    for (int r = 0; r < 8; ++r) {
      auto c0 = std::chrono::steady_clock::now();
      for (int i = 0; i < M; ++i) blob_elems_std52(blob.data(), n, elems, planes);
      auto c1t = std::chrono::steady_clock::now();
      double v = std::chrono::duration<double, std::micro>(c1t - c0).count() / M;
      if (v < best_conv) best_conv = v;
      const u64 *ep[5];
      for (int l = 0; l < 5; ++l) ep[l] = planes[l].data();
      Fr z;
      for (int l = 0; l < 4; ++l) z.v[l] = rnd64();
      z.v[3] %= FR.mod[3];
      int in_dom;
      Fr y;
      c0 = std::chrono::steady_clock::now();
      for (int i = 0; i < M; ++i)
        bary52_eval(D, ep, z, false, S, &in_dom, &y);
      c1t = std::chrono::steady_clock::now();
      v = std::chrono::duration<double, std::micro>(c1t - c0).count() / M;
      if (v < best_bary) best_bary = v;
    }
    printf("perblob split: conv=%.1f us/blob  bary=%.1f us/blob\n", best_conv,
           best_bary);
  }
  // pairing split: miller loop, final exponentiation, tower ops
  {
    G1Aff g1 = {G1_GEN_X_M, G1_GEN_Y_M, false};
    // Arbitrary Fp2 coordinates: miller_loop's cost is input-independent,
    // so an off-curve q times identically to the real generator.
    u64 rs2 = 0x243f6a8885a308d3ULL;
    auto r64 = [&rs2]() {
      rs2 ^= rs2 << 13;
      rs2 ^= rs2 >> 7;
      rs2 ^= rs2 << 17;
      return rs2;
    };
    G2Aff q;
    q.inf = false;
    for (Fp *c : {&q.x.a, &q.x.b, &q.y.a, &q.y.b}) {
      u64 raw[6];
      for (int l = 0; l < 6; ++l) raw[l] = r64();
      raw[5] %= FP.mod[5];
      to_mont<6>(FP, raw, c->v);
    }
    {
      const int M = 50;
      Fp12 f = FP12_ONE_C;
      auto t0p = std::chrono::steady_clock::now();
      for (int i = 0; i < M; ++i) f = fp12_mul(f, miller_loop(g1, q));
      auto t1p = std::chrono::steady_clock::now();
      double ml =
          std::chrono::duration<double, std::micro>(t1p - t0p).count() / M;
      t0p = std::chrono::steady_clock::now();
      for (int i = 0; i < M; ++i) f = fp12_mul(f, final_exponentiation(f));
      t1p = std::chrono::steady_clock::now();
      double fe =
          std::chrono::duration<double, std::micro>(t1p - t0p).count() / M;
      const int K = 20000;
      Fp12 g = f;
      t0p = std::chrono::steady_clock::now();
      for (int i = 0; i < K; ++i) g = fp12_mul(g, f);
      t1p = std::chrono::steady_clock::now();
      double m12 =
          std::chrono::duration<double, std::nano>(t1p - t0p).count() / K;
      t0p = std::chrono::steady_clock::now();
      for (int i = 0; i < K; ++i) g = fp12_cyclo_sqr(g);
      t1p = std::chrono::steady_clock::now();
      double cs =
          std::chrono::duration<double, std::nano>(t1p - t0p).count() / K;
      printf("pairing split: miller=%.0f us  final_exp=%.0f us  "
             "fp12_mul=%.0f ns  cyclo_sqr=%.0f ns\n",
             ml, fe, m12, cs);
      if (fp12_is_one(g)) printf("!\n");
    }
  }
  // keep results live
  u64 sink[8][8]; v8_extract(c1, sink);
  u64 fsink[8]; _mm512_storeu_si512(fsink, fa.l[0]);
  return (int)(sink[0][0] & 1) ^ (int)(x.v[0] & 1) ^ (int)(fsink[0] & 1);
#else
  return 1;
#endif
}
