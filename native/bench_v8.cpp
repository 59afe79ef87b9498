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
  // keep results live
  u64 sink[8][8]; v8_extract(c1, sink);
  u64 fsink[8]; _mm512_storeu_si512(fsink, fa.l[0]);
  return (int)(sink[0][0] & 1) ^ (int)(x.v[0] & 1) ^ (int)(fsink[0] & 1);
#else
  return 1;
#endif
}
