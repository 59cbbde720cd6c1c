// BN254 (alt_bn128) optimal-ate pairing — native host library.
//
// This is the C++ counterpart of zksnark_tpu/curve/bn254.py and fills the
// role the external Rust `bn` crate plays in the reference implementation
// (/root/reference/src/groth16/fr.rs:4): the fast host-side group/pairing
// arithmetic that the protocol's verify path needs.  Same tower and the
// same algorithms as the Python module (which is the correctness oracle):
//
//   Fq   : 4x64-bit limbs, Montgomery form (CIOS with __int128)
//   Fq2  = Fq[u]/(u^2+1)
//   Fq12 = Fq2[w]/(w^6 - xi), xi = 9 + u
//   Miller loop: affine, sparse untwisted lines l = yP - lam*xP*w + (...)w^3
//   Final exp: easy part via Frobenius, hard part by square-and-multiply
//              of (q^4 - q^2 + 1)/r.
//
// C ABI (bytes are little-endian, coordinates in PLAIN form, infinity =
// all-zero point):
//   bn254_pairing(g1[64], g2[128], out_gt[384])
//   bn254_pairing_check(g1s, g2s, n) -> 1 iff prod_i e(P_i, Q_i) == 1
//   bn254_g1_scalar_mul(p[64], k[32], out[64])
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <cstdint>
#include <cstring>

#include "bn254_constants.h"

typedef unsigned __int128 u128;

struct Fq { uint64_t v[4]; };

static inline bool fq_is_zero(const Fq &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool fq_eq(const Fq &a, const Fq &b) {
  return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
         a.v[3] == b.v[3];
}

static inline bool geq_q(const Fq &a) {
  for (int i = 3; i >= 0; --i) {
    if (a.v[i] > BN_Q[i]) return true;
    if (a.v[i] < BN_Q[i]) return false;
  }
  return true;  // equal
}

static inline void fq_sub_q(Fq &a) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - BN_Q[i] - borrow;
    a.v[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

static inline Fq fq_add(const Fq &a, const Fq &b) {
  Fq r;
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (uint64_t)s;
    carry = s >> 64;
  }
  if (carry || geq_q(r)) fq_sub_q(r);
  return r;
}

static inline Fq fq_sub(const Fq &a, const Fq &b) {
  Fq r;
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)r.v[i] + BN_Q[i] + carry;
      r.v[i] = (uint64_t)s;
      carry = s >> 64;
    }
  }
  return r;
}

static inline Fq fq_neg(const Fq &a) {
  if (fq_is_zero(a)) return a;
  Fq q;
  memcpy(q.v, BN_Q, sizeof(q.v));
  return fq_sub(q, a);
}

// CIOS Montgomery multiplication
static Fq fq_mul(const Fq &a, const Fq &b) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
      t[j] = (uint64_t)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[4] + carry;
    t[4] = (uint64_t)s;
    t[5] = (uint64_t)(s >> 64);

    uint64_t m = t[0] * BN_N0INV;
    carry = 0;
    {
      u128 s0 = (u128)t[0] + (u128)m * BN_Q[0];
      carry = s0 >> 64;
    }
    for (int j = 1; j < 4; ++j) {
      u128 s2 = (u128)t[j] + (u128)m * BN_Q[j] + carry;
      t[j - 1] = (uint64_t)s2;
      carry = s2 >> 64;
    }
    u128 s3 = (u128)t[4] + carry;
    t[3] = (uint64_t)s3;
    t[4] = t[5] + (uint64_t)(s3 >> 64);
    t[5] = 0;
  }
  Fq r = {{t[0], t[1], t[2], t[3]}};
  if (t[4] || geq_q(r)) fq_sub_q(r);
  return r;
}

static inline Fq fq_sqr(const Fq &a) { return fq_mul(a, a); }

static Fq fq_pow(const Fq &a, const uint64_t *e, int nlimbs) {
  Fq one;
  memcpy(one.v, BN_ONE_MONT, sizeof(one.v));
  Fq acc = one;
  bool started = false;
  for (int i = nlimbs - 1; i >= 0; --i) {
    for (int b = 63; b >= 0; --b) {
      if (started) acc = fq_sqr(acc);
      if ((e[i] >> b) & 1) {
        if (started) acc = fq_mul(acc, a);
        else { acc = a; started = true; }
      }
    }
  }
  return started ? acc : one;
}

static Fq fq_inv(const Fq &a) {
  // Fermat: a^(q-2)
  uint64_t e[4];
  memcpy(e, BN_Q, sizeof(e));
  // subtract 2
  u128 borrow = 2;
  for (int i = 0; i < 4 && borrow; ++i) {
    u128 d = (u128)e[i] - borrow;
    e[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  return fq_pow(a, e, 4);
}

static Fq fq_from_plain(const uint64_t *limbs) {
  Fq a = {{limbs[0], limbs[1], limbs[2], limbs[3]}};
  Fq r2;
  memcpy(r2.v, BN_R2, sizeof(r2.v));
  return fq_mul(a, r2);
}

static void fq_to_plain(const Fq &a, uint64_t *out) {
  Fq one = {{1, 0, 0, 0}};
  Fq p = fq_mul(a, one);
  memcpy(out, p.v, 32);
}

// ---------------------------------------------------------------------------
// Fq2
// ---------------------------------------------------------------------------

struct Fq2 { Fq c0, c1; };

static const Fq FQ_ZERO = {{0, 0, 0, 0}};

static inline Fq2 fq2_zero() { return {FQ_ZERO, FQ_ZERO}; }
static inline Fq2 fq2_one() {
  Fq one;
  memcpy(one.v, BN_ONE_MONT, sizeof(one.v));
  return {one, FQ_ZERO};
}
static inline bool fq2_is_zero(const Fq2 &a) {
  return fq_is_zero(a.c0) && fq_is_zero(a.c1);
}
static inline bool fq2_eq(const Fq2 &a, const Fq2 &b) {
  return fq_eq(a.c0, b.c0) && fq_eq(a.c1, b.c1);
}
static inline Fq2 fq2_add(const Fq2 &a, const Fq2 &b) {
  return {fq_add(a.c0, b.c0), fq_add(a.c1, b.c1)};
}
static inline Fq2 fq2_sub(const Fq2 &a, const Fq2 &b) {
  return {fq_sub(a.c0, b.c0), fq_sub(a.c1, b.c1)};
}
static inline Fq2 fq2_neg(const Fq2 &a) {
  return {fq_neg(a.c0), fq_neg(a.c1)};
}
static inline Fq2 fq2_conj(const Fq2 &a) { return {a.c0, fq_neg(a.c1)}; }
static Fq2 fq2_mul(const Fq2 &a, const Fq2 &b) {
  Fq t0 = fq_mul(a.c0, b.c0);
  Fq t1 = fq_mul(a.c1, b.c1);
  Fq t2 = fq_mul(fq_add(a.c0, a.c1), fq_add(b.c0, b.c1));
  return {fq_sub(t0, t1), fq_sub(fq_sub(t2, t0), t1)};
}
static inline Fq2 fq2_sqr(const Fq2 &a) { return fq2_mul(a, a); }
static Fq2 fq2_scalar(const Fq2 &a, const Fq &k) {
  return {fq_mul(a.c0, k), fq_mul(a.c1, k)};
}
static Fq2 fq2_inv(const Fq2 &a) {
  Fq norm = fq_add(fq_sqr(a.c0), fq_sqr(a.c1));
  Fq ni = fq_inv(norm);
  return {fq_mul(a.c0, ni), fq_neg(fq_mul(a.c1, ni))};
}

// xi = 9 + u (Montgomery)
static Fq2 XI_MONT;

// ---------------------------------------------------------------------------
// Fq12 = Fq2[w]/(w^6 - xi)
// ---------------------------------------------------------------------------

struct Fq12 { Fq2 c[6]; };

static Fq12 fq12_one() {
  Fq12 r;
  r.c[0] = fq2_one();
  for (int i = 1; i < 6; ++i) r.c[i] = fq2_zero();
  return r;
}

static bool fq12_is_one(const Fq12 &a) {
  if (!fq2_eq(a.c[0], fq2_one())) return false;
  for (int i = 1; i < 6; ++i)
    if (!fq2_is_zero(a.c[i])) return false;
  return true;
}

static Fq12 fq12_mul(const Fq12 &a, const Fq12 &b) {
  Fq2 prod[11];
  for (int i = 0; i < 11; ++i) prod[i] = fq2_zero();
  for (int i = 0; i < 6; ++i) {
    if (fq2_is_zero(a.c[i])) continue;
    for (int j = 0; j < 6; ++j) {
      if (fq2_is_zero(b.c[j])) continue;
      prod[i + j] = fq2_add(prod[i + j], fq2_mul(a.c[i], b.c[j]));
    }
  }
  Fq12 r;
  for (int i = 0; i < 6; ++i) r.c[i] = prod[i];
  for (int k = 6; k < 11; ++k)
    r.c[k - 6] = fq2_add(r.c[k - 6], fq2_mul(prod[k], XI_MONT));
  return r;
}

static inline Fq12 fq12_sqr(const Fq12 &a) { return fq12_mul(a, a); }

static Fq12 fq12_conj(const Fq12 &a) {
  Fq12 r = a;
  r.c[1] = fq2_neg(a.c[1]);
  r.c[3] = fq2_neg(a.c[3]);
  r.c[5] = fq2_neg(a.c[5]);
  return r;
}

// polynomial extended gcd over Fq2 for the inverse in Fq2[w]/(w^6 - xi)
struct Poly {
  Fq2 c[13];
  int deg;  // -1 for zero
};

static void poly_norm(Poly &p) {
  p.deg = -1;
  for (int i = 12; i >= 0; --i)
    if (!fq2_is_zero(p.c[i])) { p.deg = i; break; }
}

static Fq12 fq12_inv(const Fq12 &a) {
  // r0 = w^6 - xi, r1 = a; maintain t0, t1 with t*a = r (mod modulus)
  Poly r0, r1, t0, t1;
  for (int i = 0; i < 13; ++i) {
    r0.c[i] = fq2_zero();
    r1.c[i] = fq2_zero();
    t0.c[i] = fq2_zero();
    t1.c[i] = fq2_zero();
  }
  r0.c[6] = fq2_one();
  r0.c[0] = fq2_neg(XI_MONT);
  for (int i = 0; i < 6; ++i) r1.c[i] = a.c[i];
  t1.c[0] = fq2_one();
  poly_norm(r0);
  poly_norm(r1);
  poly_norm(t0);
  poly_norm(t1);

  while (r1.deg > 0) {
    // divide r0 by r1 -> quotient q; r0 = r0 - q*r1, t0 = t0 - q*t1
    while (r0.deg >= r1.deg && r0.deg >= 0) {
      Fq2 coef = fq2_mul(r0.c[r0.deg], fq2_inv(r1.c[r1.deg]));
      int shift = r0.deg - r1.deg;
      for (int i = 0; i <= r1.deg; ++i)
        r0.c[i + shift] = fq2_sub(r0.c[i + shift], fq2_mul(coef, r1.c[i]));
      for (int i = 0; i <= t1.deg; ++i)
        t0.c[i + shift] = fq2_sub(t0.c[i + shift], fq2_mul(coef, t1.c[i]));
      poly_norm(r0);
      if (t0.deg < t1.deg + shift) t0.deg = t1.deg + shift;
      poly_norm(t0);
    }
    Poly tmp = r0; r0 = r1; r1 = tmp;
    tmp = t0; t0 = t1; t1 = tmp;
  }
  // r1 is a nonzero constant (a invertible): result = t1 / r1
  Fq2 s = fq2_inv(r1.c[0]);
  Fq12 out;
  for (int i = 0; i < 6; ++i) out.c[i] = fq2_mul(t1.c[i], s);
  return out;
}

static Fq2 GAMMA_MONT[6];

static Fq12 fq12_frobenius(const Fq12 &a) {
  Fq12 r;
  for (int i = 0; i < 6; ++i)
    r.c[i] = fq2_mul(fq2_conj(a.c[i]), GAMMA_MONT[i]);
  return r;
}

// ---------------------------------------------------------------------------
// G1 (plain affine, Montgomery coords) and G2 (twist, Fq2 coords)
// ---------------------------------------------------------------------------

struct G1 { Fq x, y; bool inf; };
struct G2 { Fq2 x, y; bool inf; };

static G1 g1_add(const G1 &p, const G1 &q) {
  if (p.inf) return q;
  if (q.inf) return p;
  Fq lam;
  if (fq_eq(p.x, q.x)) {
    if (fq_is_zero(fq_add(p.y, q.y))) return {FQ_ZERO, FQ_ZERO, true};
    Fq three_x2 = fq_mul(fq_add(fq_add(p.x, p.x), p.x), p.x);
    lam = fq_mul(three_x2, fq_inv(fq_add(p.y, p.y)));
  } else {
    lam = fq_mul(fq_sub(q.y, p.y), fq_inv(fq_sub(q.x, p.x)));
  }
  Fq x3 = fq_sub(fq_sub(fq_sqr(lam), p.x), q.x);
  Fq y3 = fq_sub(fq_mul(lam, fq_sub(p.x, x3)), p.y);
  return {x3, y3, false};
}

static G1 g1_scalar_mul(const G1 &p, const uint64_t *k, int nlimbs) {
  G1 acc = {FQ_ZERO, FQ_ZERO, true};
  G1 add = p;
  for (int i = 0; i < nlimbs; ++i) {
    uint64_t limb = k[i];
    for (int b = 0; b < 64; ++b) {
      if ((limb >> b) & 1) acc = g1_add(acc, add);
      add = g1_add(add, add);
    }
  }
  return acc;
}

static G2 g2_neg(const G2 &p) { return {p.x, fq2_neg(p.y), p.inf}; }

static G2 g2_frobenius(const G2 &p) {
  if (p.inf) return p;
  return {fq2_mul(fq2_conj(p.x), GAMMA_MONT[2]),
          fq2_mul(fq2_conj(p.y), GAMMA_MONT[3]), false};
}

// ---------------------------------------------------------------------------
// Miller loop
// ---------------------------------------------------------------------------

// line through T, Q (tangent if equal) evaluated at P; updates T <- T+Q
static Fq12 line_and_add(G2 &t, const G2 &q, const Fq &xp, const Fq &yp) {
  Fq12 l = fq12_one();
  bool tangent = fq2_eq(t.x, q.x) && fq2_eq(t.y, q.y);
  Fq2 lam;
  if (tangent) {
    Fq2 x2 = fq2_sqr(t.x);
    Fq2 three_x2 = fq2_add(fq2_add(x2, x2), x2);
    lam = fq2_mul(three_x2, fq2_inv(fq2_add(t.y, t.y)));
  } else if (fq2_eq(t.x, q.x)) {
    // vertical: l = xP - xT w^2
    for (int i = 0; i < 6; ++i) l.c[i] = fq2_zero();
    l.c[0] = {xp, FQ_ZERO};
    l.c[2] = fq2_neg(t.x);
    t.inf = true;
    return l;
  } else {
    lam = fq2_mul(fq2_sub(q.y, t.y), fq2_inv(fq2_sub(q.x, t.x)));
  }
  Fq2 x3 = fq2_sub(fq2_sub(fq2_sqr(lam), t.x), q.x);
  Fq2 y3 = fq2_sub(fq2_mul(lam, fq2_sub(t.x, x3)), t.y);

  for (int i = 0; i < 6; ++i) l.c[i] = fq2_zero();
  l.c[0] = {yp, FQ_ZERO};
  l.c[1] = fq2_neg(fq2_scalar(lam, xp));
  l.c[3] = fq2_sub(fq2_mul(lam, t.x), t.y);
  t = {x3, y3, false};
  return l;
}

static Fq12 miller_loop(const G1 &p, const G2 &q) {
  if (p.inf || q.inf) return fq12_one();
  Fq12 f = fq12_one();
  G2 t = q;
  for (int b = 0; b < BN_ATE_BITS_LEN; ++b) {
    Fq12 l = line_and_add(t, t, p.x, p.y);
    f = fq12_mul(fq12_sqr(f), l);
    if (BN_ATE_BITS[b]) {
      Fq12 l2 = line_and_add(t, q, p.x, p.y);
      f = fq12_mul(f, l2);
    }
  }
  G2 q1 = g2_frobenius(q);
  G2 q2 = g2_neg(g2_frobenius(q1));
  Fq12 l = line_and_add(t, q1, p.x, p.y);
  f = fq12_mul(f, l);
  Fq12 l2 = line_and_add(t, q2, p.x, p.y);
  f = fq12_mul(f, l2);
  return f;
}

static Fq12 fq12_pow(const Fq12 &a, const uint64_t *e, int nlimbs) {
  Fq12 acc = fq12_one();
  bool started = false;
  for (int i = nlimbs - 1; i >= 0; --i) {
    for (int b = 63; b >= 0; --b) {
      if (started) acc = fq12_sqr(acc);
      if ((e[i] >> b) & 1) {
        if (started) acc = fq12_mul(acc, a);
        else { acc = a; started = true; }
      }
    }
  }
  return acc;
}

static Fq12 final_exponentiation(const Fq12 &f0) {
  Fq12 f = fq12_mul(fq12_conj(f0), fq12_inv(f0));         // ^(q^6 - 1)
  f = fq12_mul(fq12_frobenius(fq12_frobenius(f)), f);     // ^(q^2 + 1)
  return fq12_pow(f, BN_HARD_EXP, 12);
}

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

static void init_constants() {
  static bool done = false;
  if (done) return;
  uint64_t nine[4] = {9, 0, 0, 0};
  uint64_t one[4] = {1, 0, 0, 0};
  XI_MONT = {fq_from_plain(nine), fq_from_plain(one)};
  for (int i = 0; i < 6; ++i)
    GAMMA_MONT[i] = {fq_from_plain(BN_GAMMA[i][0]),
                     fq_from_plain(BN_GAMMA[i][1])};
  done = true;
}

static G1 g1_from_bytes(const uint8_t *b) {
  uint64_t x[4], y[4];
  memcpy(x, b, 32);
  memcpy(y, b + 32, 32);
  bool inf = true;
  for (int i = 0; i < 4; ++i)
    if (x[i] || y[i]) inf = false;
  if (inf) return {FQ_ZERO, FQ_ZERO, true};
  return {fq_from_plain(x), fq_from_plain(y), false};
}

static G2 g2_from_bytes(const uint8_t *b) {
  uint64_t x0[4], x1[4], y0[4], y1[4];
  memcpy(x0, b, 32);
  memcpy(x1, b + 32, 32);
  memcpy(y0, b + 64, 32);
  memcpy(y1, b + 96, 32);
  bool inf = true;
  for (int i = 0; i < 4; ++i)
    if (x0[i] || x1[i] || y0[i] || y1[i]) inf = false;
  if (inf) return {fq2_zero(), fq2_zero(), true};
  return {{fq_from_plain(x0), fq_from_plain(x1)},
          {fq_from_plain(y0), fq_from_plain(y1)}, false};
}

extern "C" {

// product of Miller loops + final exponentiation; out = 12 Fq2 coeffs
// = 12 * 32 bytes (c0_0, c1_0, c0_1, c1_1, ...) in plain form
void bn254_multi_pairing(const uint8_t *g1s, const uint8_t *g2s, int n,
                         uint8_t *out384) {
  init_constants();
  Fq12 f = fq12_one();
  for (int i = 0; i < n; ++i) {
    G1 p = g1_from_bytes(g1s + 64 * i);
    G2 q = g2_from_bytes(g2s + 128 * i);
    f = fq12_mul(f, miller_loop(p, q));
  }
  f = final_exponentiation(f);
  for (int i = 0; i < 6; ++i) {
    uint64_t c0[4], c1[4];
    fq_to_plain(f.c[i].c0, c0);
    fq_to_plain(f.c[i].c1, c1);
    memcpy(out384 + 64 * i, c0, 32);
    memcpy(out384 + 64 * i + 32, c1, 32);
  }
}

int bn254_pairing_check(const uint8_t *g1s, const uint8_t *g2s, int n) {
  init_constants();
  Fq12 f = fq12_one();
  for (int i = 0; i < n; ++i) {
    G1 p = g1_from_bytes(g1s + 64 * i);
    G2 q = g2_from_bytes(g2s + 128 * i);
    f = fq12_mul(f, miller_loop(p, q));
  }
  return fq12_is_one(final_exponentiation(f)) ? 1 : 0;
}

void bn254_g1_scalar_mul(const uint8_t *p64, const uint8_t *k32,
                         uint8_t *out64) {
  init_constants();
  G1 p = g1_from_bytes(p64);
  uint64_t k[4];
  memcpy(k, k32, 32);
  G1 r = g1_scalar_mul(p, k, 4);
  uint64_t x[4] = {0, 0, 0, 0}, y[4] = {0, 0, 0, 0};
  if (!r.inf) {
    fq_to_plain(r.x, x);
    fq_to_plain(r.y, y);
  }
  memcpy(out64, x, 32);
  memcpy(out64 + 32, y, 32);
}

}  // extern "C"
