"""RNS (residue number system) Montgomery arithmetic — the MXU formulation.

Motivation (BENCH_NOTES.md): on TPU v5e the VPU sustains ~0.4 Top/s while
the MXU does 10-100x that.  Digit-plane schoolbook mulmod (jnp_ops /
pallas_ops) is VPU-bound because a*b has no shared operand.  In RNS form the
quadratic work of Montgomery reduction becomes *base extensions* — matmuls
with a SHARED CRT matrix — which the MXU can execute; only O(K) pointwise
channel ops per multiply remain on the VPU.

Algorithm (Bajard-style RNS Montgomery with an offset first extension and a
Shenoy-Kumaresan exact return extension via one redundant channel):

  bases A = {p_1..p_K}, B = {q_1..q_K} of ~12-bit primes, r-channel m_r=2^13
  P = prod(A) >= 16*K*N (the Montgomery radix R := P), Q = prod(B) >= 4*K*N
  value invariant: mul outputs <= V := 2*K*N; add/sub outputs <= 2V

  mont_mul(x, y):  (all per curve, channels vectorized)
    1. s      = x * y mod each channel                       [2K+1 muls]
    2. sigma_i = s_i * |(-N^-1)(P/p_i)^-1|_{p_i}  (base A)   [K muls]
    3. M0 mod (B, r) = sigma @ W1,  W1[i,j] = |P/p_i|_{q_j}  [MATMUL K x K+1]
       (M0 = sum sigma_i P/p_i < K*P is NOT reduced mod P — the offset
        multiple of P divides out in step 4 and only widens t by K*N)
    4. t_{B,r} = (s + M0 * N) * P^-1 per channel             [2(K+1) muls]
    5. tau_j  = t_j * |(Q/q_j)^-1|_{q_j}                     [K muls]
    6. t mod (A, r') = tau @ W2, W2[j,i] = |Q/q_j|_{p_i}     [MATMUL K x K+1]
       beta = (tau @ w_r - t_r) * |Q^-1|_{m_r} mod m_r   (exact: beta < K)
       t_A = (tau @ W2 - beta * |Q|_{p_i}) mod p_i
  Subtraction adds the constant F = 2K*N (a multiple of N >= V) to keep
  values nonnegative: RNS cannot carry signs through CRT.

Channel reductions use a float32 Barrett (z < 2^30, q = round(z * 1/p) off
by <= 2, fixed with selects) — the 24-bit-exact-float trick in the same
spirit as the reference's 52-bit FMA arithmetic (/root/reference/
vecarith52.c:199-247), sized for the TPU's f32 VPU.

This module is the exact jnp implementation + host conversions; the Pallas/
MXU kernel lands on top of it (see ARCHITECTURE.md round-2 plan).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import MontyCtx


# ---------------------------------------------------------------------------
# context construction (host)
# ---------------------------------------------------------------------------

def _primes_below(limit: int, count: int) -> List[int]:
    out = []
    x = limit
    while len(out) < count:
        x -= 1
        if x < 3:
            raise ValueError("ran out of channel primes")
        is_p = all(x % d for d in range(2, int(x ** 0.5) + 1))
        if is_p:
            out.append(x)
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RnsCtx:
    # channel moduli and their f32 reciprocals, rows = [A | B | r]
    p: jax.Array          # [2K+2, 1] int32  (last row padded copy of m_r)
    inv_p: jax.Array      # [2K+2, 1] f32
    c1: jax.Array         # [K, 1]  |(-N^-1)(P/p_i)^-1|_{p_i}
    w1: jax.Array         # [K, K+1] |P/p_i|_{q_j / m_r}
    n_br: jax.Array       # [K+1, 1] |N|_{q_j / m_r}
    pinv_br: jax.Array    # [K+1, 1] |P^-1|_{q_j / m_r}
    qdivinv: jax.Array    # [K, 1]  |(Q/q_j)^-1|_{q_j}
    w2: jax.Array         # [K, K+1] |Q/q_j|_{p_i / m_r}
    qinv_r: jax.Array     # [1, 1]  |Q^-1|_{m_r}
    qmod_ar: jax.Array    # [K+1, 1] |Q|_{p_i / m_r} (r row unused)
    comp_a: jax.Array     # [K, 1]  per-channel nonneg compensation (mult of p)
    f_sub: jax.Array      # [2K+1, 1] residues of F = 2K*N (subtraction lift)
    K: int = dataclasses.field(metadata=dict(static=True))
    mr_shift: int = dataclasses.field(metadata=dict(static=True))

    @property
    def rows(self) -> int:
        return 2 * self.K + 1


@dataclasses.dataclass(frozen=True)
class RnsHost:
    """Host-side mirror for conversions."""
    ctx: MontyCtx
    pa: List[int]
    pb: List[int]
    mr: int
    P: int
    Q: int
    K: int
    V: int
    dev: RnsCtx

    def to_rns(self, x_mont: int) -> np.ndarray:
        """Montgomery(P)-domain int -> channel residues [2K+1]."""
        x = x_mont % self.ctx.n_int if x_mont >= 0 else x_mont % self.ctx.n_int
        chans = [x % p for p in self.pa] + [x % q for q in self.pb] \
            + [x % self.mr]
        return np.asarray(chans, dtype=np.int32)

    def pack(self, vals_mont: List[int]) -> np.ndarray:
        return np.stack([self.to_rns(v) for v in vals_mont], axis=1)

    def from_rns(self, res: np.ndarray) -> int:
        """A-base CRT -> exact value (valid while value < P), canonical
        mod N."""
        x = 0
        for i, p in enumerate(self.pa):
            pi = self.P // p
            x += int(res[i]) * pi * pow(pi, -1, p)
        return (x % self.P) % self.ctx.n_int

    def unpack(self, res: np.ndarray) -> List[int]:
        res = np.asarray(res)
        return [self.from_rns(res[:, b]) for b in range(res.shape[1])]

    def to_mont_int(self, x: int) -> int:
        return (x * self.P) % self.ctx.n_int

    def from_mont_int(self, x: int) -> int:
        return (x * pow(self.P, -1, self.ctx.n_int)) % self.ctx.n_int


def make_rns(ctx: MontyCtx, cw: int = 12) -> RnsHost:
    """Build RNS bases and constant tables for modulus ctx.n_int."""
    n = ctx.n_int
    mr = 1 << (cw + 1)
    # grow K until P >= 16*K*N and Q >= 4*K*N
    K = max(4, (n.bit_length() + cw - 1) // (cw - 1))
    while True:
        chans = _primes_below(1 << cw, 2 * K)
        pa, pb = chans[:K], chans[K:]
        P = 1
        for p in pa:
            P *= p
        Q = 1
        for q in pb:
            Q *= q
        if P >= 16 * K * n and Q >= 4 * K * n:
            break
        K += 1
    V = 2 * K * n
    F = 2 * K * n  # subtraction lift, multiple of N, >= V

    ninv = pow(-n, -1, P) % P
    rows_br = pb + [mr]
    w1 = np.zeros((K, K + 1), dtype=np.int32)
    c1 = np.zeros((K, 1), dtype=np.int32)
    for i, p in enumerate(pa):
        ppi = P // p
        c1[i, 0] = (ninv % p) * pow(ppi % p, -1, p) % p
        for j, q in enumerate(rows_br):
            w1[i, j] = ppi % q
    n_br = np.asarray([[n % q] for q in rows_br], dtype=np.int32)
    pinv_br = np.asarray([[pow(P % q, -1, q)] for q in rows_br],
                         dtype=np.int32)
    qdivinv = np.zeros((K, 1), dtype=np.int32)
    w2 = np.zeros((K, K + 1), dtype=np.int32)
    rows_ar = pa + [mr]
    for j, q in enumerate(pb):
        qqj = Q // q
        qdivinv[j, 0] = pow(qqj % q, -1, q)
        for i, p in enumerate(rows_ar):
            w2[j, i] = qqj % p
    qinv_r = np.asarray([[pow(Q % mr, -1, mr)]], dtype=np.int32)
    qmod_ar = np.asarray([[Q % p] for p in rows_ar], dtype=np.int32)
    # compensation to keep (tau@W2 - beta*Qmod) nonnegative: beta < K,
    # Qmod < p, so K*p rounded up to a multiple of p = p*K... use p*(K+1)
    comp_a = np.asarray([[p * (K + 1)] for p in pa], dtype=np.int32)
    f_sub = np.asarray([[F % p] for p in pa + pb + [mr]], dtype=np.int32)

    allp = np.asarray([[p] for p in pa + pb + [mr, mr]], dtype=np.int32)
    inv_p = (1.0 / allp.astype(np.float64)).astype(np.float32)

    dev = RnsCtx(
        p=jnp.asarray(allp), inv_p=jnp.asarray(inv_p),
        c1=jnp.asarray(c1), w1=jnp.asarray(w1),
        n_br=jnp.asarray(n_br), pinv_br=jnp.asarray(pinv_br),
        qdivinv=jnp.asarray(qdivinv), w2=jnp.asarray(w2),
        qinv_r=jnp.asarray(qinv_r), qmod_ar=jnp.asarray(qmod_ar),
        comp_a=jnp.asarray(comp_a), f_sub=jnp.asarray(f_sub),
        K=K, mr_shift=cw + 1)
    return RnsHost(ctx=ctx, pa=pa, pb=pb, mr=mr, P=P, Q=Q, K=K, V=V, dev=dev)


# ---------------------------------------------------------------------------
# device ops
# ---------------------------------------------------------------------------

def _modred(z: jax.Array, p: jax.Array, inv_p: jax.Array) -> jax.Array:
    """z mod p for 0 <= z < 2^30, per-row modulus (f32 Barrett, q off by
    at most ~2, fixed with selects)."""
    q = jnp.floor(z.astype(jnp.float32) * inv_p + 0.5).astype(jnp.int32)
    r = z - q * p
    r = jnp.where(r < 0, r + p, r)
    r = jnp.where(r < 0, r + p, r)
    r = jnp.where(r >= p, r - p, r)
    r = jnp.where(r >= p, r - p, r)
    return r


def _chan_mul(x, y, p, inv_p):
    return _modred(x * y, p, inv_p)


def mont_mul(x: jax.Array, y: jax.Array, rc: RnsCtx) -> jax.Array:
    """RNS Montgomery product of [2K+1, B] residue planes."""
    K = rc.K
    pA, invA = rc.p[:K], rc.inv_p[:K]
    pBr, invBr = rc.p[K:2 * K + 1], rc.inv_p[K:2 * K + 1]

    s = _chan_mul(x, y, rc.p[:2 * K + 1], rc.inv_p[:2 * K + 1])
    s_a, s_br = s[:K], s[K:]

    sigma = _chan_mul(s_a, rc.c1, pA, invA)                      # [K, B]

    # extension 1 (A -> B, r): M0 = sigma^T @ W1  (shared matrix -> MXU)
    m0 = jax.lax.dot_general(rc.w1, sigma, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)   # [K+1, B]
    m0 = _modred(m0, pBr, invBr)

    u = s_br + m0 * rc.n_br                                      # < 2^25
    u = _modred(u, pBr, invBr)
    t_br = _chan_mul(u, rc.pinv_br, pBr, invBr)                  # [K+1, B]
    t_b, t_r = t_br[:K], t_br[K:]

    # extension 2 (B -> A, exact via Shenoy with the r channel)
    tau = _chan_mul(t_b, rc.qdivinv, rc.p[K:2 * K], rc.inv_p[K:2 * K])
    s2 = jax.lax.dot_general(rc.w2, tau, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)   # [K+1, B]
    s2_a, s2_r = s2[:K], s2[K:]
    mr_mask = (1 << rc.mr_shift) - 1
    beta = jnp.bitwise_and(
        jnp.bitwise_and(s2_r - t_r, mr_mask) * rc.qinv_r, mr_mask)  # [1, B]
    t_a = _modred(s2_a - beta * rc.qmod_ar[:K] + rc.comp_a, pA, invA)

    return jnp.concatenate([t_a, t_b, t_r], axis=0)


def mont_sqr(x: jax.Array, rc: RnsCtx) -> jax.Array:
    return mont_mul(x, x, rc)


def add(x: jax.Array, y: jax.Array, rc: RnsCtx) -> jax.Array:
    p = rc.p[:2 * rc.K + 1]
    z = x + y - p
    return jnp.where(z < 0, z + p, z)


def sub(x: jax.Array, y: jax.Array, rc: RnsCtx) -> jax.Array:
    """x - y + F (F = 2KN keeps the true value nonnegative)."""
    p = rc.p[:2 * rc.K + 1]
    z = x - y + rc.f_sub
    z = jnp.where(z < 0, z + p, z)
    return jnp.where(z >= p, z - p, z)


def addsub(x, y, rc) -> Tuple[jax.Array, jax.Array]:
    return add(x, y, rc), sub(x, y, rc)
