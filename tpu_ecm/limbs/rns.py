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

MXU exactness: a direct int32 dot overflows once K * (2^cw-1)^2 >= 2^31
(K > ~127 at cw=12), and int matmuls are not the MXU's native mode anyway.
The *split* path decomposes both dot operands into 7-bit digits — exact in
bfloat16 (integers < 2^9) — and runs four bf16 matmuls with f32
accumulation: every partial sum is < 2*K*127^2 < 2^24 for K <= 520, i.e.
exactly representable, so the recombined integer is bit-exact at full MXU
throughput.  rns_exec.py's Pallas kernel always uses the split tables;
this jnp model uses them whenever the direct dot would overflow (keeping
CPU tests cheap at small K).
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
    npinv_br: jax.Array   # [K+1, 1] |N * P^-1|_{q_j / m_r} (fused step 4+5)
    qdivinv: jax.Array    # [K, 1]  |(Q/q_j)^-1|_{q_j}
    w2: jax.Array         # [K, K+1] |Q/q_j|_{p_i / m_r}
    qinv_r: jax.Array     # [1, 1]  |Q^-1|_{m_r}
    qmod_ar: jax.Array    # [K+1, 1] |Q|_{p_i / m_r} (r row unused)
    comp_a: jax.Array     # [K, 1]  per-channel nonneg compensation (mult of p)
    f_sub: jax.Array      # [2K+1, 1] residues of F = 2K*N (subtraction lift)
    # 7-bit digit-split extension tables, transposed and stacked for ONE
    # [2*kp, K] @ [K, 2B] MXU matmul per extension: rows [0:K+1] carry
    # w.T & 127, rows [kp:kp+K+1] carry w.T >> 7 (kp = K+8 keeps the hi
    # block sublane-tile aligned; filler rows are zero)
    w1t_cat: jax.Array    # [2*kp, K] bf16
    w2t_cat: jax.Array    # [2*kp, K] bf16
    t14: jax.Array        # [K+1, 1] int32  2^14 mod (q_j / m_r rows)
    t14_a: jax.Array      # [K+1, 1] int32  2^14 mod (p_i / m_r rows)
    p_ar: jax.Array       # [K+1, 1] int32  (p_i / m_r rows)
    inv_ar: jax.Array     # [K+1, 1] f32
    K: int = dataclasses.field(metadata=dict(static=True))
    mr_shift: int = dataclasses.field(metadata=dict(static=True))
    use_split: bool = dataclasses.field(metadata=dict(static=True),
                                        default=False)
    kp: int = dataclasses.field(metadata=dict(static=True), default=0)

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
        x = x_mont % self.ctx.n_int
        chans = [x % p for p in self.pa] + [x % q for q in self.pb] \
            + [x % self.mr]
        return np.asarray(chans, dtype=np.int32)

    def pack(self, vals_mont: List[int]) -> np.ndarray:
        return np.stack([self.to_rns(v) for v in vals_mont], axis=1)

    @functools.cached_property
    def _crt_w(self) -> List[int]:
        """A-base CRT weights (P/p_i) * ((P/p_i)^-1 mod p_i), reduced mod P
        — computed once (unpack runs per host sync over whole planes)."""
        out = []
        for p in self.pa:
            pi = self.P // p
            out.append(pi * pow(pi % p, -1, p) % self.P)
        return out

    def from_rns(self, res: np.ndarray) -> int:
        """A-base CRT -> exact value (valid while value < P), canonical
        mod N."""
        x = sum(int(r) * w for r, w in zip(res, self._crt_w))
        return (x % self.P) % self.ctx.n_int

    def unpack(self, res: np.ndarray) -> List[int]:
        res = np.asarray(res)
        return [self.from_rns(res[:, b]) for b in range(res.shape[1])]

    def to_mont_int(self, x: int) -> int:
        return (x * self.P) % self.ctx.n_int

    def from_mont_int(self, x: int) -> int:
        return (x * pow(self.P, -1, self.ctx.n_int)) % self.ctx.n_int


def choose_cw(nbits: int) -> int:
    """Channel width for the MXU engine: cw=13 gives the fewest channels
    (least matmul work) while pi(2^13) = 1028 primes cover 2K channels all
    the way to the K <= 520 f32-exactness bound (~6200-bit moduli), and K
    lands just under the 128 MXU tile at the 1500-bit entry point
    (K ~ 117)."""
    del nbits
    return 13


def make_rns(ctx: MontyCtx, cw: int = 12) -> RnsHost:
    """Build RNS bases and constant tables for modulus ctx.n_int."""
    n = ctx.n_int
    mr = 1 << (cw + 1)
    # grow K until P >= 16*K*N and Q >= 4*K*N (start at the optimistic
    # floor — every extra channel costs O(K) matmul work).  K is kept a
    # multiple of 8 so the A/B sub-base slices of the [2K+1, B] residue
    # planes stay sublane-tile-aligned in the Pallas kernel.
    K = max(8, (n.bit_length() // cw + 7) // 8 * 8)
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
        K += 8
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
    npinv_br = np.asarray([[n * pow(P % q, -1, q) % q] for q in rows_br],
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

    # 7-bit digit-split tables (see module docstring): exact bf16 operands,
    # partial sums f32-exact while 2*K*127^2 < 2^24
    if K > 520:
        raise ValueError(f"K={K}: split extension exceeds f32 exactness")
    kp = K + 8
    w1t = w1.T.astype(np.int64)          # [K+1, K]
    w2t = w2.T.astype(np.int64)

    def cat(wt):
        out = np.zeros((2 * kp, K), dtype=np.int64)
        out[:K + 1] = wt & 127
        out[kp:kp + K + 1] = wt >> 7
        return out

    bf = jnp.bfloat16
    t14 = np.asarray([[(1 << 14) % q] for q in rows_br], dtype=np.int32)
    t14_a = np.asarray([[(1 << 14) % p] for p in rows_ar], dtype=np.int32)
    # direct int32 dot is exact only while the worst-case column sum fits;
    # the weight matrices carry an m_r row whose entries reach
    # mr - 1 = 2^(cw+1) - 1 (~2x the largest prime), so the bound is
    # K * max_operand * max_weight, NOT K * maxp^2
    use_split = K * (max(pa + pb) - 1) * (mr - 1) >= 2 ** 31

    dev = RnsCtx(
        p=jnp.asarray(allp), inv_p=jnp.asarray(inv_p),
        c1=jnp.asarray(c1), w1=jnp.asarray(w1),
        n_br=jnp.asarray(n_br), pinv_br=jnp.asarray(pinv_br),
        npinv_br=jnp.asarray(npinv_br),
        qdivinv=jnp.asarray(qdivinv), w2=jnp.asarray(w2),
        qinv_r=jnp.asarray(qinv_r), qmod_ar=jnp.asarray(qmod_ar),
        comp_a=jnp.asarray(comp_a), f_sub=jnp.asarray(f_sub),
        w1t_cat=jnp.asarray(cat(w1t), dtype=bf),
        w2t_cat=jnp.asarray(cat(w2t), dtype=bf),
        t14=jnp.asarray(t14), t14_a=jnp.asarray(t14_a),
        p_ar=jnp.asarray(np.asarray([[p] for p in rows_ar], np.int32)),
        inv_ar=jnp.asarray((1.0 / np.asarray(
            [[p] for p in rows_ar], np.float64)).astype(np.float32)),
        K=K, mr_shift=cw + 1, use_split=use_split, kp=kp)
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


def _ext_dot_split(x, wt_cat, kp, p, inv_p, t14, want_low14=True):
    """Exact base-extension dot w.T @ x ([K+1,K] @ [K,B]) via 7-bit digit
    decomposition: ONE [2*kp, K] @ [K, 2B] bf16 matmul with f32
    accumulation (every operand < 2^9 and every partial sum
    < 2*K*127^2 < 2^24 are exactly representable), whose four quadrants
    are the digit products, recombined as P_ll + 2^7*P_m + 2^14*P_hh.

    Returns (value reduced mod the per-row modulus [K+1,B],
             exact value mod 2^14 [K+1,B] — feeds the Shenoy r channel).
    This is the MXU path: the reference spends this work on AVX-512 FMA
    columns (/root/reference/vecarith52.c); here it is a matrix product
    with a SHARED weight matrix, the systolic array's native shape."""
    f, bf = jnp.float32, jnp.bfloat16
    kk, b = x.shape
    x_lo = jnp.bitwise_and(x, 127).astype(f).astype(bf)
    x_hi = jnp.right_shift(x, 7).astype(f).astype(bf)
    xc = jnp.concatenate([x_lo, x_hi], axis=1)                   # [K, 2B]
    y = jax.lax.dot_general(wt_cat, xc, (((1,), (0,)), ((), ())),
                            preferred_element_type=f)            # [2kp, 2B]
    i_ll = y[:kk + 1, :b].astype(jnp.int32)
    i_m = (y[:kk + 1, b:] + y[kp:kp + kk + 1, :b]).astype(jnp.int32)
    i_hh = y[kp:kp + kk + 1, b:].astype(jnp.int32)
    # only the scaled partials need pre-reduction: the recombined value
    # P_ll + 2^7*(P_m mod p) + t14*(P_hh mod p) stays < 2^27
    r_m = _modred(i_m, p, inv_p)
    r_hh = _modred(i_hh, p, inv_p)
    red = _modred(i_ll + jnp.left_shift(r_m, 7) + t14 * r_hh, p, inv_p)
    if not want_low14:
        return red, None
    m14 = (1 << 14) - 1
    low14 = jnp.bitwise_and(
        jnp.bitwise_and(i_ll, m14)
        + jnp.left_shift(jnp.bitwise_and(i_m, m14), 7), m14)
    return red, low14


def mont_mul(x: jax.Array, y: jax.Array, rc: RnsCtx) -> jax.Array:
    """RNS Montgomery product of [2K+1, B] residue planes."""
    K = rc.K
    pA, invA = rc.p[:K], rc.inv_p[:K]
    pBr, invBr = rc.p[K:2 * K + 1], rc.inv_p[K:2 * K + 1]

    s = _chan_mul(x, y, rc.p[:2 * K + 1], rc.inv_p[:2 * K + 1])
    s_a, s_br = s[:K], s[K:]

    sigma = _chan_mul(s_a, rc.c1, pA, invA)                      # [K, B]

    # extension 1 (A -> B, r): M0 = sigma^T @ W1  (shared matrix -> MXU)
    if rc.use_split:
        m0, _ = _ext_dot_split(sigma, rc.w1t_cat, rc.kp, pBr, invBr,
                               rc.t14, want_low14=False)
    else:
        m0 = jax.lax.dot_general(rc.w1, sigma, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        m0 = _modred(m0, pBr, invBr)                             # [K+1, B]

    # fused t = (s + M0*N) * P^-1: one pass via the precomputed N*P^-1
    # residues (both products < 2^26, sum < 2^27 — one Barrett)
    t_br = _modred(s_br * rc.pinv_br + m0 * rc.npinv_br, pBr, invBr)
    t_b, t_r = t_br[:K], t_br[K:]

    # extension 2 (B -> A, exact via Shenoy with the r channel)
    tau = _chan_mul(t_b, rc.qdivinv, rc.p[K:2 * K], rc.inv_p[K:2 * K])
    mr_mask = (1 << rc.mr_shift) - 1
    if rc.use_split:
        s2_red, s2_low = _ext_dot_split(tau, rc.w2t_cat, rc.kp,
                                        rc.p_ar, rc.inv_ar, rc.t14_a)
        s2_a, s2_r = s2_red[:K], s2_low[K:]
    else:
        s2 = jax.lax.dot_general(rc.w2, tau, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        s2_a, s2_r = s2[:K], s2[K:]                              # [K+1, B]
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
