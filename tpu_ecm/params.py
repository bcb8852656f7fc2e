"""Arithmetic-context construction: radix selection and Montgomery/Mersenne setup.

This is the TPU-native replacement for the reference's ``monty`` context and
compile-time MAXBITS/NWORDS sizing (see /root/reference/main.c:464-533 and
/root/reference/vec_common.c:100-131).  Where the reference picks a fixed
52-bit (or 32-bit) limb width for AVX-512 lanes and quantizes inputs to
208-bit steps, we pick a *reduced radix* ``2**w`` (w <= 13) so that schoolbook
column sums of digit products accumulate exactly in int32 vector registers —
the native integer MAC width of the TPU VPU.  Carries live in the int32
headroom (carry-save) and are only lazily normalized; there are no
conditional subtracts anywhere in the hot path because R >= 16*N keeps every
intermediate in (-4N, 4N)  [standard redundant-Montgomery bound:
|REDC(a*b)| <= (16N^2 + RN)/R <= 2N when |a|,|b| <= 4N and R >= 16N].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np


def _digit_bound_fixed_point(w: int, nw: int, norm_inputs: bool = False) -> int:
    """Worst-case int32 column magnitude for mont_mul at radix 2**w, nw digits.

    Without norm_inputs, mul inputs are either normalized mul outputs (digits
    in (-cmax2, 2**w + cmax2)) or a single add/sub of two of those.  With
    norm_inputs, mulmod/sqrmod apply one extra lazy pass to each operand at
    entry, which squeezes every digit except the unsplit top guard back to
    ~2**w — that halves the operand bound and lets nw grow ~4x (needed for
    >= ~700-bit moduli).  Solve the fixed point of
    column <= sum(products) + nw*2^(2w) [REDC q*n rows] + 2*column>>w.
    Returns the fixed-point column bound (or a huge number if divergent).
    """
    col = 1 << (2 * w + 4)
    for _ in range(40):
        c2 = (col >> (2 * w)) + 2          # residual carry after 2 lazy passes
        if norm_inputs:
            din = (1 << w) + c2 + 4        # after the entry lazy pass
            din_top = 2 * ((1 << w) + c2) + c2 + 4   # unsplit guard digit
            prod = (nw - 2) * din * din + 2 * din_top * din
        else:
            din = 2 * ((1 << w) + c2)      # one add/sub of two mul outputs
            prod = nw * din * din
        new_col = prod + nw * (1 << (2 * w)) + 2 * (col >> w)
        if new_col == col or col > (1 << 40):
            return col
        col = new_col
    return col


def select_radix(nbits: int) -> Tuple[int, int, bool]:
    """Pick (w, nw, norm_inputs): the largest radix 2**w whose worst-case
    column sums fit int32, with nw digits giving R = 2**(w*nw) >= 16 *
    2**nbits >= 16*N.  Prefers norm_inputs=False (no entry normalization in
    mulmod); large moduli (>= ~700 bits) need the entry pass to keep operand
    digits near 2**w.

    The +5/+1 slack mirrors the role of the reference's 208-bit quantization
    (/root/reference/main.c:464-480): arithmetic cost is constant within a
    radix step, and every value fits with a signed guard digit on top.
    """
    limit = int(0.95 * 2**31)
    # prefer the largest radix (fewest digits) even when it needs the entry
    # pass: measured 13.5 us/point-op at w=12/nw=36/norm vs 16.7 at
    # w=11/nw=40/plain on the 416-bit headline (TPU v5e, B=2048) — the
    # ~6nw-op entry normalization is far cheaper than 2*(40^2-36^2) MACs
    for w in range(13, 5, -1):
        nw = (nbits + 4 + w - 1) // w + 1
        for norm in (False, True):
            if _digit_bound_fixed_point(w, nw, norm) < limit:
                return w, nw, norm
    raise ValueError(f"no valid radix for {nbits}-bit modulus")


def _radix_or_host_only(nbits: int) -> Tuple[int, int, bool, bool]:
    """(w, nw, norm_inputs, device_ok).  Beyond the int32 digit-plane bound
    (~2000 bits: small radices diverge because the 2-pass lazy-carry
    residual col >> 2w stays large relative to 2^w) fall back to a
    host-only geometry — any R = 2^(w*nw) > 16*N serves the host-side
    Montgomery bookkeeping — and flag device_ok=False so the driver routes
    device arithmetic to the RNS/MXU engine (the reference covers this
    regime with its DIGITBITS=32 build, /root/reference/vecarith.c; here
    the MXU formulation is the large-moduli path)."""
    try:
        w, nw, norm = select_radix(nbits)
        return w, nw, norm, True
    except ValueError:
        w = 13
        return w, (nbits + 4 + w - 1) // w + 1, True, False


@dataclasses.dataclass(frozen=True)
class ArithParams:
    """Static (trace-time) arithmetic geometry."""
    w: int          # radix bits
    nw: int         # number of digits per bignum
    nbits: int      # bit size the geometry was sized for
    norm_inputs: bool = False   # lazy-pass mul operands at entry (large nw)
    # False: no int32 digit-plane radix satisfies the worst-case column
    # bound at this size (~> 2000 bits with 2 lazy passes) — the geometry
    # is HOST-ONLY Montgomery bookkeeping (R, nprime, conversions) and the
    # driver must route device arithmetic to the RNS/MXU engine, whose
    # f32-exactness bound reaches ~6200 bits (limbs/rns.py choose_cw)
    device_ok: bool = True

    @property
    def mask(self) -> int:
        return (1 << self.w) - 1

    @property
    def R(self) -> int:
        return 1 << (self.w * self.nw)


@dataclasses.dataclass(frozen=True)
class MontyCtx:
    """Montgomery context for a fixed odd modulus N shared by all curves.

    Host-side mirror of the reference ``monty`` struct
    (/root/reference/avx_ecm.h:126-147): n, nhat (here: the single-digit
    nprime = -N^-1 mod 2^w, the analog of vrho), rhat (R^2 mod N for
    to-Montgomery conversion), one (R mod N).  ``mersenne_c`` / ``mersenne_e``
    select the special-form reduction path (isMersenne in the reference);
    when active, arithmetic is done mod M = 2^e - c and ``n_int`` is M, while
    ``input_n`` keeps the original composite for gcd checks — exactly the
    vnhat trick at /root/reference/main.c:599-618.
    """
    p: ArithParams
    n_int: int                 # working modulus (N, or the full Mersenne M)
    input_n: int               # original input composite (gcd target)
    nprime: int                # -n_int^-1 mod 2^w  (0 for Mersenne path)
    r_mod_n: int               # R mod n_int ("one" in Montgomery form)
    r2_mod_n: int              # R^2 mod n_int
    mersenne_e: int = 0        # exponent e when n_int = 2^e - c, else 0
    mersenne_c: int = 0        # signed c (1 for 2^e-1, -1 for 2^e+1, c>=2 pseudo)

    @property
    def is_mersenne(self) -> bool:
        return self.mersenne_e != 0

    def to_mont_int(self, x: int) -> int:
        if self.is_mersenne:
            return x % self.n_int
        return (x << (self.p.w * self.p.nw)) % self.n_int

    def from_mont_int(self, x: int) -> int:
        if self.is_mersenne:
            return x % self.n_int
        rinv = pow(self.p.R, -1, self.n_int)
        return (x * rinv) % self.n_int


def make_monty(n: int, *, mersenne: Optional[Tuple[int, int]] = None,
               force_w: Optional[int] = None) -> MontyCtx:
    """Build a MontyCtx for odd composite n.

    mersenne=(e, c) requests the special-form path: all arithmetic is done
    mod M = 2^e - c (c may be negative: 2^e+1 has c=-1), with gcds taken
    against the original n.
    """
    if n % 2 == 0:
        raise ValueError("modulus must be odd")
    if mersenne is not None:
        e, c = mersenne
        m = (1 << e) - c
        if m % n != 0:
            raise ValueError("2^e - c is not a multiple of n")
        if force_w is not None:
            w = force_w
            nw = (e + 4 + w - 1) // w + 1
            norm = (_digit_bound_fixed_point(w, nw, False)
                    >= int(0.95 * 2**31))
            dev_ok = True
        else:
            w, nw, norm, dev_ok = _radix_or_host_only(e)
        p = ArithParams(w=w, nw=nw, nbits=e, norm_inputs=norm,
                        device_ok=dev_ok)
        return MontyCtx(p=p, n_int=m, input_n=n, nprime=0,
                        r_mod_n=1, r2_mod_n=1, mersenne_e=e, mersenne_c=c)

    nbits = n.bit_length()
    if force_w is not None:
        w = force_w
        nw = (nbits + 4 + w - 1) // w + 1
        norm = _digit_bound_fixed_point(w, nw, False) >= int(0.95 * 2**31)
        dev_ok = True
    else:
        w, nw, norm, dev_ok = _radix_or_host_only(nbits)
    p = ArithParams(w=w, nw=nw, nbits=nbits, norm_inputs=norm,
                    device_ok=dev_ok)
    R = p.R
    nprime = (-pow(n, -1, 1 << w)) % (1 << w)
    return MontyCtx(p=p, n_int=n, input_n=n, nprime=nprime,
                    r_mod_n=R % n, r2_mod_n=(R * R) % n)


def detect_mersenne(n: int, max_exp: int = 2048,
                    digit_bits: int = 52) -> Optional[Tuple[int, int]]:
    """Detect 2^e-1 / 2^e+1 / 2^e-c special forms dividing... divisible by n.

    Re-derivation of the scan at /root/reference/main.c:406-442: for rising e
    starting just below n's bit size, accept the first e with n | 2^e - 1
    (c=1), n | 2^e + 1 (c=-1), or 2^e mod n smaller than ``digit_bits`` bits
    (pseudo-Mersenne c = 2^e mod n, so n | 2^e - c).
    Returns (e, c) or None.
    """
    size_n = n.bit_length()
    for e in range(size_n - 1, max_exp):
        r = 1 << e
        if (r - 1) % n == 0:
            return (e, 1)
        if (r + 1) % n == 0:
            return (e, -1)
        g = r % n
        if 0 < g.bit_length() < digit_bits:
            return (e, g)
    return None


def mersenne_density_ok(n: int, e: int, threshold: float = 0.7) -> bool:
    """The reference falls back to generic REDC when the input uses < 70% of
    the Mersenne width (/root/reference/main.c:505-516)."""
    return (n.bit_length() / e) >= threshold


def strip_algebraic_factors(n: int, e: int, c: int) -> int:
    """For (true) Mersenne inputs 2^e-1 / 2^e+1 that still contain algebraic
    factors, reduce n to gcd(n, primitive part).  Mirrors
    find_primitive_factor (/root/reference/main.c:187-353), which builds the
    primitive factor of 2^e -/+ 1 by inclusion-exclusion over the distinct
    odd prime factors of e (after http://home.earthlink.net/~elevensmooth).
    Returns the reduced n (gcd of n with the primitive part).
    """
    assert c in (1, -1)
    # factor e over small primes
    f = []
    x = e
    d = 2
    while d * d <= x:
        while x % d == 0:
            f.append(d)
            x //= d
        d += 1
    if x > 1:
        f.append(x)
    odd_distinct = sorted({q for q in f if q % 2 == 1})
    if len(odd_distinct) > 3:
        raise ValueError("too many distinct odd factors in exponent")
    mult = e
    for q in odd_distinct:
        mult //= q
    # ranks: rank k = products of k distinct odd primes
    import itertools
    ranks = [[1], odd_distinct]
    if len(odd_distinct) >= 2:
        ranks.append([a * b for a, b in itertools.combinations(odd_distinct, 2)])
    if len(odd_distinct) == 3:
        ranks.append([odd_distinct[0] * odd_distinct[1] * odd_distinct[2]])
    nr = len(ranks)
    mrank = 0 if (nr & 1) == 1 else 1
    num = 1
    den = 1
    for i in range(nr - 1, -1, -1):
        for term_exp in ranks[i]:
            term = (1 << (term_exp * mult)) + (1 if c < 0 else -1)
            # NOTE: reference uses coeff2=-isMersenne, so 2^e-1 -> terms 2^k-1
            if (i & 1) == mrank:
                num *= term
            else:
                den *= term
    primitive = num // den
    g = math.gcd(n, primitive)
    return g


def iroot(x: int, k: int) -> int:
    """Exact floor k-th root via integer Newton (float-free: safe for
    arbitrarily large x)."""
    if x < 0:
        raise ValueError("iroot of negative")
    if x < 2 or k == 1:
        return x
    r = 1 << ((x.bit_length() + k - 1) // k)
    while True:
        nr = ((k - 1) * r + x // r ** (k - 1)) // k
        if nr >= r:
            break
        r = nr
    while r ** k > x:
        r -= 1
    return r


def perfect_power(n: int):
    """(base, k) with maximal k >= 2 if n is a perfect power, else None
    (the GMP-ECM-style up-front structure check; the reference has no
    equivalent, so every curve's gcd would hit n itself)."""
    if n < 4:
        return None
    best = None
    k = 2
    while (1 << k) <= n:
        r = iroot(n, k)
        if r ** k == n:
            best = (r, k)
        k += 1
    return best


def choose_stage2_D(b1: int) -> int:
    """Stage-2 giant-step size by B1 (/root/reference/main.c:840-872)."""
    if b1 <= 60:
        return 30
    if b1 <= 128:
        return 60
    if b1 <= 256:
        return 120
    if b1 <= 512:
        return 210
    if b1 <= 2048:
        return 385
    if b1 <= 4096:
        return 1155
    return 2310


def choose_stage2_U(b1: int, b2: int, D: int, veclen_equiv: int = 8) -> int:
    """The REFERENCE's U model, kept for provenance/parity only.

    Re-derivation of /root/reference/main.c:884-951 (with the uninitialized
    ``paircost`` term of the reference taken as 0, making the model
    deterministic): minimize 6*(numadds + D*U) + numinv*(veclen*6 + 3) over
    U in {2,3,4,6,8,12,16}.  L is always 2*U (/root/reference/main.c:951).
    The production selector is choose_stage2_U_tpu — on this design an
    inversion is ONE host xgcd amortized over the whole batch plus device
    scans, so the mpz-inversion term above prices the wrong machine.
    """
    best_u, best = 4, float("inf")
    numadds = (b2 - b1) / D
    for u in (2, 3, 4, 6, 8, 12, 16):
        addcost = 6.0 * (numadds + D * u)
        numinv = numadds / u / 2.0 + 2
        invcost = numinv * (veclen_equiv * 6.0) + numinv * 3.0
        cost = addcost + invcost
        if cost < best:
            best, best_u = cost, u
    return best_u


# TPU stage-2 cost model, hardware-calibrated (round 5, BENCH_NOTES
# "(D,U) window sweep"): all terms in replay-entry equivalents, so tunnel
# load and modulus size cancel to first order (every term is VMEM-traffic
# x batch).  Two independent sessions agreed on the constants:
S2_ROW_COST = 175.0     # Pb-init cost per stored table row (chain adds +
#                         donated scatters + inversion scans), measured
#                         ~0.6 ms/row at B=2048 vs ~3.5 us/entry replay
S2_WINDOW_COST = 150.0  # per giant-step window shift (U-point extend +
#                         incremental re-inversion + 1 amortized host xgcd)
S2_PAIR_C = 0.46        # pairing ratio ~ 0.5 + S2_PAIR_C/U (planner-exact
#                         fit over U in [6, 32] at D=2310)
S2_TABLE_HBM_CAP = 6 * 2 ** 30   # Pb-table budget; leaves Pa/chain/
#                         inversion transients inside the measured 16 GB
#                         envelope at G <= 4096 (BENCH_NOTES round 4)


def _totient(n: int) -> int:
    r, m, p = n, n, 2
    while p * p <= m:
        if m % p == 0:
            r -= r // p
            while m % p == 0:
                m //= p
        p += 1
    if m > 1:
        r -= r // m
    return r


def choose_stage2_U_tpu(b1: int, b2: int, D: int,
                        nw: Optional[int] = None,
                        batch: Optional[int] = None) -> int:
    """Stage-2 window multiplier for THIS machine's cost surface.

    Per curve batch: the Pb table is built ONCE (cost ~ num_pb rows), the
    replay runs over every prime in (B1, B2] (cost ~ pairmap entries), and
    each window shift pays an extend + re-invert.  The optimum is
    B2-DEPENDENT: at the flagship (B2 = 100*B1 = 1e8) init dominates the
    pairing gain and U=8 measured 13-14% faster stage 2 than the
    reference-model U=16 in two sessions; at huge B2 (e.g. test.csh:38's
    1.64e11) the init amortizes over ~60x more primes and large U wins.
    nw/batch, when known, cap U so the Pb table stays inside the HBM
    envelope (S2_TABLE_HBM_CAP)."""
    phi = _totient(D)
    # prime count approximation (li-free; 4% low at 1e8, cancels in argmin)
    pcount = max(b2 / math.log(b2) - b1 / math.log(max(b1, 3)), 1.0)
    windows = max((b2 - b1) / (2.0 * D), 1.0)
    best_u, best = 8, float("inf")
    for u in (2, 3, 4, 6, 8, 12, 16, 24, 32):
        num_pb = u * phi + 3
        if nw and batch and num_pb * nw * batch * 4 > S2_TABLE_HBM_CAP:
            continue
        cost = (S2_ROW_COST * num_pb
                + pcount * (0.5 + S2_PAIR_C / u)
                + S2_WINDOW_COST * windows / u)
        if cost < best:
            best, best_u = cost, u
    return best_u
