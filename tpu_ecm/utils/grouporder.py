"""Curve group-order oracle: #E(F_p) for a Suyama curve (p, sigma).

The reference ships this tool as a Magma script embedded in its oracle log
(/root/reference/test_inputs.txt:1-20, ``FindGroupOrder2``): given a known
prime factor p and the sigma that was run, compute the curve's group order
over F_p to decide whether a missed factor is a *pairing bug* (order was
B1/B2-smooth but the run missed it) or *smoothness bad luck* (order simply
is not smooth).  This is the pure-Python equivalent, sized for the test
fixtures (p up to ~2^48; O(p^(1/4)) baby-step/giant-step).

Model (same as the Magma script): the Suyama curve By^2 = x^3 + Ax^2 + x
with x0 = u^3/v^3, B = x0^3 + A*x0^2 + x0 is counted via the isomorphic
short-Weierstrass-with-a2 model Y^2 = X^3 + (AB)X^2 + (B^2)X.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Tuple

# affine points are (x, y) tuples; None is the identity


def _ec_add(P: Optional[Tuple[int, int]], Q: Optional[Tuple[int, int]],
            a2: int, a4: int, p: int) -> Optional[Tuple[int, int]]:
    """Addition on y^2 = x^3 + a2 x^2 + a4 x over F_p."""
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        lam = (3 * x1 * x1 + 2 * a2 * x1 + a4) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - a2 - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def _ec_mul(k: int, P: Optional[Tuple[int, int]], a2: int, a4: int,
            p: int) -> Optional[Tuple[int, int]]:
    R = None
    Q = P
    while k:
        if k & 1:
            R = _ec_add(R, Q, a2, a4, p)
        Q = _ec_add(Q, Q, a2, a4, p)
        k >>= 1
    return R


def _point_order_in_hasse(P, a2: int, a4: int, p: int) -> int:
    """Order of P, via BSGS over the Hasse interval (Shanks–Mestre step)."""
    w = 2 * math.isqrt(p) + 1          # |t| <= 2*sqrt(p)
    base = p + 1 - w
    Q = _ec_mul(base, P, a2, a4, p)    # Q + t*P = O for some t in [0, 2w]
    m = math.isqrt(2 * w) + 1
    # baby steps j*P, j in [0, m)
    baby = {}
    R = None
    for j in range(m):
        key = R if R is None else R[0:2]
        baby.setdefault(key, j)
        R = _ec_add(R, P, a2, a4, p)
    # giant steps Q + i*m*P  (match against -j*P, i.e. negated babies)
    mP = _ec_mul(m, P, a2, a4, p)
    G = Q
    for i in range(m + 2):
        key = G if G is None else G[0:2]
        if key is None and None in baby:
            t = i * m + baby[None]
            k = base + t
            if k > 0:
                return _reduce_to_order(k, P, a2, a4, p)
        if key is not None:
            neg = (key[0], (-key[1]) % p)
            if neg in baby:
                t = i * m + baby[neg]
                k = base + t
                if k > 0 and _ec_mul(k, P, a2, a4, p) is None:
                    return _reduce_to_order(k, P, a2, a4, p)
            if key in baby:
                t = i * m - baby[key]
                k = base + t
                if k > 0 and _ec_mul(k, P, a2, a4, p) is None:
                    return _reduce_to_order(k, P, a2, a4, p)
        G = _ec_add(G, mP, a2, a4, p)
    raise ArithmeticError("BSGS failed (is p prime?)")


def _reduce_to_order(k: int, P, a2: int, a4: int, p: int) -> int:
    """Shrink an annihilating multiple k of P to the exact order of P."""
    for q in _small_factors(k):
        while k % q == 0 and _ec_mul(k // q, P, a2, a4, p) is None:
            k //= q
    return k


def _small_factors(k: int):
    fs = []
    d = 2
    x = k
    while d * d <= x:
        if x % d == 0:
            fs.append(d)
            while x % d == 0:
                x //= d
        d += 1
    if x > 1:
        fs.append(x)
    return fs


def suyama_curve_mod_p(sigma: int, p: int) -> Tuple[int, int]:
    """(a2, a4) of the counting model Y^2 = X^3 + AB X^2 + B^2 X for the
    Suyama curve of this sigma over F_p (mirrors build_one_curve,
    /root/reference/ecm.c:1548, reduced mod the known factor p)."""
    u = (sigma * sigma - 5) % p
    v = (4 * sigma) % p
    if u % p == 0 or v % p == 0:
        raise ValueError("degenerate sigma for this p")
    x0 = pow(u, 3, p) * pow(pow(v, 3, p), -1, p) % p
    a = pow(v - u, 3, p) * (3 * u + v) % p
    b = 4 * pow(u, 3, p) * v % p
    A = (a * pow(b, -1, p) - 2) % p
    B = (pow(x0, 3, p) + A * x0 * x0 + x0) % p
    if B % p == 0:
        raise ValueError("singular curve for this (sigma, p)")
    return (A * B % p, B * B % p)


def group_order(sigma: int, p: int, tries: int = 24) -> int:
    """#E(F_p) for the Suyama curve of sigma — FindGroupOrder2 equivalent.

    lcm point orders over random points until a unique multiple lies in the
    Hasse interval."""
    a2, a4 = suyama_curve_mod_p(sigma, p)
    lo = p + 1 - 2 * math.isqrt(p)
    hi = p + 1 + 2 * math.isqrt(p)
    rng = random.Random(12345)
    n = 1
    for _ in range(tries):
        # random point: x with x^3 + a2 x^2 + a4 x a square
        while True:
            x = rng.randrange(1, p)
            rhs = (pow(x, 3, p) + a2 * x * x + a4 * x) % p
            if rhs == 0:
                continue
            y = pow(rhs, (p + 1) // 4, p) if p % 4 == 3 else _sqrt_mod(rhs, p)
            if y is not None and y * y % p == rhs:
                break
        o = _point_order_in_hasse((x, y), a2, a4, p)
        n = n * o // math.gcd(n, o)
        first = ((lo + n - 1) // n) * n
        if first <= hi and first + n > hi:
            return first
    raise ArithmeticError("group order not pinned down; raise tries")


def _sqrt_mod(a: int, p: int) -> Optional[int]:
    """Tonelli–Shanks for p % 4 == 1."""
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, b * b % p, t * b * b % p, r * b % p
    return r


def start_point_order(sigma: int, p: int) -> int:
    """Exact order of the Suyama *starting point* — sharper than the group
    order (a run succeeds iff this divides the stage's accumulated product).
    On By^2 = x^3 + Ax^2 + x the start satisfies B*y0^2 = B, i.e. y0 = 1, so
    in the counting model the point is (B*x0, B^2)."""
    a2, a4 = suyama_curve_mod_p(sigma, p)
    u = (sigma * sigma - 5) % p
    v = (4 * sigma) % p
    x0 = pow(u, 3, p) * pow(pow(v, 3, p), -1, p) % p
    a = pow(v - u, 3, p) * (3 * u + v) % p
    b = 4 * pow(u, 3, p) * v % p
    A = (a * pow(b, -1, p) - 2) % p
    B = (pow(x0, 3, p) + A * x0 * x0 + x0) % p
    P = (B * x0 % p, B * B % p)
    return _point_order_in_hasse(P, a2, a4, p)


def smoothness_verdict(sigma: int, p: int, b1: int, b2: int) -> str:
    """Classify where (p, sigma) SHOULD be found — the debugging decision
    the reference makes with its Magma script (but sharper: uses the exact
    order of the starting point, not the whole group): 'stage1' (order is
    B1-smooth with prime powers <= B1), 'stage2' (one prime in (B1, B2]),
    or 'unsmooth' (a miss is smoothness bad luck, not a pairing bug).

    Note 'unsmooth' classifies the *guarantee* only: x-only chains can
    still find p as a bonus when intermediate multiples collide mod p
    (Z ~ 0 through the degenerate xADD case), which is common once the
    post-stage-1 residual order is tiny — e.g. the e2e fixture's sigma 174
    (residual order 73 after B1=300) is such a collision find."""
    n = start_point_order(sigma, p)
    big = []
    x = n
    for q in _small_factors(n):
        e = 0
        while x % q == 0:
            x //= q
            e += 1
        if q ** e > b1:
            big.append((q, e))
    if not big:
        return "stage1"
    if len(big) == 1 and big[0][1] == 1 and b1 < big[0][0] <= b2:
        return "stage2"
    return "unsmooth"
