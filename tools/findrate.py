"""Empirical find-rate comparison: Suyama (12 | order) vs Edwards a=-1
quadric family (4 | order).  Samples ~27-bit primes, computes exact START
POINT orders (BSGS) for a sigma sweep on both families, and reports the
fraction of (B1, B2)-smooth orders (all factors <= B1 except at most one in
(B1, B2])."""
import math, random, sys, json
sys.path.insert(0, '/root/repo')
from tpu_ecm.utils import grouporder as go
from tpu_ecm.curve import edwards as ed


class C:
    def __init__(s, n): s.n_int = n
    def to_mont_int(s, v): return v


def edwards_point_order(c, p):
    """Order of the Edwards base point via the Montgomery counting model:
    on B v^2 = u^3 + A u^2 + u, the scaled curve Y^2 = X^3 + AB X^2 + B^2 X
    carries (Bu, B^2 v) with the same point order (u = (1+y0)/(1-y0),
    v = u/x0, A = 2(1-d)/(1+d), B from the point)."""
    inv = lambda x: pow(x, -1, p)
    A = 2 * (1 - c.d) % p * inv((1 + c.d) % p) % p
    u = (1 + c.y0) % p * inv((1 - c.y0) % p) % p
    v = u * inv(c.x0) % p
    B = (pow(u, 3, p) + A * u * u + u) % p * inv(v * v % p) % p
    P = (B * u % p, B * B % p * v % p)
    return go._point_order_in_hasse(P, A * B % p, B * B % p, p)


def smooth_class(k, b1, b2):
    big = 1
    d = 2
    while d * d <= k:
        while k % d == 0:
            if d > b1:
                if d > b2 or big > 1:
                    return "miss"
                big = d
            k //= d
        d += 1 if d == 2 else 2
    if k > 1:
        if k > b2 or (big > 1 and k > b1):
            return "miss"
        if k > b1:
            big = k
    return "stage2" if big > 1 else "stage1"


def main():
    rng = random.Random(42)
    B1, B2 = 2000, 100000
    nprimes, nsig = 60, 24
    res = {"suyama": {"stage1": 0, "stage2": 0, "miss": 0, "err": 0},
           "edwards": {"stage1": 0, "stage2": 0, "miss": 0, "err": 0}}
    primes = []
    while len(primes) < nprimes:
        c = rng.randrange(1 << 26, 1 << 27) | 1
        if all(pow(a, c - 1, c) == 1 for a in (2, 3, 5, 7)):
            primes.append(c)
    div4 = div12 = total_ed = total_su = 0
    for p in primes:
        for sig in range(6, 6 + nsig):
            try:
                o = go.start_point_order(sig, p)
                res["suyama"][smooth_class(o, B1, B2)] += 1
                go_ord = go.group_order(sig, p)
                if go_ord % 12 == 0:
                    div12 += 1
                total_su += 1
            except Exception:
                res["suyama"]["err"] += 1
            try:
                c = ed.build_one_curve(C(p), sig)
                o = edwards_point_order(c, p)
                res["edwards"][smooth_class(o, B1, B2)] += 1
                total_ed += 1
            except Exception:
                res["edwards"]["err"] += 1
    res["suyama"]["div12_frac"] = div12 / max(1, total_su)
    res["params"] = {"B1": B1, "B2": B2, "primes": nprimes, "sigmas": nsig}
    print(json.dumps(res, indent=1))


main()
