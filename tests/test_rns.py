"""RNS-Montgomery arithmetic vs Python-int oracles, including the curve-op
usage pattern and a full stage-1 cross-check against the digit-plane engine
(two independent arithmetic implementations must agree canonically)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moduli import N256, N416
from tpu_ecm import params
from tpu_ecm.limbs import rns


@pytest.mark.parametrize("n", [N256, N416])
def test_rns_sizing(n):
    ctx = params.make_monty(n)
    h = rns.make_rns(ctx)
    assert h.P >= 16 * h.K * n
    assert h.Q >= 4 * h.K * n
    assert len(set(h.pa + h.pb)) == 2 * h.K
    assert h.mr > h.K


@pytest.mark.parametrize("n", [N256, N416])
def test_rns_pack_roundtrip(n):
    ctx = params.make_monty(n)
    h = rns.make_rns(ctx)
    rng = random.Random(1)
    vals = [rng.randrange(0, n) for _ in range(8)]
    res = h.pack(vals)
    assert h.unpack(res) == vals


@pytest.mark.parametrize("n", [N256, N416])
def test_rns_mont_mul(n):
    ctx = params.make_monty(n)
    h = rns.make_rns(ctx)
    rng = random.Random(2)
    b = 16
    av = [rng.randrange(0, n) for _ in range(b)]
    bv = [rng.randrange(0, n) for _ in range(b)]
    x = jnp.asarray(h.pack([h.to_mont_int(v) for v in av]))
    y = jnp.asarray(h.pack([h.to_mont_int(v) for v in bv]))
    z = np.asarray(jax.jit(rns.mont_mul)(x, y, h.dev))
    got = h.unpack(z)
    for i in range(b):
        assert h.from_mont_int(got[i]) == av[i] * bv[i] % n


@pytest.mark.parametrize("n", [N256])
def test_rns_add_sub_mul_chain(n):
    """The curve-op pattern: add/sub of mul outputs feeding muls (the 2V
    input extreme for the value-bound analysis)."""
    ctx = params.make_monty(n)
    h = rns.make_rns(ctx)
    rng = random.Random(3)
    b = 8
    xv = [rng.randrange(0, n) for _ in range(b)]
    yv = [rng.randrange(0, n) for _ in range(b)]

    @jax.jit
    def chain(x, y):
        x2 = rns.mont_sqr(x, h.dev)
        y2 = rns.mont_sqr(y, h.dev)
        s, d = rns.addsub(x2, y2, h.dev)
        u = rns.mont_mul(s, d, h.dev)
        v = rns.mont_sqr(s, h.dev)
        return rns.mont_mul(rns.sub(u, v, h.dev), rns.add(u, v, h.dev),
                            h.dev)

    x = jnp.asarray(h.pack([h.to_mont_int(v) for v in xv]))
    y = jnp.asarray(h.pack([h.to_mont_int(v) for v in yv]))
    got = h.unpack(np.asarray(chain(x, y)))
    for i in range(b):
        x2, y2 = xv[i] ** 2 % n, yv[i] ** 2 % n
        s, d = (x2 + y2) % n, (x2 - y2) % n
        u, v = s * d % n, s * s % n
        expect = (u - v) * (u + v) % n
        assert h.from_mont_int(got[i]) == expect


def test_rns_worst_case_values():
    """Drive the value bounds to the analysis limits: multiply two sums of
    two mul outputs (inputs at the 2V bound) repeatedly."""
    n = N256
    ctx = params.make_monty(n)
    h = rns.make_rns(ctx)
    rng = random.Random(4)
    b = 4
    vals = [h.to_mont_int(rng.randrange(0, n)) for _ in range(b)]
    x = jnp.asarray(h.pack(vals))

    @jax.jit
    def worst(x):
        for _ in range(10):
            s = rns.add(x, x, h.dev)           # 2V
            x = rns.mont_mul(s, s, h.dev)      # 4V^2 -> V
        return x

    got = h.unpack(np.asarray(worst(x)))
    pinv = pow(h.P, -1, n)
    for i in range(b):
        e = vals[i]
        for _ in range(10):
            s = 2 * e
            e = s * s * pinv % n
        assert got[i] % n == e % n


def test_rns_stage1_matches_digit_engine():
    """Full stage-1 (tape of curve ops) computed with RNS arithmetic matches
    the digit-plane engine canonically — two independent arithmetic stacks,
    one answer."""
    from tpu_ecm.curve import oracle, prac, suyama
    from tpu_ecm.primes import primes_range

    n = N256
    b1 = 150
    ctx = params.make_monty(n)
    h = rns.make_rns(ctx)
    curves = [suyama.build_one_curve(ctx, 7000 + i) for i in range(4)]
    tape = prac.stage1_tape(primes_range(0, b1), b1)

    # run the tape with RNS ops (host loop over the small tape is fine here)
    # note: curve constants are Montgomery(R=2^wNW) ints; convert to
    # canonical then into the RNS Montgomery domain (R=P)
    def conv(v):
        return h.to_mont_int(ctx.from_mont_int(v))

    xs = jnp.asarray(h.pack([conv(c.x_mont) for c in curves]))
    zs = jnp.asarray(h.pack([conv(c.z_mont) for c in curves]))
    sc = jnp.asarray(h.pack([conv(c.s_mont) for c in curves]))

    @jax.jit
    def run(xs, zs, sc, tape_arr):
        slots_x = jnp.stack([xs] + [jnp.zeros_like(xs)] * 5)
        slots_z = jnp.stack([zs] + [jnp.zeros_like(zs)] * 5)

        def xdbl(X, Z):
            s_, d_ = rns.addsub(X, Z, h.dev)
            v = rns.mont_sqr(d_, h.dev)
            u = rns.mont_sqr(s_, h.dev)
            x2 = rns.mont_mul(u, v, h.dev)
            w_ = rns.sub(u, v, h.dev)
            t = rns.mont_mul(w_, sc, h.dev)
            return x2, rns.mont_mul(rns.add(t, v, h.dev), w_, h.dev)

        def xadd(X1, Z1, X2, Z2, Xd, Zd):
            s1, d1 = rns.addsub(X1, Z1, h.dev)
            s2, d2 = rns.addsub(X2, Z2, h.dev)
            u = rns.mont_mul(d1, s2, h.dev)
            v = rns.mont_mul(s1, d2, h.dev)
            sp, dm = rns.addsub(u, v, h.dev)
            t1 = rns.mont_sqr(sp, h.dev)
            t2 = rns.mont_sqr(dm, h.dev)
            return (rns.mont_mul(t1, Zd, h.dev),
                    rns.mont_mul(t2, Xd, h.dev))

        def step(carry, e):
            sx, sz = carry
            op, dst, a, b, c = e[0], e[1], e[2], e[3], e[4]
            Xa, Za = jnp.take(sx, a, axis=0), jnp.take(sz, a, axis=0)

            def dup(_):
                return xdbl(Xa, Za)

            def addf(_):
                return xadd(Xa, Za, jnp.take(sx, b, axis=0),
                            jnp.take(sz, b, axis=0),
                            jnp.take(sx, c, axis=0),
                            jnp.take(sz, c, axis=0))

            nx, nz = jax.lax.cond(op == 0, dup, addf, None)
            return (sx.at[dst].set(nx), sz.at[dst].set(nz)), None

        (sx, sz), _ = jax.lax.scan(step, (slots_x, slots_z), tape_arr)
        return sx[0], sz[0]

    gx, gz = run(xs, zs, sc, jnp.asarray(tape))
    got_x = [h.from_mont_int(v) for v in h.unpack(np.asarray(gx))]
    got_z = [h.from_mont_int(v) for v in h.unpack(np.asarray(gz))]

    dom = oracle.IntDomain(ctx)
    for i, c in enumerate(curves):
        slots = oracle.run_tape_int(ctx, tape.tolist(),
                                    c.x_mont, c.z_mont, c.s_mont)
        ex, ez = slots[0]
        assert got_x[i] == ctx.from_mont_int(ex)
        assert got_z[i] == ctx.from_mont_int(ez)


def test_rns_split_threshold_accounts_for_mr_row():
    """Regression: the non-split int32 extension dot must also be exact on
    the m_r weight row, whose entries reach mr-1 = 2^(cw+1)-1 (~2x the
    largest prime).  At ~800 bits (cw=12, K~72) the old K*maxp^2 bound
    chose the non-split path while the m_r-row worst case exceeds 2^31;
    the corrected K*(maxp-1)*(mr-1) bound must select the split path —
    and arithmetic must stay exact there."""
    rng = random.Random(4)
    n = (rng.getrandbits(800) | (1 << 799)) | 1
    ctx = params.make_monty(n)
    h = rns.make_rns(ctx)
    maxp = max(h.pa + h.pb)
    worst = h.K * (maxp - 1) * (h.mr - 1)
    assert worst >= 2 ** 31, "regime no longer exercises the threshold"
    assert h.dev.use_split
    b = 4
    av = [rng.randrange(0, n) for _ in range(b)]
    bv = [rng.randrange(0, n) for _ in range(b)]
    x = jnp.asarray(h.pack([h.to_mont_int(v) for v in av]))
    y = jnp.asarray(h.pack([h.to_mont_int(v) for v in bv]))
    got = h.unpack(np.asarray(jax.jit(rns.mont_mul)(x, y, h.dev)))
    for i in range(b):
        assert h.from_mont_int(got[i]) == av[i] * bv[i] % n
