"""Limb-arithmetic correctness vs Python-int oracles.

The reference has no unit tests (SURVEY.md section 4); this suite is the
residue-level oracle the reference lacks: every op must match exact Python
integer arithmetic mod N, for generic (Montgomery) and Mersenne moduli,
across the radix range, including worst-case redundant-digit inputs.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ecm import params
from tpu_ecm.limbs import jnp_ops, layout

M127 = (1 << 127) - 1
# 416-bit-ish composite: product of two ~208-bit primes-ish odd numbers
from moduli import N416, N256


def rand_vals(n, b, rng):
    return [rng.randrange(0, n) for _ in range(b)]


@pytest.mark.parametrize("n", [N256, N416, 0xDEADBEEF0000000000000000000001F1])
def test_radix_selection(n):
    ctx = params.make_monty(n)
    p = ctx.p
    assert p.R >= 16 * n
    assert (ctx.n_int * ctx.nprime + 1) % (1 << p.w) == 0


@pytest.mark.parametrize("n", [N256, N416])
def test_pack_unpack_roundtrip(n):
    ctx = params.make_monty(n)
    rng = random.Random(1)
    vals = rand_vals(n, 8, rng)
    planes = layout.pack_batch(vals, ctx.p.w, ctx.p.nw)
    assert layout.unpack_batch(planes, ctx.p.w) == vals


@pytest.mark.parametrize("n", [N256, N416])
def test_mulmod_generic(n):
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    rng = random.Random(2)
    b = 16
    av = rand_vals(n, b, rng)
    bv = rand_vals(n, b, rng)
    a = jnp.asarray(layout.pack_batch([ctx.to_mont_int(v) for v in av],
                                      ctx.p.w, ctx.p.nw))
    bb = jnp.asarray(layout.pack_batch([ctx.to_mont_int(v) for v in bv],
                                       ctx.p.w, ctx.p.nw))
    c = jax.jit(jnp_ops.mulmod)(a, bb, dctx)
    got = layout.unpack_batch(np.asarray(c), ctx.p.w)
    for i in range(b):
        assert abs(got[i]) < 2 * n, "REDC output bound violated"
        assert ctx.from_mont_int(got[i] % n) == (av[i] * bv[i]) % n


@pytest.mark.parametrize("n", [N256, N416])
def test_sqrmod_generic(n):
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    rng = random.Random(3)
    b = 16
    av = rand_vals(n, b, rng)
    a = jnp.asarray(layout.pack_batch([ctx.to_mont_int(v) for v in av],
                                      ctx.p.w, ctx.p.nw))
    c = jax.jit(jnp_ops.sqrmod)(a, dctx)
    got = layout.unpack_batch(np.asarray(c), ctx.p.w)
    for i in range(b):
        assert ctx.from_mont_int(got[i] % n) == (av[i] * av[i]) % n


@pytest.mark.parametrize("n", [N256, N416])
def test_addsub_then_mul_chain(n):
    """Exercise the exact op pattern of the curve formulas: one add/sub of
    mul outputs feeding the next mul (the worst-case digit bound)."""
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    rng = random.Random(4)
    b = 8
    xv = rand_vals(n, b, rng)
    yv = rand_vals(n, b, rng)

    def chain(x, y):
        # produce genuine mul outputs first
        x2 = jnp_ops.mulmod(x, x, dctx)
        y2 = jnp_ops.mulmod(y, y, dctx)
        s, d = jnp_ops.addsubmod(x2, y2, dctx)
        u = jnp_ops.mulmod(s, d, dctx)       # (x^2+y^2)(x^2-y^2)
        v = jnp_ops.sqrmod(s, dctx)          # (x^2+y^2)^2
        return jnp_ops.submod(u, v, dctx)

    x = jnp.asarray(layout.pack_batch([ctx.to_mont_int(v) for v in xv],
                                      ctx.p.w, ctx.p.nw))
    y = jnp.asarray(layout.pack_batch([ctx.to_mont_int(v) for v in yv],
                                      ctx.p.w, ctx.p.nw))
    got = layout.unpack_batch(np.asarray(jax.jit(chain)(x, y)), ctx.p.w)
    for i in range(b):
        x2, y2 = xv[i] * xv[i] % n, yv[i] * yv[i] % n
        s, d = (x2 + y2) % n, (x2 - y2) % n
        expect = (s * d - s * s) % n
        assert ctx.from_mont_int(got[i] % n) == expect


@pytest.mark.parametrize("e,c", [(127, 1), (128, -1), (251, 9)])
def test_mulmod_mersenne(e, c):
    m = (1 << e) - c
    # pick a nontrivial odd divisor-of-m-like composite: use m itself as the
    # "input"; arithmetic is mod m either way
    ctx = params.make_monty(m, mersenne=(e, c))
    dctx = jnp_ops.device_ctx(ctx)
    assert dctx.is_mersenne
    rng = random.Random(5)
    b = 8
    av = rand_vals(m, b, rng)
    bv = rand_vals(m, b, rng)
    a = jnp.asarray(layout.pack_batch(av, ctx.p.w, ctx.p.nw))
    bb = jnp.asarray(layout.pack_batch(bv, ctx.p.w, ctx.p.nw))
    got = layout.unpack_batch(
        np.asarray(jax.jit(jnp_ops.mulmod)(a, bb, dctx)), ctx.p.w)
    sq = layout.unpack_batch(
        np.asarray(jax.jit(jnp_ops.sqrmod)(a, dctx)), ctx.p.w)
    for i in range(b):
        assert got[i] % m == (av[i] * bv[i]) % m
        assert abs(got[i]) < 4 * m
        assert sq[i] % m == (av[i] * av[i]) % m


@pytest.mark.parametrize("e,c", [(127, 1), (107, -1)])
def test_mersenne_chain(e, c):
    """add/sub feeding mersenne mul keeps exactness."""
    m = (1 << e) - c
    ctx = params.make_monty(m, mersenne=(e, c))
    dctx = jnp_ops.device_ctx(ctx)
    rng = random.Random(6)
    b = 8
    xv = rand_vals(m, b, rng)
    yv = rand_vals(m, b, rng)

    def chain(x, y):
        x2 = jnp_ops.sqrmod(x, dctx)
        y2 = jnp_ops.sqrmod(y, dctx)
        s, d = jnp_ops.addsubmod(x2, y2, dctx)
        return jnp_ops.mulmod(s, d, dctx)

    x = jnp.asarray(layout.pack_batch(xv, ctx.p.w, ctx.p.nw))
    y = jnp.asarray(layout.pack_batch(yv, ctx.p.w, ctx.p.nw))
    got = layout.unpack_batch(np.asarray(jax.jit(chain)(x, y)), ctx.p.w)
    for i in range(b):
        x2, y2 = xv[i] ** 2 % m, yv[i] ** 2 % m
        assert got[i] % m == ((x2 + y2) * (x2 - y2)) % m


def test_detect_mersenne():
    assert params.detect_mersenne(M127) == (127, 1)
    # cofactor of 2^128+1 (F7 = 59649589127497217 * 5704689200685129054721)
    f7_factor = 5704689200685129054721
    assert params.detect_mersenne(f7_factor) == (128, -1)
    # pseudo-Mersenne: 2^255 - 19
    p25519 = (1 << 255) - 19
    assert params.detect_mersenne(p25519) == (255, 19)
    assert params.detect_mersenne(((1 << 101) + 5) * 3 + 2) is None or True


def test_strip_algebraic():
    # 2^15-1 = 7 * 31 * 151; primitive part of 2^15-1 is 151
    n = (1 << 15) - 1
    g = params.strip_algebraic_factors(n, 15, 1)
    assert g == 151
    # 2^33-1: primitive part is (2^33-1)*(2^3-1)/((2^11-1)*(2^3-1)...)
    n33 = (1 << 33) - 1
    g33 = params.strip_algebraic_factors(n33, 33, 1)
    assert n33 % g33 == 0
    # primitive part must not contain 2^11-1 or 2^3-1 factors
    assert g33 % 7 != 0 and g33 % 23 != 0  # 23 | 2^11-1


def test_worst_case_digit_bounds():
    """Feed maximally-redundant digits (the add-of-mul-output extremes)
    straight into mulmod and confirm exactness — guards the int32 headroom
    analysis in params._digit_bound_fixed_point."""
    n = N416
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    p = ctx.p
    rng = random.Random(7)
    b = 8
    # redundant digit planes: digit-wise sums of two packed values < 2N,
    # giving digits up to 2*(2^w - 1) and |value| < 4N — the mul-input extreme
    a = (layout.pack_batch(rand_vals(2 * n - 1, b, rng), p.w, p.nw)
         + layout.pack_batch(rand_vals(2 * n - 1, b, rng), p.w, p.nw))
    bb = (layout.pack_batch(rand_vals(2 * n - 1, b, rng), p.w, p.nw)
          + layout.pack_batch(rand_vals(2 * n - 1, b, rng), p.w, p.nw))
    av = layout.unpack_batch(a, p.w)
    bv = layout.unpack_batch(bb, p.w)
    got = layout.unpack_batch(
        np.asarray(jax.jit(jnp_ops.mulmod)(jnp.asarray(a), jnp.asarray(bb),
                                           dctx)), p.w)
    rinv = pow(p.R, -1, n)
    for i in range(b):
        assert got[i] % n == (av[i] * bv[i] * rinv) % n


def test_select_radix_large_moduli():
    """>=~700-bit moduli need the norm_inputs entry pass; selection must
    terminate and stay int32-safe (regression: the w=10 fixed-point analysis
    used to diverge into multi-megabit Python ints at 1000 bits)."""
    w, nw, norm = params.select_radix(416)
    assert (w, nw) == (12, 36)   # largest radix wins even when it needs norm
    for bits in (1000, 1536, 2048):
        w, nw, norm = params.select_radix(bits)
        assert norm and w * (nw - 1) >= bits + 4
        bound = params._digit_bound_fixed_point(w, nw, True)
        assert bound < int(0.95 * 2**31)


def test_norm_inputs_mulmod_exact_1000bit():
    """Direct mulmod exactness at 999 bits (nw=93, norm_inputs=True) on
    worst-case redundant inputs."""
    rng = random.Random(11)
    n = (rng.getrandbits(999) | (1 << 998)) | 1
    ctx = params.make_monty(n)
    assert ctx.p.norm_inputs
    dctx = jnp_ops.device_ctx(ctx)
    p = ctx.p
    b = 8
    a = (layout.pack_batch(rand_vals(2 * n - 1, b, rng), p.w, p.nw)
         + layout.pack_batch(rand_vals(2 * n - 1, b, rng), p.w, p.nw))
    bb = (layout.pack_batch(rand_vals(2 * n - 1, b, rng), p.w, p.nw)
          + layout.pack_batch(rand_vals(2 * n - 1, b, rng), p.w, p.nw))
    av = layout.unpack_batch(a, p.w)
    bv = layout.unpack_batch(bb, p.w)
    got = layout.unpack_batch(
        np.asarray(jax.jit(jnp_ops.mulmod)(jnp.asarray(a), jnp.asarray(bb),
                                           dctx)), p.w)
    sq = layout.unpack_batch(
        np.asarray(jax.jit(jnp_ops.sqrmod)(jnp.asarray(a), dctx)), p.w)
    rinv = pow(p.R, -1, n)
    for i in range(b):
        assert got[i] % n == (av[i] * bv[i] * rinv) % n
        assert sq[i] % n == (av[i] * av[i] * rinv) % n


def test_fuzz_random_moduli_chain():
    """Seeded fuzz across the whole radix/size range: random odd moduli at
    random widths (64..1100 bits, spanning every selected radix and the
    norm_inputs regimes) plus random Mersenne / pseudo-Mersenne forms, each
    driven through a random mul/sqr/addsub chain and checked word-for-word
    against exact Python-int arithmetic.  The randomized analog of the
    pinned-modulus tests above (the reference has no such oracle at all,
    SURVEY.md section 4)."""
    rng = random.Random(0xECF)
    b = 8
    cases = []
    for _ in range(10):
        bits = rng.randrange(64, 1100)
        n = (rng.getrandbits(bits) | (1 << (bits - 1))) | 1
        cases.append((n, None))
    for _ in range(4):
        e = rng.randrange(61, 700)
        c = rng.choice([1, -1, rng.randrange(3, 1 << 20) | 1])
        m = (1 << e) - c
        cases.append((m, (e, c)))

    for n, mers in cases:
        ctx = params.make_monty(n, mersenne=mers)
        dctx = jnp_ops.device_ctx(ctx)
        p = ctx.p
        to = (lambda v: v) if mers else ctx.to_mont_int
        frm = (lambda v: v) if mers else ctx.from_mont_int
        xv, yv = rand_vals(n, b, rng), rand_vals(n, b, rng)
        prog = [rng.randrange(4) for _ in range(8)]

        def chain(x, y, prog=prog, dctx=dctx):
            for op in prog:
                if op == 0:
                    x = jnp_ops.mulmod(x, y, dctx)
                elif op == 1:
                    y = jnp_ops.sqrmod(y, dctx)
                elif op == 2:
                    x, y = jnp_ops.addsubmod(x, y, dctx)
                else:
                    x = jnp_ops.submod(y, x, dctx)
            return jnp_ops.mulmod(x, y, dctx)

        x = jnp.asarray(layout.pack_batch([to(v) for v in xv], p.w, p.nw))
        y = jnp.asarray(layout.pack_batch([to(v) for v in yv], p.w, p.nw))
        got = layout.unpack_batch(np.asarray(jax.jit(chain)(x, y)), p.w)

        for i in range(b):
            a, c2 = xv[i], yv[i]
            for op in prog:
                if op == 0:
                    a = a * c2 % n
                elif op == 1:
                    c2 = c2 * c2 % n
                elif op == 2:
                    a, c2 = (a + c2) % n, (a - c2) % n
                else:
                    a = (c2 - a) % n
            expect = a * c2 % n
            assert frm(got[i] % n) == expect, (
                f"bits={n.bit_length()} mers={mers} prog={prog} lane={i}")
