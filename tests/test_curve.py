"""Curve-op and PRAC-tape correctness: device scan vs Python-int oracles."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ecm import params
from tpu_ecm.curve import oracle, ops, prac, suyama
from tpu_ecm.limbs import jnp_ops, layout

P61 = (1 << 61) - 1          # prime modulus: Z always invertible
from moduli import N416


def _pack(ctx, vals, b=None):
    return jnp.asarray(layout.pack_batch(vals, ctx.p.w, ctx.p.nw))


def _mk_state(ctx, curves):
    """[S, 2, NW, B] register file from per-curve (x, z) mont ints."""
    b = len(curves)
    xs = layout.pack_batch([c.x_mont for c in curves], ctx.p.w, ctx.p.nw)
    zs = layout.pack_batch([c.z_mont for c in curves], ctx.p.w, ctx.p.nw)
    pts = np.zeros((ops.NUM_SLOTS, 2, ctx.p.nw, b), dtype=np.int32)
    pts[0, 0] = xs
    pts[0, 1] = zs
    return jnp.asarray(pts)




def simple_primes(limit):
    sieve = np.ones(limit, dtype=bool)
    sieve[:2] = False
    for i in range(2, int(limit ** 0.5) + 1):
        if sieve[i]:
            sieve[i * i::i] = False
    return np.nonzero(sieve)[0].tolist()


def test_prac_tape_wellformed():
    out = []
    for p in simple_primes(2000):
        if p == 2:
            continue
        prac.prac_tape(p, out)
    arr = np.asarray(out)
    assert arr[:, 1].max() < ops.NUM_SLOTS
    assert set(np.unique(arr[:, 0])) <= {ops.OP_DUP, ops.OP_ADD}


def test_prac_tapes_validate_symbolically():
    """Every chain op must be a legal differential add (diff slot holds
    +-(X-Y) or +-(X+Y)) and slot 0 must end as [p]P — for BOTH rule sets
    (reduced 3/4/5/9 default and the full ORIG_PRAC-analog 9-rule set)."""
    for full in (False, True):
        for p in simple_primes(5000):
            if p == 2:
                continue
            out = []
            prac.prac_tape(p, out, full=full)
            prac.validate_tape(np.asarray(out, np.int32), p)


def test_full_prac_matches_ladder():
    """Full 9-rule PRAC tapes must still compute [p]P (projective check
    against the ladder oracle)."""
    ctx = params.make_monty(P61)
    dom = oracle.IntDomain(ctx)
    ci = suyama.build_one_curve(ctx, 1234577)
    for p in (127, 1009, 65537, 999983):
        tape = []
        prac.prac_tape(p, tape, full=True)
        slots = oracle.run_tape_int(ctx, tape, ci.x_mont, ci.z_mont,
                                    ci.s_mont)
        xp, zp = slots[0]
        xl, zl = oracle.ladder_int(dom, ci.x_mont, ci.z_mont,
                                   ci.s_mont, p)
        assert (xp * zl - xl * zp) % P61 == 0, p


def test_prac_vs_ladder_projective():
    """[p]P from the PRAC tape must agree projectively with a textbook
    ladder (prime modulus, so Z is invertible)."""
    ctx = params.make_monty(P61)
    dom = oracle.IntDomain(ctx)
    rng = random.Random(11)
    ci = suyama.build_one_curve(ctx, 1234577)
    for p in (3, 5, 7, 11, 101, 257, 1009, 65537, 999983):
        tape = []
        prac.prac_tape(p, tape)
        slots = oracle.run_tape_int(ctx, tape, ci.x_mont, ci.z_mont, ci.s_mont)
        xp, zp = slots[0]
        xl, zl = oracle.ladder_int(dom, ci.x_mont, ci.z_mont, ci.s_mont, p)
        assert (xp * zl - xl * zp) % P61 == 0, f"PRAC != ladder for p={p}"
        assert zp % P61 != 0


def test_ladder_tape_matches_int_ladder():
    ctx = params.make_monty(P61)
    dom = oracle.IntDomain(ctx)
    ci = suyama.build_one_curve(ctx, 8689)
    for k in (1, 2, 3, 4, 30, 210, 2310, 12345):
        tape, res_slot = prac.ladder_tape_result_slot(k)
        slots = oracle.run_tape_int(ctx, tape, ci.x_mont, ci.z_mont, ci.s_mont)
        xk, zk = slots[res_slot]
        xl, zl = oracle.ladder_int(dom, ci.x_mont, ci.z_mont, ci.s_mont, k)
        assert (xk, zk) == (xl, zl), f"ladder tape mismatch k={k}"


@pytest.mark.parametrize("n", [P61, N416])
def test_device_tape_matches_oracle(n):
    """Bit-exact (canonical) parity: device lax.scan replay vs the
    Python-int oracle on the same tape — the core determinism property
    (fixed sigma => identical residues regardless of batching/sharding)."""
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    sigmas = [1000003 + i for i in range(4)]
    curves = [suyama.build_one_curve(ctx, s) for s in sigmas]
    plist = simple_primes(200)
    tape_np = prac.stage1_tape(plist, 200)
    pts = _mk_state(ctx, curves)
    s_const = _pack(ctx, [c.s_mont for c in curves])

    run = jax.jit(ops.run_tape)
    final = np.asarray(run(pts, jnp.asarray(tape_np), s_const, dctx))

    got_x = layout.unpack_batch(final[0, 0], ctx.p.w)
    got_z = layout.unpack_batch(final[0, 1], ctx.p.w)
    for i, c in enumerate(curves):
        slots = oracle.run_tape_int(ctx, tape_np.tolist(),
                                    c.x_mont, c.z_mont, c.s_mont)
        ex, ez = slots[0]
        assert got_x[i] % n == ex, f"curve {i} X mismatch"
        assert got_z[i] % n == ez, f"curve {i} Z mismatch"


def test_device_tape_mersenne():
    e, c = 127, 1
    m = (1 << e) - c
    ctx = params.make_monty(m, mersenne=(e, c))
    dctx = jnp_ops.device_ctx(ctx)
    curves = [suyama.build_one_curve(ctx, s) for s in (11, 12, 13, 14)]
    plist = simple_primes(100)
    tape_np = prac.stage1_tape(plist, 100)
    pts = _mk_state(ctx, curves)
    s_const = _pack(ctx, [cv.s_mont for cv in curves])
    final = np.asarray(jax.jit(ops.run_tape)(
        pts, jnp.asarray(tape_np), s_const, dctx))
    got_x = layout.unpack_batch(final[0, 0], ctx.p.w)
    got_z = layout.unpack_batch(final[0, 1], ctx.p.w)
    for i, cv in enumerate(curves):
        slots = oracle.run_tape_int(ctx, tape_np.tolist(),
                                    cv.x_mont, cv.z_mont, cv.s_mont)
        assert got_x[i] % m == slots[0][0]
        assert got_z[i] % m == slots[0][1]


def test_suyama_reference_values():
    """Spot-check the Suyama parameterization algebra on a prime field."""
    p = 1000003
    ctx = params.make_monty(p)
    sigma = 7
    ci = suyama.build_one_curve(ctx, sigma)
    u, v = sigma * sigma - 5, 4 * sigma
    x = pow(u, 3, p) * pow(pow(v, 3, p), -1, p) % p
    s = (pow(v - u, 3, p) * (3 * u + v)) % p * pow(16 * pow(u, 3, p) * v % p,
                                                   -1, p) % p
    assert ctx.from_mont_int(ci.x_mont) == x
    assert ctx.from_mont_int(ci.s_mont) == s
    assert ctx.from_mont_int(ci.z_mont) == 1
