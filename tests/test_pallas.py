"""Pallas tape-executor parity: interpret mode must be bit-identical to the
jnp path (which is itself oracle-verified)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ecm import params
from tpu_ecm.curve import ops, prac, suyama
from tpu_ecm.limbs import jnp_ops, layout, pallas_ops
from tpu_ecm.primes import primes_range

import jax


def _setup(ctx, b, b1):
    curves = [suyama.build_one_curve(ctx, 100 + i) for i in range(b)]
    p = ctx.p
    pts = np.zeros((ops.NUM_SLOTS, 2, p.nw, b), dtype=np.int32)
    pts[0, 0] = layout.pack_batch([c.x_mont for c in curves], p.w, p.nw)
    pts[0, 1] = layout.pack_batch([c.z_mont for c in curves], p.w, p.nw)
    s_const = layout.pack_batch([c.s_mont for c in curves], p.w, p.nw)
    tape = prac.stage1_tape(primes_range(0, b1), b1)
    return pts, s_const, tape


N64 = 2545580083 * 2551628647          # 63-bit semiprime (both factors prime)
M61 = (1 << 61) - 1


@pytest.mark.parametrize("n,mers", [
    (N64, None),
    pytest.param(M61, (61, 1), marks=pytest.mark.slow),
])
def test_pallas_executor_bitexact(n, mers):
    ctx = params.make_monty(n, mersenne=mers)
    dctx = jnp_ops.device_ctx(ctx)
    b = 128
    pts, s_const, tape = _setup(ctx, b, 40)
    ref = np.asarray(jax.jit(ops.run_tape)(
        jnp.asarray(pts), jnp.asarray(tape), jnp.asarray(s_const), dctx))
    run = pallas_ops.make_tape_executor(ctx, b, chunk=16, interpret=True)
    got = np.asarray(run(jnp.asarray(pts), jnp.asarray(tape),
                         jnp.asarray(s_const)))
    np.testing.assert_array_equal(got[0], ref[0])


def test_nop_padding_is_identity():
    ctx = params.make_monty(N64)
    b = 128
    pts, s_const, tape = _setup(ctx, b, 14)
    run = pallas_ops.make_tape_executor(ctx, b, chunk=32, interpret=True)
    # chunk=256 forces NOP padding beyond the short tape
    got = np.asarray(run(jnp.asarray(pts), jnp.asarray(tape),
                         jnp.asarray(s_const)))
    run2 = pallas_ops.make_tape_executor(ctx, b, chunk=len(tape),
                                         interpret=True)
    got2 = np.asarray(run2(jnp.asarray(pts), jnp.asarray(tape),
                           jnp.asarray(s_const)))
    np.testing.assert_array_equal(got[0], got2[0])


@pytest.mark.slow
def test_pallas_norm_inputs_bitexact():
    """norm_inputs entry-normalization branch (large-modulus mode), forced on
    via a tiny radix: pallas must stay bit-identical to the jnp path."""
    ctx = params.make_monty(N64, force_w=6)
    assert ctx.p.norm_inputs
    dctx = jnp_ops.device_ctx(ctx)
    b = 128
    pts, s_const, tape = _setup(ctx, b, 40)
    ref = np.asarray(jax.jit(ops.run_tape)(
        jnp.asarray(pts), jnp.asarray(tape), jnp.asarray(s_const), dctx))
    run = pallas_ops.make_tape_executor(ctx, b, chunk=16, interpret=True)
    got = np.asarray(run(jnp.asarray(pts), jnp.asarray(tape),
                         jnp.asarray(s_const)))
    np.testing.assert_array_equal(got[0], ref[0])


@pytest.mark.parametrize("n,mers", [
    (N64, None),
    pytest.param(M61, (61, 1), marks=pytest.mark.slow),
])
def test_pallas_karatsuba_bitexact(monkeypatch, n, mers):
    """One-level Karatsuba product/square schedule (headline-nw mode) must
    stay bit-identical to the jnp schoolbook path; forced on via the KARA_NW
    threshold."""
    monkeypatch.setattr(pallas_ops, "KARA_NW", 4)
    ctx = params.make_monty(n, mersenne=mers)
    assert ctx.p.nw >= 4 and ctx.p.nw <= pallas_ops.BLOCKED_NW
    dctx = jnp_ops.device_ctx(ctx)
    b = 128
    pts, s_const, tape = _setup(ctx, b, 40)
    ref = np.asarray(jax.jit(ops.run_tape)(
        jnp.asarray(pts), jnp.asarray(tape), jnp.asarray(s_const), dctx))
    run = pallas_ops.make_tape_executor(ctx, b, chunk=16, interpret=True)
    got = np.asarray(run(jnp.asarray(pts), jnp.asarray(tape),
                         jnp.asarray(s_const)))
    np.testing.assert_array_equal(got[0], ref[0])


def test_pallas_blocked_cios_bitexact(monkeypatch):
    """Blocked-CIOS mulmod schedule (large-nw mode) must stay bit-identical
    to the jnp path; forced on via the BLOCKED_NW threshold.  (The hybrid
    kara+blocked schedule was deleted after losing its idle-chip A/B at 2
    of 3 sizes — round-4 BENCH_NOTES.)"""
    monkeypatch.setattr(pallas_ops, "BLOCKED_NW", 4)
    ctx = params.make_monty(N64)
    dctx = jnp_ops.device_ctx(ctx)
    b = 128
    pts, s_const, tape = _setup(ctx, b, 40)
    ref = np.asarray(jax.jit(ops.run_tape)(
        jnp.asarray(pts), jnp.asarray(tape), jnp.asarray(s_const), dctx))
    run = pallas_ops.make_tape_executor(ctx, b, chunk=16, interpret=True)
    got = np.asarray(run(jnp.asarray(pts), jnp.asarray(tape),
                         jnp.asarray(s_const)))
    np.testing.assert_array_equal(got[0], ref[0])


@pytest.mark.slow
def test_pallas_blocked_mersenne_bitexact(monkeypatch):
    """Blocked product + Mersenne fold parity."""
    monkeypatch.setattr(pallas_ops, "BLOCKED_NW", 4)
    ctx = params.make_monty(M61, mersenne=(61, 1))
    dctx = jnp_ops.device_ctx(ctx)
    b = 128
    pts, s_const, tape = _setup(ctx, b, 40)
    ref = np.asarray(jax.jit(ops.run_tape)(
        jnp.asarray(pts), jnp.asarray(tape), jnp.asarray(s_const), dctx))
    run = pallas_ops.make_tape_executor(ctx, b, chunk=16, interpret=True)
    got = np.asarray(run(jnp.asarray(pts), jnp.asarray(tape),
                         jnp.asarray(s_const)))
    np.testing.assert_array_equal(got[0], ref[0])
