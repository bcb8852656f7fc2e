"""Native (C++) host components must match the Python implementations
bit-for-bit: primes, stage-1 tapes, stage-2 pairmaps."""

import numpy as np
import pytest

from tpu_ecm.native import lib as native
from tpu_ecm.primes import sieve
from tpu_ecm.curve import prac
from tpu_ecm.stage2 import plan as s2plan

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("lo,hi", [(0, 10), (0, 100000), (999000, 1001000),
                                   (10**9, 10**9 + 100000), (2, 3), (5, 5)])
def test_native_primes_match(lo, hi):
    got = native.primes_range(lo, hi)
    # python fallback (bypass native dispatch)
    import os
    ref = _py_primes(lo, hi)
    np.testing.assert_array_equal(got, ref)


def _py_primes(lo, hi):
    import os
    os.environ["TPU_ECM_NO_NATIVE"] = "1"
    try:
        # force the numpy path by calling internals
        s = sieve
        nat = sieve._native
        sieve._native = False
        out = sieve.primes_range(lo, hi)
        sieve._native = nat
        return out
    finally:
        os.environ.pop("TPU_ECM_NO_NATIVE", None)


@pytest.mark.parametrize("b1", [100, 1000, 20000])
def test_native_stage1_tape_match(b1):
    primes = _py_primes(0, b1)
    ref = prac.stage1_tape(primes, b1, include_two=True,
                           allow_native=False)
    got = native.stage1_tape(primes, b1, True)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("b1,b2", [(300, 10000), (2000, 60000)])
def test_native_pair_match(b1, b2):
    primes = _py_primes(b1, b2 + 1000)
    sp = s2plan.make_stage2_params(b1, b2)
    ref_v, ref_u, ref_amin, _ = s2plan.pair(sp, primes, b1, b2,
                                            allow_native=False)
    got_v, got_u, got_amin = native.pair(primes, b1, b2, sp.D, sp.U)
    assert got_amin == ref_amin
    np.testing.assert_array_equal(got_v, ref_v)
    np.testing.assert_array_equal(got_u, ref_u)


def test_native_pair_fuzz_match():
    """Random (B1, B2): the C++ planner must emit a bit-identical pairmap
    to the Python planner (same algorithm, same tie-breaking)."""
    import random
    rng = random.Random(0xC44)
    for _ in range(10):
        b1 = rng.randrange(250, 30000)
        b2 = b1 + rng.randrange(100, 40 * b1)
        primes = _py_primes(b1, b2 + 1000)
        sp = s2plan.make_stage2_params(b1, b2)
        ref_v, ref_u, ref_amin, _ = s2plan.pair(sp, primes, b1, b2,
                                                allow_native=False)
        got_v, got_u, got_amin = native.pair(primes, b1, b2, sp.D, sp.U)
        assert got_amin == ref_amin, (b1, b2)
        np.testing.assert_array_equal(got_v, ref_v)
        np.testing.assert_array_equal(got_u, ref_u)
