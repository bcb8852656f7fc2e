"""Group-order oracle (utils/grouporder): the FindGroupOrder2 equivalent
(/root/reference/test_inputs.txt:1-20) that classifies where a (p, sigma)
pair is guaranteed to be found.  Validated against the pinned e2e fixture
sigmas of tests/test_e2e.py."""

from tpu_ecm.utils.grouporder import (group_order, smoothness_verdict,
                                      start_point_order)

P1 = 34359738421
P2 = 68719476767


def test_group_order_in_hasse_and_divisibility():
    for sigma, p in ((112, P1), (162, P2), (180, P2)):
        n = group_order(sigma, p)
        import math
        assert abs(n - (p + 1)) <= 2 * math.isqrt(p) + 1
        assert n % start_point_order(sigma, p) == 0


def test_e2e_fixture_verdicts():
    # sigma 112 finds P1 in stage 2 at B1=300/B2=10000 (tests/test_e2e.py)
    assert smoothness_verdict(112, P1, 300, 10000) == "stage2"
    # sigma 180 finds P2 in stage 1 at B1=300
    assert smoothness_verdict(180, P2, 300, 10000) == "stage1"
    # sigma 162 finds P2 in stage 2: one big prime (457) in (B1, B2]
    assert smoothness_verdict(162, P2, 300, 10000) == "stage2"
    # the observed find already at B2=310 (test_e2e) is a *pairing bonus* —
    # 457 is covered as the 2aw-/+u twin of a paired prime <= 310 — so the
    # guarantee classifier must NOT promise it:
    assert smoothness_verdict(162, P2, 300, 310) == "unsmooth"
    # sigma 174's stage-1 find is an x-only collision bonus (73^2 || order)
    assert smoothness_verdict(174, P1, 300, 10000) == "unsmooth"


def test_stage1_case_is_b1_smooth():
    x = start_point_order(180, P2)
    q = 2
    while x > 1:
        if x % q == 0:
            e = 0
            while x % q == 0:
                x //= q
                e += 1
            assert q ** e <= 300
        q += 1
        assert q <= 300
