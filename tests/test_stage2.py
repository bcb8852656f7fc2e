"""Stage-2 planner and executor correctness: coverage audit (the reference's
'testcoverage' self-check) and exact accumulator parity vs an int oracle."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ecm import params
from tpu_ecm.curve import oracle, suyama
from tpu_ecm.limbs import jnp_ops, layout
from tpu_ecm.primes import primes_range
from tpu_ecm.stage2 import exec as s2exec
from tpu_ecm.stage2 import plan as s2plan

P61 = (1 << 61) - 1


def test_choose_stage2_U_tpu_model():
    """Pin the hardware-calibrated model's choices (BENCH_NOTES round 5
    '(D, U) window sweep'): U=8 at the flagship bounds (init dominates),
    large U at huge B2 (init amortizes), and the HBM cap bounding U when
    the Pb table would not fit."""
    from tpu_ecm import params as p
    assert p.choose_stage2_U_tpu(1_000_000, 100_000_000, 2310) == 8
    assert p.choose_stage2_U_tpu(9_000_000, 164_000_000_000, 2310) == 32
    # HBM cap: at nw=90 (1000-bit) and B=2048, U=32's table would be
    # ~11 GB — the cap must pick a smaller window
    capped = p.choose_stage2_U_tpu(9_000_000, 164_000_000_000, 2310,
                                   nw=90, batch=2048)
    assert capped < 32
    assert (capped * 480 + 3) * 90 * 2048 * 4 <= p.S2_TABLE_HBM_CAP
    # coverage is D/U-generic: the chosen window must plan + audit
    sp = s2plan.make_stage2_params(20000, 400000)
    from tpu_ecm.primes import primes_range
    prs = primes_range(10000, 401000)
    v, u, amin0, _ = s2plan.pair(sp, prs, 20000, 400000,
                                 allow_native=False)
    s2plan.audit_coverage(sp, v, u, amin0, prs, 20000, 400000)


@pytest.mark.parametrize("b1,b2", [(300, 10000), (2000, 50000),
                                   (10000, 200000)])
def test_pairmap_covers_all_primes(b1, b2):
    sp = s2plan.make_stage2_params(b1, b2)
    primes = primes_range(b1, b2 + 1000)
    map_v, map_u, amin0, stats = s2plan.pair(sp, primes, b1, b2)
    missing = s2plan.audit_coverage(sp, map_v, map_u, amin0, primes, b1, b2)
    assert missing == [], f"uncovered primes: {missing[:10]}"
    assert 0.3 < stats["ratio"] <= 2.0


def test_pairmap_chunked_coverage():
    """Chunked planning (PRIME_RANGE protocol) still covers everything."""
    b1, b2, chunk = 500, 40000, 13000
    sp = s2plan.make_stage2_params(b1, b2)
    lo = b1
    while lo < b2:
        hi = min(lo + chunk, b2)
        primes = primes_range(lo, hi + 1000)
        map_v, map_u, amin0, _ = s2plan.pair(sp, primes, lo, hi)
        missing = s2plan.audit_coverage(sp, map_v, map_u, amin0,
                                        primes, lo, hi)
        assert missing == [], f"chunk {lo}:{hi} uncovered {missing[:5]}"
        lo = hi


def test_pair_indices_in_executor_range():
    b1, b2 = 300, 30000
    sp = s2plan.make_stage2_params(b1, b2)
    primes = primes_range(b1, b2 + 1000)
    map_v, map_u, amin0, _ = s2plan.pair(sp, primes, b1, b2)
    amin = amin0
    for v, u in zip(map_v.tolist(), map_u.tolist()):
        if v == 0 and u == 0:
            amin += sp.U
            continue
        pa = v - amin
        assert 0 <= pa < 2 * sp.L
        assert 1 <= u <= sp.umax
        assert sp.rprime_map[u] > 0, f"unstored baby-step index u={u}"


def test_host_batch_inverse():
    from moduli import N256, P127
    ctx = params.make_monty(N256)
    import random
    rng = random.Random(9)
    vals = [rng.randrange(1, N256) for _ in range(20)]
    vals[7] = P127 * 3        # non-invertible, factor P127
    out, factors = s2exec.host_batch_inverse(ctx, vals)
    assert factors == {7: P127}
    r = ctx.p.R
    for i, v in enumerate(vals):
        if i == 7:
            assert out[i] == 0
            continue
        # out = R^2 * v^-1: mont_mul(x, out) = x*out/R = x * R * v^-1
        assert out[i] * v % N256 == (r * r) % N256 % N256 * 1 % N256 \
            or (out[i] * v - r * r) % N256 == 0


def test_stage2_executor_exact_vs_oracle():
    """Full phase-2+3 on a prime modulus vs an exact integer replay of the
    same pairmap: the accumulator value must match exactly."""
    n = P61
    b1, b2 = 300, 4000
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    sigmas = [40, 41, 42, 43]
    curves = [suyama.build_one_curve(ctx, s) for s in sigmas]
    dom = oracle.IntDomain(ctx)

    # stage-1 to B1 with the int oracle, then feed the device from there
    from tpu_ecm.curve import prac
    s1 = []
    for c in curves:
        X, Z, s = c.x_mont, c.z_mont, c.s_mont
        for _ in range(prac.stage1_powers_of_two(b1)):
            X, Z = oracle.xdbl_int(dom, X, Z, s)
        for q in primes_range(3, b1).tolist():
            q = int(q)
            k = 1
            while True:
                tape = []
                prac.prac_tape(q, tape)
                X, Z = oracle.run_tape_int(ctx, tape, X, Z, s)[0]
                k *= q
                if k * q >= b1:
                    break
        s1.append((X, Z, s))

    p = ctx.p
    pt = np.zeros((2, p.nw, len(curves)), dtype=np.int32)
    pt[0] = layout.pack_batch([t[0] for t in s1], p.w, p.nw)
    pt[1] = layout.pack_batch([t[1] for t in s1], p.w, p.nw)
    s_const = jnp.asarray(layout.pack_batch([t[2] for t in s1], p.w, p.nw))

    sp = s2plan.make_stage2_params(b1, b2)
    runner = s2exec.Stage2Runner(ctx, dctx, sp, jnp.asarray(pt), s_const, b1)
    runner.init()
    primes = primes_range(b1, b2 + 1000)
    map_v, map_u, amin0, _ = s2plan.pair(sp, primes, b1, b2)
    runner.run_chunk(map_v, map_u, amin0)
    res = runner.result()

    # integer oracle replay: product of (x_a - x_b) over all pair entries
    rinv = pow(p.R, -1, n)
    for i, (X, Z, s) in enumerate(s1):

        def affine(k):
            xk, zk = oracle.ladder_int(dom, X, Z, s, k)
            return xk * rinv % n * pow(zk * rinv % n, -1, n) % n

        amin = amin0
        acc = 1
        cache = {}
        for v, u in zip(map_v.tolist(), map_u.tolist()):
            if v == 0 and u == 0:
                amin += sp.U
                continue
            m = (v + amin) * sp.D
            if m not in cache:
                cache[m] = affine(m)
            if u not in cache:
                cache[u] = affine(u)
            acc = acc * (cache[m] - cache[u]) % n
        assert res.acc[i] == acc, f"curve {i}: stage-2 accumulator mismatch"
    assert res.paired == int(np.sum(~((map_v == 0) & (map_u == 0))))


def test_stage2_noinv_exact_vs_oracle():
    """Inversion-free CROSS_PRODUCT form (the reference's non-DO_STAGE2_INV
    build, /root/reference/ecm.c:1861-1866,2526-2530): phases 2+3 with
    cross='noinv' must produce exactly prod (x_a*z_b - x_b*z_a) mod n over
    the pairmap entries — the projective cross product, no inversions at
    all (numinv == 0), same final gcd factor detection power up to z-unit
    factors."""
    n = P61
    b1, b2 = 300, 4000
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    sigmas = [40, 41, 42, 43]
    curves = [suyama.build_one_curve(ctx, s) for s in sigmas]
    dom = oracle.IntDomain(ctx)

    from tpu_ecm.curve import prac
    s1 = []
    for c in curves:
        X, Z, s = c.x_mont, c.z_mont, c.s_mont
        for _ in range(prac.stage1_powers_of_two(b1)):
            X, Z = oracle.xdbl_int(dom, X, Z, s)
        for q in primes_range(3, b1).tolist():
            q = int(q)
            k = 1
            while True:
                tape = []
                prac.prac_tape(q, tape)
                X, Z = oracle.run_tape_int(ctx, tape, X, Z, s)[0]
                k *= q
                if k * q >= b1:
                    break
        s1.append((X, Z, s))

    p = ctx.p
    pt = np.zeros((2, p.nw, len(curves)), dtype=np.int32)
    pt[0] = layout.pack_batch([t[0] for t in s1], p.w, p.nw)
    pt[1] = layout.pack_batch([t[1] for t in s1], p.w, p.nw)
    s_const = jnp.asarray(layout.pack_batch([t[2] for t in s1], p.w, p.nw))

    sp = s2plan.make_stage2_params(b1, b2)
    primes = primes_range(b1, b2 + 1000)
    map_v, map_u, amin0, _ = s2plan.pair(sp, primes, b1, b2)

    # inverted reference run: acc_inv = prod (x_a/z_a - x_b/z_b), verified
    # exactly against the affine int oracle by
    # test_stage2_executor_exact_vs_oracle above
    runner_i = s2exec.Stage2Runner(ctx, dctx, sp, jnp.asarray(pt), s_const,
                                   b1, cross="inv")
    runner_i.init()
    runner_i.run_chunk(map_v, map_u, amin0)
    res_i = runner_i.result()

    # noinv run with operand capture: every projective cross product
    # (x_a*z_b - x_b*z_a) equals the affine difference scaled by z_a*z_b
    # FOR THE RUN'S OWN representatives, so
    #     acc_noinv == acc_inv * prod(z_a * z_b)  (mod n)
    # with the z planes taken from the captured replay operands — this
    # pins both the arithmetic identity and that every referenced row is
    # the correct projective point (a wrong row breaks the relation).
    runner = s2exec.Stage2Runner(ctx, dctx, sp, jnp.asarray(pt), s_const,
                                 b1, cross="noinv")
    caps = []
    orig = runner.ops.replay_segment_noinv

    def capture(acc, pa_ext, pbx, idx):
        caps.append((np.asarray(pa_ext), np.asarray(pbx), np.asarray(idx)))
        return orig(acc, pa_ext, pbx, idx)

    runner.ops.replay_segment_noinv = capture
    runner.init()
    runner.run_chunk(map_v, map_u, amin0)
    res = runner.result()
    assert res.numinv == 0 and not res.factors
    assert res.paired == res_i.paired \
        == int(np.sum(~((map_v == 0) & (map_u == 0))))

    rinv = pow(p.R, -1, n)
    zprod = [1] * len(sigmas)
    for pa_ext, pbx, idx in caps:
        for j, u in idx.tolist():
            if u == 0:                      # pad entry: contributes one
                continue
            # captured planes are Montgomery-domain (z * R): strip R
            za = layout.unpack_batch(pa_ext[j, 1], p.w)
            zb = layout.unpack_batch(pbx[u, 1], p.w)
            for i in range(len(sigmas)):
                zprod[i] = (zprod[i] * (za[i] * rinv % n) % n
                            * (zb[i] * rinv % n) % n)
    for i in range(len(sigmas)):
        want = res_i.acc[i] * zprod[i] % n
        assert res.acc[i] == want, \
            f"curve {i}: noinv/inv accumulator relation broken"


def test_stage2_pallas_kernels_parity():
    """The stage-2 Pallas kernels (chain extension, prefix products,
    apply-inverse, pairmap replay) must match the jnp fallback bit-exactly
    (interpret mode; the TPU path is additionally cross-checked on hardware,
    see BENCH_NOTES.md)."""
    import jax
    import jax.numpy as jnp
    from tpu_ecm.curve import suyama
    from tpu_ecm.limbs import jnp_ops, layout, pallas_ops
    from tpu_ecm.stage2 import exec as s2exec

    n = 2545580083 * 2551628647
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    b = 128
    cs = [suyama.build_one_curve(ctx, 5000 + i) for i in range(b)]
    p = ctx.p
    pt = np.stack([layout.pack_batch([c.x_mont for c in cs], p.w, p.nw),
                   layout.pack_batch([c.z_mont for c in cs], p.w, p.nw)])
    s = layout.pack_batch([c.s_mont for c in cs], p.w, p.nw)
    pd = jnp.asarray(pt)  # Pd = Q; chain from ([2]Q, [1]Q) walks [3]Q, [4]Q...
    one = jnp.asarray(layout.broadcast_int(ctx.r_mod_n, p.w, p.nw, b))
    from tpu_ecm.curve import ops as curve_ops
    x2, z2 = jax.jit(curve_ops.xdbl)(pd[0], pd[1], jnp.asarray(s), dctx)
    q2 = jnp.stack([x2, z2])

    K = 6
    # chain
    cnt = jnp.zeros((K,), dtype=jnp.int32)
    ref = s2exec._pa_extend((q2, pd), pd, jnp.asarray(s), cnt, dctx)
    got = pallas_ops.make_chain_executor(ctx, b, K, interpret=True)(
        q2, pd, pd)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # prefix + apply-inverse
    zs = ref[:, 1]
    xs = ref[:, 0]
    pref_ref = s2exec._z_prefix(zs, one, dctx)
    pref_got = pallas_ops.make_prefix_executor(ctx, b, K, interpret=True)(
        zs, one)
    np.testing.assert_array_equal(np.asarray(pref_got), np.asarray(pref_ref))
    total = layout.unpack_batch(np.asarray(pref_ref[-1]), p.w)
    inv_ints, fnd = s2exec.host_batch_inverse(ctx, total)
    assert not fnd
    tinv = jnp.asarray(layout.pack_batch(inv_ints, p.w, p.nw))
    app_ref = s2exec._apply_inverse(xs, zs, pref_ref, tinv, one, dctx)
    pres = jnp.concatenate([one[None], pref_got[:-1]], axis=0)
    app_got = pallas_ops.make_apply_inverse_executor(
        ctx, b, K, interpret=True)(xs, zs, pres, tinv)
    np.testing.assert_array_equal(np.asarray(app_got), np.asarray(app_ref))


@pytest.mark.parametrize("entries_per_step", [4, 8])
def test_replay_kernel_value_parity(entries_per_step):
    """Pallas replay kernel (E entries per grid step) vs a sequential jnp
    reference: values mod n must match (tree multiplication order differs,
    digit representations may too)."""
    import random
    import jax.numpy as jnp
    from tpu_ecm.limbs import jnp_ops, layout, pallas_ops
    n = 2545580083 * 2551628647
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    p = ctx.p
    b = 128
    rng = random.Random(3)
    PA, PB, T = 17, 9, 16

    def mk(rows):
        return np.stack([layout.pack_batch(
            [rng.randrange(n) for _ in range(b)], p.w, p.nw)
            for _ in range(rows)])

    pa, pb = mk(PA), mk(PB)
    pa[-1] = layout.broadcast_int(ctx.r_mod_n, p.w, p.nw, b)
    pb[0] = 0
    acc0 = layout.pack_batch([rng.randrange(n) for _ in range(b)], p.w, p.nw)
    idx = np.stack([np.array([rng.randrange(PA - 1) for _ in range(T)]),
                    np.array([rng.randrange(1, PB) for _ in range(T)])],
                   1).astype(np.int32)
    acc = jnp.asarray(acc0)
    for v, u in idx.tolist():
        acc = jnp_ops.mulmod(acc, jnp.asarray(pa[v] - pb[u]), dctx)
    ref = layout.unpack_batch(np.asarray(acc), p.w)
    run = pallas_ops.make_replay_executor(ctx, b, PA, PB, t_block=T,
                                          entries_per_step=entries_per_step,
                                          interpret=True)
    got = layout.unpack_batch(np.asarray(
        run(jnp.asarray(acc0), jnp.asarray(pa), jnp.asarray(pb),
            jnp.asarray(idx))), p.w)
    for i in range(b):
        assert got[i] % n == ref[i] % n, i


@pytest.mark.parametrize("entries_per_step", [4, 8])
def test_replay_parow_kernel_value_parity(entries_per_step):
    """Shared-Pa-row replay kernel (one Pa + E Pb blocks per grid step,
    pb == 0 pads masked to the Montgomery one in kernel) vs a sequential
    jnp reference, including the host step-packing (runs of equal Pa split
    into E-entry steps)."""
    import random
    import jax.numpy as jnp
    from tpu_ecm.limbs import jnp_ops, layout, pallas_ops
    from tpu_ecm.stage2 import exec as s2exec
    n = 2545580083 * 2551628647
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    p = ctx.p
    b = 128
    rng = random.Random(11)
    PA, PB, T = 17, 9, 37          # deliberately not a multiple of E

    def mk(rows):
        return np.stack([layout.pack_batch(
            [rng.randrange(n) for _ in range(b)], p.w, p.nw)
            for _ in range(rows)])

    pa, pb = mk(PA), mk(PB)
    pa[-1] = layout.broadcast_int(ctx.r_mod_n, p.w, p.nw, b)
    pb[0] = 0
    acc0 = layout.pack_batch([rng.randrange(n) for _ in range(b)], p.w, p.nw)
    # v-sorted entries with runs of unequal length (incl. length-1 runs)
    pav = np.sort(np.array([rng.randrange(PA - 1) for _ in range(T)]))
    idx = np.stack([pav,
                    np.array([rng.randrange(1, PB) for _ in range(T)])],
                   1).astype(np.int32)
    acc = jnp.asarray(acc0)
    for v, u in idx.tolist():
        acc = jnp_ops.mulmod(acc, jnp.asarray(pa[v] - pb[u]), dctx)
    ref = layout.unpack_batch(np.asarray(acc), p.w)

    e = entries_per_step
    steps = s2exec.Stage2Runner._pack_parow_steps(idx, e)
    # entry conservation: every (pa, pb) entry lands in a step with its row
    got_entries = sorted((int(s[0]), int(u))
                         for s in steps for u in s[1:] if u != 0)
    assert got_entries == sorted(map(tuple, idx.tolist()))
    nsteps = steps.shape[0] + 2    # exercise whole-step padding too
    pad = np.zeros((2, 1 + e), np.int32)
    pad[:, 0] = PA - 1
    flat = np.concatenate([steps, pad], axis=0).reshape(-1)
    run = pallas_ops.make_replay_parow_executor(
        ctx, b, PA, PB, nsteps=nsteps, entries_per_step=e, interpret=True)
    got = layout.unpack_batch(np.asarray(
        run(jnp.asarray(acc0), jnp.asarray(pa), jnp.asarray(pb),
            jnp.asarray(flat))), p.w)
    for i in range(b):
        assert got[i] % n == ref[i] % n, i


def test_replay_stream_kernel_value_parity():
    """Manual-DMA-pipeline replay kernel (n_buffers row-pairs in flight,
    sequential acc chain) vs the sequential jnp reference — same entry/pad
    contract as the gather kernel."""
    import random
    import jax.numpy as jnp
    from tpu_ecm.limbs import jnp_ops, layout, pallas_ops
    n = 2545580083 * 2551628647
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    p = ctx.p
    b = 128
    rng = random.Random(5)
    PA, PB, T = 17, 9, 16

    def mk(rows):
        return np.stack([layout.pack_batch(
            [rng.randrange(n) for _ in range(b)], p.w, p.nw)
            for _ in range(rows)])

    pa, pb = mk(PA), mk(PB)
    pa[-1] = layout.broadcast_int(ctx.r_mod_n, p.w, p.nw, b)
    pb[0] = 0
    acc0 = layout.pack_batch([rng.randrange(n) for _ in range(b)], p.w, p.nw)
    # v-SORTED pa (the kernel re-fetches Pa only on row change), runs of
    # unequal length, plus trailing pad entries
    pav = np.sort(np.array([rng.randrange(PA - 1) for _ in range(T - 2)]))
    idx = np.stack([np.concatenate([pav, [PA - 1, PA - 1]]),
                    np.array([rng.randrange(1, PB) for _ in range(T - 2)]
                             + [0, 0])], 1).astype(np.int32)
    acc = jnp.asarray(acc0)
    for v, u in idx.tolist()[:T - 2]:
        acc = jnp_ops.mulmod(acc, jnp.asarray(pa[v] - pb[u]), dctx)
    ref = layout.unpack_batch(np.asarray(acc), p.w)
    packed = ((idx[:, 0] << 16) | idx[:, 1]).astype(np.int32)
    # unroll=1 is the plain dynamic loop; unroll=4 exercises the unrolled
    # main body with a 2-entry tail at count=T-2 (14 = 3*4 + 2) and a clean
    # split at count=T (16 = 4*4); unroll=3 gives a different tail phase
    # (14 = 4*3 + 2) and a 1-entry tail at count=T (16 = 5*3 + 1)
    # (unroll, n_acc, tree): plain loop, two unroll tail phases, the
    # independent-accumulator-chains variant (n_acc=3 at count=T-2 leaves
    # a 2-entry tail into chain 0; n_acc=4 at count=T splits 4x4), and
    # the value-tree bodies (tree=3 at count=T-2 leaves a 2-entry tail,
    # tree=4 at count=T splits clean; both must stay exact mod n under
    # the re-associated product)
    for unroll, n_acc, tree in ((1, 1, 0), (3, 1, 0), (4, 1, 0),
                                (1, 3, 0), (1, 4, 0), (1, 1, 3),
                                (1, 1, 4)):
        run = pallas_ops.make_replay_stream_executor(
            ctx, b, PA, PB, t_block=T, n_buffers=4, unroll=unroll,
            n_acc=n_acc, tree=tree, interpret=True)
        # idx[0] = live count: stop after the real entries (the two trailing
        # pads are never touched — exercises the dynamic loop bound); also
        # run with count = T to check pads multiply by one
        for count in (T - 2, T):
            flat = np.concatenate([[np.int32(count)], packed])
            got = layout.unpack_batch(np.asarray(
                run(jnp.asarray(acc0), jnp.asarray(pa), jnp.asarray(pb),
                    jnp.asarray(flat))), p.w)
            for i in range(b):
                assert got[i] % n == ref[i] % n, \
                    (count, unroll, n_acc, tree, i)


def test_replay_stream_packed_value_parity():
    """Dense-packed Pb variant of the stream kernel: pack_replay_rows wraps
    each row's (possibly lazy, possibly negative) value mod R into canonical
    32-bit words; the kernel unpacks with a sign-extended top digit.
    Results must be value-identical to the unpacked kernel/jnp reference —
    including rows stored in non-canonical digit form and a negative-value
    row (both occur in real pbx planes: mulmod outputs are lazy, diffs can
    be value-negative)."""
    import random
    import jax.numpy as jnp
    from tpu_ecm.limbs import jnp_ops, layout, pallas_ops
    n = 2545580083 * 2551628647
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    p = ctx.p
    b = 128
    rng = random.Random(11)
    PA, PB, T = 17, 9, 16

    def mk(rows):
        return np.stack([layout.pack_batch(
            [rng.randrange(n) for _ in range(b)], p.w, p.nw)
            for _ in range(rows)])

    pa, pb = mk(PA), mk(PB)
    pa[-1] = layout.broadcast_int(ctx.r_mod_n, p.w, p.nw, b)
    pb[0] = 0
    # de-canonicalize pb row 2 (value-preserving lazy form: dig[j] -= 2^w,
    # dig[j+1] += 1) and make row 1 a negative-VALUE row
    pb[2, 0] -= 1 << p.w
    pb[2, 1] += 1
    pb[1] = 0
    pb[1, 0] = -7
    # pack -> unpack roundtrip must reproduce every row's exact value
    pbp = np.asarray(pallas_ops.pack_replay_rows(ctx, jnp.asarray(pb)))
    assert pbp.shape == (PB, pallas_ops.packed_words(p), b)
    import jax
    unpack = jax.jit(pallas_ops._make_unpack(p))
    for r in range(PB):
        want = layout.unpack_batch(pb[r], p.w)
        got = layout.unpack_batch(np.asarray(unpack(jnp.asarray(pbp[r]))),
                                  p.w)
        assert got == want, r

    acc0 = layout.pack_batch([rng.randrange(n) for _ in range(b)], p.w, p.nw)
    pav = np.sort(np.array([rng.randrange(PA - 1) for _ in range(T - 2)]))
    idx = np.stack([np.concatenate([pav, [PA - 1, PA - 1]]),
                    np.array([rng.randrange(1, PB) for _ in range(T - 2)]
                             + [0, 0])], 1).astype(np.int32)
    acc = jnp.asarray(acc0)
    for v, u in idx.tolist()[:T - 2]:
        acc = jnp_ops.mulmod(acc, jnp.asarray(pa[v] - pb[u]), dctx)
    ref = layout.unpack_batch(np.asarray(acc), p.w)
    packed = ((idx[:, 0] << 16) | idx[:, 1]).astype(np.int32)
    for unroll in (1, 4):
        run = pallas_ops.make_replay_stream_executor(
            ctx, b, PA, PB, t_block=T, n_buffers=3, unroll=unroll,
            packed=True, interpret=True)
        for count in (T - 2, T):
            flat = np.concatenate([[np.int32(count)], packed])
            got = layout.unpack_batch(np.asarray(
                run(jnp.asarray(acc0), jnp.asarray(pa), jnp.asarray(pbp),
                    jnp.asarray(flat))), p.w)
            for i in range(b):
                assert got[i] % n == ref[i] % n, (count, unroll, i)


def test_replay_resident_kernel_value_parity():
    """VMEM-resident replay kernel (manual-DMA Pb slab + dynamic row index)
    vs the sequential jnp reference — same contract as the gather kernel,
    with idx column 1 in LOCAL slab coordinates (row 0 = zero pad row)."""
    import random
    import jax.numpy as jnp
    from tpu_ecm.limbs import jnp_ops, layout, pallas_ops
    n = 2545580083 * 2551628647
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    p = ctx.p
    b = 128
    rng = random.Random(7)
    PA, PB, T = 17, 9, 16

    def mk(rows):
        return np.stack([layout.pack_batch(
            [rng.randrange(n) for _ in range(b)], p.w, p.nw)
            for _ in range(rows)])

    pa, slab = mk(PA), mk(PB)
    pa[-1] = layout.broadcast_int(ctx.r_mod_n, p.w, p.nw, b)
    slab[0] = 0
    acc0 = layout.pack_batch([rng.randrange(n) for _ in range(b)], p.w, p.nw)
    idx = np.stack([np.array([rng.randrange(PA - 1) for _ in range(T)]),
                    np.array([rng.randrange(1, PB) for _ in range(T)])],
                   1).astype(np.int32)
    idx[-2:] = [PA - 1, 0]     # exercise the pad convention in-kernel
    acc = jnp.asarray(acc0)
    for v, u in idx.tolist():
        acc = jnp_ops.mulmod(acc, jnp.asarray(pa[v] - slab[u]), dctx)
    ref = layout.unpack_batch(np.asarray(acc), p.w)
    run = pallas_ops.make_replay_resident_executor(
        ctx, b, PA, PB, t_block=T, entries_per_step=8, interpret=True)
    got = layout.unpack_batch(np.asarray(
        run(jnp.asarray(acc0), jnp.asarray(pa), jnp.asarray(slab),
            jnp.asarray(idx))), p.w)
    for i in range(b):
        assert got[i] % n == ref[i] % n, i


def test_stage2_pa_group_env_value_parity(monkeypatch):
    """TPU_ECM_PA_GROUP (the HBM-peak group-size override, added after the
    513-bit/2048-curve init OOM) must not change results: accumulators and
    the factor set are grouping-independent for any group size, including
    sizes that don't divide umax or the giant-step count."""
    n = P61
    b1, b2 = 300, 4000
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    sigmas = [40 + i for i in range(8)]
    curves = [suyama.build_one_curve(ctx, s) for s in sigmas]
    p = ctx.p
    pt = np.stack([layout.pack_batch([c.x_mont for c in curves], p.w, p.nw),
                   layout.pack_batch([c.z_mont for c in curves], p.w, p.nw)])
    s_const = jnp.asarray(
        layout.pack_batch([c.s_mont for c in curves], p.w, p.nw))
    sp = s2plan.make_stage2_params(b1, b2)
    primes = primes_range(b1, b2 + 1000)
    map_v, map_u, amin0, _ = s2plan.pair(sp, primes, b1, b2)

    def run(pa_group=None):
        if pa_group is None:
            monkeypatch.delenv("TPU_ECM_PA_GROUP", raising=False)
        else:
            monkeypatch.setenv("TPU_ECM_PA_GROUP", str(pa_group))
        runner = s2exec.Stage2Runner(ctx, dctx, sp, jnp.asarray(pt), s_const,
                                     b1, use_pallas=False)
        runner.init()
        runner.run_chunk(map_v, map_u, amin0)
        return runner.result()

    ref = run()
    for g in (37, 64, 1000):
        got = run(g)
        assert got.acc == ref.acc
        assert got.factors == ref.factors
        assert got.paired == ref.paired


def test_stage2_fused_group_pipeline_parity(monkeypatch):
    """TPU_ECM_FUSED=1 (default on the pallas path) fuses each init /
    giant-step group's chain + gather + mask + prefix and suffix-apply +
    scatter into single jitted calls (dispatch economy through the tunnel,
    ~13.7 ms/call).  The fused bodies inline the SAME cached executors the
    eager composition calls, so accumulators, factor harvests, and pair
    counts must be bit-identical to TPU_ECM_FUSED=0."""
    n = P61
    b1, b2 = 300, 4000
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    curves = [suyama.build_one_curve(ctx, 40 + i) for i in range(128)]
    p = ctx.p
    pt = np.stack([layout.pack_batch([c.x_mont for c in curves], p.w, p.nw),
                   layout.pack_batch([c.z_mont for c in curves], p.w, p.nw)])
    s_const = jnp.asarray(
        layout.pack_batch([c.s_mont for c in curves], p.w, p.nw))
    sp = s2plan.make_stage2_params(b1, b2)
    primes = primes_range(b1, b2 + 1000)
    map_v, map_u, amin0, _ = s2plan.pair(sp, primes, b1, b2)

    def run(fused):
        monkeypatch.setenv("TPU_ECM_FUSED", fused)
        runner = s2exec.Stage2Runner(ctx, dctx, sp, jnp.asarray(pt), s_const,
                                     b1, use_pallas=True, interpret=True)
        assert runner.fused == (fused != "0")
        runner.init()
        runner.run_chunk(map_v, map_u, amin0)
        return runner.result(), runner.ptadds, runner.numinv

    ref, ref_adds, ref_inv = run("0")
    got, got_adds, got_inv = run("1")
    assert got.acc == ref.acc
    assert got.factors == ref.factors
    assert got.paired == ref.paired
    assert got_adds == ref_adds
    assert got_inv == ref_inv


@pytest.mark.slow
def test_stage2_replay_resident_runner_parity(monkeypatch):
    """Full Stage2Runner in resident-replay mode with the slab budget forced
    to one Pb row per slab (maximum partitioning: every slab remap, pad, and
    per-slab call path exercised) must produce the same accumulators as
    gather mode."""
    n = P61
    b1, b2 = 300, 4000
    ctx = params.make_monty(n)
    dctx = jnp_ops.device_ctx(ctx)
    sigmas = [40 + i for i in range(128)]
    curves = [suyama.build_one_curve(ctx, s) for s in sigmas]
    p = ctx.p
    pt = np.stack([layout.pack_batch([c.x_mont for c in curves], p.w, p.nw),
                   layout.pack_batch([c.z_mont for c in curves], p.w, p.nw)])
    s_const = jnp.asarray(
        layout.pack_batch([c.s_mont for c in curves], p.w, p.nw))
    sp = s2plan.make_stage2_params(b1, b2)
    primes = primes_range(b1, b2 + 1000)
    map_v, map_u, amin0, _ = s2plan.pair(sp, primes, b1, b2)

    def run(mode, slab_mb=None):
        monkeypatch.setenv("TPU_ECM_REPLAY", mode)
        # small replay blocks for BOTH modes: with cap=1 slabs, every slab's
        # (few) entries pay a full padded t_block call — 32 keeps the
        # interpret-mode cost sane without changing what's exercised
        monkeypatch.setenv("TPU_ECM_REPLAY_BLOCK", "32")
        if slab_mb is None:
            monkeypatch.delenv("TPU_ECM_REPLAY_SLAB_MB", raising=False)
        else:
            monkeypatch.setenv("TPU_ECM_REPLAY_SLAB_MB", slab_mb)
        runner = s2exec.Stage2Runner(ctx, dctx, sp, jnp.asarray(pt), s_const,
                                     b1, use_pallas=True, interpret=True)
        runner.init()
        runner.run_chunk(map_v, map_u, amin0)
        return runner.result()

    ref = run("gather")
    got = run("resident", "0")    # cap=1: one Pb row per slab
    assert got.acc == ref.acc
    assert got.factors == ref.factors
    assert got.paired == ref.paired

    # stream mode with dense-packed Pb rows: canonical-mod-R repack of the
    # pbx planes must leave every canonical accumulator (and factor find)
    # identical — the value-exactness contract of pack_replay_rows
    monkeypatch.setenv("TPU_ECM_REPLAY_PACKED", "1")
    got_pk = run("stream")
    assert got_pk.acc == ref.acc
    assert got_pk.factors == ref.factors
    assert got_pk.paired == ref.paired

    # stream mode with 3 independent accumulator chains (and packing off):
    # per-block chain splits + tail entries + the final combine must keep
    # canonical accumulators identical (R-power bookkeeping cancels)
    monkeypatch.delenv("TPU_ECM_REPLAY_PACKED", raising=False)
    monkeypatch.setenv("TPU_ECM_REPLAY_NACC", "3")
    got_na = run("stream")
    assert got_na.acc == ref.acc
    assert got_na.factors == ref.factors
    assert got_na.paired == ref.paired


def test_pair_fuzz_random_bounds():
    """Seeded fuzz over random (B1, B2): the pairmap must cover every prime
    in (B1, B2] for any D/U the cost model picks, including awkward window
    alignments (tiny ranges, B2 barely past B1, huge ratios) — the
    randomized analog of the reference's always-on testcoverage audit
    (/root/reference/ecm.c:2883-2900)."""
    import random
    rng = random.Random(0x5742)
    for trial in range(24):
        b1 = rng.randrange(250, 60000)
        b2 = b1 + rng.choice([
            rng.randrange(40, 400),            # near-empty windows
            rng.randrange(400, 20 * b1),       # typical
            rng.randrange(20 * b1, 120 * b1),  # huge ratio
        ])
        sp = s2plan.make_stage2_params(b1, b2)
        primes = primes_range(b1, b2 + 1000)
        map_v, map_u, amin0, stats = s2plan.pair(sp, primes, b1, b2)
        missing = s2plan.audit_coverage(sp, map_v, map_u, amin0,
                                        primes, b1, b2)
        assert missing == [], (
            f"trial {trial}: b1={b1} b2={b2} D={sp.D} U={sp.U} "
            f"uncovered {missing[:5]}")
