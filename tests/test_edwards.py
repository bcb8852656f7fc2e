"""Edwards a=-1 stage 1: recoding, oracle, engine parity, and e2e factoring.

Pinned hits (point orders searched offline with the BSGS oracle, mod
P35 = 34359738421):
  sigma=46: point order 2^7*5*11*29*31*61*89  -> stage-1 hit at B1=300
  sigma=29: point order 2^6*3*11*17^2*41*1373 -> stage-2 hit (1373 in
            (300, 10000])
Every searched order was divisible by 4 — the curve family's guaranteed
Z/2 x Z/2 torsion (curve/edwards.py)."""

import random

import numpy as np
import pytest

from tpu_ecm import driver
from tpu_ecm.curve import edwards as ed

P35 = 34359738421
P36 = 68719476767
N71 = P35 * P36


def _cfg(tmp_path, **kw):
    kw.setdefault("save_b1_path", str(tmp_path / "save_b1.txt"))
    kw.setdefault("checkpoint_path", None)
    kw.setdefault("results_path", str(tmp_path / "r.txt"))
    kw.setdefault("cache_dir", str(tmp_path / "cache"))
    kw.setdefault("verbose", 0)
    kw.setdefault("curve_mode", "edwards")
    return driver.RunConfig(**kw)


def test_wnaf_roundtrip_and_property():
    rng = random.Random(7)
    for bits in (13, 64, 65, 127, 2000):
        for _ in range(10):
            s = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
            dg = ed.wnaf_digits(s, 6)
            assert ed.digits_to_int(dg) == s
            nz = np.nonzero(dg)[0]
            assert all(b - a >= 6 for a, b in zip(nz, nz[1:]))
            assert all(abs(int(dg[i])) < 32 and int(dg[i]) % 2 for i in nz)


def test_tape_reconstructs_scalar():
    rng = random.Random(11)
    for _ in range(20):
        s = rng.getrandbits(300) | 1
        tape, lead = ed.tape_from_digits(ed.wnaf_digits(s, 6))
        acc = int(lead)
        for op, arg in tape:
            op, arg = int(op), int(arg)
            if op in (ed.ED_DBL, ed.ED_DBLT):
                acc *= 2
            elif op == ed.ED_ADD:
                acc += 2 * arg + 1
            elif op == ed.ED_SUB:
                acc -= 2 * arg + 1
        assert acc == s
        # every add is immediately preceded by a T-producing doubling
        for i in range(len(tape)):
            if tape[i, 0] in (ed.ED_ADD, ed.ED_SUB):
                assert tape[i - 1, 0] == ed.ED_DBLT


class _IntCtx:
    def __init__(self, n):
        self.n_int = n

    def to_mont_int(self, v):
        return v


def test_construction_and_oracle_group_law():
    p = (1 << 61) - 1
    c = ed.build_one_curve(_IntCtx(p), 11)

    def on_curve(P):
        X, Y, Z, T = P
        lhs = (Y * Y - X * X) % p * (Z * Z) % p
        rhs = (pow(Z, 4, p) + c.d * X * X % p * Y * Y) % p
        assert lhs == rhs and (X * Y - Z * T) % p == 0

    P = (c.x0, c.y0, 1, c.x0 * c.y0 % p)
    on_curve(P)
    # -1/d is a square (the rational full-2-torsion condition)
    invd = pow(-c.d % p, -1, p)
    assert pow(invd, (p - 1) // 2, p) == 1
    for k in (2, 3, 97, 12345, 987654321987654321):
        Q = ed.oracle_scalar_mul(k, c.x0, c.y0, c.d, p)
        on_curve(Q)
        R = None
        for b in bin(k)[2:]:
            if R is None:
                R = P
                continue
            R = ed.oracle_dbl(R, p)
            if b == "1":
                R = ed.oracle_add_d(R, P, c.d, p)
        zi, zj = pow(Q[2], -1, p), pow(R[2], -1, p)
        assert (Q[0] * zi - R[0] * zj) % p == 0
        assert (Q[1] * zi - R[1] * zj) % p == 0


def test_jnp_engine_matches_oracle():
    import jax.numpy as jnp
    from tpu_ecm.curve import edops
    from tpu_ecm.limbs import jnp_ops, layout
    from tpu_ecm.primes.sieve import primes_range

    ctx = driver.prepare_context(N71)
    dctx = jnp_ops.device_ctx(ctx)
    b1 = 3000
    primes = primes_range(0, b1 + 100)
    s = ed.stage1_scalar(primes, b1)
    tape, lead = ed.cached_stage1_tape(primes, b1, None)
    sigmas = [10, 11, 12, 13]
    curves = [ed.build_one_curve(ctx, sg) for sg in sigmas]
    pts, cached = ed.build_batch_tables(ctx, curves)
    acc0 = ed.init_accumulator(ctx, pts, lead)
    acc = np.asarray(edops.run_tape(jnp.asarray(acc0), jnp.asarray(tape),
                                    jnp.asarray(cached), dctx))
    n = ctx.n_int
    for i, c in enumerate(curves):
        got = [ctx.from_mont_int(layout.unpack_batch(acc[k], ctx.p.w)[i] % n)
               for k in range(4)]
        Q = ed.oracle_scalar_mul(s, c.x0, c.y0, c.d, n)
        assert got[0] * Q[2] % n == Q[0] * got[2] % n
        assert got[1] * Q[2] % n == Q[1] * got[2] % n


def test_pallas_interpret_bit_identical_to_jnp():
    import jax.numpy as jnp
    from tpu_ecm.curve import edops
    from tpu_ecm.limbs import jnp_ops, pallas_ops
    from tpu_ecm.primes.sieve import primes_range

    ctx = driver.prepare_context(N71)
    dctx = jnp_ops.device_ctx(ctx)
    primes = primes_range(0, 2100)
    tape, lead = ed.cached_stage1_tape(primes, 2000, None)
    curves = [ed.build_one_curve(ctx, sg) for sg in range(10, 138)]
    pts, cached = ed.build_batch_tables(ctx, curves)
    acc0 = ed.init_accumulator(ctx, pts, lead)
    a_jnp = np.asarray(edops.run_tape(jnp.asarray(acc0), jnp.asarray(tape),
                                      jnp.asarray(cached), dctx))
    run = pallas_ops.make_edwards_executor(ctx, 128, cached.shape[0],
                                           chunk=256, interpret=True)
    a_pal = np.asarray(run(acc0, tape, cached))
    assert np.array_equal(a_jnp, a_pal)


def test_e2e_stage1_find(tmp_path):
    cfg = _cfg(tmp_path, n=N71, curves=4, b1=300, b2=300, sigma=44)
    res = driver.ECMDriver(cfg).run()
    hit = [h for h in res.factors if h.factor == P35]
    assert hit and hit[0].stage == 1 and hit[0].sigma == 46, res.factors


def test_e2e_stage2_find(tmp_path):
    cfg = _cfg(tmp_path, n=N71, curves=4, b1=300, b2=10000, sigma=28)
    res = driver.ECMDriver(cfg).run()
    hit = [h for h in res.factors if h.factor == P35]
    assert hit and hit[0].stage == 2 and hit[0].sigma == 29, res.factors


def test_chunked_stage1_checkpoints_and_same_point(tmp_path):
    """Edwards stage 1 split over prime chunks (the reference's 1e8-prime
    checkpoint cadence, /root/reference/ecm.c:1236-1312): checkpoint.txt is
    appended per chunk boundary, and the final point is the SAME affine
    point as the single-chunk run (the chunk-boundary normalization changes
    the projective representative, not the point)."""
    from tpu_ecm.io import savefile
    common = dict(n=N71, curves=4, b1=1500, b2=1500, sigma=9)
    one = driver.ECMDriver(_cfg(tmp_path, **common)).run()
    ck = str(tmp_path / "checkpoint.txt")
    chunked = driver.ECMDriver(_cfg(
        tmp_path, prime_chunk=500, checkpoint_path=ck,
        save_b1_path=str(tmp_path / "s2.txt"),
        results_path=str(tmp_path / "r2.txt"), **common)).run()
    # checkpoints: 2 boundaries (500, 1000) x 4 curves, Edwards-tagged,
    # monotonically increasing B1 labels
    with open(ck) as f:
        recs = list(savefile.parse_records(f))
    assert len(recs) == 8
    assert all(r.n == N71 for r in recs)
    b1s = sorted({r.b1 for r in recs})
    assert len(b1s) == 2 and b1s[-1] <= 1500
    # same affine final point per sigma: x = U/W must agree
    for (s1, u1, w1), (s2, u2, w2) in zip(one.stage1_residues,
                                          chunked.stage1_residues):
        assert s1 == s2
        assert u1 * w2 % N71 == u2 * w1 % N71, s1
    # and the checkpointed mid-points are the true [s_c0]P (int oracle)
    for r in [r for r in recs if r.b1 == b1s[0]][:2]:
        c = ed.build_one_curve(_IntCtx(N71), r.sigma)
        s = ed.stage1_scalar(
            [p for p in range(2, 500) if _is_prime(p)], 1500)
        Q = ed.oracle_scalar_mul(s, c.x0, c.y0, c.d, N71)
        u, w = ed.to_montgomery_xz(Q, N71)
        assert r.x * w % N71 == r.z * u % N71, r.sigma


def _is_prime(p):
    return p > 1 and all(p % q for q in range(2, int(p ** 0.5) + 1))


def test_savefile_resumable_montgomery_point(tmp_path):
    """Edwards-mode save_b1 records carry the *Montgomery-equivalent* (X, Z)
    so foreign GMP-ECM stage-2 resume keeps working; PROGRAM tags the curve
    family.  Check X/Z against the oracle + birational map."""
    from tpu_ecm.io import savefile
    from tpu_ecm.primes.sieve import primes_range

    sv = str(tmp_path / "save_b1.txt")
    cfg = _cfg(tmp_path, n=N71, curves=4, b1=500, b2=500, sigma=10,
               save_b1_path=sv)
    driver.ECMDriver(cfg).run()
    with open(sv) as f:
        recs = list(savefile.parse_records(f))
    assert len(recs) == 4 and all(r.program == "AVX-ECM-ED" for r in recs)
    primes = primes_range(0, 600)
    s = ed.stage1_scalar(primes, 500)
    for r in recs:
        c = ed.build_one_curve(_IntCtx(N71), r.sigma)
        Q = ed.oracle_scalar_mul(s, c.x0, c.y0, c.d, N71)
        u, w = ed.to_montgomery_xz(Q, N71)
        assert r.x * w % N71 == r.z * u % N71   # projective equality
