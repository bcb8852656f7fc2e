"""RNS/MXU stage-1 engine: executor exactness (jnp + Pallas interpret, incl.
the digit-split bf16 matmul path at large K), sharded parity, driver
end-to-end, and auto-dispatch.  The split path is the MXU formulation — the
same base-extension dots the TPU kernel runs (limbs/rns.py docstring)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moduli import N256
from tpu_ecm import driver, params
from tpu_ecm.curve import oracle, prac, suyama
from tpu_ecm.limbs import rns, rns_exec
from tpu_ecm.primes import primes_range


def _prp(rng, bits):
    while True:
        c = rng.getrandbits(bits) | 1 | (1 << (bits - 1))
        if all(pow(a, c - 1, c) == 1 for a in (2, 3, 5, 7, 11)):
            return c


def _setup(n, b1, nburn, cw=13):
    ctx = params.make_monty(n)
    h = rns.make_rns(ctx, cw=cw)
    curves = [suyama.build_one_curve(ctx, 9000 + i) for i in range(nburn)]
    tape = prac.stage1_tape(primes_range(0, b1), b1)
    conv = ctx.from_mont_int
    pts, sc = rns_exec.init_state(
        h, [conv(c.x_mont) for c in curves],
        [conv(c.z_mont) for c in curves],
        [conv(c.s_mont) for c in curves])
    return ctx, h, curves, tape, pts, sc


def _assert_oracle(ctx, h, curves, tape, pts_out, idxs):
    xs, zs = rns_exec.extract_point(h, np.asarray(pts_out))
    for i in idxs:
        slots = oracle.run_tape_int(ctx, tape.tolist(), curves[i].x_mont,
                                    curves[i].z_mont, curves[i].s_mont)
        ex, ez = slots[0]
        assert xs[i] == ctx.from_mont_int(ex)
        assert zs[i] == ctx.from_mont_int(ez)


def test_rns_pallas_tape_small():
    """Pallas kernel (interpret) == jnp scan == int oracle, direct-dot K."""
    ctx, h, curves, tape, pts, sc = _setup(N256, 200, 128)
    out_j = jax.jit(rns_exec.run_tape)(jnp.asarray(pts), jnp.asarray(tape),
                                       jnp.asarray(sc), h.dev)
    run = rns_exec.make_rns_tape_executor(h, 128, chunk=64, interpret=True)
    out_p = run(pts, tape, sc)
    assert np.array_equal(np.asarray(out_j[0]), np.asarray(out_p[0]))
    _assert_oracle(ctx, h, curves, tape, out_p, [0, 5, 127])


def test_rns_pallas_tape_split_1536bit():
    """The large-moduli regime: K > 127 forces the 7-bit digit-split bf16
    matmul extensions; kernel output must stay bit-exact vs the oracle."""
    rng = random.Random(11)
    n = _prp(rng, 768) * _prp(rng, 768)
    ctx, h, curves, tape, pts, sc = _setup(n, 100, 128)
    assert h.dev.use_split and h.K >= 128
    run = rns_exec.make_rns_tape_executor(h, 128, chunk=64, interpret=True)
    out_p = run(pts, tape, sc)
    _assert_oracle(ctx, h, curves, tape, out_p, [0, 17, 127])


def test_rns_executor_sharded_parity():
    """shard_mapped RNS kernel over the 8-device CPU mesh == single-device
    (the multi-chip contract for the MXU engine)."""
    from tpu_ecm.parallel import mesh as _mesh
    ctx, h, curves, tape, pts, sc = _setup(N256, 150, 8 * 128)
    sh = _mesh.Sharder(jax.devices()[:8])
    run1 = rns_exec.make_rns_tape_executor(h, 8 * 128, chunk=64,
                                           interpret=True)
    out1 = np.asarray(run1(pts, tape, sc))
    runs = rns_exec.make_rns_tape_executor(h, 8 * 128, chunk=64,
                                           interpret=True, sharder=sh)
    outs = np.asarray(runs(sh.device_put_state(pts),
                           tape, sh.device_put_plane(sc)))
    assert np.array_equal(out1, outs)


def _cfg(tmp_path, **kw):
    kw.setdefault("save_b1_path", str(tmp_path / "save_b1.txt"))
    kw.setdefault("checkpoint_path", str(tmp_path / "checkpoint.txt"))
    kw.setdefault("results_path", str(tmp_path / "ecm_results.txt"))
    kw.setdefault("cache_dir", str(tmp_path / "cache"))
    kw.setdefault("verbose", 0)
    return driver.RunConfig(**kw)


def test_rns_engine_end_to_end(tmp_path):
    """Full driver with engine='rns': stage-1 find, savefile, digit-plane
    stage-2 handoff find — same pinned sigmas as the digit-engine e2e."""
    P35, P36 = 34359738421, 68719476767
    cfg = _cfg(tmp_path, n=P35 * P36, curves=4, b1=300, b2=10000, sigma=172,
               engine="rns")
    res = driver.ECMDriver(cfg).run()
    assert any(h.factor == P35 and h.stage == 1 and h.sigma == 174
               for h in res.factors)
    cfg2 = _cfg(tmp_path, n=P35 * P36, curves=4, b1=300, b2=10000, sigma=110,
                engine="rns", stop_on_factor=False)
    res2 = driver.ECMDriver(cfg2).run()
    assert any(h.factor == P35 and h.stage == 2 and h.sigma == 112
               for h in res2.factors)


def test_rns_engine_matches_digit_engine(tmp_path):
    """Same run, both engines: identical stage-1 residues (two independent
    arithmetic stacks, one canonical answer)."""
    n = N256
    r1 = driver.ECMDriver(_cfg(tmp_path, n=n, curves=4, b1=500, b2=500,
                               sigma=40, engine="digit")).run()
    r2 = driver.ECMDriver(_cfg(tmp_path, n=n, curves=4, b1=500, b2=500,
                               sigma=40, engine="rns")).run()
    assert r1.stage1_residues == r2.stage1_residues


def test_rns_engine_pallas_stage2(tmp_path):
    """engine='rns' with the Pallas executors (interpret): the RNS stage-2
    kernels (chain/prefix/apply-inverse/replay) must reproduce the jnp
    fallback's factor finds exactly."""
    P35, P36 = 34359738421, 68719476767
    cfg = _cfg(tmp_path, n=P35 * P36, curves=128, b1=300, b2=10000,
               sigma=110, engine="rns", use_pallas=True,
               pallas_interpret=True, batch=128, stop_on_factor=False)
    res = driver.ECMDriver(cfg).run()
    got = {(h.factor, h.stage, h.sigma) for h in res.factors}
    cfg2 = _cfg(tmp_path, n=P35 * P36, curves=128, b1=300, b2=10000,
                sigma=110, engine="rns", use_pallas=False, batch=128,
                stop_on_factor=False)
    res2 = driver.ECMDriver(cfg2).run()
    assert got == {(h.factor, h.stage, h.sigma) for h in res2.factors}
    assert (P35, 2, 112) in got


@pytest.mark.slow
def test_rns_engine_pallas_stage2_sharded(tmp_path):
    """engine='rns' + Sharder: all five RNS Pallas executors (tape, chain,
    prefix, apply-inverse, replay) shard_mapped over a 2-device mesh must
    give the same factor set as the unsharded jnp run — the multi-chip
    contract extended to the RNS stage-2 path."""
    from tpu_ecm.parallel import mesh as _mesh
    P35, P36 = 34359738421, 68719476767
    sh = _mesh.Sharder(jax.devices()[:2])
    cfg = _cfg(tmp_path, n=P35 * P36, curves=256, b1=300, b2=10000,
               sigma=110, engine="rns", use_pallas=True,
               pallas_interpret=True, batch=256, sharder=sh,
               stop_on_factor=False)
    got = {(h.factor, h.stage, h.sigma)
           for h in driver.ECMDriver(cfg).run().factors}
    cfg2 = _cfg(tmp_path, n=P35 * P36, curves=256, b1=300, b2=10000,
                sigma=110, engine="rns", use_pallas=False, batch=256,
                stop_on_factor=False)
    ref = {(h.factor, h.stage, h.sigma)
           for h in driver.ECMDriver(cfg2).run().factors}
    assert got == ref
    assert (P35, 2, 112) in got


def test_rns_replay_stream_kernel_value_parity():
    """RNS stream replay kernel (manual DMA pipeline, packed idx, dynamic
    count) vs the jnp replay_segment reference — the RNS twin of the digit
    kernel's contract: pads multiply by sub(one, 0) (a multiple-of-N
    offset), short counts stop early, unroll tails stay exact mod n."""
    ctx, h, curves, tape, pts, sc = _setup(N256, 60, 128)
    del tape, sc
    rng = random.Random(7)
    n = ctx.n_int
    b = 128
    # T - 2 real entries = 8: the jnp reference's balanced product tree
    # needs a power-of-two count (exec.py's jnp path pads to one)
    PA, PB, T = 9, 7, 10

    def mk(rows):
        return np.stack([h.pack([h.to_mont_int(rng.randrange(n))
                                 for _ in range(b)]) for _ in range(rows)])

    pa, pb = mk(PA), mk(PB)
    pa[-1] = h.pack([h.to_mont_int(1)] * b)
    pb[0] = 0
    acc0 = h.pack([h.to_mont_int(rng.randrange(n)) for _ in range(b)])
    pav = np.sort(np.array([rng.randrange(PA - 1) for _ in range(T - 2)]))
    idx = np.stack([np.concatenate([pav, [PA - 1, PA - 1]]),
                    np.array([rng.randrange(1, PB) for _ in range(T - 2)]
                             + [0, 0])], 1).astype(np.int32)
    ref = rns_exec.replay_segment(jnp.asarray(acc0), jnp.asarray(pa),
                                  jnp.asarray(pb),
                                  jnp.asarray(idx[:T - 2]), h.dev)
    want = [v % n for v in h.unpack(np.asarray(ref))]
    packed = ((idx[:, 0] << 16) | idx[:, 1]).astype(np.int32)
    for unroll, n_acc in ((1, 1), (4, 1), (1, 3)):
        run = rns_exec.make_rns_replay_stream_executor(
            h, b, PA, PB, t_block=T, n_buffers=3, unroll=unroll,
            n_acc=n_acc, interpret=True)
        for count in (T - 2, T):
            flat = np.concatenate([[np.int32(count)], packed])
            got = [v % n for v in h.unpack(np.asarray(
                run(jnp.asarray(acc0), jnp.asarray(pa), jnp.asarray(pb),
                    jnp.asarray(flat))))]
            assert got == want, (count, unroll, n_acc)
    # the once-per-runner prepadded Pb table (RnsOps.prepare_replay_pbx,
    # the sublane pad hoisted out of the per-call wrapper) must be
    # value-identical to passing the raw table
    ops = rns_exec.RnsOps(h)
    pb_pre = ops.prepare_replay_pbx(jnp.asarray(pb))
    assert pb_pre.shape[1] % 8 == 0
    run = rns_exec.make_rns_replay_stream_executor(
        h, b, PA, PB, t_block=T, n_buffers=3, interpret=True)
    flat = np.concatenate([[np.int32(T - 2)], packed])
    got = [v % n for v in h.unpack(np.asarray(
        run(jnp.asarray(acc0), jnp.asarray(pa), pb_pre,
            jnp.asarray(flat))))]
    assert got == want


def test_rns_engine_1536bit_stage2_find(tmp_path):
    """Large-moduli end-to-end: a 1535-bit input (P35 x P1500) on the RNS
    engine — stage-1 AND stage-2 arithmetic run the split/MXU formulation —
    must surface the P35 at the same pinned sigma as the small case (the
    curve order mod P35 does not depend on the cofactor)."""
    rng = random.Random(5)
    P35 = 34359738421
    n = P35 * _prp(rng, 1500)
    cfg = _cfg(tmp_path, n=n, curves=4, b1=300, b2=10000, sigma=110,
               engine="rns", stop_on_factor=False)
    d = driver.ECMDriver(cfg)
    assert d._rns_host.dev.use_split
    res = d.run()
    assert any(h.factor % P35 == 0 and h.stage == 2 and h.sigma == 112
               for h in res.factors), res.factors


@pytest.mark.slow
def test_huge_modulus_host_only_geometry_routes_to_rns(tmp_path):
    """> ~2000 bits no int32 digit-plane radix exists: make_monty must fall
    back to a host-only geometry (device_ok=False) instead of raising, the
    driver must auto-route to the RNS engine, and an explicit digit-engine
    request must fail with a clear error.  (Acceptance row 21 is a
    2355-bit input the reference handles via its DIGITBITS=32 build,
    /root/reference/test.csh:23; here the MXU engine is that regime's
    path — full find-parity is covered by the TPU_ECM_SLOW test below
    and was validated on hardware, BENCH_NOTES round 3.)"""
    rng = random.Random(5)
    n = 34359738421 * _prp(rng, 2320)          # ~2355 bits, like row 21
    ctx = params.make_monty(n)
    assert not ctx.p.device_ok
    assert ctx.from_mont_int(ctx.to_mont_int(12345)) == 12345
    cfg = _cfg(tmp_path, n=n, curves=1, b1=100, b2=100)
    d = driver.ECMDriver(cfg)
    assert d.engine == "rns" and d._rns_host is not None
    with pytest.raises(ValueError, match="digit"):
        driver.ECMDriver(_cfg(tmp_path, n=n, curves=1, b1=100,
                              engine="digit"))
    with pytest.raises(ValueError, match="RNS"):
        driver.ECMDriver(_cfg(tmp_path, n=n, curves=1, b1=100,
                              curve_mode="edwards"))


@pytest.mark.skipif(not __import__("os").environ.get("TPU_ECM_SLOW"),
                    reason="~5-10 min CPU-interpret run: TPU_ECM_SLOW=1")
def test_huge_modulus_stage2_find(tmp_path):
    """2355-bit end-to-end on the RNS engine: the pinned P35 stage-2 hit
    must surface (run on hardware 2026-08-19, 288 s wall, sigma 112/132/...
    all found; this gate keeps the CPU suite fast)."""
    rng = random.Random(5)
    P35 = 34359738421
    n = P35 * _prp(rng, 2320)
    cfg = _cfg(tmp_path, n=n, curves=4, b1=300, b2=10000, sigma=110,
               stop_on_factor=False)
    res = driver.ECMDriver(cfg).run()
    assert any(h.factor % P35 == 0 and h.stage == 2 and h.sigma == 112
               for h in res.factors), res.factors


def test_rns_engine_resume_stage2(tmp_path):
    """A >=1400-bit savefile resume rides the RNS stage-2 path (the same
    engine a fresh run auto-dispatches to) and finds the pinned factor."""
    rng = random.Random(5)
    P35 = 34359738421
    n = P35 * _prp(rng, 1500)
    save = tmp_path / "save_b1.txt"
    cfg = _cfg(tmp_path, n=n, curves=4, b1=300, b2=300, sigma=110,
               save_b1_path=str(save), stop_on_factor=False)
    d = driver.ECMDriver(cfg)
    assert d.engine == "rns"
    d.run()
    res = driver.resume_stage2(str(save), 10000, verbose=0,
                               results_path=str(tmp_path / "r.txt"),
                               cache_dir=str(tmp_path / "cache"))
    assert any(h.factor % P35 == 0 and h.stage == 2 and h.sigma == 112
               for h in res.factors), res.factors


def test_engine_auto_dispatch(tmp_path):
    rng = random.Random(3)
    big = _prp(rng, 768) * _prp(rng, 768)
    d1 = driver.ECMDriver(_cfg(tmp_path, n=N256, curves=1, b1=100))
    assert d1.engine == "digit"
    d2 = driver.ECMDriver(_cfg(tmp_path, n=big, curves=1, b1=100))
    assert d2.engine == "rns"
    with pytest.raises(ValueError):
        driver.ECMDriver(_cfg(tmp_path, n=N256, curves=1, b1=100,
                              engine="rns", curve_mode="edwards"))
