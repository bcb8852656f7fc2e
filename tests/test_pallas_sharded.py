"""Multi-chip execution of the Pallas engine: every Mosaic executor (tape,
chain, prefix, apply-inverse, replay) shard_mapped over a ('curves',) mesh
must be bit-identical to its single-device run — the multi-chip analog of
the reference running its hot loop on every pthread
(/root/reference/threadpool.c:202-397, main.c:585-589).  Interpret mode on
the virtual CPU mesh; the kernels are the same ones the TPU compiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ecm import params
from tpu_ecm.curve import ops, prac, suyama
from tpu_ecm.limbs import jnp_ops, layout, pallas_ops
from tpu_ecm.parallel import Sharder
from tpu_ecm.primes import primes_range

N64 = 2545580083 * 2551628647
NDEV = 2
B = NDEV * 128


@pytest.fixture(scope="module")
def env():
    ctx = params.make_monty(N64)
    dctx = jnp_ops.device_ctx(ctx)
    sharder = Sharder(jax.devices()[:NDEV])
    curves = [suyama.build_one_curve(ctx, 100 + i) for i in range(B)]
    p = ctx.p
    pts = np.zeros((ops.NUM_SLOTS, 2, p.nw, B), dtype=np.int32)
    pts[0, 0] = layout.pack_batch([c.x_mont for c in curves], p.w, p.nw)
    pts[0, 1] = layout.pack_batch([c.z_mont for c in curves], p.w, p.nw)
    s_const = layout.pack_batch([c.s_mont for c in curves], p.w, p.nw)
    one = layout.broadcast_int(ctx.r_mod_n, p.w, p.nw, B)
    return ctx, dctx, sharder, pts, s_const, one


def test_tape_executor_sharded_bitexact(env):
    ctx, dctx, sharder, pts, s_const, _ = env
    tape = prac.stage1_tape(primes_range(0, 60), 60)
    ref = np.asarray(jax.jit(ops.run_tape)(
        jnp.asarray(pts), jnp.asarray(tape), jnp.asarray(s_const), dctx))
    run = pallas_ops.make_tape_executor(ctx, B, chunk=16, interpret=True,
                                        sharder=sharder)
    out = run(sharder.device_put(pts), tape, sharder.device_put(s_const))
    assert len(out.sharding.device_set) == NDEV, "result must stay sharded"
    np.testing.assert_array_equal(np.asarray(out)[0], ref[0])


def test_chain_executor_sharded_bitexact(env):
    ctx, dctx, sharder, pts, s_const, _ = env
    p1 = jnp.asarray(pts[0])
    x2, z2 = jax.jit(ops.xdbl)(p1[0], p1[1], jnp.asarray(s_const), dctx)
    p2, pd = jnp.stack([x2, z2]), p1
    count = 5
    ref = np.asarray(pallas_ops.make_chain_executor(
        ctx, B, count, interpret=True)(p2, p1, pd))
    run = pallas_ops.make_chain_executor(ctx, B, count, interpret=True,
                                         sharder=sharder)
    out = run(sharder.device_put(np.asarray(p2)),
              sharder.device_put(np.asarray(p1)),
              sharder.device_put(np.asarray(pd)))
    assert len(out.sharding.device_set) == NDEV
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_inversion_executors_sharded_bitexact(env):
    ctx, dctx, sharder, pts, s_const, one = env
    from tpu_ecm.stage2 import exec as s2exec
    k = 4
    rng = np.random.RandomState(7)
    # k stacked pseudo-points with the batch's real X/Z planes rotated
    xs = np.stack([np.roll(pts[0, 0], i, axis=-1) for i in range(k)])
    zs = np.stack([np.roll(pts[0, 1], i, axis=-1) for i in range(k)])

    pre_ref = np.asarray(pallas_ops.make_prefix_executor(
        ctx, B, k, interpret=True)(jnp.asarray(zs), jnp.asarray(one)))
    run_pre = pallas_ops.make_prefix_executor(ctx, B, k, interpret=True,
                                              sharder=sharder)
    pre = run_pre(sharder.device_put(zs), sharder.device_put(one))
    assert len(pre.sharding.device_set) == NDEV
    np.testing.assert_array_equal(np.asarray(pre), pre_ref)

    total = layout.unpack_batch(np.asarray(pre[-1]), ctx.p.w)
    inv_ints, fnd = s2exec.host_batch_inverse(ctx, total)
    assert not fnd
    tinv = layout.pack_batch(inv_ints, ctx.p.w, ctx.p.nw)
    pres = np.concatenate([one[None], pre_ref[:-1]], axis=0)

    app_ref = np.asarray(pallas_ops.make_apply_inverse_executor(
        ctx, B, k, interpret=True)(jnp.asarray(xs), jnp.asarray(zs),
                                   jnp.asarray(pres), jnp.asarray(tinv)))
    run_app = pallas_ops.make_apply_inverse_executor(
        ctx, B, k, interpret=True, sharder=sharder)
    app = run_app(sharder.device_put(xs), sharder.device_put(zs),
                  sharder.device_put(pres), sharder.device_put(tinv))
    assert len(app.sharding.device_set) == NDEV
    np.testing.assert_array_equal(np.asarray(app), app_ref)


def test_replay_executor_sharded_bitexact(env):
    ctx, dctx, sharder, pts, s_const, one = env
    pa_rows, pb_rows, t_block = 5, 3, 8
    pa = np.stack([np.roll(pts[0, 0], i, axis=-1) for i in range(pa_rows - 1)]
                  + [one])
    pbx = np.stack([np.zeros_like(one)]
                   + [np.roll(pts[0, 1], i, axis=-1) for i in range(pb_rows - 1)])
    idx = np.array([[0, 1], [1, 2], [2, 1], [3, 2], [0, 2],
                    [pa_rows - 1, 0], [pa_rows - 1, 0], [pa_rows - 1, 0]],
                   np.int32)
    ref = np.asarray(pallas_ops.make_replay_executor(
        ctx, B, pa_rows, pb_rows, t_block=t_block, entries_per_step=2,
        interpret=True)(jnp.asarray(one), jnp.asarray(pa), jnp.asarray(pbx),
                        jnp.asarray(idx)))
    run = pallas_ops.make_replay_executor(
        ctx, B, pa_rows, pb_rows, t_block=t_block, entries_per_step=2,
        interpret=True, sharder=sharder)
    out = run(sharder.device_put(one), sharder.device_put(pa),
              sharder.device_put(pbx), jnp.asarray(idx))
    assert len(out.sharding.device_set) == NDEV
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_replay_parow_executor_sharded_bitexact(env):
    """Shared-Pa-row replay variant shard_mapped over the curves mesh: the
    flat step stream stays replicated host metadata; pb == 0 pads mask to
    the Montgomery one identically on every shard."""
    ctx, dctx, sharder, pts, s_const, one = env
    pa_rows, pb_rows, nsteps, e = 5, 3, 4, 2
    pa = np.stack([np.roll(pts[0, 0], i, axis=-1) for i in range(pa_rows - 1)]
                  + [one])
    pbx = np.stack([np.zeros_like(one)]
                   + [np.roll(pts[0, 1], i, axis=-1)
                      for i in range(pb_rows - 1)])
    # steps: (pa, [pb0, pb1]); one short run (pad pb=0) and one pad step
    flat = np.array([0, 1, 2,
                     1, 2, 0,
                     3, 1, 1,
                     pa_rows - 1, 0, 0], np.int32)
    ref = np.asarray(pallas_ops.make_replay_parow_executor(
        ctx, B, pa_rows, pb_rows, nsteps=nsteps, entries_per_step=e,
        interpret=True)(jnp.asarray(one), jnp.asarray(pa), jnp.asarray(pbx),
                        jnp.asarray(flat)))
    run = pallas_ops.make_replay_parow_executor(
        ctx, B, pa_rows, pb_rows, nsteps=nsteps, entries_per_step=e,
        interpret=True, sharder=sharder)
    out = run(sharder.device_put(one), sharder.device_put(pa),
              sharder.device_put(pbx), jnp.asarray(flat))
    assert len(out.sharding.device_set) == NDEV
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_replay_resident_executor_sharded_bitexact(env):
    """VMEM-resident-slab replay variant shard_mapped over the curves mesh:
    the slab (like every residue plane) is batch-sharded; idx stays
    replicated host metadata."""
    ctx, dctx, sharder, pts, s_const, one = env
    pa_rows, slab_rows, t_block = 5, 3, 8
    pa = np.stack([np.roll(pts[0, 0], i, axis=-1) for i in range(pa_rows - 1)]
                  + [one])
    slab = np.stack([np.zeros_like(one)]
                    + [np.roll(pts[0, 1], i, axis=-1)
                       for i in range(slab_rows - 1)])
    idx = np.array([[0, 1], [1, 2], [2, 1], [3, 2], [0, 2],
                    [pa_rows - 1, 0], [pa_rows - 1, 0], [pa_rows - 1, 0]],
                   np.int32)
    ref = np.asarray(pallas_ops.make_replay_resident_executor(
        ctx, B, pa_rows, slab_rows, t_block=t_block, entries_per_step=2,
        interpret=True)(jnp.asarray(one), jnp.asarray(pa), jnp.asarray(slab),
                        jnp.asarray(idx)))
    gather_ref = np.asarray(pallas_ops.make_replay_executor(
        ctx, B, pa_rows, slab_rows, t_block=t_block, entries_per_step=2,
        interpret=True)(jnp.asarray(one), jnp.asarray(pa), jnp.asarray(slab),
                        jnp.asarray(idx)))
    np.testing.assert_array_equal(ref, gather_ref)
    run = pallas_ops.make_replay_resident_executor(
        ctx, B, pa_rows, slab_rows, t_block=t_block, entries_per_step=2,
        interpret=True, sharder=sharder)
    out = run(sharder.device_put(one), sharder.device_put(pa),
              sharder.device_put(slab), jnp.asarray(idx))
    assert len(out.sharding.device_set) == NDEV
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.slow
def test_driver_sharded_pallas_end_to_end(tmp_path):
    """Full driver run (stage 1 + stage 2) on the PALLAS engine sharded over
    2 devices: must find the pinned stage-2 factor and produce the identical
    factor set to the jnp engine (fixed sigma => engine/mesh-independent)."""
    from tpu_ecm import driver
    P35, P36 = 34359738421, 68719476767
    sharder = Sharder(jax.devices()[:NDEV])
    # 256 curves on BOTH engines (the pallas path rounds to 128*ndev lane
    # tiles; the jnp run must consume the identical sigma range)
    common = dict(n=P35 * P36, curves=B, b1=300, b2=10000, sigma=110,
                  stop_on_factor=False, verbose=0,
                  cache_dir=str(tmp_path / "cache"))

    def run(tag, **kw):
        cfg = driver.RunConfig(
            save_b1_path=str(tmp_path / f"s{tag}.txt"),
            checkpoint_path=None,
            results_path=str(tmp_path / f"r{tag}.txt"),
            **common, **kw)
        res = driver.ECMDriver(cfg).run()
        return {(h.factor, h.stage, h.sigma) for h in res.factors}

    got = run("pallas", sharder=sharder, use_pallas=True,
              pallas_interpret=True)
    ref = run("jnp", use_pallas=False)
    assert got == ref
    assert any(f == P35 and st == 2 for f, st, _ in got)
