"""Sharding equality: fixed sigma => bit-exact residues regardless of the
mesh shape (the TPU analog of the reference's NO_THREADS-vs-threads
determinism property, SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moduli import N256
from tpu_ecm import params
from tpu_ecm.curve import ops, prac, suyama
from tpu_ecm.limbs import jnp_ops, layout
from tpu_ecm.parallel import Sharder
from tpu_ecm.primes import primes_range


def _state(ctx, batch):
    curves = [suyama.build_one_curve(ctx, 3000 + i) for i in range(batch)]
    p = ctx.p
    pts = np.zeros((ops.NUM_SLOTS, 2, p.nw, batch), dtype=np.int32)
    pts[0, 0] = layout.pack_batch([c.x_mont for c in curves], p.w, p.nw)
    pts[0, 1] = layout.pack_batch([c.z_mont for c in curves], p.w, p.nw)
    s_const = layout.pack_batch([c.s_mont for c in curves], p.w, p.nw)
    return pts, s_const


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_stage1_bit_exact(ndev):
    ctx = params.make_monty(N256)
    dctx = jnp_ops.device_ctx(ctx)
    b1 = 150
    batch = 16
    pts, s_const = _state(ctx, batch)
    tape = jnp.asarray(prac.stage1_tape(primes_range(0, b1), b1))

    @jax.jit
    def step(pts, tape, s_const):
        return ops.run_tape(pts, tape, s_const, dctx)

    ref = np.asarray(step(jnp.asarray(pts), tape, jnp.asarray(s_const)))

    sharder = Sharder(jax.devices()[:ndev])
    out = step(sharder.device_put(pts), tape, sharder.device_put(s_const))
    assert len(out.sharding.device_set) == ndev
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()


def test_graft_entry_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_driver_with_sharder(tmp_path):
    """Full driver run with the batch sharded over 4 virtual devices."""
    from tpu_ecm import driver
    P35, P36 = 34359738421, 68719476767
    sharder = Sharder(jax.devices()[:4])
    cfg = driver.RunConfig(
        n=P35 * P36, curves=4, b1=300, b2=300, sigma=172, sharder=sharder,
        save_b1_path=str(tmp_path / "s.txt"),
        checkpoint_path=str(tmp_path / "c.txt"),
        results_path=str(tmp_path / "r.txt"),
        cache_dir=str(tmp_path / "cache"), verbose=0)
    res = driver.ECMDriver(cfg).run()
    assert any(h.factor == P35 for h in res.factors)


def test_multihost_union_equals_single_run(tmp_path):
    """Multi-host partitioning invariant: two 'hosts' running disjoint
    sigma ranges (parallel.distributed.host_sigma_base) must together find
    exactly the factor set of one run over the whole range — the
    reference's determinism-across-threads property lifted to hosts
    (no cross-host collectives exist in the compute path)."""
    from tpu_ecm import driver
    from tpu_ecm.parallel import distributed
    P35, P36 = 34359738421, 68719476767
    n = P35 * P36

    def run(curves, sigma, tag):
        cfg = driver.RunConfig(
            n=n, curves=curves, b1=300, b2=20000, sigma=sigma,
            stop_on_factor=False, verbose=0,
            save_b1_path=None, checkpoint_path=None,
            results_path=str(tmp_path / f"r{tag}.txt"),
            cache_dir=str(tmp_path / "cache"))
        res = driver.ECMDriver(cfg).run()
        return {(h.factor, h.stage, h.sigma) for h in res.factors}

    total, nproc = 64, 2
    per_host = total // nproc
    union = set()
    for pid in range(nproc):
        base = distributed.host_sigma_base(110, pid, per_host)
        union |= run(per_host, base, f"h{pid}")
    assert union == run(total, 110, "all")
