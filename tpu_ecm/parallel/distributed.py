"""Multi-host launch: partition the sigma space across hosts and run the
same single-host program on each.

ECM curves are fully independent (the reference's "distributed" story is
SIMD lanes x pthreads in one process, SURVEY.md section 2.4; ours is the
sharded curve axis).  Multi-host therefore needs NO cross-host collectives
in the compute path at all: each host factors the same N with a disjoint
sigma range.  Coordination is exactly two things:

(a) unique sigma partitioning — host i owns sigmas
    [base + i*curves_per_host, base + (i+1)*curves_per_host);
(b) stop-on-factor — a one-bit HitFlag poll per curve-batch boundary
    (parallel/coordination.py): CollectiveFlag over DCN when running under
    jax.distributed, or a shared-filesystem FileFlag for independent
    launcher-style processes.  The reference's analog is its curve-loop
    stop on a hit (/root/reference/ecm.c:1529-1535).

Each host drives ALL of its local chips: a Sharder over jax.local_devices()
is installed by default, so the per-host curve batch is shard_mapped over
the local ('curves',) mesh (tested sharding + the flag logic in
tests/test_distributed.py; the union-equals-single-run invariant in
tests/test_sharding.py).

Usage (same command on every host, e.g. under an mpi-style launcher):

    from tpu_ecm.parallel import distributed
    res = distributed.run_multihost(n, total_curves=32768, b1=43_000_000)

Under a real multi-host TPU slice, call jax.distributed.initialize() first
(or pass coordinator/num_processes/process_id); on a single host this
degrades to a plain run.
"""

from __future__ import annotations

from typing import Optional

from .. import driver as _driver
from . import coordination as _coord
from .mesh import Sharder


def host_sigma_base(global_sigma: int, process_id: int,
                    curves_per_host: int) -> int:
    """Deterministic, disjoint sigma ranges per host: host i starts at
    global_sigma + i * curves_per_host (sequential SigmaGen consumes one
    sigma per curve).  global_sigma == 0 (random mode) derives a per-host
    seed instead."""
    if global_sigma == 0:
        return 0
    return global_sigma + process_id * curves_per_host


def run_multihost(n: int, total_curves: int, b1: int, *,
                  b2: Optional[int] = None, sigma: int = 0,
                  coordinator: Optional[str] = None,
                  num_processes: Optional[int] = None,
                  process_id: Optional[int] = None,
                  **kw) -> _driver.RunResult:
    """Run this host's share of a multi-host ECM job.

    Each host runs the identical program on its local devices with a
    disjoint slice of the curve budget; fixed sigma => the union of all
    hosts' results is bit-identical to a single giant run (the reference's
    determinism property across threads, threadpool.c NO_THREADS).  Batch
    counts may differ across hosts (batch size follows the local device
    count), so the driver negotiates the CollectiveFlag poll budget via
    plan()/drain() — see parallel/coordination.py.
    """
    import jax

    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    nproc = jax.process_count()
    pid = jax.process_index()
    curves_here = (total_curves + nproc - 1) // nproc
    base = host_sigma_base(sigma, pid, curves_here)
    if sigma == 0:
        # random mode: each host gets its own results file; the driver
        # seeds SigmaGen from (time, process_index) so host streams
        # decorrelate even under synchronized clocks
        kw.setdefault("results_path", f"ecm_results_h{pid}.txt")
    if "sharder" not in kw and len(jax.local_devices()) > 1:
        # drive every local chip, not one per process
        kw["sharder"] = Sharder(jax.local_devices())
    if "hit_flag" not in kw and nproc > 1:
        kw["hit_flag"] = _coord.CollectiveFlag()
    cfg = _driver.RunConfig(n=n, curves=curves_here, b1=b1, b2=b2,
                            sigma=base, **kw)
    return _driver.ECMDriver(cfg).run()
