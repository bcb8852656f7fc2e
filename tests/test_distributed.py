"""Multi-host coordination: stop-on-factor flag semantics and the
per-host driver integration (VERDICT round-1 item 2; the reference's
curve-loop stop on a hit is /root/reference/ecm.c:1529-1535)."""

import os
import subprocess
import sys

import pytest

from tpu_ecm import driver
from tpu_ecm.parallel import coordination as coord
from tpu_ecm.parallel import distributed

P35, P36 = 34359738421, 68719476767
N = P35 * P36


def test_local_flag_sticky():
    f = coord.LocalFlag()
    assert not f.poll(False)
    assert f.poll(True)
    assert f.poll(False)          # sticky


def test_collective_flag_single_process():
    f = coord.CollectiveFlag()
    assert not f.poll(False)
    assert f.poll(True)
    assert f.poll(False)          # sticky


def test_file_flag_cross_instance(tmp_path):
    """Two FileFlag instances (≙ two hosts on a shared filesystem): a hit
    published by one is visible to the other."""
    path = str(tmp_path / "hit.flag")
    a, b = coord.FileFlag(path), coord.FileFlag(path)
    assert not b.poll(False)
    assert a.poll(True)
    assert b.poll(False)          # sees A's hit without hitting itself
    a.clear()
    assert not b.poll(False)


def _cfg(tmp_path, tag, **kw):
    base = dict(n=N, b1=300, sigma=110, verbose=0,
                save_b1_path=None, checkpoint_path=None,
                results_path=str(tmp_path / f"r{tag}.txt"),
                cache_dir=str(tmp_path / "cache"))
    base.update(kw)
    return driver.RunConfig(**base)


def test_driver_stops_when_other_host_hit(tmp_path):
    """Host B must stop at its first batch boundary when the shared flag
    says another host already found a factor — even though B itself found
    nothing (B2=B1: stage 1 only, sigmas 110..117 yield no stage-1 hit)."""
    flag = coord.FileFlag(str(tmp_path / "hit.flag"))
    assert flag.poll(True)        # "host A" publishes
    cfg = _cfg(tmp_path, "b", curves=8, batch=2, b2=300,
               hit_flag=coord.FileFlag(flag.path))
    res = driver.ECMDriver(cfg).run()
    assert not res.factors
    assert res.curves_run == 2    # 1 of 4 batches, then the flag stopped it


def test_driver_publishes_hit_to_flag(tmp_path):
    """Host A's own find must be published at the batch boundary (so B's
    next poll sees it)."""
    flag_path = str(tmp_path / "hit.flag")
    cfg = _cfg(tmp_path, "a", curves=4, b2=10000, stop_on_factor=False,
               hit_flag=coord.FileFlag(flag_path))
    res = driver.ECMDriver(cfg).run()
    assert any(h.factor == P35 for h in res.factors)    # sigma 112, stage 2
    assert os.path.exists(flag_path)


def test_run_multihost_single_process(tmp_path):
    """Single-process degeneration: local-device sharder installed by
    default, full budget on this host, factor found and run stopped."""
    res = distributed.run_multihost(
        N, total_curves=8, b1=300, b2=10000, sigma=110,
        verbose=0, save_b1_path=None, checkpoint_path=None,
        results_path=str(tmp_path / "r.txt"),
        cache_dir=str(tmp_path / "cache"))
    assert any(h.factor == P35 and h.sigma == 112 for h in res.factors)


_TWO_PROC_SCRIPT = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); tmp = sys.argv[2]
jax.distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id=pid)
from tpu_ecm.parallel import distributed
res = distributed.run_multihost(
    {n}, total_curves=12, b1=300, b2=10000, sigma=110, batch=2,
    verbose=0, save_b1_path=None, checkpoint_path=None,
    results_path=os.path.join(tmp, "r%d.txt" % pid),
    cache_dir=os.path.join(tmp, "cache"))
print("RESULT", pid, res.curves_run,
      sorted((h.factor, h.stage, h.sigma) for h in res.factors))
"""


@pytest.mark.skipif(not os.environ.get("TPU_ECM_SLOW"),
                    reason="2-process jax.distributed run: set TPU_ECM_SLOW=1")
def test_run_multihost_two_processes(tmp_path):
    """Real 2-process jax.distributed run on CPU: host 0 owns sigmas
    110..115 (hit at 112, its 2nd of 3 batches), host 1 owns 116..121 (no
    hit).  The CollectiveFlag must stop BOTH hosts at the batch-2 boundary:
    host 1 runs 4 of its 6 curves and never its 3rd batch.  Opt-in
    (-m slow): spawns subprocesses."""
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = _TWO_PROC_SCRIPT.format(port=port, n=N)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, str(i), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd="/root/repo") for i in range(2)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e[-2000:]
    lines = {o.strip().splitlines()[-1].split()[1]: o.strip().splitlines()[-1]
             for o, _ in outs if o.strip()}
    # host 0 (sigmas 110..115) finds a factor (sigma 111 hits in its first
    # batch at this B2); host 1 (sigmas 116..121) finds nothing itself and
    # must stop at the SAME batch boundary as host 0 — early, before its
    # 6-curve budget
    assert "3435973" in lines["0"] or "6871947" in lines["0"]
    assert lines["1"].endswith("[]")
    ran0, ran1 = int(lines["0"].split()[2]), int(lines["1"].split()[2])
    assert ran0 == ran1 < 6, (ran0, ran1)


def test_collective_flag_plan_drain_single_process():
    """plan() fixes the poll budget; drain() pads the shortfall so
    all-gather counts always match across hosts (single-process path)."""
    f = coord.CollectiveFlag()
    f.plan(5)
    assert f.poll(False) is False
    assert f.poll(True) is True          # sticky from here on
    f.drain()
    assert f._polls == 5
    assert f.poll(False) is True         # stickiness survives draining


def test_driver_brackets_hit_flag_with_plan_and_drain(tmp_path):
    """The driver must plan() the batch count before its loop and drain()
    after it — including on early stop-on-factor exits."""
    class Recording(coord.HitFlag):
        def __init__(self):
            self.planned = None
            self.polls = 0
            self.drained = 0

        def plan(self, n_batches):
            self.planned = n_batches

        def poll(self, found_local):
            self.polls += 1
            return bool(found_local)

        def drain(self):
            self.drained += 1

    flag = Recording()
    n = 34359738421 * 68719476767
    cfg = driver.RunConfig(
        n=n, curves=8, b1=300, b2=300, sigma=110, batch=2, verbose=0,
        hit_flag=flag, stop_on_factor=False,
        save_b1_path=str(tmp_path / "s.txt"),
        checkpoint_path=str(tmp_path / "c.txt"),
        results_path=str(tmp_path / "r.txt"),
        cache_dir=str(tmp_path / "cache"))
    driver.ECMDriver(cfg).run()
    assert flag.planned == 4
    assert flag.polls == 4
    assert flag.drained == 1

    flag2 = Recording()
    cfg2 = driver.RunConfig(
        n=n, curves=8, b1=300, b2=300, sigma=174, batch=2, verbose=0,
        hit_flag=flag2, stop_on_factor=True,
        save_b1_path=str(tmp_path / "s2.txt"),
        checkpoint_path=str(tmp_path / "c2.txt"),
        results_path=str(tmp_path / "r2.txt"),
        cache_dir=str(tmp_path / "cache"))
    driver.ECMDriver(cfg2).run()
    assert flag2.planned == 4
    assert flag2.polls < 4               # sigma 174 hits in the first batch
    assert flag2.drained == 1
