"""The ECM driver: batch loop over curve construction, stage 1, checkpoints,
and stage 2 — the vececm equivalent (/root/reference/ecm.c:1077-1544).

Phase structure per batch of B curves (B = the sharded tensor axis replacing
VECLEN lanes x threads):

  phase 0  build curves        host Suyama from sigma  (ecm.c:1548)
  phase 1  stage 1             device tape scans per prime chunk, with
                               GMP-ECM-format checkpoint.txt between chunks
                               (ecm.c:1236-1312) and save_b1.txt at the end
                               (ecm.c:1319-1388)
  phase 2  stage 2 init        device Pb table + batched inversion
  phase 3  stage 2 pairing     host pair() plan per chunk, device replay
  harvest  gcd checks          host, against the original input
                               (ecm.c:1485-1528, check_factor ecm.c:2542)
"""

from __future__ import annotations

import dataclasses
import math
import os
import sys
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import params as _params
from . import stage1 as _stage1
from .curve import suyama
from .io import savefile
from .limbs import jnp_ops
from .primes import PrimeStream
from .stage2 import exec as s2exec
from .stage2 import plan as s2plan
from .utils import rng as _rng


@dataclasses.dataclass
class RunConfig:
    n: int                       # the number to factor (already calc()ed)
    curves: int
    b1: int
    b2: Optional[int] = None     # None -> 100*B1; <= B1 -> stage 1 only
    sigma: int = 0               # 0 -> random sigmas
    batch: Optional[int] = None  # curves per device batch (None: all curves)
    do_stage2: bool = True
    save_b1_path: Optional[str] = "save_b1.txt"
    checkpoint_path: Optional[str] = "checkpoint.txt"
    results_path: Optional[str] = "ecm_results.txt"
    verbose: int = 1
    # MUST be cwd-independent: a relative path would give every working
    # directory its own cold compilation cache (Mosaic compiles are minutes)
    cache_dir: Optional[str] = os.path.expanduser("~/.cache/tpu_ecm")
    force_no_mersenne: bool = False
    stop_on_factor: bool = True
    sharder: Optional[object] = None   # parallel.mesh.Sharder
    prime_chunk: Optional[int] = None
    use_pallas: Optional[bool] = None  # None: auto (TPU yes, CPU no)
    pallas_interpret: bool = False     # interpret-mode kernels (CPU testing)
    full_prac: Optional[bool] = None   # 9-rule ORIG_PRAC analog (None: default)
    hit_flag: Optional[object] = None  # parallel.coordination.HitFlag
    # stage-1 curve family: "suyama" = Montgomery x-only PRAC (reference
    # parity, 12 | order); "edwards" = a=-1 twisted Edwards signed-window
    # (~20% fewer weighted muls/bit, 4 | order — see curve/edwards.py)
    curve_mode: str = "suyama"
    # stage-1 arithmetic engine: "digit" = int32 digit planes on the VPU
    # (limbs/pallas_ops.py); "rns" = residue channels with MXU base
    # extensions (limbs/rns_exec.py) — the large-moduli regime the
    # reference concedes (/root/reference/README.md:2).  "auto" switches
    # to RNS at RNS_MIN_BITS for non-Mersenne Suyama runs.
    engine: str = "auto"


# auto-engine crossover: the digit/VPU path's cost grows ~nw^2 in VPU issue
# slots while the RNS/MXU path rides the systolic array.  Static fallback
# placement from the round-2 hardware sweep (tools/bench_large_moduli.py
# -both); inside [RNS_PROBE_LO, RNS_PROBE_HI] a first-run timing probe
# per (backend, geometry) decides instead and is persisted next to the
# compile cache — kernel changes re-place the crossover automatically
# (the probe file just needs deleting; VERDICT r2 item 8).
RNS_MIN_BITS = 1400
RNS_PROBE_LO = 1009   # digit measured clearly ahead through 1008 bits
RNS_PROBE_HI = 2048   # RNS measured clearly ahead from 2048 bits
RNS_PROBE_STEPS = 512  # probe tape length (ADD/DUP alternation)


_KERNEL_FP = None
_KERNEL_FP_RELIABLE = True


def _kernel_fingerprint() -> str:
    """Short hash of the kernel-defining sources; baked into the probe key
    so editing any engine kernel invalidates persisted probe results
    automatically (no stale engine_probe.json after a kernel change).

    If a source file cannot be read (e.g. a zipped install) the fingerprint
    can no longer track kernel changes, so it degrades to a per-process
    value: every process re-probes, and the result is not persisted."""
    global _KERNEL_FP, _KERNEL_FP_RELIABLE
    if _KERNEL_FP is None:
        import hashlib
        here = os.path.dirname(__file__)
        h = hashlib.sha256()
        for rel in ("limbs/pallas_ops.py", "limbs/jnp_ops.py",
                    "limbs/rns.py", "limbs/rns_exec.py"):
            try:
                with open(os.path.join(here, rel), "rb") as f:
                    h.update(f.read())
            except OSError:
                _KERNEL_FP_RELIABLE = False
                print(f"tpu_ecm: cannot read {rel} for the engine-probe "
                      "kernel fingerprint; probe results will not be cached "
                      "this process", file=sys.stderr)
                h.update(f"{rel}:{os.getpid()}:{time.time_ns()}".encode())
        _KERNEL_FP = h.hexdigest()[:12]
    return _KERNEL_FP


def _measured_engine(ctx, rns_host_factory, cache_dir: Optional[str],
                     verbose: int) -> str:
    """Timing probe: run a short synthetic ADD/DUP tape on both engines at
    their default batches and pick the higher curves/throughput.  Result is
    persisted per (backend, w, nw, kernel-source hash) in
    {cache_dir}/engine_probe.json, so the probe (two small Mosaic compiles +
    two timed runs) happens once per geometry per machine — and re-runs by
    itself whenever a kernel source changes."""
    import json

    import jax
    import jax.numpy as jnp

    key = (f"{jax.default_backend()}_w{ctx.p.w}_nw{ctx.p.nw}"
           f"_{_kernel_fingerprint()}")
    path = None
    if cache_dir:
        path = os.path.join(cache_dir, "engine_probe.json")
        try:
            with open(path) as f:
                data = json.load(f)
            if key in data:
                return data[key]
        except (OSError, ValueError):
            pass

    from .curve import ops as curve_ops
    from .curve import prac
    from .limbs import layout, pallas_ops, rns as _rns, rns_exec

    # synthetic tape: DUP/ADD alternation over live slots (work content
    # matches stage 1's ~1.4 ADD+DUP per prime bit)
    tape = np.zeros((RNS_PROBE_STEPS, 5), dtype=np.int32)
    tape[0::2, 0] = curve_ops.OP_DUP
    tape[0::2, 1:3] = 1, 0
    tape[1::2, 0] = curve_ops.OP_ADD
    tape[1::2, 1:5] = [[2, 1, 0, 0]] * (RNS_PROBE_STEPS // 2)
    rng = np.random.RandomState(7)

    def rand_ints(b):
        return [int.from_bytes(rng.bytes(ctx.p.nbits // 8 + 8), "little")
                % ctx.n_int for _ in range(b)]

    def time_run(run, pts, s_const):
        out = run(pts, tape, s_const)
        _ = np.asarray(out[0, 0])            # sync (compile + first run)
        best = float("inf")
        for _i in range(3):
            t0 = time.time()
            out = run(out, tape, s_const)
            _ = np.asarray(out[0, 0])
            best = min(best, time.time() - t0)
        return best

    # digit engine at its default batch
    bd = pallas_ops.default_batch(ctx)
    ptsd = np.zeros((curve_ops.NUM_SLOTS, 2, ctx.p.nw, bd), dtype=np.int32)
    ptsd[0] = [layout.pack_batch(rand_ints(bd), ctx.p.w, ctx.p.nw)
               for _ in range(2)]
    sd = jnp.asarray(layout.pack_batch(rand_ints(bd), ctx.p.w, ctx.p.nw))
    run_d = pallas_ops.make_tape_executor(ctx, bd, chunk=RNS_PROBE_STEPS)
    td = time_run(run_d, jnp.asarray(ptsd), sd) / bd

    # RNS engine at its default batch
    h = rns_host_factory()
    br = rns_exec.default_batch(h)
    ptsr, sr = rns_exec.init_state(h, rand_ints(br), rand_ints(br),
                                   rand_ints(br))
    run_r = rns_exec.make_rns_tape_executor(h, br, chunk=RNS_PROBE_STEPS)
    tr = time_run(run_r, jnp.asarray(ptsr), jnp.asarray(sr)) / br

    pick = "digit" if td <= tr else "rns"
    if verbose:
        print(f"engine probe ({ctx.p.nbits} bits): digit "
              f"{td * 1e9:.1f} ns/curve/step vs rns {tr * 1e9:.1f} "
              f"-> {pick}")
    if path and _KERNEL_FP_RELIABLE:
        _probe_store(path, key, pick)
    return pick


def _probe_store(path: str, key: str, pick: str) -> None:
    """Persist one probe result, pruning only the entries this one
    supersedes: same backend/w/nw prefix, older kernel fingerprint.
    Entries for other geometries OR other fingerprints stay — two
    checkouts at different revisions can share one cache_dir without
    wiping each other's probes on every write."""
    import json
    try:
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        prefix = key.rsplit("_", 1)[0]
        data = {k: v for k, v in data.items()
                if not (k.startswith(prefix + "_") and k != key)}
        data[key] = pick
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, path)
    except (OSError, ValueError):
        pass


@dataclasses.dataclass
class FactorHit:
    factor: int
    stage: int
    curve: int
    sigma: int
    is_prp: bool


@dataclasses.dataclass
class RunResult:
    n: int
    work_modulus: int
    factors: List[FactorHit]
    curves_run: int
    stage1_residues: List[Tuple[int, int, int]]  # (sigma, X, Z) canonical
    timings: Dict[str, float]
    counters: Dict[str, int]


def prepare_context(n: int, force_no_mersenne: bool = False,
                    verbose: int = 1) -> _params.MontyCtx:
    """Mersenne detection + density rule + algebraic-factor stripping, then
    context construction (mirrors /root/reference/main.c:405-527)."""
    work_n = n
    mers = None if force_no_mersenne else _params.detect_mersenne(n)
    if mers is not None:
        e, c = mers
        if abs(c) == 1:
            g = _params.strip_algebraic_factors(n, e, c)
            if g not in (0, 1) and g != n:
                if verbose:
                    cofactor = n // math.gcd(n, g)
                    print(f"removing algebraic "
                          f"{savefile.classify_factor(cofactor)} factor "
                          f"{cofactor}")
                work_n = math.gcd(n, g)
        if not _params.mersenne_density_ok(work_n, e):
            if verbose:
                print(f"Mersenne input 2^{e} determined to be faster by REDC")
            mers = None
        # pseudo-Mersenne c must leave fold headroom at our radix
        elif c not in (1, -1):
            w, _, _, dev_ok = _params._radix_or_host_only(e)
            if not dev_ok or e <= 2 * abs(c).bit_length() + 2 * w + 16:
                mers = None
    if mers is not None and verbose:
        e, c = mers
        kind = {1: f"2^{e}-1", -1: f"2^{e}+1"}.get(c, f"2^{e}-{c}")
        print(f"Using special Mersenne mod for factor of: {kind}")
    return _params.make_monty(work_n, mersenne=mers)


def check_factor(z: int, n: int) -> Optional[int]:
    """gcd harvest (/root/reference/ecm.c:2542-2557): a factor in (1, n)."""
    g = math.gcd(z % n, n)
    if 1 < g < n:
        return g
    return None


class ECMDriver:
    def __init__(self, cfg: RunConfig):
        self.cfg = cfg
        # Montgomery arithmetic needs an odd modulus: divide out powers of 2
        # up front and report them as trivial factors
        self._even_factor = 0
        n = cfg.n
        while n % 2 == 0 and n > 1:
            n //= 2
            self._even_factor += 1
        if self._even_factor and cfg.verbose:
            print(f"dividing out factor 2^{self._even_factor}")
        if n == 1:
            raise ValueError("input is a power of 2; nothing to run ECM on")
        # perfect powers: every curve's gcd would hit n itself — factor the
        # base instead (factors lift to n); GMP-ECM-style structure check
        pp = _params.perfect_power(n)
        if pp is not None:
            base, k = pp
            if cfg.verbose:
                print(f"input is a perfect power: {base}^{k}; "
                      f"factoring the base")
            n = base
        # a probable-prime input needs no curves at all
        self._prp_input = (n > 1 and
                           savefile.classify_factor(n).startswith("PRP"))
        cfg = self.cfg = dataclasses.replace(cfg, n=n)
        if cfg.b2 is None:
            self.b2 = 100 * cfg.b1
            self.do_stage2 = cfg.do_stage2
        else:
            self.b2 = cfg.b2
            self.do_stage2 = cfg.do_stage2 and cfg.b2 > cfg.b1
        if self._prp_input:
            if cfg.verbose:
                print(f"input {n} is a probable prime; nothing to run")
            self.factors = []
            self.timings = {}
            self.counters = {}
            if self._even_factor:
                self._report_factor(2, 0, 0, 0, cfg.b1)
            self._report_factor(n, 0, 0, 0, cfg.b1)
            self._initial_hits = len(self.factors)
            return
        self.ctx = prepare_context(cfg.n, cfg.force_no_mersenne, cfg.verbose)
        self.dctx = jnp_ops.device_ctx(self.ctx)
        self.stream = PrimeStream(cfg.prime_chunk or PrimeStream().chunk)
        import jax
        # skip the process-global cache-dir mutation when the persistent
        # compilation cache is off (the test harness disables it: a
        # per-tmp_path dir set here leaked into unrelated tests and the
        # accumulated cache writes eventually segfaulted the suite,
        # VERDICT r4 item 2)
        if cfg.cache_dir and jax.config.jax_enable_compilation_cache:
            try:
                # per-backend cache subdir: XLA:CPU AOT executables compiled
                # by the remote compile service carry that machine's feature
                # set and can mis-execute locally (observed "prefer-no-
                # scatter not supported on the host machine" loads)
                jax.config.update(
                    "jax_compilation_cache_dir",
                    f"{cfg.cache_dir}/jax-{jax.default_backend()}")
            except Exception:
                pass
        self.use_pallas = (cfg.use_pallas if cfg.use_pallas is not None
                           else jax.default_backend() != "cpu")
        if cfg.engine not in ("auto", "digit", "rns"):
            raise ValueError(f"unknown engine {cfg.engine!r}")
        if cfg.engine == "rns" and cfg.curve_mode == "edwards":
            # the Edwards ladder nests two subtractions (E = E0 - A - B),
            # breaking the RNS 2V input bound (rns_exec.py docstring)
            raise ValueError("engine='rns' supports curve_mode='suyama' only")
        if not self.ctx.p.device_ok:
            # > ~2000 bits: no int32 digit-plane radix exists (host-only
            # geometry, params._radix_or_host_only) — the RNS/MXU engine is
            # the only device path (covers to ~6200 bits)
            if cfg.engine == "digit":
                raise ValueError(
                    f"{self.ctx.p.nbits}-bit modulus exceeds the digit "
                    "engine's int32 column bound; use engine='rns'")
            if cfg.curve_mode != "suyama":
                raise ValueError(
                    f"{self.ctx.p.nbits}-bit moduli require the RNS engine, "
                    "which supports curve_mode='suyama' only")
        self.engine = cfg.engine
        if self.engine == "auto":
            if not self.ctx.p.device_ok:
                self.engine = "rns"
            elif self.ctx.is_mersenne or cfg.curve_mode != "suyama":
                self.engine = "digit"
            elif not self.use_pallas:
                # CPU fallback keeps the static threshold (probing jnp
                # scans would measure dispatch, not kernels)
                self.engine = ("rns" if self.ctx.p.nbits >= RNS_MIN_BITS
                               else "digit")
            elif self.ctx.p.nbits < RNS_PROBE_LO:
                self.engine = "digit"
            elif self.ctx.p.nbits >= RNS_PROBE_HI:
                self.engine = "rns"
            else:
                from .limbs import rns as _rns
                try:
                    self.engine = _measured_engine(
                        self.ctx,
                        lambda: _rns.make_rns(
                            self.ctx, cw=_rns.choose_cw(self.ctx.p.nbits)),
                        cfg.cache_dir, cfg.verbose)
                except Exception as e:   # probe failure -> static threshold
                    if cfg.verbose:
                        print(f"engine probe failed ({e!r}); "
                              f"using static crossover")
                    self.engine = ("rns"
                                   if self.ctx.p.nbits >= RNS_MIN_BITS
                                   else "digit")
        self._rns_host = None
        if self.engine == "rns":
            from .limbs import rns as _rns
            self._rns_host = _rns.make_rns(
                self.ctx, cw=_rns.choose_cw(self.ctx.p.nbits))
            if cfg.verbose:
                print(f"stage-1 engine: RNS/MXU, K={self._rns_host.K} "
                      f"channels x 2 bases")
        self._executors: Dict[int, object] = {}
        self._s2_executors: Dict = {}
        # stage-2 pairmap cache: the (v, u) stream depends only on
        # (chunk bounds, B1, B2, D, U) — never on the curves — so it is
        # planned once and replayed for every curve batch (the reference
        # plans once on thread 0 and shares it read-only across threads,
        # /root/reference/ecm.c:1449-1459, main.c:750-754).  Capped in
        # total entries so huge-B2 streaming runs don't accumulate
        # gigabytes of maps; 0 disables caching.
        self._pairmaps: Dict[Tuple[int, int], tuple] = {}
        self._pairmap_entries = 0
        self._pairmap_cap = int(
            os.environ.get("TPU_ECM_PAIRMAP_CACHE", str(125_000_000)))
        # mix the process index into the random-sigma seed: multi-host
        # random mode must not rest on microsecond clock skew alone to
        # decorrelate the hosts' sigma streams
        try:
            pid = jax.process_index()
        except Exception:
            pid = 0
        seed = _rng.hash64((int(time.time() * 1e6)
                            ^ (pid * 0x9E3779B97F4A7C15)) & ((1 << 64) - 1))
        self.sigma_gen = _rng.SigmaGen(cfg.sigma, seed)
        self.factors: List[FactorHit] = []
        self.timings: Dict[str, float] = {}
        self.counters: Dict[str, int] = {}
        if self._even_factor:
            self._report_factor(2, 0, 0, 0, cfg.b1)
        # trivial up-front factors must not trip stop_on_factor
        self._initial_hits = len(self.factors)

    # ------------------------------------------------------------------

    def _report_factor(self, f: int, stage: int, curve_idx: int, sigma: int,
                       bound: int):
        if any(h.factor == f and h.sigma == sigma for h in self.factors):
            return
        hit = FactorHit(factor=f, stage=stage, curve=curve_idx, sigma=sigma,
                        is_prp=savefile.classify_factor(f).startswith("PRP"))
        self.factors.append(hit)
        savefile.log_factor(self.cfg.results_path, f, stage, bound,
                            curve_idx, 0, curve_idx, sigma,
                            echo=self.cfg.verbose >= 1)

    def _check_batch(self, vals: List[int], sigmas: List[int], stage: int,
                     bound: int, base_idx: int):
        for i, (z, s) in enumerate(zip(vals, sigmas)):
            f = check_factor(z, self.ctx.input_n)
            if f:
                self._report_factor(f, stage, base_idx + i, s, bound)

    def _write_save(self, path: Optional[str], sigmas: List[int],
                    xs: List[int], zs: List[int], b1_label: int,
                    program: str = "AVX-ECM"):
        # PROGRAM tags the curve family: AVX-ECM-ED records carry an Edwards
        # seed in SIGMA (X/Z are on the equivalent Montgomery curve either
        # way, so foreign `ecm -resume` keeps working — it only needs X/Z)
        if not path:
            return
        n_out = self.ctx.input_n
        recs = [savefile.SaveRecord(sigma=s, b1=b1_label, n=n_out, x=x, z=z,
                                    program=program)
                for s, x, z in zip(sigmas, xs, zs)]
        savefile.append_records(path, recs)

    # ------------------------------------------------------------------

    def _tape_runner(self, batch: int):
        """Stage-1 tape executor: Pallas mega-kernel on TPU (state resident
        in VMEM per chunk), jnp scan elsewhere; both bit-identical.  With a
        Sharder the executor is shard_mapped over the ('curves',) mesh, so
        the flagship engine itself runs multi-chip."""
        sh = self.cfg.sharder
        local = batch // sh.n if sh is not None else batch
        if not (self.use_pallas and local % 128 == 0):
            return None  # stage1 falls back to the jitted jnp scan
        if batch not in self._executors:
            from .limbs import pallas_ops
            run = pallas_ops.make_tape_executor(
                self.ctx, batch, sharder=sh,
                chunk=256 if self.cfg.pallas_interpret else 8192,
                interpret=self.cfg.pallas_interpret)

            def runner(pts, tape, s_const, dctx):
                return run(pts, tape, s_const)

            self._executors[batch] = runner
        return self._executors[batch]

    def _rns_tape_runner(self, batch: int):
        """Stage-1 tape executor for the RNS/MXU engine: Pallas kernel on
        TPU (base extensions on the systolic array), jnp scan elsewhere;
        both run the same rns.mont_mul and are bit-identical."""
        from .limbs import rns_exec
        sh = self.cfg.sharder
        local = batch // sh.n if sh is not None else batch
        key = ("rns", batch)
        if key not in self._executors:
            if self.use_pallas and local % 128 == 0:
                run = rns_exec.make_rns_tape_executor(
                    self._rns_host, batch, sharder=sh,
                    chunk=256 if self.cfg.pallas_interpret else 4096,
                    interpret=self.cfg.pallas_interpret)

                def runner(pts, tape, s_const, dctx):
                    return run(pts, tape, s_const)
            else:
                import jax
                import jax.numpy as jnp
                jrun = jax.jit(rns_exec.run_tape)
                rc = self._rns_host.dev

                def runner(pts, tape, s_const, dctx):
                    return jrun(pts, jnp.asarray(tape), s_const, rc)

            self._executors[key] = runner
        return self._executors[key]

    def _run_batch_rns(self, sigmas: List[int], base_idx: int
                       ) -> List[Tuple[int, int, int]]:
        """Stage 1 AND stage 2 on RNS residue planes (large moduli): the
        Stage2Runner orchestration is engine-generic via the RnsOps
        adapter, so the whole run stays on residue channels; savefiles
        still get canonical (X, Z) integers at the phase boundary."""
        import jax.numpy as jnp

        from .limbs import rns_exec
        cfg, ctx = self.cfg, self.ctx
        h = self._rns_host
        t0 = time.time()
        curves = []
        for s in sigmas:
            for attempt in range(64):
                try:
                    curves.append(suyama.build_one_curve(ctx, s))
                    break
                except suyama.FactorFoundDuringBuild as e:
                    if e.factor:
                        self._report_factor(e.factor, 0, base_idx, e.sigma,
                                            cfg.b1)
                    s = s + 1_000_003
            else:
                raise RuntimeError(
                    "curve construction kept hitting gcd factors; "
                    "input has many small factors — divide them out first")
        sigmas = [c.sigma for c in curves]
        conv = ctx.from_mont_int
        pts, sc = rns_exec.init_state(
            h, [conv(c.x_mont) for c in curves],
            [conv(c.z_mont) for c in curves],
            [conv(c.s_mont) for c in curves])
        if cfg.sharder is not None:
            pts = cfg.sharder.device_put_state(pts)
            sc = cfg.sharder.device_put_plane(sc)
        else:
            pts, sc = jnp.asarray(pts), jnp.asarray(sc)
        state = _stage1.Stage1State(pts=pts, s_const=sc)
        self.timings["build"] = self.timings.get("build", 0) + time.time() - t0

        t0 = time.time()
        run_tape = self._rns_tape_runner(len(sigmas))
        for chunk, state in _stage1.run_stage1(
                state, None, cfg.b1, self.stream,
                cache_dir=cfg.cache_dir, run_tape=run_tape,
                full_prac=cfg.full_prac):
            for k in ("ptadds", "ptdups", "numprimes"):
                self.counters[k] = (self.counters.get(k, 0)
                                    + getattr(chunk, k))
            if not chunk.is_final:
                xs, zs = rns_exec.extract_point(h, np.asarray(state.pts))
                self._check_batch(zs, sigmas, 1, chunk.last_prime, base_idx)
                self._write_save(cfg.checkpoint_path, sigmas, xs, zs,
                                 chunk.last_prime)
        xs, zs = rns_exec.extract_point(h, np.asarray(state.pts))
        self.timings["stage1"] = (self.timings.get("stage1", 0)
                                  + time.time() - t0)
        if cfg.verbose >= 2:
            print(f"Stage 1 completed, {self.counters.get('ptadds', 0)} "
                  f"point-adds, {self.counters.get('ptdups', 0)} "
                  f"point-doubles over {self.counters.get('numprimes', 0)} "
                  f"primes")
        self._check_batch(zs, sigmas, 1, cfg.b1, base_idx)
        self._write_save(cfg.save_b1_path, sigmas, xs, zs, cfg.b1)
        residues = [(s, x, z) for s, x, z in zip(sigmas, xs, zs)]

        # stage 2 stays on RNS planes end-to-end (the Stage2Runner
        # orchestration is engine-generic via the RnsOps adapter)
        if self.do_stage2:
            s2ops = rns_exec.RnsOps(h, sharder=cfg.sharder,
                                    interpret=cfg.pallas_interpret)
            self._run_stage2(state.pts[0], state.s_const, sigmas, base_idx,
                             ops=s2ops)
        return residues

    def _ed_runner(self, batch: int, table_pts: int):
        """Edwards tape executor: Pallas on TPU, jnp scan elsewhere."""
        sh = self.cfg.sharder
        local = batch // sh.n if sh is not None else batch
        key = ("ed", batch, table_pts)
        if not (self.use_pallas and local % 128 == 0):
            if key not in self._executors:
                import jax
                from .curve import edops

                jrun = jax.jit(edops.run_tape, static_argnums=())

                def runner(acc, tape, table):
                    import jax.numpy as jnp
                    return jrun(jnp.asarray(acc), jnp.asarray(tape),
                                jnp.asarray(table), self.dctx)

                self._executors[key] = runner
            return self._executors[key]
        if key not in self._executors:
            from .limbs import pallas_ops
            self._executors[key] = pallas_ops.make_edwards_executor(
                self.ctx, batch, table_pts, sharder=sh,
                chunk=256 if self.cfg.pallas_interpret else 8192,
                interpret=self.cfg.pallas_interpret)
        return self._executors[key]

    def _ed_normalize(self, acc, sigmas: List[int], base_idx: int,
                      bound: int):
        """Host-normalize the Edwards accumulator at a chunk boundary (ONE
        batch modinv): returns (base_pts [(x, y)], u, w) with u/w the
        canonical Montgomery-x projective pair (Z+Y, Z-Y) for the
        checkpoint record.  A lane whose Z shares a factor with n is a
        find (harvested like the reference's inversion-failure path,
        /root/reference/ecm.c:1927-1939); it continues from the identity
        (0, 1) so batch shapes stay fixed."""
        from .limbs import layout as _layout
        ctx = self.ctx
        n = ctx.n_int
        arr = np.asarray(acc)
        xs = _layout.unpack_batch(arr[0], ctx.p.w)
        ys = _layout.unpack_batch(arr[1], ctx.p.w)
        zs = _layout.unpack_batch(arr[2], ctx.p.w)
        xc = [ctx.from_mont_int(v % n) for v in xs]
        yc = [ctx.from_mont_int(v % n) for v in ys]
        zc = [ctx.from_mont_int(v % n) for v in zs]
        invs, fnd = s2exec.host_batch_inverse(ctx, zc, premul=1)
        for i, f in fnd.items():
            if f:
                self._report_factor(f, 1, base_idx + i, sigmas[i], bound)
        base_pts = []
        for i in range(len(zc)):
            if i in fnd:
                base_pts.append((0, 1))          # identity: find reported
            else:
                base_pts.append((xc[i] * invs[i] % n, yc[i] * invs[i] % n))
        u = [(z + y) % n for z, y in zip(zc, yc)]
        w = [(z - y) % n for z, y in zip(zc, yc)]
        return base_pts, u, w

    def _run_batch_edwards(self, sigmas: List[int], base_idx: int
                           ) -> List[Tuple[int, int, int]]:
        """Stage 1 on a=-1 twisted Edwards curves (curve/edwards.py), then
        the unchanged Montgomery stage 2 on the birationally equivalent
        curve via (U : W) = (Z+Y : Z-Y) and (A+2)/4 = 1/(1+d).

        Stage 1 runs chunked: the scalar factorizes over prime chunks
        (s = s_c0 * s_c1 * ...), each chunk replays its own wNAF tape with
        the window table rebuilt from the normalized chunk-boundary point,
        and checkpoint.txt is appended per chunk — the same cadence as the
        Suyama path and the reference (/root/reference/ecm.c:1236-1312)."""
        from .curve import edops, edwards
        from .limbs import layout as _layout
        cfg, ctx = self.cfg, self.ctx
        t0 = time.time()
        curves = []
        for s in sigmas:
            for attempt in range(64):
                try:
                    curves.append(edwards.build_one_curve(ctx, s))
                    break
                except suyama.FactorFoundDuringBuild as e:
                    if e.factor:
                        self._report_factor(e.factor, 0, base_idx, e.sigma,
                                            cfg.b1)
                    s = s + 1_000_003
            else:
                raise RuntimeError(
                    "curve construction kept hitting gcd factors; "
                    "input has many small factors — divide them out first")
        sigmas_list = [c.sigma for c in curves]
        self.timings["build"] = self.timings.get("build", 0) + time.time() - t0

        t0 = time.time()
        chunk_list = list(self.stream.chunks(0, cfg.b1))
        acc = None
        base_pts = None          # None = the curves' own base points
        nprimes = 0
        for ci, (lo, hi, primes) in enumerate(chunk_list):
            is_final = ci == len(chunk_list) - 1
            tag = "" if len(chunk_list) == 1 else f"_c{lo}"
            tape, lead = edwards.cached_stage1_tape(
                primes, cfg.b1, cfg.cache_dir, include_two=(ci == 0),
                tag=tag)
            # (re)build window tables from the chunk's start point (may
            # harvest a factor from a non-invertible Z)
            try:
                pts, cached = edwards.build_batch_tables(
                    ctx, curves, base_pts=base_pts)
            except suyama.FactorFoundDuringBuild as e:
                if e.factor:
                    self._report_factor(e.factor, 1 if ci else 0, base_idx,
                                        e.sigma, cfg.b1)
                raise RuntimeError(
                    "window table hit a factor of n; rerun with fresh "
                    "sigmas or divide the reported factor out") from e
            acc0 = edwards.init_accumulator(ctx, pts, lead)
            if cfg.sharder is not None:
                acc0 = cfg.sharder.device_put(acc0)
                cached_dev = cfg.sharder.device_put(cached)
            else:
                cached_dev = cached
            run = self._ed_runner(len(sigmas), cached.shape[0])
            acc = run(acc0, tape, cached_dev)
            ndbl = int(np.count_nonzero(tape[:, 0] <= 1))
            nadd = int(np.count_nonzero((tape[:, 0] == 2) | (tape[:, 0] == 3)))
            self.counters["ptdups"] = self.counters.get("ptdups", 0) + ndbl + 1
            self.counters["ptadds"] = (self.counters.get("ptadds", 0) + nadd
                                       + cached.shape[0] - 1)
            nprimes += int(np.count_nonzero((primes < cfg.b1)
                                            & (primes > 2))) + (ci == 0)
            if not is_final:
                # mid-stage-1 checkpoint + next chunk's table base
                base_pts, u_c, w_c = self._ed_normalize(
                    acc, sigmas_list, base_idx,
                    min(int(primes[-1]), cfg.b1))
                self._check_batch(w_c, sigmas_list, 1,
                                  min(int(primes[-1]), cfg.b1), base_idx)
                self._write_save(cfg.checkpoint_path, sigmas_list, u_c, w_c,
                                 min(int(primes[-1]), cfg.b1),
                                 program="AVX-ECM-ED")
        self.counters["numprimes"] = (self.counters.get("numprimes", 0)
                                      + nprimes)
        # Montgomery handoff
        import jax.numpy as jnp
        u, w = edops.to_montgomery_pair(acc, self.dctx)
        pts0 = jnp.stack([u, w])
        xs = [ctx.from_mont_int(v % ctx.n_int)
              for v in _layout.unpack_batch(np.asarray(u), ctx.p.w)]
        zs = [ctx.from_mont_int(v % ctx.n_int)
              for v in _layout.unpack_batch(np.asarray(w), ctx.p.w)]
        self.timings["stage1"] = (self.timings.get("stage1", 0)
                                  + time.time() - t0)
        if cfg.verbose >= 2:
            print(f"Stage 1 (edwards) completed, "
                  f"{self.counters.get('ptadds', 0)} window-adds, "
                  f"{self.counters.get('ptdups', 0)} doublings")
        # the identity mod p shows as X=0 (and (0,-1) too); y=1 shows as W=0
        accX = [ctx.from_mont_int(v % ctx.n_int) for v in
                _layout.unpack_batch(np.asarray(acc[0]), ctx.p.w)]
        self._check_batch(accX, sigmas_list, 1, cfg.b1, base_idx)
        self._check_batch(zs, sigmas_list, 1, cfg.b1, base_idx)
        self._write_save(cfg.save_b1_path, sigmas_list, xs, zs, cfg.b1,
                         program="AVX-ECM-ED")
        residues = [(s, x, z) for s, x, z in zip(sigmas_list, xs, zs)]

        s_const = _layout.pack_batch([c.s_mont for c in curves],
                                     ctx.p.w, ctx.p.nw)
        s_plane = (cfg.sharder.device_put(s_const)
                   if cfg.sharder is not None else jnp.asarray(s_const))
        self._run_stage2(pts0, s_plane, sigmas_list, base_idx)
        return residues

    def run_batch(self, sigmas: List[int], base_idx: int) -> List[Tuple[int, int, int]]:
        cfg, ctx = self.cfg, self.ctx
        if cfg.curve_mode == "edwards":
            return self._run_batch_edwards(sigmas, base_idx)
        if self.engine == "rns":
            return self._run_batch_rns(sigmas, base_idx)
        t0 = time.time()
        curves = []
        for s in sigmas:
            # keep batch shape: on a gcd hit during construction, report the
            # factor and retry with fresh sigmas (an input with several small
            # factors can trip consecutive substitutes too)
            for attempt in range(64):
                try:
                    curves.append(suyama.build_one_curve(ctx, s))
                    break
                except suyama.FactorFoundDuringBuild as e:
                    if e.factor:
                        self._report_factor(e.factor, 0, base_idx, e.sigma,
                                            cfg.b1)
                    s = s + 1_000_003
            else:
                raise RuntimeError(
                    "curve construction kept hitting gcd factors; "
                    "input has many small factors — divide them out first")
        state = _stage1.init_state(
            ctx, [c.x_mont for c in curves], [c.z_mont for c in curves],
            [c.s_mont for c in curves], sharder=cfg.sharder)
        self.timings["build"] = self.timings.get("build", 0) + time.time() - t0

        # ---- stage 1 ----
        t0 = time.time()
        run_tape = self._tape_runner(len(sigmas))
        for chunk, state in _stage1.run_stage1(
                state, self.dctx, cfg.b1, self.stream,
                cache_dir=cfg.cache_dir, run_tape=run_tape,
                full_prac=cfg.full_prac):
            for k in ("ptadds", "ptdups", "numprimes"):
                self.counters[k] = (self.counters.get(k, 0)
                                    + getattr(chunk, k))
            if not chunk.is_final:
                # mid-stage-1 checkpoint (/root/reference/ecm.c:1236-1312)
                xs, zs = _stage1.extract_point(state, ctx)
                self._check_batch(zs, sigmas, 1, chunk.last_prime, base_idx)
                self._write_save(cfg.checkpoint_path, sigmas, xs, zs,
                                 chunk.last_prime)
        xs, zs = _stage1.extract_point(state, ctx)
        self.timings["stage1"] = (self.timings.get("stage1", 0)
                                  + time.time() - t0)
        if cfg.verbose >= 2:
            # mirrors "Stage 1 completed, %u point-adds, %u point-doubles"
            # (/root/reference/ecm.c:1849-1850)
            print(f"Stage 1 completed, {self.counters.get('ptadds', 0)} "
                  f"point-adds, {self.counters.get('ptdups', 0)} "
                  f"point-doubles over {self.counters.get('numprimes', 0)} "
                  f"primes")
        self._check_batch(zs, sigmas, 1, cfg.b1, base_idx)
        self._write_save(cfg.save_b1_path, sigmas, xs, zs, cfg.b1)
        residues = [(s, x, z) for s, x, z in zip(sigmas, xs, zs)]

        # ---- stage 2 ----
        self._run_stage2(state.pts[0], state.s_const, sigmas, base_idx)
        return residues

    def _stage2_chunk_bounds(self) -> List[Tuple[int, int]]:
        """Chunk bounds of the stage-2 prime walk — the stream.chunks
        protocol without materializing primes, so cached pairmaps skip
        the re-sieve as well as the re-plan."""
        out = []
        p = self.cfg.b1
        while p < self.b2:
            q = min(p + self.stream.chunk, self.b2)
            out.append((p, q))
            p = q
        return out

    def _iter_pairmaps(self, sp):
        """Yield each stage-2 chunk's pairmap, planning (sieve + pair) one
        chunk AHEAD on a background thread so the host planner overlaps the
        device replay of the previous chunk — the TPU analog of the
        reference overlapping thread 0's pair() with the other threads'
        compute (/root/reference/ecm.c:1449-1459).  At huge B2 (hundreds of
        1e8-prime chunks) serial planning would leave the chip idle between
        chunks; here the only exposed cost is recorded in
        timings['stage2_plan_wait'].  Cumulative sieve/pair wall (whether
        overlapped or not) lands in timings['stage2_sieve'/'stage2_pair']
        so the host-planning share of stage 2 is always measurable."""
        import concurrent.futures as _cf
        bounds = self._stage2_chunk_bounds()
        # a dedicated stream: the planner thread must not race the driver's
        # chunk cache (PrimeStream.load mutates self.primes)
        stream = PrimeStream(self.stream.chunk)
        timings = self.timings

        def make(lo: int, hi: int):
            t0 = time.time()
            primes = stream.load(lo, hi + 1000 if hi == self.b2 else hi)
            t1 = time.time()
            cached = s2plan.pair(sp, primes, lo, hi,
                                 verbose=self.cfg.verbose >= 2)
            t2 = time.time()
            timings["stage2_sieve"] = (timings.get("stage2_sieve", 0)
                                       + t1 - t0)
            timings["stage2_pair"] = timings.get("stage2_pair", 0) + t2 - t1
            return cached

        pool = _cf.ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="s2plan")
        futs: Dict[int, object] = {}

        def ensure(i: int):
            if (0 <= i < len(bounds) and i not in futs
                    and bounds[i] not in self._pairmaps):
                futs[i] = pool.submit(make, *bounds[i])

        try:
            ensure(0)
            for i, (lo, hi) in enumerate(bounds):
                ensure(i + 1)
                cached = self._pairmaps.get((lo, hi))
                if cached is None:
                    t0 = time.time()
                    cached = futs.pop(i).result()
                    timings["stage2_plan_wait"] = (
                        timings.get("stage2_plan_wait", 0) + time.time() - t0)
                    if (self._pairmap_entries + cached[0].size
                            <= self._pairmap_cap):
                        self._pairmaps[(lo, hi)] = cached
                        self._pairmap_entries += cached[0].size
                yield cached
        finally:
            for f in futs.values():
                f.cancel()
            pool.shutdown(wait=False)

    def _run_stage2(self, pts0, s_const, sigmas: List[int], base_idx: int,
                    ops=None):
        cfg, ctx = self.cfg, self.ctx
        if self.do_stage2:
            t0 = time.time()
            sp = s2plan.make_stage2_params(
                cfg.b1, self.b2, nw=self.ctx.p.nw,
                batch=int(pts0.shape[-1]))
            runner = s2exec.Stage2Runner(ctx, self.dctx, sp,
                                         pts0, s_const,
                                         cfg.b1, verbose=cfg.verbose >= 2,
                                         use_pallas=self.use_pallas,
                                         executor_cache=self._s2_executors,
                                         sharder=cfg.sharder,
                                         interpret=cfg.pallas_interpret,
                                         ops=ops)
            runner.init()
            self.timings["stage2_init"] = (self.timings.get("stage2_init", 0)
                                           + time.time() - t0)
            t0 = time.time()
            s2_pairs = s2_primes = 0
            for map_v, map_u, amin0, stats in self._iter_pairmaps(sp):
                s2_pairs += stats["pairs"]
                s2_primes += stats["primes"]
                runner.run_chunk(map_v, map_u, amin0)
            res = runner.result()
            self.timings["stage2"] = (self.timings.get("stage2", 0)
                                      + time.time() - t0)
            if cfg.verbose >= 1 and s2_primes:
                # pairing-efficiency report (/root/reference/ecm.c:2902-2906),
                # printed on BOTH planner paths (native and Python)
                print(f"stage 2: {s2_pairs} pairs from {s2_primes} primes "
                      f"(ratio = {s2_pairs / s2_primes:.2f})")
            self.counters["paired"] = (self.counters.get("paired", 0)
                                       + res.paired)
            self.counters["ptadds"] = (self.counters.get("ptadds", 0)
                                       + res.ptadds)
            self.counters["ptdups"] = (self.counters.get("ptdups", 0)
                                       + res.ptdups)
            self.counters["numinv"] = (self.counters.get("numinv", 0)
                                       + res.numinv)
            for i, f in res.factors.items():
                if f:
                    self._report_factor(f, 2, base_idx + i, sigmas[i], self.b2)
            self._check_batch(res.acc, sigmas, 2, self.b2, base_idx)

    # ------------------------------------------------------------------

    def run(self) -> RunResult:
        cfg = self.cfg
        if self._prp_input:
            return RunResult(n=cfg.n, work_modulus=cfg.n,
                             factors=self.factors, curves_run=0,
                             stage1_residues=[], timings={}, counters={})
        total = cfg.curves
        if cfg.batch:
            batch = cfg.batch
        elif self.use_pallas:
            # per-chip sweet spot: VMEM/register pressure scales with
            # nw * batch (measured optima 2048 lanes at nw=40, 896 at nw=93);
            # a sharded mesh takes the sweet spot PER DEVICE
            ndev = cfg.sharder.n if cfg.sharder is not None else 1
            if self.engine == "rns":
                from .limbs import rns_exec
                per_dev = rns_exec.default_batch(self._rns_host)
            else:
                from .limbs import pallas_ops
                per_dev = pallas_ops.default_batch(self.ctx)
            batch = min(max(total, 128 * ndev), per_dev * ndev)
        else:
            batch = total
        if self.use_pallas:
            # round the device batch to full 128-lane tiles PER DEVICE (the
            # reference rounds curves up to threads*VECLEN,
            # /root/reference/main.c:585)
            q = 128 * (cfg.sharder.n if cfg.sharder is not None else 1)
            batch = ((batch + q - 1) // q) * q
            total = ((total + q - 1) // q) * q
        elif cfg.sharder is not None:
            batch = cfg.sharder.round_batch(batch)
            total = cfg.sharder.round_batch(total)
        residues: List[Tuple[int, int, int]] = []
        done = 0
        if cfg.hit_flag is not None:
            # collective flags must agree on a poll budget up front: batch
            # size (hence boundary count) depends on the LOCAL device count
            # and engine, so hosts can differ — plan() all-gathers the max
            # and drain() pads the shortfall so all-gather counts match
            cfg.hit_flag.plan((total + batch - 1) // batch)
        try:
            while done < total:
                b = min(batch, total - done)
                sigmas = [self.sigma_gen.next() for _ in range(b)]
                if cfg.verbose:
                    print(f"Commencing curves {done}-{done + b - 1} "
                          f"of {total}")
                residues += self.run_batch(sigmas, done)
                done += b
                hit = len(self.factors) > self._initial_hits
                if cfg.hit_flag is not None:
                    # cross-host stop-on-factor: publish this host's bit and
                    # learn everyone's at the batch boundary — the phase
                    # granularity the reference stops at
                    # (/root/reference/ecm.c:1529-1535)
                    hit = cfg.hit_flag.poll(hit)
                if hit and cfg.stop_on_factor:
                    break
        finally:
            if cfg.hit_flag is not None:
                cfg.hit_flag.drain()
        return RunResult(n=cfg.n, work_modulus=self.ctx.n_int,
                         factors=self.factors, curves_run=done,
                         stage1_residues=residues, timings=dict(self.timings),
                         counters=dict(self.counters))


def run_ecm(n: int, curves: int, b1: int, **kw) -> RunResult:
    cfg = RunConfig(n=n, curves=curves, b1=b1, **kw)
    return ECMDriver(cfg).run()


def resume_stage2(path: str, b2: int, *,
                  results_path: Optional[str] = "ecm_results.txt",
                  verbose: int = 1,
                  cache_dir: Optional[str] = os.path.expanduser(
                      "~/.cache/tpu_ecm"),
                  force_no_mersenne: bool = False,
                  use_pallas: Optional[bool] = None,
                  prime_chunk: Optional[int] = None,
                  batch: Optional[int] = None,
                  sharder: Optional[object] = None) -> RunResult:
    """Run stage 2 (only) from a stage-1 savefile — the ecosystem workflow
    the reference delegates to `ecm -resume save_b1.txt`
    (/root/reference/README.md:8-10).  Works with files written by this
    program or avx-ecm: records carry SIGMA (Suyama parameterization), so
    the curve constant (A+2)/4 is rebuilt from sigma and the saved X, Z are
    lifted back into Montgomery form.  Useful to push a batch to a larger
    B2 without redoing stage 1.

    Records are processed in device-sized batch groups (default: the same
    per-chip VMEM sweet spot a fresh run uses, times the sharder's device
    count), so a file with tens of thousands of records neither blows the
    VMEM budget nor idles all but one chip; pairmaps and compiled executors
    are planned/built once and reused across groups, and factor finds are
    identical to a single-group run for any batch/sharding (the golden-
    sweep invariant).
    """
    with open(path) as f:
        recs = list(savefile.parse_records(f))
    if not recs:
        raise ValueError(f"no savefile records in {path}")
    ns = {r.n for r in recs}
    b1s = {r.b1 for r in recs}
    if len(ns) != 1 or len(b1s) != 1:
        raise ValueError(f"savefile mixes inputs/bounds: N x{len(ns)}, "
                         f"B1 x{len(b1s)}; split it first")
    n, b1 = ns.pop(), b1s.pop()
    if b2 <= b1:
        raise ValueError(f"B2 ({b2}) must exceed the savefile B1 ({b1})")
    if any(r.sigma <= 5 for r in recs):
        raise ValueError("record without a usable SIGMA; cannot rebuild "
                         "the curve constant")
    if any(r.param != 0 for r in recs):
        raise ValueError("only param-0 (Suyama sigma) records can be "
                         "resumed; this file uses another GMP-ECM "
                         "parameterization")

    cfg = RunConfig(n=n, curves=len(recs), b1=b1, b2=b2,
                    results_path=results_path, verbose=verbose,
                    cache_dir=cache_dir, force_no_mersenne=force_no_mersenne,
                    use_pallas=use_pallas, prime_chunk=prime_chunk,
                    save_b1_path=None, checkpoint_path=None,
                    stop_on_factor=False, sharder=sharder)
    d = ECMDriver(cfg)
    if d._prp_input:
        # a prime (or prime-power-base) input has nothing to resume
        return d.run()
    ctx = d.ctx
    ndev = sharder.n if sharder is not None else 1
    if batch is None:
        if d.use_pallas:
            if d.engine == "rns":
                from .limbs import rns_exec
                per_dev = rns_exec.default_batch(d._rns_host)
            else:
                from .limbs import pallas_ops
                per_dev = pallas_ops.default_batch(d.ctx)
            batch = per_dev * ndev
        else:
            batch = len(recs)
    # round the group to full 128-lane tiles per device on TPU (sharded CPU
    # runs only need equal per-device shards)
    q = 128 * ndev if d.use_pallas else (ndev if sharder is not None else 1)
    batch = max(q, (batch // q) * q)
    sigmas_all = [r.sigma for r in recs]
    if verbose:
        print(f"resuming {len(recs)} curves from {path} "
              f"(B1={b1}) into stage 2 to B2={b2}"
              + (f" in groups of {batch}" if len(recs) > batch else ""))

    import jax.numpy as _jnp
    for base in range(0, len(recs), batch):
        group = recs[base:base + batch]
        # pad to full lane tiles by repeating the last record (duplicate
        # curves produce duplicate hits, deduped by (factor, sigma))
        want = ((len(group) + q - 1) // q) * q
        group = group + [group[-1]] * (want - len(group))
        sigmas = [r.sigma for r in group]
        t0 = time.time()
        consts = [suyama.build_one_curve(ctx, s).s_mont for s in sigmas]
        s2ops = None
        if d.engine == "rns":
            # large-moduli resume rides the same RNS stage-2 path as a
            # fresh run (fixed sigma gives identical finds on any engine)
            from .limbs import rns_exec
            h = d._rns_host
            pts_np, sc_np = rns_exec.init_state(
                h, [r.x % ctx.n_int for r in group],
                [r.z % ctx.n_int for r in group],
                [ctx.from_mont_int(s) for s in consts])
            if sharder is not None:
                pts = sharder.device_put_state(pts_np)
                sc = sharder.device_put_plane(sc_np)
            else:
                pts, sc = _jnp.asarray(pts_np), _jnp.asarray(sc_np)
            state = _stage1.Stage1State(pts=pts, s_const=sc)
            s2ops = rns_exec.RnsOps(h, sharder=sharder)
        else:
            xs_m = [ctx.to_mont_int(r.x % ctx.n_int) for r in group]
            zs_m = [ctx.to_mont_int(r.z % ctx.n_int) for r in group]
            state = _stage1.init_state(ctx, xs_m, zs_m, consts,
                                       sharder=sharder)
        d.timings["build"] = d.timings.get("build", 0) + time.time() - t0
        # leftover stage-1 factors first (gcd of the saved Z)
        d._check_batch([r.z for r in group], sigmas, 1, b1, base)
        d._run_stage2(state.pts[0], state.s_const, sigmas, base, ops=s2ops)
    return RunResult(n=n, work_modulus=ctx.n_int, factors=d.factors,
                     curves_run=len(recs), stage1_residues=[],
                     timings=dict(d.timings), counters=dict(d.counters))
