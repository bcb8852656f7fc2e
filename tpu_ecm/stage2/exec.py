"""Stage-2 device execution: streamed baby-step table, global giant-step
chain, bulk batched inversion, and pairmap replay.

Mirrors ecm_stage2_init / ecm_stage2_pair (/root/reference/ecm.c:2201-2540)
with the TPU host/device split:

* the window-relative pairmap is flattened to GLOBAL giant-step indices
  (j = v - amin0 + U*s) so a prime chunk becomes one gather list; points
  are built in fixed-size groups on one differential-add chain (a Pallas
  chain kernel on TPU, lax.scan on CPU);
* Montgomery's inversion trick runs on device across each *point group*
  (Pallas prefix/apply kernels) and continues on the host across the
  *curve batch* (all curves share N): ONE modular inverse per group for
  the whole batch — versus one mpz_invert per SIMD lane per 2U-point
  window in the reference (/root/reference/ecm.c:1919-1950).  Padding
  rows are masked to the Montgomery one so the gcd-harvest detection set
  is identical for any grouping/engine;
* a curve whose Z-product is not invertible has gcd(Z..., N) > 1: that gcd
  is a factor, harvested exactly like the reference's inversion-failure
  path (/root/reference/ecm.c:1927-1939);
* the replay acc *= Pa_inv[pa] - PbX[pb] (CROSS_PRODUCT_INV,
  /root/reference/ecm.c:1857-1859) runs as a Pallas kernel whose scalar-
  prefetched indices drive pipelined row gathers (jnp gather + log-depth
  multiply tree on CPU); no-op pad entries multiply by (one - 0);
* the Pb baby-step table streams: chain group -> gather stored rows ->
  invert -> scatter affine-x into pbx; the full U*D-point table (tens of
  GB at U=16) never materializes.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import ops as curve_ops
from ..curve import prac
from ..limbs import jnp_ops, layout
from ..limbs.jnp_ops import DeviceCtx
from ..params import MontyCtx
from .plan import Stage2Params


# ---------------------------------------------------------------------------
# host batch inversion (one modular inverse for the whole curve batch)
# ---------------------------------------------------------------------------

def host_batch_inverse(ctx: MontyCtx, vals_mont: List[int],
                       premul: Optional[int] = None
                       ) -> Tuple[List[int], Dict[int, int]]:
    """Invert Montgomery-domain values sharing modulus N with one modinv.

    Input: canonical ints v_i = z_i * R mod N.  Output: device-pushable
    V_i = R^2 * v_i^-1 mod N (so mont_mul(X_m, V_i) = (x/z)*R mod N), plus
    {curve_index: factor} for curves with gcd(v_i, N) > 1 (factor == 0 when
    the gcd is trivial N itself); those curves get V_i = 0.  `premul`
    overrides the R^2 factor (the RNS engine passes P^2)."""
    n = ctx.n_int
    if premul is not None:
        r2 = premul % n
    else:
        r2 = (ctx.p.R * ctx.p.R) % n if not ctx.is_mersenne else 1
    b = len(vals_mont)
    factors: Dict[int, int] = {}
    vals = [v % n for v in vals_mont]
    good = []
    for i in range(b):
        g = math.gcd(vals[i], n)
        if g == 1:
            good.append(i)
        else:
            factors[i] = 0 if g == n else g
    out = [0] * b
    if good:
        prefix = []
        acc = 1
        for i in good:
            acc = acc * vals[i] % n
            prefix.append(acc)
        inv = pow(acc, -1, n)
        for k in range(len(good) - 1, -1, -1):
            i = good[k]
            pre = prefix[k - 1] if k > 0 else 1
            out[i] = (r2 * (inv * pre % n)) % n
            inv = inv * vals[i] % n
    return out, factors


# ---------------------------------------------------------------------------
# jitted device pieces
# ---------------------------------------------------------------------------

@jax.jit
def _jit_xdbl(x, z, s_const, dctx: DeviceCtx):
    return curve_ops.xdbl(x, z, s_const, dctx)


@jax.jit
def _z_prefix(zs, one_plane, dctx: DeviceCtx):
    """Running products of zs[0..K-1] -> [K, NW, B]."""

    def step(acc, z):
        # operands pre-safe (mirrors the pallas prefix kernel exactly)
        acc = jnp_ops.mulmod(acc, z, dctx, pre=True)
        return acc, acc

    _, prods = jax.lax.scan(step, one_plane, zs)
    return prods


@jax.jit
def _apply_inverse(xs, zs, prefix, total_inv, one_plane, dctx: DeviceCtx):
    """Given prefix products of zs and the inverse of the total product,
    return x_i * z_i^-1 for every i (suffix walk-back)."""
    k = zs.shape[0]
    pres = jnp.concatenate([one_plane[None], prefix[:k - 1]], axis=0)

    def step(suffix, operands):
        z_i, pre = operands
        # operands pre-safe (mirrors the pallas apply-inverse kernel)
        inv_i = jnp_ops.mulmod(suffix, pre, dctx, pre=True)
        suffix = jnp_ops.mulmod(suffix, z_i, dctx, pre=True)
        return suffix, inv_i

    _, invs = jax.lax.scan(step, total_inv, (zs[::-1], pres[::-1]))
    invs = invs[::-1]
    return jax.vmap(lambda x, z: jnp_ops.mulmod(x, z, dctx, pre=True))(
        xs, invs)


@jax.jit
def _pa_extend(carry_pts, pd, s_const, count_arr, dctx: DeviceCtx):
    """Giant steps: Pa[i] = Pa[i-1] + Pd (diff Pa[i-2]) repeated
    (/root/reference/ecm.c:2405-2424)."""

    def step(carry, _):
        p1, p2 = carry
        xo, zo = curve_ops.xadd(p1[0], p1[1], pd[0], pd[1],
                                p2[0], p2[1], dctx)
        pout = jnp.stack([xo, zo])
        return (pout, p1), pout

    _, pts = jax.lax.scan(step, carry_pts, count_arr)
    return pts


@jax.jit
def _replay_segment(acc, pa_inv_ext, pbx, idx, dctx: DeviceCtx):
    """acc *= prod over entries (Pa_inv[pa] - PbX[pb]); idx [T, 2] int32
    with T a power of two.  Entry (K, 0) with pa_inv_ext[K] = one and
    pbx[0] = 0 is a no-op pad.

    The cross products (CROSS_PRODUCT_INV, /root/reference/ecm.c:1857-1859)
    are data-parallel: bulk-gather all operands, take the elementwise
    difference, and multiply them together with a log-depth tree of
    vmapped mulmods — every level is one large batched VPU op instead of a
    latency-bound sequential scan."""
    pa_rows = jnp.take(pa_inv_ext, idx[:, 0], axis=0)   # [T, NW, B]
    pb_rows = jnp.take(pbx, idx[:, 1], axis=0)
    vals = pa_rows - pb_rows
    vm = jax.vmap(lambda a, b: jnp_ops.mulmod(a, b, dctx))
    t = vals.shape[0]
    while t > 1:
        half = t // 2
        vals = vm(vals[:half], vals[half:t])
        t = half
    return jnp_ops.mulmod(acc, vals[0], dctx)


@jax.jit
def _mul_planes(a, b, dctx: DeviceCtx):
    """Row-wise Montgomery products for stacked planes [K, NW, B]."""
    return jax.vmap(lambda x, y: jnp_ops.mulmod(x, y, dctx, pre=True))(a, b)


@jax.jit
def _replay_segment_noinv(acc, pa_ext, pbx, idx, dctx: DeviceCtx):
    """Inversion-free cross product: acc *= prod (Xa*Zb - Xb*Za) via the
    identity (Xa - Xb)(Za + Zb) + Xb*Zb - Xa*Za (the reference's
    CROSS_PRODUCT compile-time variant, /root/reference/ecm.c:1861-1866,
    selected when DO_STAGE2_INV is not defined; Paprod/Pbprod are the
    precomputed X*Z rows).  pa_ext rows are (X, Z, X*Z) stacks
    [K+1, 3, NW, B] whose pad row K is (one, one, 0); pbx rows likewise
    with pbx[0] = (0, 0, 0), so a pad entry (K, 0) contributes
    (1-0)(1+0) + 0 - 0 = the Montgomery one."""
    pa = jnp.take(pa_ext, idx[:, 0], axis=0)   # [T, 3, NW, B]
    pb = jnp.take(pbx, idx[:, 1], axis=0)

    def one_val(a, b):
        t1 = jnp_ops.submod_n(a[0], b[0], dctx)
        t2 = jnp_ops.addmod_n(a[1], b[1], dctx)
        t3 = jnp_ops.mulmod(t1, t2, dctx, pre=True)
        t4 = jnp_ops.addmod_n(t3, b[2], dctx)
        return jnp_ops.submod_n(t4, a[2], dctx)

    vals = jax.vmap(one_val)(pa, pb)
    vm = jax.vmap(lambda a, b: jnp_ops.mulmod(a, b, dctx, pre=True))
    t = vals.shape[0]
    while t > 1:
        half = t // 2
        vals = vm(vals[:half], vals[half:t])
        t = half
    return jnp_ops.mulmod(acc, vals[0], dctx)


def _run_ladder(pt, s_const, k: int, run_tape, num_slots: int,
                sharder=None):
    """[k]P via a host-planned binary-ladder tape (next_pt_vec analog).
    Tapes are NOP-padded to 64-step multiples so varying k re-uses a handful
    of compiled scan lengths instead of one per distinct k.  `run_tape` is
    the engine's 3-arg executor (pts, tape, s_const)."""
    tape, res_slot = prac.ladder_tape_result_slot(k)
    rows, b = pt.shape[1], pt.shape[2]
    pts = _zeros((num_slots, 2, rows, b), sharder)
    pts = pts.at[0].set(pt)
    if tape.shape[0]:
        tape = prac.pad_tape(tape, 64)
        pts = run_tape(pts, jnp.asarray(tape), s_const)
    return jnp.take(pts, res_slot, axis=0)


def _zeros(shape, sharder=None):
    """Batch-trailing int32 zeros, laid out over the sharder's mesh when
    given (keeps eager scatter/where updates from gathering the batch to
    one device)."""
    if sharder is None:
        return jnp.zeros(shape, dtype=jnp.int32)
    return sharder.device_put(np.zeros(shape, dtype=np.int32))


@functools.partial(jax.jit, donate_argnums=0)
def _scatter_rows_donated(tbl, idx, val):
    return tbl.at[idx].set(val)


def _scatter_rows(tbl, idx, val):
    """``tbl.at[idx].set(val)`` without double-buffering the table.

    The eager functional update allocates a second full table while the
    first is still live; at stage-2 init geometry (num_pb ~ 3.8k rows x
    nw x B planes) that transient copy IS the HBM peak — observed as a
    TPU RESOURCE_EXHAUSTED at 513-bit / 2048 curves / U=16
    (BENCH_NOTES round 4).  On accelerators the donated jit aliases the
    input buffer to the output (true in-place update); on CPU donation
    is unsupported, so keep the plain update there (tests run CPU and
    would otherwise warn on every call).  The gate reads the TABLE's
    placement, not the default backend: a table deliberately placed on
    CPU under a TPU default must not be migrated by the donated jit
    (ADVICE r4)."""
    try:
        platforms = {d.platform for d in tbl.devices()}
    except Exception:
        platforms = {jax.default_backend()}
    if platforms == {"cpu"}:
        return tbl.at[idx].set(val)
    return _scatter_rows_donated(tbl, jnp.asarray(idx), val)


# ---------------------------------------------------------------------------
# engine adapter: everything representation-specific behind one object
# ---------------------------------------------------------------------------

class DigitOps:
    """Digit-plane engine operations for Stage2Runner (the default).  The
    RNS twin is limbs/rns_exec.RnsOps; the runner's orchestration (group
    streaming, masking, batch-inversion protocol, replay) is engine-
    independent — fixed sigma must give identical factor finds on any
    engine (the golden-sweep invariant)."""

    num_slots = curve_ops.NUM_SLOTS

    def __init__(self, ctx: MontyCtx, dctx: DeviceCtx, sharder=None,
                 interpret: bool = False):
        self.ctx, self.dctx = ctx, dctx
        self.sharder = sharder
        self.interpret = interpret
        # modinv premultiplier override for host_batch_inverse (None: its
        # default R^2 / Mersenne-1 logic; the RNS engine passes P^2)
        self.inv_premul = None

    # host packing --------------------------------------------------------
    def one_plane_np(self, b: int) -> np.ndarray:
        return layout.broadcast_int(self.ctx.r_mod_n, self.ctx.p.w,
                                    self.ctx.p.nw, b)

    def pack(self, ints: List[int]) -> np.ndarray:
        return layout.pack_batch(ints, self.ctx.p.w, self.ctx.p.nw)

    def unpack(self, plane) -> List[int]:
        return layout.unpack_batch(np.asarray(plane), self.ctx.p.w)

    def from_mont_int(self, v: int) -> int:
        return self.ctx.from_mont_int(v % self.ctx.n_int)

    # jitted jnp ops ------------------------------------------------------
    def xdbl(self, x, z, s_const):
        return _jit_xdbl(x, z, s_const, self.dctx)

    def jit_run_tape(self):
        f = jax.jit(curve_ops.run_tape)
        return lambda pts, tape, s: f(pts, tape, s, self.dctx)

    def z_prefix(self, zs, one_plane):
        return _z_prefix(zs, one_plane, self.dctx)

    def apply_inverse(self, xs, zs, prefix, total_inv, one_plane):
        return _apply_inverse(xs, zs, prefix, total_inv, one_plane,
                              self.dctx)

    def pa_extend(self, carry_pts, pd, s_const, count_arr):
        return _pa_extend(carry_pts, pd, s_const, count_arr, self.dctx)

    def replay_segment(self, acc, pa_inv_ext, pbx, idx):
        return _replay_segment(acc, pa_inv_ext, pbx, idx, self.dctx)

    def mul_planes(self, a, b):
        return _mul_planes(a, b, self.dctx)

    def replay_segment_noinv(self, acc, pa_ext, pbx, idx):
        return _replay_segment_noinv(acc, pa_ext, pbx, idx, self.dctx)

    # pallas executor factories ------------------------------------------
    def make_chain(self, b, count):
        from ..limbs import pallas_ops
        return pallas_ops.make_chain_executor(
            self.ctx, b, count, sharder=self.sharder,
            interpret=self.interpret)

    def make_prefix(self, b, count):
        from ..limbs import pallas_ops
        return pallas_ops.make_prefix_executor(
            self.ctx, b, count, sharder=self.sharder,
            interpret=self.interpret)

    def make_apply(self, b, count):
        from ..limbs import pallas_ops
        return pallas_ops.make_apply_inverse_executor(
            self.ctx, b, count, sharder=self.sharder,
            interpret=self.interpret)

    def make_replay(self, b, pa_rows, pb_rows, t_block, entries_per_step):
        from ..limbs import pallas_ops
        return pallas_ops.make_replay_executor(
            self.ctx, b, pa_rows=pa_rows, pb_rows=pb_rows, t_block=t_block,
            entries_per_step=entries_per_step, sharder=self.sharder,
            interpret=self.interpret)

    def make_replay_resident(self, b, pa_rows, slab_rows, t_block,
                             entries_per_step):
        from ..limbs import pallas_ops
        return pallas_ops.make_replay_resident_executor(
            self.ctx, b, pa_rows=pa_rows, slab_rows=slab_rows,
            t_block=t_block, entries_per_step=entries_per_step,
            sharder=self.sharder, interpret=self.interpret)

    def make_replay_parow(self, b, pa_rows, pb_rows, nsteps,
                          entries_per_step):
        from ..limbs import pallas_ops
        return pallas_ops.make_replay_parow_executor(
            self.ctx, b, pa_rows=pa_rows, pb_rows=pb_rows, nsteps=nsteps,
            entries_per_step=entries_per_step, sharder=self.sharder,
            interpret=self.interpret)

    def make_replay_stream(self, b, pa_rows, pb_rows, t_block, n_buffers,
                           unroll=1, packed=False, n_acc=1, tree=0):
        from ..limbs import pallas_ops
        return pallas_ops.make_replay_stream_executor(
            self.ctx, b, pa_rows=pa_rows, pb_rows=pb_rows, t_block=t_block,
            n_buffers=n_buffers, unroll=unroll, packed=packed, n_acc=n_acc,
            tree=tree, sharder=self.sharder, interpret=self.interpret)

    def pack_replay_rows(self, rows):
        from ..limbs import pallas_ops
        return jax.jit(functools.partial(pallas_ops.pack_replay_rows,
                                         self.ctx))(rows)


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Stage2Result:
    acc: List[int]                  # canonical accumulator per curve (mod n)
    factors: Dict[int, int]         # curve -> factor found during inversions
    paired: int
    ptadds: int
    ptdups: int
    numinv: int


class Stage2Runner:
    """Per-batch stage-2 state machine (phases 2+3 of vececm)."""

    def __init__(self, ctx: MontyCtx, dctx: DeviceCtx, sp: Stage2Params,
                 pt, s_const, b1: int, verbose: bool = False,
                 use_pallas: bool = False,
                 executor_cache: Optional[Dict] = None,
                 sharder=None, interpret: bool = False, ops=None,
                 cross: Optional[str] = None):
        self.ctx, self.dctx, self.sp = ctx, dctx, sp
        self.ops = ops if ops is not None else DigitOps(
            ctx, dctx, sharder=sharder, interpret=interpret)
        # cross-product form (the reference's DO_STAGE2_INV compile switch,
        # /root/reference/ecm.c:2526-2530): "inv" normalizes points with
        # batched inversions and accumulates 1 mul/pair (the reference's
        # shipped configuration and the measured-fastest form here — the
        # TPU pays ONE host modinv per point group already); "noinv" keeps
        # points projective, carries X*Z product rows, and accumulates the
        # 2-mul identity with ZERO inversions (and therefore no
        # inversion-failure factor harvests, exactly like the reference's
        # CROSS_PRODUCT build).  noinv runs on the jnp path (XLA on either
        # backend); no Pallas twin is built for a measured-slower form.
        self.cross = cross or os.environ.get("TPU_ECM_CROSS", "inv")
        if self.cross not in ("inv", "noinv"):
            raise ValueError(f"unknown cross-product form {self.cross!r}")
        if self.cross == "noinv" and not hasattr(self.ops,
                                                 "replay_segment_noinv"):
            raise ValueError("cross='noinv' requires the digit engine")
        self.pt = pt                  # stage-1 point [2, planes, B]
        self.s_const = s_const
        self.b1 = b1
        self.verbose = verbose
        b = pt.shape[2]
        self.b = b
        self.sharder = sharder
        self.interpret = interpret
        b_local = b // sharder.n if sharder is not None else b
        self.use_pallas = use_pallas and b_local % 128 == 0
        # compiled-executor cache, shareable across runners (the driver makes
        # one runner per curve batch; executors depend only on (kind, size));
        # keys carry the engine so digit/RNS runners never collide
        self._cache = executor_cache if executor_cache is not None else {}
        self._ek = type(self.ops).__name__
        # bigger Pa groups / replay blocks on TPU (fewer host syncs and
        # kernel launches); modest on the jnp fallback so CPU tests stay
        # fast; tiny in interpret mode (grid steps execute one by one)
        if self.use_pallas and interpret:
            self.pa_group, self.replay_block = 64, 256
        elif self.use_pallas:
            # 64k-entry replay blocks: ~13.7 ms host dispatch per pallas
            # call makes block count the first-order stage-2 cost
            self.pa_group, self.replay_block = 4096, 65536
        else:
            self.pa_group, self.replay_block = 512, 4096
        # env override for the hardware sweep (tools/hw_replay_modes.py):
        # resident-mode replay re-DMAs its Pb slab once per kernel call, so
        # a larger block amortizes the slab upload over more entries
        rb = os.environ.get("TPU_ECM_REPLAY_BLOCK")
        if rb:
            self.replay_block = int(rb)
        # Pa/Pb group size override: the init and giant-step loops hold
        # [G, 2, nw, B] chain buffers plus same-order inversion transients,
        # so at large B*nw the default G=4096 exceeds HBM next to the
        # num_pb-row Pb table (513-bit/2048-curve/U=16: ~3 GB per group
        # buffer + 2.8 GB table -> RESOURCE_EXHAUSTED, BENCH_NOTES round
        # 4).  Smaller G trades ~13.7 ms of extra replay dispatch per
        # group boundary for a proportionally lower peak.
        one = self.ops.one_plane_np(b)
        pg = os.environ.get("TPU_ECM_PA_GROUP")
        if pg:
            self.pa_group = int(pg)
        elif self.use_pallas and not interpret:
            # AUTO-SIZE the group to the measured HBM envelope (round 5:
            # the 624-bit/2048-curve/U=16 config OOMed exactly like the
            # round-4 513-bit row until TPU_ECM_PA_GROUP was set by hand
            # — the runner should apply its own rule).  Peak model
            # (BENCH_NOTES round 4): Pb table num_pb*rows*B*4 plus ~3
            # chain/inversion transients of G*2*rows*B*4 within ~12 GB
            # usable of the 16 GB chip.  rows = per-value plane rows for
            # WHICHEVER engine (digit nw / RNS residue rows), read off
            # the one-plane the engine just built.
            nwrows = int(one.shape[0])
            budget = 12 * 2 ** 30 - sp.num_pb * nwrows * b * 4
            # 4*2 plane-equivalents per G row: ~3 chain/inversion transients
            # (round-4 peak model) + one deferred (xs, zs, pre) stack held
            # live by the one-group-ahead pipeline (fused path)
            g = budget // max(1, 4 * 2 * nwrows * b * 4)
            while self.pa_group > 64 and self.pa_group > g:
                self.pa_group //= 2
        # fused per-group pipelines (see "fused group pipelines" below):
        # default on for every pallas path; TPU_ECM_FUSED=0 restores the
        # eager per-op composition for dispatch A/Bs
        self.fused = (self.use_pallas
                      and os.environ.get("TPU_ECM_FUSED", "1") != "0")
        self.one_plane = (sharder.device_put(one) if sharder is not None
                          else jnp.asarray(one))
        self.acc = self.one_plane     # mdata->one init (/root/reference/ecm.c:2318)
        self.factors: Dict[int, int] = {}
        self.paired = 0
        self.ptadds = 0
        self.ptdups = 0               # point-doubles (ecm_work->ptdups)
        self.numinv = 0
        if (self._ek, "run_tape") not in self._cache:
            self._cache[(self._ek, "run_tape")] = self.ops.jit_run_tape()
        self.run_tape = self._cache[(self._ek, "run_tape")]
        self.pbx: Optional[jax.Array] = None
        self.pd = None

    def _count_tape(self, tape: np.ndarray):
        """ADD/DUP op counters for a host-planned tape (the reference counts
        every vec_add/vec_duplicate, /root/reference/avx_ecm.h:248-252)."""
        if tape.shape[0]:
            opc = np.asarray(tape)[:, 0]
            self.ptadds += int(np.count_nonzero(opc == curve_ops.OP_ADD))
            self.ptdups += int(np.count_nonzero(opc == curve_ops.OP_DUP))

    def _ladder(self, pt, k: int):
        self._count_tape(prac.ladder_tape_result_slot(k)[0])
        return _run_ladder(pt, self.s_const, k, self.run_tape,
                           self.ops.num_slots, sharder=self.sharder)

    # -- inversion helper ---------------------------------------------------

    def _harvest_inverse(self, total_plane):
        """ONE host modinv for a prefix-product total; harvests
        inversion-failure gcds into self.factors (the reference's
        batch-invert gcd detection, /root/reference/ecm.c:2002-2133).
        Returns the packed total-inverse plane."""
        self.numinv += 1
        total = self.ops.unpack(total_plane)
        inv_ints, fnd = host_batch_inverse(self.ctx, total,
                                           premul=self.ops.inv_premul)
        for i, f in fnd.items():
            if f and i not in self.factors:
                self.factors[i] = f
        return jnp.asarray(self.ops.pack(inv_ints))

    def _invert_planes(self, xs, zs):
        """x_i/z_i in Montgomery form for stacked planes [K, ...]; one host
        modinv for the whole (K x B) block."""
        k = int(zs.shape[0])
        if self.use_pallas:
            if (self._ek, "prefix", k) not in self._cache:
                self._cache[(self._ek, "prefix", k)] = \
                    self.ops.make_prefix(self.b, k)
                self._cache[(self._ek, "apply", k)] = \
                    self.ops.make_apply(self.b, k)
            prefix = self._cache[(self._ek, "prefix", k)](zs, self.one_plane)
        else:
            prefix = self.ops.z_prefix(zs, self.one_plane)
        total_inv = self._harvest_inverse(prefix[-1])
        if self.use_pallas:
            pres = jnp.concatenate([self.one_plane[None], prefix[:-1]],
                                   axis=0)
            return self._cache[(self._ek, "apply", k)](xs, zs, pres,
                                                       total_inv)
        return self.ops.apply_inverse(xs, zs, prefix, total_inv,
                                      self.one_plane)

    def _invert_planes_grouped(self, xs, zs):
        """Grouped batch inversion for arbitrary-K stacks (bounds the scan
        intermediates: at U=16 the Pb table is ~7.7k rows and a single
        prefix/suffix scan would materialize ~11 GB).  Tail rows are masked
        to the Montgomery one so the gcd-harvest detection set is exactly
        the real rows for any grouping."""
        G = self.pa_group
        k = int(zs.shape[0])
        outs = []
        for lo in range(0, k, G):
            sx, sz = xs[lo:lo + G], zs[lo:lo + G]
            cnt = int(sz.shape[0])
            if cnt < G:
                pad = jnp.broadcast_to(self.one_plane[None],
                                       (G - cnt,) + tuple(self.one_plane.shape))
                sx = jnp.concatenate([sx, pad], axis=0)
                sz = jnp.concatenate([sz, pad], axis=0)
            inv = self._invert_planes(sx, sz)
            outs.append(inv[:cnt])
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    # -- fused group pipelines (dispatch economy) ---------------------------
    #
    # Through the axon tunnel every device call costs ~13.7 ms of host
    # dispatch (BENCH_NOTES round 3), and the init / giant-step loops run
    # one G-point group per iteration.  Composed eagerly, each group pays
    # ~8-10 dispatches (chain, slices, gathers, masks, prefix, concats,
    # apply, scatter); fused under one jit per phase it pays TWO plus the
    # unavoidable host-modinv round-trip.  Value semantics are identical —
    # the fused bodies inline the SAME cached chain/prefix/apply executors
    # the eager path calls (golden-sweep invariant); TPU_ECM_FUSED=0
    # restores the eager composition for A/B.

    def _ensure_group_kernels(self):
        G = self.pa_group
        if (self._ek, "chain", G) not in self._cache:
            self._cache[(self._ek, "chain", G)] = self.ops.make_chain(self.b,
                                                                      G)
        if (self._ek, "prefix", G) not in self._cache:
            self._cache[(self._ek, "prefix", G)] = \
                self.ops.make_prefix(self.b, G)
            self._cache[(self._ek, "apply", G)] = \
                self.ops.make_apply(self.b, G)

    def _fused_prep(self, gather: bool):
        """chain-extend G points -> (optional stored-row gather) -> mask tail
        rows to the Montgomery one -> prefix products, as ONE device call.
        Returns (new_last, new_prev, xs, zs, prefix, prefix_total)."""
        G = self.pa_group
        key = (self._ek, "fprep", G, gather)
        if key not in self._cache:
            self._ensure_group_kernels()
            chain = self._cache[(self._ek, "chain", G)]
            prefix_f = self._cache[(self._ek, "prefix", G)]

            def mask_prefix(group, xs, zs, m, one):
                rows = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0)
                xs = jnp.where(rows < m, xs, one[None])
                zs = jnp.where(rows < m, zs, one[None])
                pre = prefix_f(zs, one)
                return group[-1], group[-2], xs, zs, pre, pre[-1]

            if gather:
                def body(p1, p2, pd, gi, m, one):
                    group = chain(p1, p2, pd)
                    xs = jnp.take(group[:, 0], gi, axis=0)
                    zs = jnp.take(group[:, 1], gi, axis=0)
                    return mask_prefix(group, xs, zs, m, one)
            else:
                def body(p1, p2, pd, m, one):
                    group = chain(p1, p2, pd)
                    return mask_prefix(group, group[:, 0], group[:, 1], m,
                                       one)
            self._cache[key] = jax.jit(body)
        return self._cache[key]

    def _fused_apply_scatter(self, donate: bool):
        """suffix-apply the batch inversion and scatter the affine rows into
        the Pb table, as ONE device call (donated in-place on accelerators,
        same gate as _scatter_rows)."""
        key = (self._ek, "fscat", self.pa_group, donate)
        if key not in self._cache:
            self._ensure_group_kernels()
            apply_f = self._cache[(self._ek, "apply", self.pa_group)]

            def body(pbx, xs, zs, pre, tinv, sl, one):
                pres = jnp.concatenate([one[None], pre[:-1]], axis=0)
                inv = apply_f(xs, zs, pres, tinv)
                return pbx.at[sl].set(inv)
            self._cache[key] = jax.jit(
                body, donate_argnums=(0,) if donate else ())
        return self._cache[key]

    def _fused_apply_ext(self):
        """suffix-apply + append the Montgomery-one pad row (the replay
        kernels' pad gather target), as ONE device call."""
        key = (self._ek, "fext", self.pa_group)
        if key not in self._cache:
            self._ensure_group_kernels()
            apply_f = self._cache[(self._ek, "apply", self.pa_group)]

            def body(xs, zs, pre, tinv, one):
                pres = jnp.concatenate([one[None], pre[:-1]], axis=0)
                inv = apply_f(xs, zs, pres, tinv)
                return jnp.concatenate([inv, one[None]], axis=0)
            self._cache[key] = jax.jit(body)
        return self._cache[key]

    # One-group-ahead pipelining: prep(g+1) is DISPATCHED before group g's
    # prefix total is pulled, so the ~34 ms tunnel round-trip + ~30 ms host
    # inversion math of group g overlap group g's replay / group g+1's chain
    # on device (measured latencies in NEXT.md).  Finish order stays
    # g, g+1, ... — the inversion-failure harvest set and its first-find-
    # per-curve ordering are identical to the unpipelined fused path.
    # Depth 2 keeps one extra (xs, zs, pre) stack live; the auto-G HBM
    # divisor in __init__ accounts for it.

    @staticmethod
    def _start_host_copy(total):
        try:                          # overlap the device->host pull with
            total.copy_to_host_async()  # the next group's device work
        except Exception:
            pass                      # np.asarray in unpack will block

    def _finish_init_group(self, pbx, donate, xs, zs, pre, total, sl):
        tinv = self._harvest_inverse(total)
        return self._fused_apply_scatter(donate)(
            pbx, xs, zs, pre, tinv, sl, self.one_plane)

    def _finish_giant_group(self, xs, zs, pre, total, idx):
        tinv = self._harvest_inverse(total)
        pa_inv_ext = self._fused_apply_ext()(xs, zs, pre, tinv,
                                             self.one_plane)
        self._replay(pa_inv_ext, idx)
        self.paired += int(idx.shape[0])

    def _extend(self, p1, p2, count: int, pd=None):
        """count new chain points out[i] = out[i-1] + pd (diff out[i-2]) from
        carry (p1, p2) = (newest, previous)."""
        if pd is None:
            pd = self.pd
        if self.use_pallas:
            if (self._ek, "chain", count) not in self._cache:
                self._cache[(self._ek, "chain", count)] = \
                    self.ops.make_chain(self.b, count)
            return self._cache[(self._ek, "chain", count)](p1, p2, pd)
        cnt = jnp.zeros((count,), dtype=jnp.int32)
        return self.ops.pa_extend((p1, p2), pd, self.s_const, cnt)

    # -- phase 2: init ------------------------------------------------------

    def init(self):
        if self.cross == "noinv":
            return self._init_noinv()
        sp = self.sp
        # The Pb chain S_d = S_{d-1} + Q (diff S_{d-2}) is the same
        # differential-add chain as the giant steps: reuse the chain
        # executor with pd = Q, built in bounded groups (umax = U*D can be
        # ~37k points = tens of GB if materialized at once).  Each group is
        # streamed: gather the phi-coprime stored rows, batch-invert them
        # (non-stored gather slots masked to the Montgomery one so the
        # gcd-harvest detection set is exactly the stored table, matching
        # the reference's batch_invert of Pb, ecm.c:2322), and scatter the
        # affine-x rows straight into pbx — the full [num_pb, 2, ...] table
        # never exists.
        q1 = self.pt
        x2, z2 = self.ops.xdbl(q1[0], q1[1], self.s_const)
        self.ptdups += 1
        q2 = jnp.stack([x2, z2])
        nw, b = q1.shape[1], q1.shape[2]
        inv12 = self._invert_planes_grouped(
            jnp.stack([q1[0], q2[0]]), jnp.stack([q1[1], q2[1]]))
        pbx = _zeros((sp.num_pb, nw, b), self.sharder)
        pbx = _scatter_rows(pbx, jnp.array([1, 2]), inv12)
        G = self.pa_group
        rows = jnp.arange(G)[:, None, None]
        try:
            donate = {d.platform for d in pbx.devices()} != {"cpu"}
        except Exception:
            donate = jax.default_backend() != "cpu"
        p_last, p_prev = q2, q1
        flush = None
        for base in range(3, sp.umax + 1, G):
            cnt = min(G, sp.umax + 1 - base)
            slots = sp.rprime_map[base:base + cnt].astype(np.int64)
            sel = np.nonzero(slots)[0]
            gi = np.zeros(G, dtype=np.int32)
            gi[:sel.size] = sel
            m = int(sel.size)
            sl = np.zeros(G, dtype=np.int32)
            sl[:m] = slots[sel]
            if self.fused:
                prep = self._fused_prep(gather=True)
                p_last, p_prev, gx, gz, pre, total = prep(
                    p_last, p_prev, q1, jnp.asarray(gi), np.int32(m),
                    self.one_plane)
                self._start_host_copy(total)
                if flush is not None:
                    pbx = self._finish_init_group(pbx, donate, *flush)
                flush = (gx, gz, pre, total, jnp.asarray(sl))
            else:
                group = self._extend(p_last, p_prev, G, pd=q1)
                p_last, p_prev = group[-1], group[-2]
                gx = jnp.take(group[:, 0], jnp.asarray(gi), axis=0)
                gz = jnp.take(group[:, 1], jnp.asarray(gi), axis=0)
                gx = jnp.where(rows < m, gx, self.one_plane[None])
                gz = jnp.where(rows < m, gz, self.one_plane[None])
                inv = self._invert_planes(gx, gz)
                pbx = _scatter_rows(pbx, sl, inv)
        if flush is not None:
            pbx = self._finish_init_group(pbx, donate, *flush)
        # padded scatter rows land in slot 0, which must stay the zero row
        # (replay pad entries read pbx[0] = 0)
        zero = jnp.zeros_like(pbx[:1])
        self.pbx = _scatter_rows(pbx, jnp.array([0]), zero)
        self.ptadds += sp.umax - 2
        # Pd = [D]Q (not inverted), /root/reference/ecm.c:2331-2334
        self.pd = self._ladder(self.pt, sp.D)
        return self

    def _init_noinv(self):
        """Inversion-free init: the Pb table keeps PROJECTIVE rows
        (X, Z, X*Z) — the reference's Pb + Pbprod arrays
        (/root/reference/ecm.c:2201-2340 builds Pbprod alongside Pb when
        CROSS_PRODUCT is the active form) — so no batch inversion runs and
        no inversion-failure harvest exists, matching that build's
        behavior.  Same streamed group chain as init(); three planes are
        scattered per stored row instead of one affine row."""
        sp = self.sp
        q1 = self.pt
        x2, z2 = self.ops.xdbl(q1[0], q1[1], self.s_const)
        self.ptdups += 1
        q2 = jnp.stack([x2, z2])
        nw, b = q1.shape[1], q1.shape[2]
        pbx = _zeros((sp.num_pb, 3, nw, b), self.sharder)
        prods = self.ops.mul_planes(jnp.stack([q1[0], q2[0]]),
                                    jnp.stack([q1[1], q2[1]]))
        pbx = _scatter_rows(
            pbx, jnp.array([1, 2]),
            jnp.stack([jnp.stack([q1[0], q1[1], prods[0]]),
                       jnp.stack([q2[0], q2[1], prods[1]])]))
        G = self.pa_group
        p_last, p_prev = q2, q1
        for base in range(3, sp.umax + 1, G):
            cnt = min(G, sp.umax + 1 - base)
            group = self._extend(p_last, p_prev, G, pd=q1)
            p_last, p_prev = group[-1], group[-2]
            slots = sp.rprime_map[base:base + cnt].astype(np.int64)
            sel = np.nonzero(slots)[0]
            gi = np.zeros(G, dtype=np.int32)
            gi[:sel.size] = sel
            gx = jnp.take(group[:, 0], jnp.asarray(gi), axis=0)
            gz = jnp.take(group[:, 1], jnp.asarray(gi), axis=0)
            gp = self.ops.mul_planes(gx, gz)
            sl = np.zeros(G, dtype=np.int32)
            sl[:sel.size] = slots[sel]
            pbx = _scatter_rows(pbx, sl, jnp.stack([gx, gz, gp], axis=1))
        # padded scatter rows land in slot 0, which must be the all-zero
        # row (pad replay entries read pbx[0] = (0, 0, 0))
        zero = jnp.zeros_like(pbx[:1])
        self.pbx = _scatter_rows(pbx, jnp.array([0]), zero)
        self.ptadds += sp.umax - 2
        self.pd = self._ladder(self.pt, sp.D)
        return self

    # -- phase 3: per-chunk pairmap replay ----------------------------------
    #
    # The reference interleaves window shifts with pairing and pays one
    # mpz_invert per lane per 2U-point extension (ecm.c:2458-2501).  Here the
    # executor contract (amin advances by U per (0,0) sentinel, local index
    # v - amin into a 2L window of points spaced D apart) is flattened to a
    # single *global* giant-step index
    #
    #     j = (v - amin_s) + 2*U*s = v - amin0 + U*s,   Pa[j] = [(2*amin0+j)*D]Q
    #
    # so a chunk's pairmap becomes one list of (j, pb) gather entries whose
    # product order is irrelevant.  Points are built once, in fixed-size
    # groups (a contiguous differential-add chain), each group batch-inverted
    # with ONE host modinv for the whole (group x curve-batch) block — vs one
    # inversion round-trip per window shift.  This keeps the device busy and
    # bounds host syncs per chunk to #groups (~ a handful).

    def _entries_global(self, map_v: np.ndarray, map_u: np.ndarray,
                        amin0: int) -> np.ndarray:
        """Pairmap -> [T, 2] int64 (global Pa index j, Pb storage index)."""
        sp = self.sp
        v = map_v.astype(np.int64)
        u = map_u.astype(np.int64)
        sent = (v == 0) & (u == 0)
        shifts = np.cumsum(sent)                 # s at each position
        keep = ~sent
        j = v[keep] - amin0 + sp.U * shifts[keep]
        win_lo = 2 * sp.U * shifts[keep]
        assert j.size == 0 or (
            (j >= win_lo).all() and (j < win_lo + 2 * sp.L).all()), \
            "pairmap v outside its window"
        pb = sp.rprime_map[u[keep]].astype(np.int64)
        assert (pb > 0).all()
        return np.stack([j, pb], axis=1)

    def run_chunk(self, map_v: np.ndarray, map_u: np.ndarray, amin0: int):
        """Replay one chunk's pairmap (built by plan.pair for this chunk)."""
        sp = self.sp
        entries = self._entries_global(map_v, map_u, amin0)
        if entries.shape[0] == 0:
            return
        order = np.argsort(entries[:, 0], kind="stable")
        entries = entries[order]
        max_j = int(entries[-1, 0])
        G = self.pa_group

        # chain seeds.  Pa_global[j] = [(2*amin0 + j) * D]Q = [2*amin0 + j]Pd,
        # so ONE ladder over Pd for k = 2*amin0 - 2 yields both seeds
        # ([k]Pd, [k+1]Pd) = (global[-2], global[-1]) and every group is a
        # uniform G-step extension (single compiled shape, no concat).
        k = 2 * amin0 - 2
        pending = None
        if k >= 1:
            tape, lo, hi = prac.ladder_pair_tape(k)
            self._count_tape(tape)
            tape = prac.pad_tape(tape, 64)
            nw_, b_ = self.pt.shape[1], self.pt.shape[2]
            pts = _zeros((self.ops.num_slots, 2, nw_, b_),
                         self.sharder).at[0].set(self.pd)
            pts = self.run_tape(pts, jnp.asarray(tape), self.s_const)
            p_prev, p_last = pts[lo], pts[hi]
        else:
            # amin0 <= 1: [2*amin0-2]Pd would be the point at infinity; seed
            # from Q ladders and fold Pa[0] in as the first group row
            a_val = 2 * amin0 * sp.D
            p_last = self._ladder(self.pt, a_val)            # global[0]
            p_prev = self._ladder(self.pt, a_val - sp.D)     # global[-1]
            pending = p_last

        pos = 0
        base = 0
        flush = None
        while base <= max_j:
            hi = np.searchsorted(entries[:, 0], base + G)
            # fused fast path: one prep call + one apply call per group
            # instead of ~8 eager dispatches, finished one group BEHIND so
            # the host round-trip hides under device replay (see "fused
            # group pipelines" / pipelining note above)
            if (self.fused and pending is None and hi > pos
                    and self.cross != "noinv"):
                valid = min(max_j - base + 1, G)
                prep = self._fused_prep(gather=False)
                p_last, p_prev, xs, zs, pre, total = prep(
                    p_last, p_prev, self.pd, np.int32(valid), self.one_plane)
                self.ptadds += G
                self._start_host_copy(total)
                if flush is not None:
                    self._finish_giant_group(*flush)
                idx = np.stack([entries[pos:hi, 0] - base,
                                entries[pos:hi, 1]], axis=1).astype(np.int32)
                flush = (xs, zs, pre, total, idx)
                pos = hi
                base += G
                continue
            if flush is not None:      # keep inversion/harvest order before
                self._finish_giant_group(*flush)   # any eager-path group
                flush = None
            # build global points [base, base+G)
            if pending is not None:
                rest = self._extend(p_last, p_prev, G - 1)
                group = jnp.concatenate([pending[None], rest], axis=0)
                pending = None
                self.ptadds += G - 1
            else:
                group = self._extend(p_last, p_prev, G)
                self.ptadds += G
            p_last, p_prev = group[-1], group[-2]

            if hi > pos:
                idx = np.stack([entries[pos:hi, 0] - base,
                                entries[pos:hi, 1]], axis=1).astype(np.int32)
                if self.cross == "noinv":
                    # projective form: no masking needed (nothing is
                    # inverted; pad chain rows are never referenced by idx)
                    xs, zs = group[:, 0], group[:, 1]
                    prod = self.ops.mul_planes(xs, zs)
                    pad = jnp.stack([self.one_plane, self.one_plane,
                                     jnp.zeros_like(self.one_plane)])
                    pa_ext = jnp.concatenate(
                        [jnp.stack([xs, zs, prod], axis=1), pad[None]],
                        axis=0)
                    self._replay_noinv(pa_ext, idx)
                else:
                    # mask chain-padding rows (j > max_j) to the Montgomery
                    # one before inversion: otherwise which gcd hits
                    # (inversion-failure factor harvests) get detected would
                    # depend on the group size — fixed sigma must give
                    # identical factor finds for ANY engine/grouping (the
                    # reference inverts exactly the window it uses,
                    # ecm.c:2375-2438)
                    valid = max_j - base + 1
                    xs, zs = group[:, 0], group[:, 1]
                    if valid < G:
                        rows = jnp.arange(G)[:, None, None]
                        xs = jnp.where(rows < valid, xs,
                                       self.one_plane[None])
                        zs = jnp.where(rows < valid, zs,
                                       self.one_plane[None])
                    pa_inv = self._invert_planes(xs, zs)
                    pa_inv_ext = jnp.concatenate(
                        [pa_inv, self.one_plane[None]], axis=0)
                    self._replay(pa_inv_ext, idx)
                self.paired += int(idx.shape[0])
                pos = hi
            base += G
        if flush is not None:
            self._finish_giant_group(*flush)

    # replay-kernel mode: "gather" DMAs one Pb row from HBM per entry;
    # "resident" keeps Pb row slabs VMEM-resident and partitions entries
    # by slab (see pallas_ops.make_replay_resident_executor).  The hardware
    # sweep (tools/hw_replay_modes.py, 2026-08-19) picked gather: resident
    # is 10% slower at the flagship geometry (the slab DMA + per-slab
    # entry partitioning costs more than the double-buffered HBM gathers
    # save); TPU_ECM_REPLAY=resident remains for re-evaluation at other
    # geometries.
    # replay-kernel mode decision (hardware A/Bs, tools/hw_replay_modes.py,
    # 2026-08-19 round 3, BENCH_NOTES.md): per-pallas-call dispatch costs
    # ~13.7 ms through the tunnel, so 64k-entry blocks beat 16k by ~20%
    # regardless of kernel; at 64k blocks "stream" (manual deep DMA
    # pipeline, Pa re-fetched on giant-step change, dynamic tail count)
    # edges "gather" 9.98-10.24 s vs 10.10-10.55 s stage-2 steady and
    # wastes no tail compute.  parow (shared-Pa auto-pipeline) and
    # resident (VMEM Pb slabs) measured slower — kept behind the env.
    # Default: stream.
    def _replay_mode(self) -> str:
        mode = os.environ.get("TPU_ECM_REPLAY",
                              getattr(self.ops, "default_replay", "stream"))
        if (mode == "resident" and self.use_pallas
                and hasattr(self.ops, "make_replay_resident")):
            return "resident"
        if (mode == "parow" and self.use_pallas
                and hasattr(self.ops, "make_replay_parow")):
            return "parow"
        if (mode == "stream" and self.use_pallas
                and hasattr(self.ops, "make_replay_stream")):
            return "stream"
        return "gather"

    def _pbx_slabs(self):
        """[(lo, slab)]: Pb rows cut into uniform VMEM-budget slabs; local
        row 0 of every slab is zero (the pad/no-op row), original row r
        lives in slab (r - lo) + 1 of the slab covering [lo, lo+cap)."""
        if getattr(self, "_slabs", None) is not None:
            return self._slabs
        row_b = self.b // self.sharder.n if self.sharder is not None \
            else self.b
        nwrows = int(self.pbx.shape[1])
        row_bytes = nwrows * row_b * 4
        budget = int(os.environ.get("TPU_ECM_REPLAY_SLAB_MB", "80")) << 20
        cap = max(1, budget // row_bytes - 1)    # original rows per slab
        r = int(self.pbx.shape[0])
        nslabs = (r + cap - 1) // cap
        zero = jnp.zeros_like(self.pbx[:1])
        slabs = []
        for h in range(nslabs):
            lo = h * cap
            part = self.pbx[lo:lo + cap]
            if part.shape[0] < cap:
                part = jnp.concatenate(
                    [part, jnp.zeros((cap - part.shape[0],) + part.shape[1:],
                                     part.dtype)], axis=0)
            slabs.append((lo, jnp.concatenate([zero, part], axis=0)))
        self._slabs = slabs
        return slabs

    @staticmethod
    def _replay_e(default: int = 8) -> int:
        """Entries per replay grid step (E); env-swept on hardware
        (tools/hw_replay_modes.py).  Measured on TPU v5e (full flagship
        stage-2, steady state): gather E=16 4.12 us/entry beats E=8's
        5.02; resident is slower at every E (5.52/4.96/13.94 for
        E=8/4/16), so gather stays the default mode."""
        return int(os.environ.get("TPU_ECM_REPLAY_E", str(default)))

    def _replay_resident(self, pa_inv_ext, idx: np.ndarray):
        G = self.pa_group
        slabs = self._pbx_slabs()
        cap = int(slabs[0][1].shape[0]) - 1
        e = self._replay_e()
        key = (self._ek, "replay_res", G + 1, cap + 1, self.replay_block, e)
        if key not in self._cache:
            self._cache[key] = self.ops.make_replay_resident(
                self.b, pa_rows=G + 1, slab_rows=cap + 1,
                t_block=self.replay_block, entries_per_step=e)
        replay = self._cache[key]
        tb = self.replay_block
        pb = idx[:, 1]
        for lo, slab in slabs:
            sel = (pb >= lo) & (pb < lo + cap)
            if not sel.any():
                continue
            sub = idx[sel].copy()          # selection preserves the v-sort
            sub[:, 1] += 1 - lo
            for s in range(0, sub.shape[0], tb):
                blk = sub[s:s + tb]
                if blk.shape[0] < tb:
                    pad = np.tile(np.array([[G, 0]], dtype=np.int32),
                                  (tb - blk.shape[0], 1))
                    blk = np.concatenate([blk, pad], axis=0)
                self.acc = replay(self.acc, pa_inv_ext, slab,
                                  jnp.asarray(blk))

    @staticmethod
    def _pack_parow_steps(idx: np.ndarray, e: int) -> np.ndarray:
        """[T, 2] v-sorted entries -> [S, 1+E] parow steps: runs of equal
        Pa row split into ceil(run/E)-step groups, short tails padded with
        pb = 0 (masked to one in kernel).  Packing efficiency is
        T / (S*E) — logged by the hardware sweep, ~95% at production
        bounds (~100+ entries per giant step)."""
        pa = idx[:, 0].astype(np.int64)
        pb = idx[:, 1].astype(np.int32)
        uniq, start, counts = np.unique(pa, return_index=True,
                                        return_counts=True)
        nsteps_per = -(-counts // e)
        total = int(nsteps_per.sum())
        steps = np.zeros((total, 1 + e), dtype=np.int32)
        steps[:, 0] = np.repeat(uniq, nsteps_per)
        ranks = (np.arange(idx.shape[0], dtype=np.int64)
                 - np.repeat(start, counts))
        sbase = np.concatenate([[0], np.cumsum(nsteps_per)[:-1]])
        estep = np.repeat(sbase, counts) + ranks // e
        steps[estep, 1 + (ranks % e)] = pb
        return steps

    def _replay_parow(self, pa_inv_ext, idx: np.ndarray):
        G = self.pa_group
        e = self._replay_e(16)
        nsteps = max(1, self.replay_block // e)
        key = (self._ek, "replay_parow", G + 1, int(self.pbx.shape[0]),
               nsteps, e)
        if key not in self._cache:
            self._cache[key] = self.ops.make_replay_parow(
                self.b, pa_rows=G + 1, pb_rows=int(self.pbx.shape[0]),
                nsteps=nsteps, entries_per_step=e)
        replay = self._cache[key]
        steps = self._pack_parow_steps(idx, e)
        for lo in range(0, steps.shape[0], nsteps):
            blk = steps[lo:lo + nsteps]
            if blk.shape[0] < nsteps:
                pad = np.zeros((nsteps - blk.shape[0], 1 + e), np.int32)
                pad[:, 0] = G
                blk = np.concatenate([blk, pad], axis=0)
            self.acc = replay(self.acc, pa_inv_ext, self.pbx,
                              jnp.asarray(blk.reshape(-1)))

    def _replay_stream(self, pa_inv_ext, idx: np.ndarray):
        G = self.pa_group
        nb = int(os.environ.get("TPU_ECM_REPLAY_NB", "16"))
        ur = int(os.environ.get("TPU_ECM_REPLAY_UNROLL", "1"))
        # dense-packed Pb rows: nw/npw (~2.6x) less DMA per entry, value-
        # identical results (pallas_ops.pack_replay_rows); one pack pass
        # per runner, amortized over every chunk's replay
        pk = (os.environ.get("TPU_ECM_REPLAY_PACKED", "0") != "0"
              and hasattr(self.ops, "pack_replay_rows"))
        # independent accumulator chains per loop body — measured NO GAIN
        # on hardware (round 4: na=1 10.04s, na=4 10.38s, na=8 10.50s
        # flagship steady; the interleaved DMA waits keep the body
        # latency-bound), kept as a knob for other geometries
        na = int(os.environ.get("TPU_ECM_REPLAY_NACC", "1"))
        # E-entry value-tree bodies (pallas_ops docstring).  Default 4:
        # measured ~3% faster full stage-2 steady than the serial chain
        # at the flagship (13.93 vs 14.35 s), agreeing with the DMA-free
        # microbench (~4%); the VMEM-bandwidth root cause caps the gain
        # (BENCH_NOTES round 5).  The digit kernel only — the RNS twin
        # ignores the knob.
        tr = int(os.environ.get("TPU_ECM_REPLAY_TREE", "4"))
        if na > 1:
            tr = 0              # mutually exclusive variants
        tb = self.replay_block      # 64k packed entries = 256 KB SMEM
        key = (self._ek, "replay_stream", G + 1, int(self.pbx.shape[0]),
               tb, nb, ur, pk, na, tr)
        if key not in self._cache:
            self._cache[key] = self.ops.make_replay_stream(
                self.b, pa_rows=G + 1, pb_rows=int(self.pbx.shape[0]),
                t_block=tb, n_buffers=nb, unroll=ur, packed=pk, n_acc=na,
                tree=tr)
        replay = self._cache[key]
        if pk:
            if getattr(self, "_pbx_packed_of", None) is not self.pbx:
                self._pbx_packed = self.ops.pack_replay_rows(self.pbx)
                self._pbx_packed_of = self.pbx
            pbx = self._pbx_packed
        else:
            # engine-specific once-per-runner table prep (e.g. the RNS
            # stream kernel's sublane pad); value-identical to passing
            # the raw table.  The padded table REPLACES self.pbx —
            # keeping both resident doubles the dominant stage-2 buffer
            # at large RNS geometries (ADVICE r4).  prep is idempotent,
            # and the other replay paths slice the pad rows back off.
            prep = getattr(self.ops, "prepare_replay_pbx", None)
            if prep is not None:
                self.pbx = prep(self.pbx)
            pbx = self.pbx
        packed = ((idx[:, 0].astype(np.int64) << 16)
                  | idx[:, 1].astype(np.int64)).astype(np.int32)
        for lo in range(0, packed.shape[0], tb):
            blk = packed[lo:lo + tb]
            # live count rides as idx[0]: a short tail block runs exactly
            # count iterations (>= NB for the warm-up pipeline), pads
            # multiply by one
            count = max(int(blk.shape[0]), nb)
            if blk.shape[0] < tb:
                blk = np.concatenate(
                    [blk, np.full(tb - blk.shape[0], np.int32(G << 16),
                                  dtype=np.int32)])
            blk = np.concatenate([[np.int32(count)], blk])
            self.acc = replay(self.acc, pa_inv_ext, pbx,
                              jnp.asarray(blk))

    def _replay_noinv(self, pa_ext, idx: np.ndarray):
        """acc *= prod (Xa*Zb - Xb*Za) over the entry list (inversion-free
        2-mul identity; see _replay_segment_noinv).  jnp path on either
        backend: the 3-plane operand rows triple the replay gather traffic
        and double its mulmods, so the inverted form stays the production
        Pallas path — this form exists for reference parity
        (/root/reference/ecm.c:2526-2530) and as an inversion-free
        fallback."""
        G = self.pa_group
        t = idx.shape[0]
        for lo in range(0, t, 512):
            blk = idx[lo:lo + 512]
            tb = blk.shape[0]
            tpad = 1 << max(0, (tb - 1).bit_length())
            if tpad > tb:
                pad = np.tile(np.array([[G, 0]], dtype=np.int32),
                              (tpad - tb, 1))
                blk = np.concatenate([blk, pad], axis=0)
            self.acc = self.ops.replay_segment_noinv(
                self.acc, pa_ext, self.pbx, jnp.asarray(blk))

    def _replay(self, pa_inv_ext, idx: np.ndarray):
        """acc *= prod (Pa_inv[v] - PbX[u]) over the entry list."""
        G = self.pa_group
        mode = self._replay_mode()
        if mode == "resident":
            return self._replay_resident(pa_inv_ext, idx)
        if mode == "parow":
            return self._replay_parow(pa_inv_ext, idx)
        if mode == "stream":
            return self._replay_stream(pa_inv_ext, idx)
        if self.use_pallas:
            e = self._replay_e(16)    # E=16: 4.12 vs 5.02 us/entry at E=8
            key = (self._ek, "replay", G + 1, int(self.pbx.shape[0]),
                   self.replay_block, e)
            if key not in self._cache:
                self._cache[key] = self.ops.make_replay(
                    self.b, pa_rows=G + 1,
                    pb_rows=int(self.pbx.shape[0]),
                    t_block=self.replay_block,
                    entries_per_step=e)
            replay = self._cache[key]
            tb = self.replay_block
            for lo in range(0, idx.shape[0], tb):
                blk = idx[lo:lo + tb]
                if blk.shape[0] < tb:
                    pad = np.tile(np.array([[G, 0]], dtype=np.int32),
                                  (tb - blk.shape[0], 1))
                    blk = np.concatenate([blk, pad], axis=0)
                self.acc = replay(self.acc, pa_inv_ext,
                                  self.pbx, jnp.asarray(blk))
            return
        # jnp fallback: <=512-entry blocks, padded to powers of two with
        # no-op entries (one - 0); bounds the number of compiled tree shapes
        t = idx.shape[0]
        for lo in range(0, t, 512):
            blk = idx[lo:lo + 512]
            tb = blk.shape[0]
            tpad = 1 << max(0, (tb - 1).bit_length())
            if tpad > tb:
                pad = np.tile(np.array([[G, 0]], dtype=np.int32),
                              (tpad - tb, 1))
                blk = np.concatenate([blk, pad], axis=0)
            self.acc = self.ops.replay_segment(self.acc, pa_inv_ext,
                                               self.pbx, jnp.asarray(blk))

    # -- harvest ------------------------------------------------------------

    def result(self) -> Stage2Result:
        accs = [self.ops.from_mont_int(a)
                for a in self.ops.unpack(self.acc)]
        return Stage2Result(acc=accs, factors=dict(self.factors),
                            paired=self.paired, ptadds=self.ptadds,
                            ptdups=self.ptdups, numinv=self.numinv)
