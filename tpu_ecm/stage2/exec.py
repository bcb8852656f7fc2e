"""Stage-2 device execution: baby-step table, giant-step windows, pairmap
replay, and batched inversion with a single host modinv per window.

Mirrors ecm_stage2_init / ecm_stage2_pair (/root/reference/ecm.c:2201-2540)
with the TPU host/device split:

* the Pb chain and Pa windows are lax.scans of differential adds;
* Montgomery's inversion trick runs on device across the *point table* and
  continues on the host across the *curve batch* (all curves share N), so
  each table entry costs 3 muls and the whole batch costs ONE modular
  inverse per window — versus one mpz_invert per SIMD lane per window in
  the reference (/root/reference/ecm.c:1919-1950);
* a curve whose Z-product is not invertible has gcd(Z..., N) > 1: that gcd
  is a factor, harvested exactly like the reference's inversion-failure
  path (/root/reference/ecm.c:1927-1939);
* the host-planned pairmap (stage2/plan.py) is replayed as a scan of
  gather-subtract-multiply steps: acc *= Pa_inv[pa] - PbX[pb]
  (CROSS_PRODUCT_INV, /root/reference/ecm.c:1857-1859); segments are padded
  to power-of-two lengths with (one - 0) no-op entries to bound the number
  of compiled shapes.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

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

def host_batch_inverse(ctx: MontyCtx, vals_mont: List[int]
                       ) -> Tuple[List[int], Dict[int, int]]:
    """Invert Montgomery-domain values sharing modulus N with one modinv.

    Input: canonical ints v_i = z_i * R mod N.  Output: device-pushable
    V_i = R^2 * v_i^-1 mod N (so mont_mul(X_m, V_i) = (x/z)*R mod N), plus
    {curve_index: factor} for curves with gcd(v_i, N) > 1 (factor == 0 when
    the gcd is trivial N itself); those curves get V_i = 0."""
    n = ctx.n_int
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

@partial(jax.jit, static_argnames=("sp_umax", "sp_num_pb"))
def _build_pb_table(pt, s_const, mapids, dctx: DeviceCtx,
                    sp_umax: int, sp_num_pb: int):
    """Baby-step chain S_d = S_{d-1} + S_1 (diff S_{d-2}) for d = 3..U*D,
    scattered into [num_pb, 2, NW, B] storage via the rprime map
    (/root/reference/ecm.c:2258-2313).  Slot 0 is scratch."""
    nw, b = pt.shape[1], pt.shape[2]
    q1 = pt
    x2, z2 = curve_ops.xdbl(pt[0], pt[1], s_const, dctx)
    q2 = jnp.stack([x2, z2])

    def step(carry, mapid):
        p1, p2 = carry
        xo, zo = curve_ops.xadd(p1[0], p1[1], q1[0], q1[1],
                                p2[0], p2[1], dctx)
        pout = jnp.stack([xo, zo])
        return (pout, p1), pout

    _, pts = jax.lax.scan(step, (q2, q1), mapids)
    table = jnp.zeros((sp_num_pb, 2, nw, b), dtype=jnp.int32)
    table = table.at[1].set(q1)
    table = table.at[2].set(q2)
    table = table.at[mapids].set(pts)
    return table


@jax.jit
def _z_prefix(zs, one_plane, dctx: DeviceCtx):
    """Running products of zs[0..K-1] -> [K, NW, B]."""

    def step(acc, z):
        acc = jnp_ops.mulmod(acc, z, dctx)
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
        inv_i = jnp_ops.mulmod(suffix, pre, dctx)
        suffix = jnp_ops.mulmod(suffix, z_i, dctx)
        return suffix, inv_i

    _, invs = jax.lax.scan(step, total_inv, (zs[::-1], pres[::-1]))
    invs = invs[::-1]
    return jax.vmap(lambda x, z: jnp_ops.mulmod(x, z, dctx))(xs, invs)


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


def _run_ladder(pt, s_const, k: int, dctx: DeviceCtx, run_tape):
    """[k]P via a host-planned binary-ladder tape (next_pt_vec analog)."""
    tape, res_slot = prac.ladder_tape_result_slot(k)
    nw, b = pt.shape[1], pt.shape[2]
    pts = jnp.zeros((curve_ops.NUM_SLOTS, 2, nw, b), dtype=jnp.int32)
    pts = pts.at[0].set(pt)
    if tape.shape[0]:
        pts = run_tape(pts, jnp.asarray(tape), s_const, dctx)
    return jnp.take(pts, res_slot, axis=0)


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Stage2Result:
    acc: List[int]                  # canonical accumulator per curve (mod n)
    factors: Dict[int, int]         # curve -> factor found during inversions
    paired: int
    ptadds: int
    numinv: int


class Stage2Runner:
    """Per-batch stage-2 state machine (phases 2+3 of vececm)."""

    def __init__(self, ctx: MontyCtx, dctx: DeviceCtx, sp: Stage2Params,
                 pt, s_const, b1: int, verbose: bool = False):
        self.ctx, self.dctx, self.sp = ctx, dctx, sp
        self.pt = pt                  # stage-1 point [2, NW, B]
        self.s_const = s_const
        self.b1 = b1
        self.verbose = verbose
        b = pt.shape[2]
        self.b = b
        one = layout.broadcast_int(ctx.r_mod_n, ctx.p.w, ctx.p.nw, b)
        self.one_plane = jnp.asarray(one)
        self.acc = self.one_plane     # mdata->one init (/root/reference/ecm.c:2318)
        self.factors: Dict[int, int] = {}
        self.paired = 0
        self.ptadds = 0
        self.numinv = 0
        self.run_tape = jax.jit(curve_ops.run_tape)
        self.pbx: Optional[jax.Array] = None
        self.pd = None
        self.pa = None                # [2L, 2, NW, B]
        self.pa_inv = None            # [2L, NW, B]
        self.amin = 0

    # -- inversion helper ---------------------------------------------------

    def _invert_planes(self, xs, zs):
        """x_i/z_i in Montgomery form for stacked planes [K, ...]; one host
        modinv for the whole (K x B) block."""
        self.numinv += 1
        prefix = _z_prefix(zs, self.one_plane, self.dctx)
        total = layout.unpack_batch(np.asarray(prefix[-1]), self.ctx.p.w)
        inv_ints, fnd = host_batch_inverse(self.ctx, total)
        for i, f in fnd.items():
            if f and i not in self.factors:
                self.factors[i] = f
        total_inv = jnp.asarray(layout.pack_batch(
            inv_ints, self.ctx.p.w, self.ctx.p.nw))
        return _apply_inverse(xs, zs, prefix, total_inv, self.one_plane,
                              self.dctx)

    # -- phase 2: init ------------------------------------------------------

    def init(self):
        sp = self.sp
        mapids = jnp.asarray(sp.rprime_map[3:sp.umax + 1].astype(np.int32))
        table = _build_pb_table(self.pt, self.s_const, mapids, self.dctx,
                                sp.umax, sp.num_pb)
        self.ptadds += sp.umax - 2
        # invert Pb[1..num_pb-1].Z into affine-x (Montgomery form)
        inv_x = self._invert_planes(table[1:, 0], table[1:, 1])
        self.pbx = jnp.concatenate(
            [jnp.zeros_like(inv_x[:1]), inv_x], axis=0)
        # Pd = [D]Q (not inverted), /root/reference/ecm.c:2331-2334
        self.pd = _run_ladder(self.pt, self.s_const, sp.D, self.dctx,
                              self.run_tape)
        return self

    # -- phase 3: per-chunk pairmap replay ----------------------------------

    def _build_pa_window(self, amin: int):
        """Pa[i] = [(2*amin + i) * D]Q for i in [0, 2L)
        (/root/reference/ecm.c:2375-2428)."""
        sp = self.sp
        a_val = 2 * amin * sp.D
        pa0 = _run_ladder(self.pt, self.s_const, a_val, self.dctx,
                          self.run_tape)
        pad = _run_ladder(self.pt, self.s_const, a_val - sp.D, self.dctx,
                          self.run_tape)
        count = jnp.zeros((2 * sp.L - 1,), dtype=jnp.int32)
        rest = _pa_extend((pa0, pad), self.pd, self.s_const, count, self.dctx)
        self.pa = jnp.concatenate([pa0[None], rest], axis=0)
        self.ptadds += 2 * sp.L - 1
        self.pa_inv = self._invert_planes(self.pa[:, 0], self.pa[:, 1])
        self.amin = amin

    def _shift_window(self):
        """(0,0) sentinel: drop 2U stale points, extend 2U new ones, invert
        only the new ones (/root/reference/ecm.c:2458-2501)."""
        sp = self.sp
        nshift = 2 * sp.U
        carry = (self.pa[-1], self.pa[-2])
        count = jnp.zeros((nshift,), dtype=jnp.int32)
        newpts = _pa_extend(carry, self.pd, self.s_const, count, self.dctx)
        self.pa = jnp.concatenate([self.pa[nshift:], newpts], axis=0)
        self.ptadds += nshift
        new_inv = self._invert_planes(newpts[:, 0], newpts[:, 1])
        self.pa_inv = jnp.concatenate([self.pa_inv[nshift:], new_inv], axis=0)
        self.amin += sp.U

    def run_chunk(self, map_v: np.ndarray, map_u: np.ndarray, amin0: int):
        """Replay one chunk's pairmap (built by plan.pair for this chunk)."""
        sp = self.sp
        self._build_pa_window(amin0)
        # extended Pa_inv with a one-row at index 2L for padded no-ops
        sent = (map_v == 0) & (map_u == 0)
        bounds = np.nonzero(sent)[0].tolist() + [map_v.shape[0]]
        start = 0
        for b_idx in bounds:
            seg_v = map_v[start:b_idx].astype(np.int64)
            seg_u = map_u[start:b_idx].astype(np.int64)
            if seg_v.size:
                pa_idx = seg_v - self.amin
                assert pa_idx.min() >= 0 and pa_idx.max() < 2 * sp.L, \
                    (pa_idx.min(), pa_idx.max(), self.amin)
                pb_idx = sp.rprime_map[seg_u]
                assert (pb_idx[seg_u > 0] > 0).all()
                idx = np.stack([pa_idx, pb_idx.astype(np.int64)],
                               axis=1).astype(np.int32)
                pa_inv_ext = jnp.concatenate(
                    [self.pa_inv, self.one_plane[None]], axis=0)
                # slice into <=512-entry blocks, each padded to a power of
                # two with no-op entries (one - 0); bounds memory and the
                # number of compiled tree shapes
                t = idx.shape[0]
                for lo in range(0, t, 512):
                    blk = idx[lo:lo + 512]
                    tb = blk.shape[0]
                    tpad = 1 << max(0, (tb - 1).bit_length())
                    if tpad > tb:
                        pad = np.tile(
                            np.array([[2 * sp.L, 0]], dtype=np.int32),
                            (tpad - tb, 1))
                        blk = np.concatenate([blk, pad], axis=0)
                    self.acc = _replay_segment(self.acc, pa_inv_ext,
                                               self.pbx, jnp.asarray(blk),
                                               self.dctx)
                self.paired += int(t)
            if b_idx < map_v.shape[0]:
                self._shift_window()
            start = b_idx + 1

    # -- harvest ------------------------------------------------------------

    def result(self) -> Stage2Result:
        accs = layout.unpack_batch(np.asarray(self.acc), self.ctx.p.w)
        accs = [self.ctx.from_mont_int(a % self.ctx.n_int) for a in accs]
        return Stage2Result(acc=accs, factors=dict(self.factors),
                            paired=self.paired, ptadds=self.ptadds,
                            numinv=self.numinv)
