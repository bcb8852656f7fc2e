"""RNS/MXU stage-1 engine: curve ops and tape executors over residue planes.

This is the large-moduli counterpart of the digit-plane engine (curve/ops.py
+ limbs/pallas_ops.py): the same host-planned ADD/DUP tapes (curve/prac.py)
replayed over a register file of S=6 points, but with every bignum held as
RNS channel residues [2K+1, B] and every Montgomery product running its two
base extensions as bf16 matmuls on the MXU (limbs/rns.py module docstring).
The reference concedes this regime — "best performance ... for inputs up to
about 1000 bits" (/root/reference/README.md:2) — because schoolbook digit
arithmetic is O(nw^2) VPU work per product; here the O(K^2) work rides the
systolic array instead.

Value-bound discipline (rns.py invariant: mul outputs <= V, add/sub <= 2V,
mul inputs <= 2V): the Montgomery-curve formulas below nest at most ONE
add/sub between products, so every product input is <= 2V and every
x*y < 4V^2 = 16K^2N^2 <= K*N*P.  (The Edwards ladder nests two subtractions
— E = E0 - A - B — so the RNS engine is Suyama/Montgomery-only.)

Semantics are identical between the jnp scan (run_tape) and the Pallas
kernel (make_rns_tape_executor): both call the same rns.mont_mul/add/sub.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from . import rns
from .pallas_ops import LANE, NUM_SLOTS, _jit_maybe_sharded, \
    _local_batch


def default_batch(host: rns.RnsHost, max_batch: int = 1024) -> int:
    """Per-chip curve batch: live VMEM state scales with rows * B (register
    file + ~10 mont_mul temporaries), so mirror the digit engine's
    B * nw ~ 82k sweet spot; the MXU lanes are full from B >= 128 up."""
    rows = host.dev.rows
    return max(LANE, min(max_batch, (82_000 // rows) // LANE * LANE))


# ---------------------------------------------------------------------------
# curve ops on [2, rows, B] points (formulas: curve/ops.py == ecm.c:407-457)
# ---------------------------------------------------------------------------

def xdbl(X, Z, s_const, rc: rns.RnsCtx):
    s_, d_ = rns.addsub(X, Z, rc)
    v = rns.mont_sqr(d_, rc)
    u = rns.mont_sqr(s_, rc)
    x2 = rns.mont_mul(u, v, rc)
    w_ = rns.sub(u, v, rc)
    t = rns.mont_mul(w_, s_const, rc)
    z2 = rns.mont_mul(rns.add(t, v, rc), w_, rc)
    return x2, z2


def xadd(pa, pb, pd, rc: rns.RnsCtx):
    s1, d1 = rns.addsub(pa[0], pa[1], rc)
    s2, d2 = rns.addsub(pb[0], pb[1], rc)
    u = rns.mont_mul(d1, s2, rc)
    v = rns.mont_mul(s1, d2, rc)
    sp, dm = rns.addsub(u, v, rc)
    t1 = rns.mont_sqr(sp, rc)
    t2 = rns.mont_sqr(dm, rc)
    return (rns.mont_mul(t1, pd[1], rc), rns.mont_mul(t2, pd[0], rc))


def tape_step(pts, entry, s_const, rc: rns.RnsCtx):
    op, dst, ia, ib, ic = entry[0], entry[1], entry[2], entry[3], entry[4]
    pa = jnp.take(pts, ia, axis=0)      # [2, rows, B]

    def dup_branch(_):
        x2, z2 = xdbl(pa[0], pa[1], s_const, rc)
        return jnp.stack([x2, z2])

    def add_branch(_):
        pb = jnp.take(pts, ib, axis=0)
        pd = jnp.take(pts, ic, axis=0)
        xo, zo = xadd(pa, pb, pd, rc)
        return jnp.stack([xo, zo])

    def nop_branch(_):
        return pa

    newpt = jax.lax.switch(op, [dup_branch, add_branch, nop_branch], None)
    return pts.at[dst].set(newpt)


def run_tape(pts, tape, s_const, rc: rns.RnsCtx):
    """jnp fallback: replay a [T, 5] tape over the [S, 2, rows, B] file."""

    def step(pts, entry):
        return tape_step(pts, entry, s_const, rc), None

    pts, _ = jax.lax.scan(step, pts, tape)
    return pts


# ---------------------------------------------------------------------------
# host packing / extraction
# ---------------------------------------------------------------------------

def init_state(host: rns.RnsHost, xs: List[int], zs: List[int],
               ss: List[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Canonical ints -> ([S, 2, rows, B] register file, [rows, B] curve
    const), all in the RNS Montgomery domain (R = P)."""
    pack = lambda vals: host.pack([host.to_mont_int(v) for v in vals])
    pts = np.zeros((NUM_SLOTS, 2, host.dev.rows, len(xs)), dtype=np.int32)
    pts[0, 0] = pack(xs)
    pts[0, 1] = pack(zs)
    return pts, pack(ss)


def extract_point(host: rns.RnsHost, pts, slot: int = 0
                  ) -> Tuple[List[int], List[int]]:
    """Slot residues -> canonical (X, Z) ints mod n (Montgomery factor P
    divided out) — the savefile normalization step."""
    arr = np.asarray(pts[slot])
    xs = [host.from_mont_int(v) for v in host.unpack(arr[0])]
    zs = [host.from_mont_int(v) for v in host.unpack(arr[1])]
    return xs, zs


# ---------------------------------------------------------------------------
# stage-2 jnp pieces (rns twins of stage2/exec.py's digit helpers)
# ---------------------------------------------------------------------------

@jax.jit
def _jit_xdbl(x, z, s_const, rc: rns.RnsCtx):
    return xdbl(x, z, s_const, rc)


@jax.jit
def z_prefix(zs, one_plane, rc: rns.RnsCtx):
    def step(acc, z):
        acc = rns.mont_mul(acc, z, rc)
        return acc, acc

    _, prods = jax.lax.scan(step, one_plane, zs)
    return prods


@jax.jit
def apply_inverse(xs, zs, prefix, total_inv, one_plane, rc: rns.RnsCtx):
    k = zs.shape[0]
    pres = jnp.concatenate([one_plane[None], prefix[:k - 1]], axis=0)

    def step(suffix, operands):
        z_i, pre = operands
        inv_i = rns.mont_mul(suffix, pre, rc)
        suffix = rns.mont_mul(suffix, z_i, rc)
        return suffix, inv_i

    _, invs = jax.lax.scan(step, total_inv, (zs[::-1], pres[::-1]))
    invs = invs[::-1]
    return jax.vmap(lambda x, z: rns.mont_mul(x, z, rc))(xs, invs)


@jax.jit
def pa_extend(carry_pts, pd, count_arr, rc: rns.RnsCtx):
    def step(carry, _):
        p1, p2 = carry
        xo, zo = xadd(p1, pd, p2, rc)
        pout = jnp.stack([xo, zo])
        return (pout, p1), pout

    _, pts = jax.lax.scan(step, carry_pts, count_arr)
    return pts


@jax.jit
def replay_segment(acc, pa_inv_ext, pbx, idx, rc: rns.RnsCtx):
    """acc *= prod (Pa_inv[v] - PbX[u]); the F-lifted rns.sub keeps every
    difference nonnegative and <= 2V, a legal product input."""
    pa_rows = jnp.take(pa_inv_ext, idx[:, 0], axis=0)
    pb_rows = jnp.take(pbx, idx[:, 1], axis=0)
    vals = jax.vmap(lambda a, b: rns.sub(a, b, rc))(pa_rows, pb_rows)
    vm = jax.vmap(lambda a, b: rns.mont_mul(a, b, rc))
    t = vals.shape[0]
    while t > 1:
        half = t // 2
        vals = vm(vals[:half], vals[half:t])
        t = half
    return rns.mont_mul(acc, vals[0], rc)


# ---------------------------------------------------------------------------
# Pallas tape executor
# ---------------------------------------------------------------------------

def _rns_tape_kernel(treedef, statics, tape_ref, *refs):
    """One tape chunk with the [S, 2, rows, B] register file resident in
    VMEM.  The RnsCtx constant tables arrive as leading inputs (flattened
    pytree leaves) and are re-assembled so the kernel executes the exact
    rns.mont_mul/add/sub the jnp engine runs — the two base-extension
    dot_generals lower to MXU bf16 matmuls."""
    nleaves = statics["nleaves"]
    leaf_refs, pts_in, s_in, pts_out = \
        refs[:nleaves], refs[nleaves], refs[nleaves + 1], refs[-1]
    rc = jax.tree_util.tree_unflatten(treedef, [r[...] for r in leaf_refs])

    pts_out[...] = pts_in[...]
    s_const = s_in[...]
    nsteps = tape_ref.shape[0] // 5

    def step(k, _):
        op = tape_ref[5 * k]
        dst = tape_ref[5 * k + 1]
        ia, ib, ic = (tape_ref[5 * k + 2], tape_ref[5 * k + 3],
                      tape_ref[5 * k + 4])
        pa = pts_out[ia]

        def do_dup(_):
            x2, z2 = xdbl(pa[0], pa[1], s_const, rc)
            return jnp.stack([x2, z2])

        def do_add(_):
            xo, zo = xadd(pa, pts_out[ib], pts_out[ic], rc)
            return jnp.stack([xo, zo])

        def do_nop(_):
            return pa

        pts_out[dst] = jax.lax.switch(op, [do_dup, do_add, do_nop], None)
        return 0

    jax.lax.fori_loop(0, nsteps, step, 0)


def _ctx_io(host: rns.RnsHost):
    """(leaves, rebuild): the RnsCtx constant tables as explicit kernel
    inputs + the kernel-side re-assembly (see _rns_tape_kernel).

    EVERY Pallas kernel gets a forced-split ctx: Mosaic cannot lower the
    small-K direct int32 dot (`Bad lhs/rhs type vector<16x128xi32>
    vector<128x128xi32>` — hit in the stream replay at K=24 in round 4
    and in the stage-1 tape kernel at K=8 in round 5).  The 7-bit
    split-table base extensions are exact over the same inputs (rns.py
    module docstring), so kernel results are value-identical; only the
    host/jnp paths keep the cheaper direct dot."""
    dev = host.dev
    if not dev.use_split:
        dev = dataclasses.replace(dev, use_split=True)
    leaves, treedef = jax.tree_util.tree_flatten(dev)
    leaves = [jnp.asarray(l) for l in leaves]

    def rebuild(refs):
        return jax.tree_util.tree_unflatten(treedef, [r[...] for r in refs])

    return leaves, rebuild


def _leaf_specs(leaves, nidx):
    """Full-array VMEM BlockSpecs for the constant tables (index maps
    ignore the grid position; nidx = arity of the index-map signature)."""
    def spec(leaf):
        zero = (0,) * leaf.ndim
        return pl.BlockSpec(leaf.shape, lambda *_: zero)

    del nidx
    return [spec(l) for l in leaves]


def _params(interpret):
    return None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)


def make_rns_chain_executor(host: rns.RnsHost, batch: int, count: int,
                            interpret: bool = False, sharder=None):
    """Differential-add chain out[i] = out[i-1] + Pd (diff out[i-2]) — the
    RNS twin of pallas_ops.make_chain_executor.
    run(p1 [2,rows,B], p2 [2,rows,B], pd [2,rows,B]) -> [count,2,rows,B]."""
    rows = host.dev.rows
    loc = _local_batch(batch, sharder)
    leaves, rebuild = _ctx_io(host)
    nl = len(leaves)

    def kernel(*refs):
        rc = rebuild(refs[:nl])
        p1_in, p2_in, pd = refs[nl], refs[nl + 1], refs[nl + 2]
        out, s1, s2 = refs[nl + 3], refs[-2], refs[-1]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s1[...] = p1_in[...]
            s2[...] = p2_in[...]

        xo, zo = xadd(s1[...], pd[...], s2[...], rc)
        new = jnp.stack([xo, zo])
        out[0] = new
        s2[...] = s1[...]
        s1[...] = new

    call = pl.pallas_call(
        kernel,
        grid=(count,),
        in_specs=_leaf_specs(leaves, 1) + [
            pl.BlockSpec((2, rows, loc), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, rows, loc), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, rows, loc), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, rows, loc), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((count, 2, rows, loc), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, rows, loc), jnp.int32),
                        pltpu.VMEM((2, rows, loc), jnp.int32)],
        interpret=interpret,
        compiler_params=_params(interpret),
    )

    def body(p1, p2, pd, *leaf_args):
        return call(*leaf_args, p1, p2, pd)

    ax = sharder.axis_name if sharder is not None else None
    run = _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, None, ax),) * 3 + (P(),) * nl,
        out_specs=P(None, None, None, ax))
    return lambda p1, p2, pd: run(p1, p2, pd, *leaves)


def make_rns_prefix_executor(host: rns.RnsHost, batch: int, count: int,
                             interpret: bool = False, sharder=None):
    """run(zs [count,rows,B], one [rows,B]) -> prefix products."""
    rows = host.dev.rows
    loc = _local_batch(batch, sharder)
    leaves, rebuild = _ctx_io(host)
    nl = len(leaves)

    def kernel(*refs):
        rc = rebuild(refs[:nl])
        z_row, one_in, out, acc = (refs[nl], refs[nl + 1], refs[nl + 2],
                                   refs[-1])

        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[...] = one_in[...]

        acc[...] = rns.mont_mul(acc[...], z_row[0], rc)
        out[0] = acc[...]

    call = pl.pallas_call(
        kernel,
        grid=(count,),
        in_specs=_leaf_specs(leaves, 1) + [
            pl.BlockSpec((1, rows, loc), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, loc), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, loc), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((count, rows, loc), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, loc), jnp.int32)],
        interpret=interpret,
        compiler_params=_params(interpret),
    )

    def body(zs, one, *leaf_args):
        return call(*leaf_args, zs, one)

    ax = sharder.axis_name if sharder is not None else None
    run = _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, None, ax), P(None, ax)) + (P(),) * nl,
        out_specs=P(None, None, ax))
    return lambda zs, one: run(zs, one, *leaves)


def make_rns_apply_inverse_executor(host: rns.RnsHost, batch: int,
                                    count: int, interpret: bool = False,
                                    sharder=None):
    """run(xs, zs, pres, total_inv) -> x_i * z_i^-1 (suffix walk-back)."""
    rows = host.dev.rows
    loc = _local_batch(batch, sharder)
    leaves, rebuild = _ctx_io(host)
    nl = len(leaves)

    def kernel(*refs):
        rc = rebuild(refs[:nl])
        x_row, z_row, pre_row, tinv_in = (refs[nl], refs[nl + 1],
                                          refs[nl + 2], refs[nl + 3])
        out, suf = refs[nl + 4], refs[-1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            suf[...] = tinv_in[...]

        inv_i = rns.mont_mul(suf[...], pre_row[0], rc)
        out[0] = rns.mont_mul(x_row[0], inv_i, rc)
        suf[...] = rns.mont_mul(suf[...], z_row[0], rc)

    rev = lambda i: (count - 1 - i, 0, 0)
    call = pl.pallas_call(
        kernel,
        grid=(count,),
        in_specs=_leaf_specs(leaves, 1) + [
            pl.BlockSpec((1, rows, loc), rev),
            pl.BlockSpec((1, rows, loc), rev),
            pl.BlockSpec((1, rows, loc), rev),
            pl.BlockSpec((rows, loc), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, loc), rev),
        out_shape=jax.ShapeDtypeStruct((count, rows, loc), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, loc), jnp.int32)],
        interpret=interpret,
        compiler_params=_params(interpret),
    )

    def body(xs, zs, pres, total_inv, *leaf_args):
        return call(*leaf_args, xs, zs, pres, total_inv)

    ax = sharder.axis_name if sharder is not None else None
    run = _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, None, ax),) * 3 + (P(None, ax),) + (P(),) * nl,
        out_specs=P(None, None, ax))
    return lambda xs, zs, pres, tinv: run(xs, zs, pres, tinv, *leaves)


def make_rns_replay_executor(host: rns.RnsHost, batch: int, pa_rows: int,
                             pb_rows: int, t_block: int = 2048,
                             entries_per_step: int = 4,
                             interpret: bool = False, sharder=None):
    """Pairmap replay acc *= (Pa_inv[v] - PbX[u]) — RNS twin of
    pallas_ops.make_replay_executor (same scalar-prefetched gather
    pipeline; the difference runs through the F-lifted rns.sub)."""
    rows = host.dev.rows
    assert t_block % entries_per_step == 0
    loc = _local_batch(batch, sharder)
    E = entries_per_step
    nsteps = t_block // E
    leaves, rebuild = _ctx_io(host)
    nl = len(leaves)

    def kernel(idx_ref, *refs):
        rc = rebuild(refs[:nl])
        rows_ = refs[nl:nl + 2 * E]
        acc_in, acc_out, acc_scr = refs[nl + 2 * E], refs[nl + 2 * E + 1], \
            refs[-1]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_scr[...] = acc_in[...]

        diffs = [rns.sub(rows_[2 * k][0], rows_[2 * k + 1][0], rc)
                 for k in range(E)]
        while len(diffs) > 1:
            diffs = ([rns.mont_mul(diffs[j], diffs[j + 1], rc)
                      for j in range(0, len(diffs) - 1, 2)]
                     + ([diffs[-1]] if len(diffs) % 2 else []))
        acc_scr[...] = rns.mont_mul(acc_scr[...], diffs[0], rc)

        @pl.when(i == nsteps - 1)
        def _():
            acc_out[...] = acc_scr[...]

    gather_specs = []
    for k in range(E):
        gather_specs.append(pl.BlockSpec(
            (1, rows, loc),
            lambda i, idx, k=k: (idx[2 * (E * i + k)], 0, 0)))
        gather_specs.append(pl.BlockSpec(
            (1, rows, loc),
            lambda i, idx, k=k: (idx[2 * (E * i + k) + 1], 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=_leaf_specs(leaves, 2) + gather_specs + [
            pl.BlockSpec((rows, loc), lambda i, idx: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, loc), lambda i, idx: (0, 0)),
        scratch_shapes=[pltpu.VMEM((rows, loc), jnp.int32)],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, loc), jnp.int32),
        interpret=interpret,
        compiler_params=_params(interpret),
    )

    def body(acc, pa_ext, pbx, idx, *leaf_args):
        # tolerate a sublane-padded table (prepare_replay_pbx replaced the
        # runner's raw Pb table to halve stage-2 HBM residency, ADVICE r4);
        # the slice happens inside the jit, per call, only on this
        # non-default path
        pbx = pbx[:, :rows]
        gathers = [pa_ext, pbx] * E
        return call(idx.reshape(2 * t_block), *leaf_args, *gathers, acc)

    ax = sharder.axis_name if sharder is not None else None
    run = _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, ax), P(None, None, ax), P(None, None, ax),
                  P(None, None)) + (P(),) * nl,
        out_specs=P(None, ax))
    return lambda acc, pa_ext, pbx, idx: run(acc, pa_ext, pbx, idx, *leaves)


def make_rns_replay_stream_executor(host: rns.RnsHost, batch: int,
                                    pa_rows: int, pb_rows: int,
                                    t_block: int = 65536,
                                    n_buffers: int = 8, unroll: int = 1,
                                    n_acc: int = 1,
                                    interpret: bool = False, sharder=None):
    """Pairmap replay with the manual deep-DMA pipeline — the RNS twin of
    pallas_ops.make_replay_stream_executor (VERDICT r3 item 4: the RNS
    replay had none of the digit path's dispatch tuning; this gives it the
    same ONE-grid-step-per-64k-block structure, so per-pallas-call host
    dispatch (~13.7 ms through the tunnel) amortizes over t_block entries
    instead of t_block/E).

    Same idx contract as the digit stream kernel: idx[0] = live entry
    count, then (pa << 16 | pb) packed entries; the shared Pa row re-
    fetches only on giant-step change (v-sorted stream); pads multiply by
    sub(one, zero) = one + F — a multiple-of-N offset the RNS value
    convention already carries, so canonical accumulators are unchanged
    (/root/reference/ecm.c:2448-2532 is the loop being replayed).

    Manual-DMA slabs are sublane-padded: RNS rows = 2K+1 is always odd,
    and make_async_copy of a non-8-aligned [rows, loc] slab from a
    dynamically indexed HBM array CRASHES the TPU worker (round-4
    bisect, tools/debug_rns_stream.py: rows=481 faults, rows=480 passes,
    arithmetic-free kernel).  So pa_ext/pbx are padded to rp rows on the
    way in (wrapper jnp.pad per call — correctness-first; hoist to a
    once-per-runner padded table if this path is ever made the default)
    and the VMEM stream buffers are [rp, loc]; all arithmetic slices
    back to the true rows.

    The kernel ALWAYS uses the 7-bit split-table base extensions — like
    every RNS Pallas kernel (see _ctx_io: the small-K direct int32 dot
    does not lower in Mosaic; split is value-identical)."""
    rows = host.dev.rows
    rp = -(-rows // 8) * 8
    loc = _local_batch(batch, sharder)
    NB = n_buffers
    NA = max(1, n_acc)
    assert t_block >= NB
    assert pa_rows <= (1 << 16) and pb_rows <= (1 << 16)
    leaves, rebuild = _ctx_io(host)
    nl = len(leaves)

    def kernel(idx_ref, *refs):
        rc = rebuild(refs[:nl])
        pa_hbm, pb_hbm, acc_in = refs[nl], refs[nl + 1], refs[nl + 2]
        acc_out = refs[nl + 3]
        pa_buf, pb_buf, acc_scr, pa_sem, pb_sems = refs[nl + 4:]
        count = idx_ref[0]

        def pb_copy(k, slot):
            u = jnp.bitwise_and(idx_ref[1 + k], 0xFFFF)
            return pltpu.make_async_copy(pb_hbm.at[u], pb_buf.at[slot],
                                         pb_sems.at[slot])

        def pa_copy(k):
            i = jnp.right_shift(idx_ref[1 + k], 16)
            return pltpu.make_async_copy(pa_hbm.at[i], pa_buf, pa_sem)

        acc_scr[0] = acc_in[...]
        for j in range(1, NA):
            # extra chains start at the one row (pa_ext[-1], engine-shared
            # convention) — same value-exact cancellation as the digit
            # twin; staged through the rp-padded pa_buf (acc_scr rows are
            # unpadded and manual DMA needs the aligned slab)
            cpo = pltpu.make_async_copy(pa_hbm.at[pa_rows - 1],
                                        pa_buf, pa_sem)
            cpo.start()
            cpo.wait()
            acc_scr[j] = pa_buf[...][:rows]
        cp = pa_copy(0)
        cp.start()
        cp.wait()
        for k in range(NB):                      # static warm-up
            pb_copy(k, k).start()

        def entry(k, j=0):
            slot = jax.lax.rem(k, NB)

            @pl.when(jnp.logical_and(
                k > 0, jnp.right_shift(idx_ref[1 + k], 16)
                != jnp.right_shift(idx_ref[jnp.maximum(k, 1)], 16)))
            def _():
                cpa = pa_copy(k)
                cpa.start()
                cpa.wait()

            pb_copy(k, slot).wait()
            d = rns.sub(pa_buf[...][:rows], pb_buf[slot][:rows], rc)
            acc_scr[j] = rns.mont_mul(acc_scr[j], d, rc)

            @pl.when(k + NB < count)
            def _():
                pb_copy(k + NB, slot).start()

        def body(k, _):
            entry(k)
            return 0

        if NA > 1:
            def body_m(t, _):
                base = t * NA
                for j in range(NA):
                    entry(base + j, j)
                return 0

            main = count // NA
            jax.lax.fori_loop(0, main, body_m, 0, unroll=False)
            jax.lax.fori_loop(main * NA, count, body, 0, unroll=False)
        elif unroll <= 1:
            jax.lax.fori_loop(0, count, body, 0, unroll=False)
        else:
            U = unroll

            def body_u(t, _):
                base = t * U
                for s in range(U):
                    entry(base + s)
                return 0

            main = (count // U) * U
            jax.lax.fori_loop(0, count // U, body_u, 0, unroll=False)
            jax.lax.fori_loop(main, count, body, 0, unroll=False)
        res = acc_scr[0]
        for j in range(1, NA):
            res = rns.mont_mul(res, acc_scr[j], rc)
        acc_out[...] = res

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=_leaf_specs(leaves, 2) + [
            pl.BlockSpec(memory_space=pl.ANY),       # pa_ext stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),       # pbx stays in HBM
            pl.BlockSpec((rows, loc), lambda i, idx: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, loc), lambda i, idx: (0, 0)),
        scratch_shapes=[pltpu.VMEM((rp, loc), jnp.int32),
                        pltpu.VMEM((NB, rp, loc), jnp.int32),
                        pltpu.VMEM((NA, rows, loc), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((NB,))],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, loc), jnp.int32),
        interpret=interpret,
        compiler_params=_params(interpret),
    )

    def body(acc, pa_ext, pbx, idx, *leaf_args):
        # shape-driven: a caller may pass pre-padded [.., rp, loc] tables
        # (RnsOps.prepare_replay_pbx hoists the pbx pad to once per
        # runner); anything still at the true row count pads here
        pad = ((0, 0), (0, rp - rows), (0, 0))
        if pa_ext.shape[1] != rp:
            pa_ext = jnp.pad(pa_ext, pad)
        if pbx.shape[1] != rp:
            pbx = jnp.pad(pbx, pad)
        return call(idx, *leaf_args, pa_ext, pbx, acc)

    ax = sharder.axis_name if sharder is not None else None
    run = _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, ax), P(None, None, ax), P(None, None, ax),
                  P(None)) + (P(),) * nl,
        out_specs=P(None, ax))
    return lambda acc, pa_ext, pbx, idx: run(acc, pa_ext, pbx, idx, *leaves)


def make_rns_tape_executor(host: rns.RnsHost, batch: int, chunk: int = 4096,
                           interpret: bool = False, sharder=None):
    """Returns run(pts [S,2,rows,B], tape [T,5], s_const [rows,B]) -> pts.

    Same chunk protocol as pallas_ops.make_tape_executor: the tape is
    NOP-padded to `chunk` multiples and driven from Python (fixed-shape
    compiled unit, Mosaic compiled once), state aliased in/out so the
    register file never leaves the device between chunks; with a Sharder
    the per-chunk call is shard_mapped over the ('curves',) mesh."""
    rows = host.dev.rows
    loc = _local_batch(batch, sharder)
    assert loc % LANE == 0

    dev = host.dev
    if not dev.use_split:
        # forced split in-kernel (see _ctx_io: Mosaic cannot lower the
        # small-K direct int32 dot); value-identical
        dev = dataclasses.replace(dev, use_split=True)
    leaves, treedef = jax.tree_util.tree_flatten(dev)
    leaves = [jnp.asarray(l) for l in leaves]
    kern = functools.partial(_rns_tape_kernel, treedef,
                             {"nleaves": len(leaves)})

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                  for _ in range(len(leaves) + 2)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_SLOTS, 2, rows, loc), jnp.int32),
        input_output_aliases={len(leaves) + 1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chunk_body(t, pts, s, *leaf_args):
        return call(t, *leaf_args, pts, s)

    # the constant tables are explicit (replicated) arguments: shard_map
    # rejects closed-over device arrays, and as arguments they upload once
    # and stay device-resident across every chunk call
    ax = sharder.axis_name if sharder is not None else None
    chunk_call = _jit_maybe_sharded(
        chunk_body, sharder,
        in_specs=(P(None), P(None, None, None, ax), P(None, ax))
        + (P(),) * len(leaves),
        out_specs=P(None, None, None, ax), donate=(1,))

    def run(pts, tape, s_const):
        from ..curve.prac import pad_tape
        pts4 = jnp.asarray(pts)
        s4 = jnp.asarray(s_const)
        flat = pad_tape(np.asarray(tape), chunk).reshape(-1)
        for lo in range(0, flat.shape[0], 5 * chunk):
            pts4 = chunk_call(jnp.asarray(flat[lo:lo + 5 * chunk]), pts4, s4,
                              *leaves)
        return pts4

    return run


# ---------------------------------------------------------------------------
# Stage2Runner engine adapter (stage2/exec.DigitOps's RNS twin)
# ---------------------------------------------------------------------------

class RnsOps:
    """Representation-specific operations for stage2/exec.Stage2Runner on
    RNS residue planes: the orchestration (group streaming, masking,
    batch-inversion protocol, pairmap replay) is shared with the digit
    engine, so fixed sigma yields identical factor finds on either."""

    num_slots = NUM_SLOTS

    def __init__(self, host: rns.RnsHost, sharder=None,
                 interpret: bool = False):
        # Stream replay is the RNS default EVERYWHERE (round 5).  Large-K:
        # measured 2.35x faster stage 2 than gather on the 2355-bit
        # acceptance row (22.1 vs 52.0 s) after the round-4 odd-rows DMA
        # fix (manual make_async_copy of non-8-aligned [rows, loc] slabs
        # crashed the TPU worker; slabs are now sublane-padded).  Small-K:
        # the direct int32-dot mont_mul did not COMPILE in-kernel (Mosaic
        # bad-operand-shape at K=24), fixed by always using the 7-bit
        # split tables (value-identical); hardware parity probed at the
        # K=24 use_split=False geometry (tools/hw_rns_smallk.py, round 5).
        # TPU_ECM_REPLAY=gather overrides.
        self.default_replay = "stream"
        self.host = host
        self.ctx = host.ctx
        self.rc = host.dev
        self.sharder = sharder
        self.interpret = interpret
        # mont_mul(X, P^2 * v^-1) = (x/v) * P — the RNS-Montgomery analog
        # of the digit engine's R^2 premultiplier
        self.inv_premul = host.P * host.P

    # host packing --------------------------------------------------------
    def one_plane_np(self, b: int) -> np.ndarray:
        return self.host.pack([self.host.to_mont_int(1)] * b)

    def pack(self, ints):
        return self.host.pack(ints)

    def unpack(self, plane):
        return self.host.unpack(np.asarray(plane))

    def from_mont_int(self, v: int) -> int:
        return self.host.from_mont_int(v % self.ctx.n_int)

    # jitted jnp ops ------------------------------------------------------
    def xdbl(self, x, z, s_const):
        return _jit_xdbl(x, z, s_const, self.rc)

    def jit_run_tape(self):
        f = jax.jit(run_tape)
        return lambda pts, tape, s: f(pts, jnp.asarray(tape), s, self.rc)

    def z_prefix(self, zs, one_plane):
        return z_prefix(zs, one_plane, self.rc)

    def apply_inverse(self, xs, zs, prefix, total_inv, one_plane):
        return apply_inverse(xs, zs, prefix, total_inv, one_plane, self.rc)

    def pa_extend(self, carry_pts, pd, s_const, count_arr):
        del s_const  # the 6-mul xadd needs no curve constant
        return pa_extend(carry_pts, pd, count_arr, self.rc)

    def replay_segment(self, acc, pa_inv_ext, pbx, idx):
        rows = self.host.dev.rows
        if int(pbx.shape[1]) > rows:      # sublane-padded table (see
            pbx = pbx[:, :rows]           # prepare_replay_pbx)
        return replay_segment(acc, pa_inv_ext, pbx, idx, self.rc)

    # pallas executor factories ------------------------------------------
    def make_chain(self, b, count):
        return make_rns_chain_executor(self.host, b, count,
                                       sharder=self.sharder,
                                       interpret=self.interpret)

    def make_prefix(self, b, count):
        return make_rns_prefix_executor(self.host, b, count,
                                        sharder=self.sharder,
                                        interpret=self.interpret)

    def make_apply(self, b, count):
        return make_rns_apply_inverse_executor(self.host, b, count,
                                               sharder=self.sharder,
                                               interpret=self.interpret)

    def make_replay(self, b, pa_rows, pb_rows, t_block, entries_per_step):
        return make_rns_replay_executor(self.host, b, pa_rows=pa_rows,
                                        pb_rows=pb_rows, t_block=t_block,
                                        entries_per_step=entries_per_step,
                                        sharder=self.sharder,
                                        interpret=self.interpret)

    def make_replay_stream(self, b, pa_rows, pb_rows, t_block, n_buffers,
                           unroll=1, packed=False, n_acc=1, tree=0):
        assert not packed   # dense digit packing is a digit-plane concept
        # tree bodies not yet built for the RNS twin: the digit-engine
        # A/B decides whether the shape is worth porting
        del tree
        return make_rns_replay_stream_executor(
            self.host, b, pa_rows=pa_rows, pb_rows=pb_rows, t_block=t_block,
            n_buffers=n_buffers, unroll=unroll, n_acc=n_acc,
            sharder=self.sharder, interpret=self.interpret)

    def prepare_replay_pbx(self, pbx):
        """Hoist the stream kernel's sublane pad of the Pb table (rows ->
        ceil(rows/8)*8, see make_rns_replay_stream_executor) to ONE copy
        per runner instead of one per replay call.  Single-device only:
        an eager pad of a mesh-sharded table could resharden/gather, so
        sharded runs keep the per-call in-shard_map pad (value-identical
        either way — the executor pads anything still at the true row
        count)."""
        rows = self.host.dev.rows
        rp = -(-rows // 8) * 8
        if self.sharder is not None or int(pbx.shape[1]) >= rp:
            return pbx          # already padded (idempotent) or sharded
        return jnp.pad(pbx, ((0, 0), (0, rp - rows), (0, 0)))
