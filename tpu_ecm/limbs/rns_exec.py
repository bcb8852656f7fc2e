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

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from . import rns
from .pallas_ops import LANE, NUM_SLOTS, OP_NOP, _jit_maybe_sharded, \
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

    leaves, treedef = jax.tree_util.tree_flatten(host.dev)
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
        pts4 = jnp.asarray(pts)
        s4 = jnp.asarray(s_const)
        tape_np = np.asarray(tape)
        t = tape_np.shape[0]
        npad = (-t) % chunk
        if npad:
            nop = np.tile(np.asarray([[OP_NOP, NUM_SLOTS - 1, 0, 0, 0]],
                                     np.int32), (npad, 1))
            tape_np = np.concatenate([tape_np, nop], axis=0)
        flat = tape_np.reshape(-1)
        for lo in range(0, flat.shape[0], 5 * chunk):
            pts4 = chunk_call(jnp.asarray(flat[lo:lo + 5 * chunk]), pts4, s4,
                              *leaves)
        return pts4

    return run
