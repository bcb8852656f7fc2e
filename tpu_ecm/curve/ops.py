"""Montgomery-curve x-only point operations and the device tape executor.

The reference drives its point math through data-dependent C control flow
(prac / next_pt_vec, /root/reference/ecm.c:565-976).  On TPU that control
flow is hoisted to the host: chains are *planned* per prime into a byte-coded
tape (curve/prac.py) — they depend only on the prime, not on N or the curves
— and the device replays the tape as a single lax.scan whose state is a
register file of S=6 points [S, 2, NW, B].  Swaps become register renaming at
plan time (the reference swaps pointers, /root/reference/ecm.c:624-629), so
the executed stream is pure ADD/DUP.

Formulas (6-mul differential add, 5-mul duplicate) follow vec_add /
vec_duplicate (/root/reference/ecm.c:407-457):
  ADD(P1,P2 | diff D):  U=(X1-Z1)(X2+Z2), V=(X1+Z1)(X2-Z2)
                        X+ = Zd*(U+V)^2,  Z+ = Xd*(U-V)^2
  DUP(P):               V=(X-Z)^2, U=(X+Z)^2, X2 = U*V
                        W = U-V,  Z2 = (V + s*W)*W      [s = (A+2)/4]
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..limbs import jnp_ops
from ..limbs.jnp_ops import DeviceCtx

# tape opcodes
OP_DUP = 0
OP_ADD = 1
OP_NOP = 2   # dst := pts[a] (padding; by convention dst = NUM_SLOTS-1, a = 0)

NUM_SLOTS = 6  # P + {A,B,C,T} + 1 spare for renaming


def xdbl(X: jax.Array, Z: jax.Array, s_const: jax.Array, ctx: DeviceCtx
         ) -> Tuple[jax.Array, jax.Array]:
    # every mulmod operand is pre-safe: mulmod outputs / stored points /
    # s_const directly, add-sub results via the normalizing *_n variants —
    # one lazy pass per produced value instead of one per mulmod entry
    s_, d_ = jnp_ops.addsubmod_n(X, Z, ctx)
    v = jnp_ops.sqrmod(d_, ctx, pre=True)
    u = jnp_ops.sqrmod(s_, ctx, pre=True)
    x2 = jnp_ops.mulmod(u, v, ctx, pre=True)
    w_ = jnp_ops.submod_n(u, v, ctx)
    t = jnp_ops.mulmod(w_, s_const, ctx, pre=True)
    z2 = jnp_ops.mulmod(jnp_ops.addmod_n(t, v, ctx), w_, ctx, pre=True)
    return x2, z2


def xadd(X1, Z1, X2, Z2, Xd, Zd, ctx: DeviceCtx) -> Tuple[jax.Array, jax.Array]:
    s1, d1 = jnp_ops.addsubmod_n(X1, Z1, ctx)
    s2, d2 = jnp_ops.addsubmod_n(X2, Z2, ctx)
    u = jnp_ops.mulmod(d1, s2, ctx, pre=True)
    v = jnp_ops.mulmod(s1, d2, ctx, pre=True)
    sp, dm = jnp_ops.addsubmod_n(u, v, ctx)
    t1 = jnp_ops.sqrmod(sp, ctx, pre=True)
    t2 = jnp_ops.sqrmod(dm, ctx, pre=True)
    xo = jnp_ops.mulmod(t1, Zd, ctx, pre=True)
    zo = jnp_ops.mulmod(t2, Xd, ctx, pre=True)
    return xo, zo


def tape_step(pts: jax.Array, entry: jax.Array, s_const: jax.Array,
              ctx: DeviceCtx) -> jax.Array:
    """Execute one tape entry (op, dst, a, b, c) on the [S, 2, NW, B] file."""
    op, dst, ia, ib, ic = (entry[0], entry[1], entry[2], entry[3], entry[4])

    pa = jnp.take(pts, ia, axis=0)  # [2, NW, B]

    def dup_branch(_):
        x2, z2 = xdbl(pa[0], pa[1], s_const, ctx)
        return jnp.stack([x2, z2])

    def add_branch(_):
        pb = jnp.take(pts, ib, axis=0)
        pd = jnp.take(pts, ic, axis=0)
        xo, zo = xadd(pa[0], pa[1], pb[0], pb[1], pd[0], pd[1], ctx)
        return jnp.stack([xo, zo])

    def nop_branch(_):
        return pa

    newpt = jax.lax.switch(op, [dup_branch, add_branch, nop_branch], None)
    return pts.at[dst].set(newpt)


def run_tape(pts: jax.Array, tape: jax.Array, s_const: jax.Array,
             ctx: DeviceCtx) -> jax.Array:
    """Replay a [T, 5] int32 tape over the point register file."""

    def step(pts, entry):
        return tape_step(pts, entry, s_const, ctx), None

    pts, _ = jax.lax.scan(step, pts, tape)
    return pts
