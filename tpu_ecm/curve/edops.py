"""Twisted Edwards a=-1 extended-coordinate point ops and the jnp tape
executor (the Edwards analog of curve/ops.py; the Pallas twin lives in
limbs/pallas_ops.make_edwards_executor — both bit-identical).

State: accumulator [4, NW, B] (X, Y, Z, T planes, Montgomery form) and a
window table of 2^(w-2) precomputed odd multiples in cached mixed-add form
[Tp, 3, NW, B]: (Y-X, Y+X, 2d*T), Z normalized to 1 host-side.

Formulas (Hisil-Wong-Carter-Dawson 2008, a=-1):
  DBL: A=X^2 B=Y^2 C=2Z^2 E=(X+Y)^2-A-B G=B-A F=G-C H=-(A+B)
       X3=EF Y3=GH Z3=FG [T3=EH]            -> 3M+4S (+1M when T is needed)
  mixed ADD (Z2=1, cached):
       A=(Y1-X1)k0 B=(Y1+X1)k1 C=T1*k2 D=2Z1
       E=B-A H=B+A F=D-C G=D+C
       X3=EF Y3=GH Z3=FG                    -> 7M (T3 never needed: wNAF
       tapes separate adds by >= w-1 doublings, and only adds read T)
  negated ADD (digit < 0): swap k0/k1, negate C — zero extra multiplies.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..limbs import jnp_ops
from ..limbs.jnp_ops import DeviceCtx
from .edwards import ED_DBL, ED_DBLT, ED_ADD, ED_SUB, ED_NOP


def edbl(acc: jax.Array, ctx: DeviceCtx, want_t: bool) -> jax.Array:
    X, Y, Z, T = acc[0], acc[1], acc[2], acc[3]
    A = jnp_ops.sqrmod(X, ctx, pre=True)
    B = jnp_ops.sqrmod(Y, ctx, pre=True)
    C1 = jnp_ops.sqrmod(Z, ctx, pre=True)
    C = jnp_ops.addmod_n(C1, C1, ctx)
    E0 = jnp_ops.sqrmod(jnp_ops.addmod_n(X, Y, ctx), ctx, pre=True)
    E = jnp_ops.submod_n(jnp_ops.submod_n(E0, A, ctx), B, ctx)
    G = jnp_ops.submod_n(B, A, ctx)
    F = jnp_ops.submod_n(G, C, ctx)
    H = -jnp_ops.addmod_n(A, B, ctx)
    X3 = jnp_ops.mulmod(E, F, ctx, pre=True)
    Y3 = jnp_ops.mulmod(G, H, ctx, pre=True)
    Z3 = jnp_ops.mulmod(F, G, ctx, pre=True)
    T3 = jnp_ops.mulmod(E, H, ctx, pre=True) if want_t else T
    return jnp.stack([X3, Y3, Z3, T3])


def eadd(acc: jax.Array, k0: jax.Array, k1: jax.Array, k2: jax.Array,
         ctx: DeviceCtx, negate: bool) -> jax.Array:
    X, Y, Z, T = acc[0], acc[1], acc[2], acc[3]
    s1, d1 = jnp_ops.addsubmod_n(Y, X, ctx)       # Y1+X1, Y1-X1
    ka, kb = (k1, k0) if negate else (k0, k1)
    A = jnp_ops.mulmod(d1, ka, ctx, pre=True)
    B = jnp_ops.mulmod(s1, kb, ctx, pre=True)
    C = jnp_ops.mulmod(T, k2, ctx, pre=True)
    if negate:
        C = -C
    D = jnp_ops.addmod_n(Z, Z, ctx)
    H, E = jnp_ops.addsubmod_n(B, A, ctx)         # B+A, B-A
    G, F = jnp_ops.addsubmod_n(D, C, ctx)         # D+C, D-C
    X3 = jnp_ops.mulmod(E, F, ctx, pre=True)
    Y3 = jnp_ops.mulmod(G, H, ctx, pre=True)
    Z3 = jnp_ops.mulmod(F, G, ctx, pre=True)
    return jnp.stack([X3, Y3, Z3, T])


def tape_step(acc: jax.Array, entry: jax.Array, table: jax.Array,
              ctx: DeviceCtx) -> jax.Array:
    op, arg = entry[0], entry[1]
    tab = jnp.take(table, arg, axis=0)            # [3, NW, B]

    return jax.lax.switch(op, [
        lambda _: edbl(acc, ctx, want_t=False),
        lambda _: edbl(acc, ctx, want_t=True),
        lambda _: eadd(acc, tab[0], tab[1], tab[2], ctx, negate=False),
        lambda _: eadd(acc, tab[0], tab[1], tab[2], ctx, negate=True),
        lambda _: acc,
    ], None)


def run_tape(acc: jax.Array, tape: jax.Array, table: jax.Array,
             ctx: DeviceCtx) -> jax.Array:
    """Replay a [T, 2] int32 Edwards tape over the accumulator."""

    def step(acc, entry):
        return tape_step(acc, entry, table, ctx), None

    acc, _ = jax.lax.scan(step, acc, tape)
    return acc


def to_montgomery_pair(acc: jax.Array, ctx: DeviceCtx
                       ) -> Tuple[jax.Array, jax.Array]:
    """(X:Y:Z:T) -> (U, W) = (Z+Y, Z-Y): the projective x-coordinate on the
    birationally equivalent Montgomery curve (feeds stage 2 / savefiles)."""
    return jnp_ops.addsubmod_n(acc[2], acc[1], ctx)
