"""Batched reduced-radix modular arithmetic in JAX — the vecarith replacement.

Functional equivalents of the reference's five arithmetic entry points
(vecmulmod/vecsqrmod/vecaddmod/vecsubmod/vecaddsubmod function pointers,
/root/reference/avx_ecm.h:205-209), re-designed for the TPU VPU:

* digits are base 2**w (w <= 13) int32 "limb planes" of shape [NW, B], the
  batch (curve) axis B last so it maps onto the 128-wide vector lanes;
* digit products (< 2**26) and their column sums accumulate exactly in int32
  (carry-save) — the TPU answer to the reference's 52-bit FMA/IFMA trick
  (/root/reference/vecarith52.c:199-277);
* carries are normalized by two data-parallel "lazy" passes over the whole
  plane instead of sequential mask-register carry chains
  (/root/reference/vecarith52.c:76-136);
* there are no conditional subtracts: R >= 16N keeps every value in (-4N,4N)
  (redundant Montgomery), so the masked compare/sub tails of
  vecaddmod52/vecsubmod52 (/root/reference/vecarith52.c:4550-4723) vanish;
* Mersenne / pseudo-Mersenne moduli skip REDC entirely: full product, then
  fold at bit e with digit-granular shifts — the reduced-radix analog of
  vecmulmod52_mersenne (/root/reference/vecarith52.c:284-1031).

Everything here is shape-static and jit/scan/shard_map-friendly; the batch
axis may be sharded over a device mesh with no cross-device communication.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import ArithParams, MontyCtx
from . import layout


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceCtx:
    """Device-resident arithmetic context (one per modulus, shared by all
    curves).  Analog of the reference ``monty`` struct."""
    n: jax.Array          # [NW, 1] int32 digits of the working modulus
    c: jax.Array          # [CL, 1] int32 digits of |mersenne c| (or [1,1] zero)
    p: ArithParams = dataclasses.field(metadata=dict(static=True))
    nprime: int = dataclasses.field(metadata=dict(static=True))
    mersenne_e: int = dataclasses.field(metadata=dict(static=True))
    mersenne_c_sign: int = dataclasses.field(metadata=dict(static=True))

    @property
    def is_mersenne(self) -> bool:
        return self.mersenne_e != 0


def device_ctx(ctx: MontyCtx) -> DeviceCtx:
    p = ctx.p
    n_digits = layout.int_to_digits(ctx.n_int, p.w, p.nw)[:, None]
    if ctx.is_mersenne:
        cabs = abs(ctx.mersenne_c)
        cl = max(1, (cabs.bit_length() + p.w - 1) // p.w)
        c_digits = layout.int_to_digits(cabs, p.w, cl)[:, None]
        sign = 1 if ctx.mersenne_c > 0 else -1
    else:
        c_digits = np.zeros((1, 1), dtype=np.int32)
        sign = 0
    return DeviceCtx(n=jnp.asarray(n_digits), c=jnp.asarray(c_digits),
                     p=p, nprime=ctx.nprime,
                     mersenne_e=ctx.mersenne_e, mersenne_c_sign=sign)


# ---------------------------------------------------------------------------
# add / sub — plain digit-wise ops (redundant representation)
# ---------------------------------------------------------------------------

def addmod(a: jax.Array, b: jax.Array, ctx: DeviceCtx) -> jax.Array:
    return a + b


def submod(a: jax.Array, b: jax.Array, ctx: DeviceCtx) -> jax.Array:
    return a - b


def addsubmod(a: jax.Array, b: jax.Array, ctx: DeviceCtx
              ) -> Tuple[jax.Array, jax.Array]:
    """(a+b, a-b) in one pass (vec_simul_addsub52 analog)."""
    return a + b, a - b


def _norm_out(t: jax.Array, ctx: DeviceCtx) -> jax.Array:
    """Make an add/sub result safe as a prenormalized mulmod operand: in
    norm_inputs mode apply the one lazy pass here (once per value) instead
    of at every mulmod entry (once per use)."""
    return _lazy_pass(t, ctx.p.w) if ctx.p.norm_inputs else t


def addmod_n(a: jax.Array, b: jax.Array, ctx: DeviceCtx) -> jax.Array:
    return _norm_out(a + b, ctx)


def submod_n(a: jax.Array, b: jax.Array, ctx: DeviceCtx) -> jax.Array:
    return _norm_out(a - b, ctx)


def addsubmod_n(a: jax.Array, b: jax.Array, ctx: DeviceCtx
                ) -> Tuple[jax.Array, jax.Array]:
    return _norm_out(a + b, ctx), _norm_out(a - b, ctx)


# ---------------------------------------------------------------------------
# lazy carry normalization
# ---------------------------------------------------------------------------

def _lazy_pass(t: jax.Array, w: int) -> jax.Array:
    """One carry-save squeeze: digit j := (t_j mod 2^w) + carry(t_{j-1}).

    The top row keeps its full (signed) value plus incoming carry; for any
    value bounded by the Montgomery invariants the top digit self-bounds to
    (-2^w-eps, 2^w+eps) once the lower rows are in [0, 2^w).
    """
    mask = (1 << w) - 1
    lo = jnp.bitwise_and(t, mask)
    carry = jnp.right_shift(t, w)
    lo = lo.at[-1].set(t[-1])  # keep top row unsplit (signed guard digit)
    shifted = jnp.concatenate([jnp.zeros_like(carry[:1]), carry[:-1]], axis=0)
    return lo + shifted


def lazy_normalize(t: jax.Array, w: int, passes: int = 2) -> jax.Array:
    for _ in range(passes):
        t = _lazy_pass(t, w)
    return t


# ---------------------------------------------------------------------------
# full product columns (schoolbook, statically unrolled)
# ---------------------------------------------------------------------------

def _product_columns(a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact column sums of a*b: [NW,B] x [NW,B] -> [2NW, B] int32.

    Statically unrolled over the NW rows of ``a``; every step is a full
    [NW, B] fused multiply-add on the VPU.  Column sums stay within int32 by
    the radix selection in params.select_radix.
    """
    nw, bsz = a.shape
    t = jnp.zeros((2 * nw, bsz), dtype=jnp.int32)
    for i in range(nw):
        t = jax.lax.dynamic_update_slice_in_dim(
            t, jax.lax.dynamic_slice_in_dim(t, i, nw, 0) + a[i][None, :] * b,
            i, axis=0)
    return t


def _square_columns(a: jax.Array) -> jax.Array:
    """Exact column sums of a*a, exploiting symmetry (~half the multiplies,
    like vecsqrmod52, /root/reference/vecarith52.c:3317-4549)."""
    nw, bsz = a.shape
    toff = jnp.zeros((2 * nw, bsz), dtype=jnp.int32)
    for i in range(nw - 1):
        # off-diagonal row: a_i * a[i+1:]
        seg = a[i][None, :] * a[i + 1:]
        toff = jax.lax.dynamic_update_slice_in_dim(
            toff, jax.lax.dynamic_slice_in_dim(toff, 2 * i + 1, nw - 1 - i, 0)
            + seg, 2 * i + 1, axis=0)
    t = toff + toff  # double the cross terms
    diag = a * a     # [NW, B]
    even = t[0:2 * nw:2] + diag
    t = t.at[0:2 * nw:2].set(even)
    return t


# ---------------------------------------------------------------------------
# Montgomery REDC
# ---------------------------------------------------------------------------

def _redc(t: jax.Array, ctx: DeviceCtx) -> jax.Array:
    """Digit-serial Montgomery reduction of [2NW, B] columns -> [NW, B].

    The sequential dependency is only through the NW quotient digits
    (q_i = t_i * nprime mod 2^w, /root/reference/vecarith52.c:2659); each of
    the NW steps is still a full [NW, B] vector FMA, so the batch axis keeps
    the VPU busy.  Result value is (T + mN)/R in (-2N, 2N).
    """
    p = ctx.p
    nw, mask = p.nw, p.mask
    n_row = ctx.n  # [NW, 1]

    def body(i, t):
        col = jax.lax.dynamic_slice_in_dim(t, i, 1, 0)            # [1, B]
        q = jnp.bitwise_and(col * ctx.nprime, mask)               # [1, B]
        seg = jax.lax.dynamic_slice_in_dim(t, i, nw, 0) + q * n_row
        t = jax.lax.dynamic_update_slice_in_dim(t, seg, i, axis=0)
        new_col = jax.lax.dynamic_slice_in_dim(t, i, 2, 0)        # [2, B]
        carry = jnp.right_shift(new_col[0:1], p.w)
        t = jax.lax.dynamic_update_slice_in_dim(
            t, new_col[1:2] + carry, i + 1, axis=0)
        return t

    t = jax.lax.fori_loop(0, nw, body, t, unroll=4)
    return jax.lax.slice_in_dim(t, nw, 2 * nw, axis=0)


# ---------------------------------------------------------------------------
# Mersenne fold
# ---------------------------------------------------------------------------

def _fold_once(t: jax.Array, ctx: DeviceCtx, out_rows: int) -> jax.Array:
    """Reduce value(t) mod 2^e - c by one fold: lo + c * (t >> e).

    Works on lazily-normalized digits; bit-slicing at e = k0*w + s is done
    per digit with the two's-complement identity x = (x & (2^s-1)) + (x>>s)*2^s.
    """
    p = ctx.p
    e, w = ctx.mersenne_e, p.w
    k0, s = divmod(e, w)
    rows, bsz = t.shape
    assert rows > k0 and out_rows > k0
    # lo part: rows [0, k0] with row k0 masked to s bits
    lo = jnp.zeros((out_rows, bsz), dtype=jnp.int32)
    lo = lo.at[:k0].set(t[:k0])
    if s > 0:
        lo = lo.at[k0].set(jnp.bitwise_and(t[k0], (1 << s) - 1))
    # hi part: value(t) >> e, as digits
    hi_rows = rows - k0
    if s == 0:
        hi = t[k0:]
    else:
        top = jnp.right_shift(t[k0:], s)
        nxt = jnp.concatenate(
            [jnp.left_shift(jnp.bitwise_and(t[k0 + 1:], (1 << s) - 1), w - s),
             jnp.zeros((1, bsz), dtype=jnp.int32)], axis=0)
        hi = top + nxt
    # res = lo + sign * c * hi  (c has CL digits; schoolbook rows)
    cl = ctx.c.shape[0]
    assert cl <= k0, "pseudo-Mersenne c too large for exponent at this radix"
    acc = lo
    for l in range(cl):
        seg_rows = min(hi_rows, out_rows - l)
        if seg_rows <= 0:
            break
        prod = ctx.c[l] * hi[:seg_rows]
        if ctx.mersenne_c_sign < 0:
            prod = -prod
        acc = acc.at[l:l + seg_rows].add(prod)
    return acc


def _mersenne_reduce(t: jax.Array, ctx: DeviceCtx) -> jax.Array:
    """[2NW, B] product columns -> [NW, B] digits of value mod 2^e - c."""
    p = ctx.p
    t = lazy_normalize(t, p.w)
    t = _fold_once(t, ctx, out_rows=t.shape[0])
    t = lazy_normalize(t, p.w)
    t = _fold_once(t, ctx, out_rows=t.shape[0])
    t = lazy_normalize(t, p.w)
    t = _fold_once(t, ctx, out_rows=p.nw)
    return lazy_normalize(t, p.w)


# ---------------------------------------------------------------------------
# public mulmod / sqrmod
# ---------------------------------------------------------------------------

def mulmod(a: jax.Array, b: jax.Array, ctx: DeviceCtx, *,
           pre: bool = False) -> jax.Array:
    """Modular product of digit planes (vecmulmod52 / vecmulmod52_mersenne).

    pre=True asserts both operands are already safe (mulmod outputs, packed
    host values, or *_n add/sub results) and skips the norm_inputs entry
    passes."""
    if ctx.p.norm_inputs and not pre:
        a = _lazy_pass(a, ctx.p.w)
        b = _lazy_pass(b, ctx.p.w)
    t = _product_columns(a, b)
    if ctx.is_mersenne:
        return _mersenne_reduce(t, ctx)
    return lazy_normalize(_redc(t, ctx), ctx.p.w)


def sqrmod(a: jax.Array, ctx: DeviceCtx, *, pre: bool = False) -> jax.Array:
    """Modular square (vecsqrmod52 analog, symmetric half-product)."""
    if ctx.p.norm_inputs and not pre:
        a = _lazy_pass(a, ctx.p.w)
    t = _square_columns(a)
    if ctx.is_mersenne:
        return _mersenne_reduce(t, ctx)
    return lazy_normalize(_redc(t, ctx), ctx.p.w)
