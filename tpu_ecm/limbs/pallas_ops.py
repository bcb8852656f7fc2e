"""Pallas/Mosaic kernels for the hot path: Montgomery mulmod and the
ADD/DUP tape executor with curve state resident in VMEM.

Design (measured on TPU v5e, see BENCH_NOTES.md):

* The jnp ops (jnp_ops.py) under a multi-million-step lax.scan are dispatch-
  and latency-bound (~360us/step).  Here an entire tape chunk executes
  inside one kernel: per-step cost is the arithmetic itself.
* Layout [NW, Bs, 128]: the batch axis is split so every *digit row* is a
  stack of full 8x128 vregs.  All product/REDC updates are full-tile FMAs
  with zero sublane/lane shuffles — the TPU answer to the reference's
  zmm-register choreography (/root/reference/vecarith52.c:2438-3074).
* The modulus digits and nprime are baked in as compile-time scalars (one
  modulus per run, same as the reference's single monty context).
* The instruction tape rides in SMEM via PrefetchScalarGridSpec; the point
  register file [S, 2, NW, Bs, 128] stays in VMEM across the whole chunk
  via input/output aliasing; an outer lax.scan feeds consecutive chunks.

Semantics are bit-identical to jnp_ops/curve.ops (tested in interpret mode
and cross-checked against the int oracle).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from ..params import MontyCtx
from . import layout as _layout

OP_DUP = 0
OP_ADD = 1
OP_NOP = 2
NUM_SLOTS = 6
LANE = 128

# beyond ~64 digits the flat mulmod schedule's ~2*nw live column accumulators
# spill badly enough that the blocked-CIOS schedule (see _make_arith) wins
# (measured: flat 18.9 vs blocked 20.0 us/step at nw=57/B=1024; blocked 90.6
# vs flat 96.1 ns/curve at nw=93/B=896)
BLOCKED_NW = 64

# one-level Karatsuba pays for its combine adds once the halves are big
# enough; below this the plain schoolbook schedule is denser
KARA_NW = 20
# recursion floor: _kara_gen splits operands while len >= KARA_MIN.
# 10 gives two levels at the 416-bit headline (nw=36): 7.38 -> 6.98
# us/step vs one level (int32 multiply costs more issue slots than add);
# deeper (8/6) measured 7.09 — combine adds win below ~10 digits
KARA_MIN = 10

# blocked-CIOS live-column window (the TPU analog of the reference's
# BLOCKWORDS=4, /root/reference/avx_ecm.h:54); module-level so the
# large-moduli sweep (tools/bench_large_moduli.py) can tune it per nw
BLOCKED_BW = 8

# A hybrid kara+blocked REDC schedule (Karatsuba a*b column sums feeding
# the blocked walk) was built and A/B'd on an idle chip (round 4,
# tools/bench_large_moduli.py interleaved best-of-3): kara lost at 840
# bits (+8.9%) and 1200 bits (+2.5%), won only at 1008 (-1.8%) — the kara
# interior's register spill eats the ~20% MAC saving in the blocked
# regime.  The schedule was deleted (VERDICT r3 item 6); Karatsuba remains
# the flat-path default (KARA_NW/KARA_MIN above).


def default_batch(ctx: MontyCtx, max_batch: int = 2048) -> int:
    """Per-chip sweet-spot curve batch: live state scales with nw * batch,
    measured optima are ~2048 lanes at nw=40 and ~1024 at nw=57, i.e.
    bs * nw ~ 640."""
    bs = max(1, min(max_batch // LANE, (640 + ctx.p.nw - 1) // ctx.p.nw))
    return bs * LANE


def _local_batch(batch: int, sharder) -> int:
    """Per-device curve count when the batch axis is sharded (the per-chip
    analog of the reference's curves-per-thread split,
    /root/reference/main.c:585-589)."""
    if sharder is None:
        return batch
    assert batch % sharder.n == 0, (batch, sharder.n)
    loc = batch // sharder.n
    assert loc % LANE == 0, (
        f"per-device batch {loc} must be a multiple of {LANE} lanes")
    return loc


def _jit_maybe_sharded(body, sharder, in_specs, out_specs, donate=()):
    """jit(body) on one device; jit(shard_map(body)) over the sharder's
    ('curves',) mesh otherwise.  Inside the mapped body every array is the
    LOCAL shard, so the pallas_call built for the local batch size runs
    unchanged on each device — zero cross-device communication, exactly the
    reference's threads-own-disjoint-curves model (SURVEY.md section 2.4.2)."""
    if sharder is None:
        return jax.jit(body, donate_argnums=donate)
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation; the specs above are the full contract (no collectives
    # inside the body, so there is nothing for the vma checker to catch)
    mapped = jax.shard_map(body, mesh=sharder.mesh,
                           in_specs=in_specs, out_specs=out_specs,
                           check_vma=False)
    return jax.jit(mapped, donate_argnums=donate)


# ---------------------------------------------------------------------------
# in-kernel arithmetic on [NW, Bs, 128] values
# ---------------------------------------------------------------------------

def _make_arith(ctx: MontyCtx):
    """Build (mulmod, sqrmod) on [NW, Bs, 128] values, fully statically
    unrolled: every product column is one (stack of) vreg(s), every update a
    full-tile FMA with a scalar or tile operand — no dynamic slicing, no
    shuffles.  Modulus digits are compile-time int scalars."""
    p = ctx.p
    nw, w = p.nw, p.w
    mask = p.mask
    n_dig = [int(x) for x in _layout.int_to_digits(ctx.n_int, w, nw)]

    def lazy_list(cols, passes=2):
        for _ in range(passes):
            out = [jnp.bitwise_and(c, mask) for c in cols[:-1]] + [cols[-1]]
            for j in range(1, len(cols)):
                out[j] = out[j] + jnp.right_shift(cols[j - 1], w)
            cols = out
        return cols

    # blocked schedule (the TPU analog of the reference's BLOCKWORDS=4 CIOS,
    # /root/reference/vecarith52.c:2438): only a BW-column register window
    # live per block; operand/quotient rows stream (store-once/load-many)
    BW = BLOCKED_BW

    def product_cols(ar, br):
        cols = [None] * (2 * nw)
        for i in range(nw):
            for j in range(nw):
                k = i + j
                t = ar[i] * br[j]
                cols[k] = t if cols[k] is None else cols[k] + t
        cols[2 * nw - 1] = jnp.zeros_like(cols[0])
        return cols

    def _school(ar, br):
        cols = [None] * (len(ar) + len(br) - 1)
        for i in range(len(ar)):
            for j in range(len(br)):
                t = ar[i] * br[j]
                k = i + j
                cols[k] = t if cols[k] is None else cols[k] + t
        return cols

    def _school_sqr(ar):
        la = len(ar)
        cols = [None] * (2 * la - 1)
        for i in range(la):
            for j in range(i + 1, la):
                t = ar[i] * ar[j]
                k = i + j
                cols[k] = t if cols[k] is None else cols[k] + t
        cols = [None if c is None else c + c for c in cols]
        for i in range(la):
            d = ar[i] * ar[i]
            cols[2 * i] = d if cols[2 * i] is None else cols[2 * i] + d
        return cols

    def _kara_gen(ar, br):
        """Recursive Karatsuba column sums (br=None for squaring), exact in
        wrapping int32: intermediates may wrap mod 2^32 but the assembled
        columns are the schoolbook integers, which fit int32 by the
        _digit_bound_fixed_point analysis — only +,-,* touch the values
        before assembly, never shifts."""
        la = len(ar)
        if la < KARA_MIN:
            return _school_sqr(ar) if br is None else _school(ar, br)
        sqr = br is None
        nh = la // 2
        a0, a1 = ar[:nh], ar[nh:]
        sa = [a0[i] + a1[i] for i in range(nh)] + list(a1[nh:])
        if sqr:
            z0, z2, zm = _kara_gen(a0, None), _kara_gen(a1, None), \
                _kara_gen(sa, None)
        else:
            b0, b1 = br[:nh], br[nh:]
            sb = [b0[i] + b1[i] for i in range(nh)] + list(b1[nh:])
            z0 = _kara_gen(a0, b0)
            z2 = _kara_gen(a1, b1)
            zm = _kara_gen(sa, sb)
        z1 = list(zm)
        for k, c in enumerate(z0):
            z1[k] = z1[k] - c
        for k, c in enumerate(z2):
            z1[k] = z1[k] - c
        out = [None] * (la + len(br or ar) - 1)

        def acc(idx, c):
            out[idx] = c if out[idx] is None else out[idx] + c

        for k, c in enumerate(z0):
            acc(k, c)
        for k, c in enumerate(z1):
            acc(nh + k, c)
        for k, c in enumerate(z2):
            acc(2 * nh + k, c)
        return out

    def _kara_cols(ar, br):
        """Karatsuba column sums padded to the 2*nw REDC layout (~25% fewer
        multiplies per level; bit-identical results)."""
        cols = _kara_gen(ar, br)
        zero = jnp.zeros_like(ar[0])
        return [zero if c is None else c for c in cols] \
            + [zero] * (2 * nw - len(cols))

    def _ab_col(ar, br, c):
        """Column-c sum of a*b partial products.  br=None squares with the
        symmetry trick: only i < c-i terms, one doubling add, plus the
        center square — the assembled integer (2*ar[i]*ar[c-i] = the two
        mirrored schoolbook terms) is identical, so digit outputs stay
        bit-exact while the MAC count halves."""
        lo_i, hi_i = max(0, c - nw + 1), min(nw, c + 1)
        if br is not None:
            t = None
            for i in range(lo_i, hi_i):
                u = ar[i] * br[c - i]
                t = u if t is None else t + u
            return t
        hs = None
        for i in range(lo_i, (c + 1) // 2):
            u = ar[i] * ar[c - i]
            hs = u if hs is None else hs + u
        t = None if hs is None else hs + hs
        if c % 2 == 0:
            d = ar[c // 2] * ar[c // 2]
            t = d if t is None else t + d
        return t

    def product_cols_blocked(ar, br):
        """Same column sums, accumulated in BW-column blocks (br=None:
        symmetric squaring)."""
        zero = jnp.zeros_like(ar[0])
        cols = []
        for lo in range(0, 2 * nw, BW):
            hi = min(2 * nw, lo + BW)
            t = [zero] * (hi - lo)
            for c in range(lo, hi):
                u = _ab_col(ar, br, c)
                if u is not None:
                    t[c - lo] = t[c - lo] + u
            cols += t
        cols[2 * nw - 1] = zero
        return cols

    def square_cols(ar):
        cols = [None] * (2 * nw)
        for i in range(nw):
            for j in range(i + 1, nw):
                k = i + j
                t = ar[i] * ar[j]
                cols[k] = t if cols[k] is None else cols[k] + t
        zero = jnp.zeros_like(ar[0])
        cols = [zero if c is None else c + c for c in cols]
        for i in range(nw):
            cols[2 * i] = cols[2 * i] + ar[i] * ar[i]
        return cols

    if ctx.is_mersenne:
        e, c = ctx.mersenne_e, ctx.mersenne_c
        k0, s_bits = divmod(e, w)
        cabs = abs(c)
        c_dig = [int(x) for x in _layout.int_to_digits(
            cabs, w, max(1, (cabs.bit_length() + w - 1) // w))]
        sign = 1 if c > 0 else -1

        def fold_list(cols, out_rows):
            rows = len(cols)
            zero = jnp.zeros_like(cols[0])
            if s_bits > 0:
                hi = [jnp.right_shift(cols[k0 + j], s_bits)
                      + (jnp.left_shift(jnp.bitwise_and(cols[k0 + j + 1],
                                                        (1 << s_bits) - 1),
                                        w - s_bits)
                         if k0 + j + 1 < rows else zero)
                      for j in range(rows - k0)]
                lo = (cols[:k0] + [jnp.bitwise_and(cols[k0],
                                                   (1 << s_bits) - 1)])
            else:
                hi = cols[k0:]
                lo = cols[:k0]
            acc = lo + [zero] * (out_rows - len(lo))
            for l, cl in enumerate(c_dig):
                for j in range(min(len(hi), out_rows - l)):
                    t = cl * hi[j]
                    acc[l + j] = acc[l + j] + (-t if sign < 0 else t)
            return acc

        def reduce_cols(cols):
            cols = lazy_list(cols)
            cols = fold_list(cols, len(cols))
            cols = lazy_list(cols)
            cols = fold_list(cols, len(cols))
            cols = lazy_list(cols)
            cols = fold_list(cols, nw)
            return jnp.stack(lazy_list(cols))
    else:
        nprime = ctx.nprime

        def reduce_cols(cols):
            for i in range(nw):
                q = jnp.bitwise_and(cols[i] * nprime, mask)
                for j in range(nw):
                    if n_dig[j]:
                        cols[i + j] = cols[i + j] + q * n_dig[j]
                cols[i + 1] = cols[i + 1] + jnp.right_shift(cols[i], w)
            return jnp.stack(lazy_list(cols[nw:2 * nw]))

        def mont_blocked(ar, br):
            """Blocked CIOS: pass 1 walks the low columns in BW blocks to
            produce the quotient digits s[0..nw) and the carry into column
            nw; pass 2 accumulates the high columns (a*b + s*n) per block.
            Identical digit values to product_cols+reduce_cols (int32
            wrapping addition is commutative), ~BW live accumulators.
            br=None squares via the symmetric _ab_col sums (same integers,
            half the a*b MACs) while keeping the blocked register window."""
            zero = jnp.zeros_like(ar[0])
            s = [None] * nw
            carry = zero
            for lo in range(0, nw, BW):
                hi = min(nw, lo + BW)
                t = [zero] * (hi - lo)
                for c in range(lo, hi):
                    u = _ab_col(ar, br, c)
                    if u is not None:
                        t[c - lo] = t[c - lo] + u
                    for i in range(0, lo):
                        j = c - i
                        if j < nw and n_dig[j]:
                            t[c - lo] = t[c - lo] + s[i] * n_dig[j]
                t[0] = t[0] + carry
                for c in range(lo, hi):
                    sc = jnp.bitwise_and(t[c - lo] * nprime, mask)
                    s[c] = sc
                    for c2 in range(c, hi):
                        if n_dig[c2 - c]:
                            t[c2 - lo] = t[c2 - lo] + sc * n_dig[c2 - c]
                    carry = jnp.right_shift(t[c - lo], w)
                    if c + 1 < hi:
                        t[c + 1 - lo] = t[c + 1 - lo] + carry
                # carry flows into the next block's first column
            out = []
            for lo in range(nw, 2 * nw, BW):
                hi = min(2 * nw, lo + BW)
                t = [zero] * (hi - lo)
                for c in range(lo, hi):
                    u = _ab_col(ar, br, c)
                    if u is not None:
                        t[c - lo] = t[c - lo] + u
                    for i in range(max(0, c - nw + 1), nw):
                        j = c - i
                        if n_dig[j]:
                            t[c - lo] = t[c - lo] + s[i] * n_dig[j]
                out += t
            out[0] = out[0] + carry
            return jnp.stack(lazy_list(out))

    blocked = nw > BLOCKED_NW

    def norm1(x):
        """One lazy pass on a stacked value — makes an add/sub result safe
        as a pre-normalized mulmod operand (identical digit semantics to
        jnp_ops._lazy_pass, so engines stay bit-identical)."""
        if not p.norm_inputs:
            return x
        return jnp.stack(lazy_list([x[i] for i in range(nw)], passes=1))

    def mulmod(a, b, pre=False):
        ar = [a[i] for i in range(nw)]
        br = [b[i] for i in range(nw)]
        if p.norm_inputs and not pre:
            # entry lazy pass (top guard row unsplit): keeps operand digits
            # near 2^w so column sums stay in int32 at large nw
            ar = lazy_list(ar, passes=1)
            br = lazy_list(br, passes=1)
        if blocked and not ctx.is_mersenne:
            return mont_blocked(ar, br)
        if blocked:
            return reduce_cols(product_cols_blocked(ar, br))
        if nw >= KARA_NW:
            return reduce_cols(_kara_cols(ar, br))
        return reduce_cols(product_cols(ar, br))

    def sqrmod(a, pre=False):
        ar = [a[i] for i in range(nw)]
        if p.norm_inputs and not pre:
            ar = lazy_list(ar, passes=1)
        if blocked and not ctx.is_mersenne:
            # blocked register window AND square symmetry: _ab_col with
            # br=None emits the mirrored-pair sums doubled (bit-identical
            # integers, ~half the a*b MACs of the mul path)
            return mont_blocked(ar, None)
        if blocked:
            return reduce_cols(product_cols_blocked(ar, None))
        if nw >= KARA_NW:
            return reduce_cols(_kara_cols(ar, None))
        return reduce_cols(square_cols(ar))

    return mulmod, sqrmod, norm1


# ---------------------------------------------------------------------------
# tape executor kernel
# ---------------------------------------------------------------------------

def _tape_kernel(ctx: MontyCtx, tape_ref, pts_in, s_in, pts_out):
    mulmod, sqrmod, norm1 = _make_arith(ctx)

    pts_out[...] = pts_in[...]
    s_const = s_in[...]
    # tape rides FLAT in SMEM ([5T] int32): a [T, 5] array would be
    # lane-padded to T*128 words and overflow the 1 MB SMEM at large chunks
    nsteps = tape_ref.shape[0] // 5

    def xdbl(X, Z):
        # mirror curve.ops.xdbl exactly: add/sub results take ONE lazy pass
        # (norm1), every mulmod operand is then pre-safe — halves the
        # norm_inputs entry-pass count per point-op
        s_, d_ = norm1(X + Z), norm1(X - Z)
        v = sqrmod(d_, pre=True)
        u = sqrmod(s_, pre=True)
        x2 = mulmod(u, v, pre=True)
        w_ = norm1(u - v)
        t = mulmod(w_, s_const, pre=True)
        z2 = mulmod(norm1(t + v), w_, pre=True)
        return jnp.stack([x2, z2])

    def xadd(pa, pb, pd):
        s1, d1 = norm1(pa[0] + pa[1]), norm1(pa[0] - pa[1])
        s2, d2 = norm1(pb[0] + pb[1]), norm1(pb[0] - pb[1])
        u = mulmod(d1, s2, pre=True)
        v = mulmod(s1, d2, pre=True)
        t1 = sqrmod(norm1(u + v), pre=True)
        t2 = sqrmod(norm1(u - v), pre=True)
        return jnp.stack([mulmod(t1, pd[1], pre=True),
                          mulmod(t2, pd[0], pre=True)])

    def step(k, _):
        op = tape_ref[5 * k]
        dst = tape_ref[5 * k + 1]
        ia, ib, ic = (tape_ref[5 * k + 2], tape_ref[5 * k + 3],
                      tape_ref[5 * k + 4])
        pa = pts_out[ia]

        def do_dup(_):
            return xdbl(pa[0], pa[1])

        def do_add(_):
            return xadd(pa, pts_out[ib], pts_out[ic])

        def do_nop(_):
            return pa

        newpt = jax.lax.switch(op, [do_dup, do_add, do_nop], None)
        pts_out[dst] = newpt
        return 0

    jax.lax.fori_loop(0, nsteps, step, 0)


def _point_ops(ctx: MontyCtx):
    """xadd/xdbl on [2, NW, Bs, 128] points built over _make_arith (same
    formulas as curve.ops / the tape executor)."""
    mulmod, sqrmod, norm1 = _make_arith(ctx)

    def xadd(pa, pb, pd):
        # mirrors curve.ops.xadd (norm1-at-addsub, pre-safe mulmod operands)
        s1, d1 = norm1(pa[0] + pa[1]), norm1(pa[0] - pa[1])
        s2, d2 = norm1(pb[0] + pb[1]), norm1(pb[0] - pb[1])
        u = mulmod(d1, s2, pre=True)
        v = mulmod(s1, d2, pre=True)
        t1 = sqrmod(norm1(u + v), pre=True)
        t2 = sqrmod(norm1(u - v), pre=True)
        return jnp.stack([mulmod(t1, pd[1], pre=True),
                          mulmod(t2, pd[0], pre=True)])

    return mulmod, sqrmod, xadd


def make_chain_executor(ctx: MontyCtx, batch: int, count: int,
                        interpret: bool = False, sharder=None):
    """Differential-add chain: out[i] = out[i-1] + Pd (diff out[i-2]), seeded
    by (p1, p2) = (out[-1], out[-2]) — the giant-step extension
    (/root/reference/ecm.c:2405-2424) as one kernel with the running pair in
    VMEM scratch and one output point DMA'd out per grid step.

    run(p1 [2,NW,B], p2 [2,NW,B], pd [2,NW,B]) -> [count, 2, NW, B].
    """
    p = ctx.p
    nw = p.nw
    bs = _local_batch(batch, sharder) // LANE

    def kernel(p1_in, p2_in, pd, out, s1, s2):
        _, _, xadd = _point_ops(ctx)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s1[...] = p1_in[...]
            s2[...] = p2_in[...]

        new = xadd(s1[...], pd[...], s2[...])
        out[0] = new
        s2[...] = s1[...]
        s1[...] = new

    call = pl.pallas_call(
        kernel,
        grid=(count,),
        in_specs=[
            pl.BlockSpec((2, nw, bs, LANE), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((2, nw, bs, LANE), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((2, nw, bs, LANE), lambda i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, nw, bs, LANE),
                               lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((count, 2, nw, bs, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, nw, bs, LANE), jnp.int32),
                        pltpu.VMEM((2, nw, bs, LANE), jnp.int32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def body(p1, p2, pd):
        bl = p1.shape[-1]
        out = call(p1.reshape(2, nw, bl // LANE, LANE),
                   p2.reshape(2, nw, bl // LANE, LANE),
                   pd.reshape(2, nw, bl // LANE, LANE))
        return out.reshape(count, 2, nw, bl)

    ax = sharder.axis_name if sharder is not None else None
    return _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, None, ax),) * 3,
        out_specs=P(None, None, None, ax))


def make_prefix_executor(ctx: MontyCtx, batch: int, count: int,
                         interpret: bool = False, sharder=None):
    """Montgomery-trick prefix products over a stack of planes:
    out[i] = one * z[0] * ... * z[i] — sequential over rows, the running
    product living in VMEM scratch (batch-inversion phase 1,
    /root/reference/ecm.c:1869-2001).

    run(zs [count,NW,B], one [NW,B]) -> [count,NW,B].
    """
    p = ctx.p
    nw = p.nw
    bs = _local_batch(batch, sharder) // LANE

    def kernel(z_row, one_in, out, acc):
        mulmod, _, _ = _make_arith(ctx)

        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[...] = one_in[...]

        # operands are mul outputs / host-packed values: pre-safe, skip
        # the norm_inputs entry passes (mirrored in jnp _z_prefix)
        acc[...] = mulmod(acc[...], z_row[0], pre=True)
        out[0] = acc[...]

    call = pl.pallas_call(
        kernel,
        grid=(count,),
        in_specs=[
            pl.BlockSpec((1, nw, bs, LANE), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((nw, bs, LANE), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nw, bs, LANE), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((count, nw, bs, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nw, bs, LANE), jnp.int32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def body(zs, one):
        bl = zs.shape[-1]
        out = call(zs.reshape(count, nw, bl // LANE, LANE),
                   one.reshape(nw, bl // LANE, LANE))
        return out.reshape(count, nw, bl)

    ax = sharder.axis_name if sharder is not None else None
    return _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, None, ax), P(None, ax)),
        out_specs=P(None, None, ax))


def make_apply_inverse_executor(ctx: MontyCtx, batch: int, count: int,
                                interpret: bool = False, sharder=None):
    """Batch-inversion suffix walk + application (phase 3 of Montgomery's
    trick, /root/reference/ecm.c:1951-2001): given prefix products pres[i] =
    one*z[0]*..*z[i-1] and total_inv = (prod z)^-1, produce
    out[i] = x[i] * z[i]^-1, walking i from count-1 down to 0 with the
    running suffix in VMEM scratch.

    run(xs [count,NW,B], zs [count,NW,B], pres [count,NW,B],
        total_inv [NW,B]) -> [count,NW,B].
    """
    p = ctx.p
    nw = p.nw
    bs = _local_batch(batch, sharder) // LANE

    def kernel(x_row, z_row, pre_row, tinv_in, out, suf):
        mulmod, _, _ = _make_arith(ctx)

        @pl.when(pl.program_id(0) == 0)
        def _():
            suf[...] = tinv_in[...]

        # all operands pre-safe (mirrored in jnp _apply_inverse)
        inv_i = mulmod(suf[...], pre_row[0], pre=True)
        out[0] = mulmod(x_row[0], inv_i, pre=True)
        suf[...] = mulmod(suf[...], z_row[0], pre=True)

    rev = lambda i: (count - 1 - i, 0, 0, 0)
    call = pl.pallas_call(
        kernel,
        grid=(count,),
        in_specs=[
            pl.BlockSpec((1, nw, bs, LANE), rev),
            pl.BlockSpec((1, nw, bs, LANE), rev),
            pl.BlockSpec((1, nw, bs, LANE), rev),
            pl.BlockSpec((nw, bs, LANE), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nw, bs, LANE), rev),
        out_shape=jax.ShapeDtypeStruct((count, nw, bs, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nw, bs, LANE), jnp.int32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def body(xs, zs, pres, total_inv):
        bl = xs.shape[-1]
        out = call(xs.reshape(count, nw, bl // LANE, LANE),
                   zs.reshape(count, nw, bl // LANE, LANE),
                   pres.reshape(count, nw, bl // LANE, LANE),
                   total_inv.reshape(nw, bl // LANE, LANE))
        return out.reshape(count, nw, bl)

    ax = sharder.axis_name if sharder is not None else None
    return _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, None, ax),) * 3 + (P(None, ax),),
        out_specs=P(None, None, ax))


def make_replay_executor(ctx: MontyCtx, batch: int, pa_rows: int,
                         pb_rows: int, t_block: int = 2048,
                         entries_per_step: int = 4,
                         interpret: bool = False, sharder=None):
    """Stage-2 pairmap replay kernel: acc *= (Pa_inv[v] - PbX[u]) per entry
    (CROSS_PRODUCT_INV, /root/reference/ecm.c:1857-1859).

    Returns run(acc [NW,B], pa_ext [pa_rows,NW,B], pbx [pb_rows,NW,B],
    idx [t_block,2] int32) -> acc.

    The grid walks the entry list E = entries_per_step at a time; the
    scalar-prefetched idx drives the BlockSpec index maps, so each step's
    Pa/Pb rows are DMA-gathered from HBM into VMEM by the pipeline
    (double-buffered) while the accumulator stays resident in VMEM across
    the whole block.  E entries per step amortize the per-step pipeline
    overhead and shorten the sequential acc chain (the E differences
    multiply in a tree before touching acc).  Pad entries with
    (pa_rows-1, 0) where pa_ext[-1] is the Montgomery one and pbx[0] is
    zero: acc *= one is value-preserving.
    """
    p = ctx.p
    nw = p.nw
    assert t_block % entries_per_step == 0
    bs = _local_batch(batch, sharder) // LANE
    E = entries_per_step
    nsteps = t_block // E

    def kernel(idx_ref, *refs):
        rows = refs[:2 * E]           # pa0, pb0, pa1, pb1, ...
        acc_in, acc_out, acc_scr = refs[2 * E], refs[2 * E + 1], refs[-1]
        mulmod, _, norm1 = _make_arith(ctx)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_scr[...] = acc_in[...]

        # each Pa-Pb difference takes ONE lazy pass; every tree/acc product
        # then runs on pre-safe operands (one pass per value, not per use)
        diffs = [norm1(rows[2 * k][0] - rows[2 * k + 1][0]) for k in range(E)]
        while len(diffs) > 1:
            diffs = ([mulmod(diffs[j], diffs[j + 1], pre=True)
                      for j in range(0, len(diffs) - 1, 2)]
                     + ([diffs[-1]] if len(diffs) % 2 else []))
        acc_scr[...] = mulmod(acc_scr[...], diffs[0], pre=True)

        @pl.when(i == nsteps - 1)
        def _():
            acc_out[...] = acc_scr[...]

    # idx rides flat in SMEM ([2T] int32; a [T,2] array would get
    # lane-padded to T*128 words and overflow SMEM)
    gather_specs = []
    for k in range(E):
        gather_specs.append(pl.BlockSpec(
            (1, nw, bs, LANE),
            lambda i, idx, k=k: (idx[2 * (E * i + k)], 0, 0, 0)))
        gather_specs.append(pl.BlockSpec(
            (1, nw, bs, LANE),
            lambda i, idx, k=k: (idx[2 * (E * i + k) + 1], 0, 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=gather_specs + [
            pl.BlockSpec((nw, bs, LANE), lambda i, idx: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nw, bs, LANE), lambda i, idx: (0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((nw, bs, LANE), jnp.int32)],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nw, bs, LANE), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def body(acc, pa_ext, pbx, idx):
        bl = acc.shape[-1]
        acc4 = acc.reshape(nw, bl // LANE, LANE)
        pa4 = pa_ext.reshape(pa_rows, nw, bl // LANE, LANE)
        pb4 = pbx.reshape(pb_rows, nw, bl // LANE, LANE)
        gathers = [pa4, pb4] * E
        out = call(idx.reshape(2 * t_block), *gathers, acc4)
        return out.reshape(nw, bl)

    ax = sharder.axis_name if sharder is not None else None
    return _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, ax), P(None, None, ax), P(None, None, ax),
                  P(None, None)),
        out_specs=P(None, ax))


def make_replay_parow_executor(ctx: MontyCtx, batch: int, pa_rows: int,
                               pb_rows: int, nsteps: int,
                               entries_per_step: int = 16,
                               interpret: bool = False, sharder=None):
    """Replay variant exploiting the v-sort: each grid step's E entries share
    ONE Pa row (the host packs runs of equal global giant-step index into
    steps), so a step fetches 1 Pa block + E Pb blocks instead of the gather
    kernel's E Pa + E Pb — the per-entry Pa HBM traffic and half the DMA
    descriptors vanish.  With ~100+ pairs landing on each giant step at
    production bounds (pairs/2L per window, /root/reference/ecm.c:2448-2532),
    the packing waste (each Pa run padded to a multiple of E) is a few
    percent.

    run(acc [NW,B], pa_ext [pa_rows,NW,B], pbx [pb_rows,NW,B],
        idx [(1+E)*nsteps] int32) -> acc.
    idx per step: [pa_row, pb_0 .. pb_{E-1}]; pb == 0 marks a pad entry and
    is masked to the Montgomery one IN KERNEL (pbx[0] is the zero row, but
    pa - 0 would be pa, not a no-op — unlike the gather kernel, pads here
    share the step's real Pa row).  Whole pad steps use pa_row = pa_rows-1.
    """
    p = ctx.p
    nw = p.nw
    bs = _local_batch(batch, sharder) // LANE
    E = entries_per_step
    one_digits = [int(x) for x in
                  _layout.int_to_digits(ctx.r_mod_n, p.w, nw)]

    def kernel(idx_ref, *refs):
        pa_row = refs[0]
        pb_rows_in = refs[1:1 + E]
        acc_in, acc_out, acc_scr = refs[1 + E], refs[2 + E], refs[-1]
        mulmod, _, norm1 = _make_arith(ctx)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_scr[...] = acc_in[...]

        one_tile = jnp.stack(
            [jnp.full((bs, LANE), d, jnp.int32) for d in one_digits])
        pa = pa_row[0]
        diffs = []
        for k in range(E):
            u = idx_ref[(1 + E) * i + 1 + k]
            d = norm1(pa - pb_rows_in[k][0])
            diffs.append(jnp.where(u == 0, one_tile, d))
        while len(diffs) > 1:
            diffs = ([mulmod(diffs[j], diffs[j + 1], pre=True)
                      for j in range(0, len(diffs) - 1, 2)]
                     + ([diffs[-1]] if len(diffs) % 2 else []))
        acc_scr[...] = mulmod(acc_scr[...], diffs[0], pre=True)

        @pl.when(i == nsteps - 1)
        def _():
            acc_out[...] = acc_scr[...]

    gather_specs = [pl.BlockSpec(
        (1, nw, bs, LANE), lambda i, idx: (idx[(1 + E) * i], 0, 0, 0))]
    for k in range(E):
        gather_specs.append(pl.BlockSpec(
            (1, nw, bs, LANE),
            lambda i, idx, k=k: (idx[(1 + E) * i + 1 + k], 0, 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=gather_specs + [
            pl.BlockSpec((nw, bs, LANE), lambda i, idx: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nw, bs, LANE), lambda i, idx: (0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((nw, bs, LANE), jnp.int32)],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nw, bs, LANE), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def body(acc, pa_ext, pbx, idx):
        bl = acc.shape[-1]
        acc4 = acc.reshape(nw, bl // LANE, LANE)
        pa4 = pa_ext.reshape(pa_rows, nw, bl // LANE, LANE)
        pb4 = pbx.reshape(pb_rows, nw, bl // LANE, LANE)
        out = call(idx, pa4, *([pb4] * E), acc4)
        return out.reshape(nw, bl)

    ax = sharder.axis_name if sharder is not None else None
    return _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, ax), P(None, None, ax), P(None, None, ax),
                  P(None)),
        out_specs=P(None, ax))


def packed_words(p) -> int:
    """32-bit words per dense-packed row: the full nw*w digit span (values
    are lazy — up to ~2n with signed digits — so pack value mod R over all
    nw*w bits and recover the sign from the top bit at unpack)."""
    return -(-(p.nw * p.w) // 32)


def pack_replay_rows(ctx: MontyCtx, rows):
    """[R, nw, B] lazy digit planes -> [R, npw, B] dense 32-bit words.

    Replay DMA volume is nw words/curve/entry at ~w useful bits per 32-bit
    word (w=12 -> 37% density).  Packing to full density cuts the streamed
    Pb bytes by nw/npw (2.57x at the 416-bit flagship) for ~4 extra VPU ops
    per digit at unpack — noise next to the mulmod.  Encoding: canonicalize
    digits (carry-propagate, value preserved mod R = 2^(nw*w)); the final
    carry is dropped, so a negative-value row wraps mod R and the kernel
    sign-extends the top digit (|value| < 2n << R/2, the select_radix
    R >= 16*N guarantee).  Unpacked digits assemble to the exact stored
    integer, so replay results are value-identical to the unpacked kernel
    (REDC quotient digits depend only on operand VALUES, not on their digit
    decomposition)."""
    p = ctx.p
    w, nw, mask = p.w, p.nw, p.mask
    npw = packed_words(p)
    carry = None
    canon = []
    for j in range(nw):
        t = rows[:, j] if carry is None else rows[:, j] + carry
        canon.append(jnp.bitwise_and(t, mask))
        carry = jnp.right_shift(t, w)       # arithmetic: negative ok
    words = [None] * npw
    for j in range(nw):
        k, s = divmod(j * w, 32)
        lo = jnp.left_shift(canon[j], s) if s else canon[j]
        words[k] = lo if words[k] is None else jnp.bitwise_or(words[k], lo)
        if s + w > 32:
            hi = jnp.right_shift(canon[j], 32 - s)
            words[k + 1] = hi if words[k + 1] is None \
                else jnp.bitwise_or(words[k + 1], hi)
    zero = jnp.zeros_like(canon[0])
    return jnp.stack([zero if x is None else x for x in words], axis=1)


def _make_unpack(p):
    """Digit extraction matching pack_replay_rows: [npw, ...] words ->
    [nw, ...] canonical planes, top digit sign-extended (w-1 is the sign
    bit of the mod-R value)."""
    w, nw, mask = p.w, p.nw, p.mask

    def unpack(pbq):
        digs = []
        for j in range(nw):
            k, s = divmod(j * w, 32)
            if s == 0:
                d = jnp.bitwise_and(pbq[k], mask)
            elif s + w <= 32:
                # arithmetic >> then & mask: sign fill sits above bit w
                d = jnp.bitwise_and(jnp.right_shift(pbq[k], s), mask)
            else:
                lo = jnp.bitwise_and(jnp.right_shift(pbq[k], s),
                                     (1 << (32 - s)) - 1)
                hi = jnp.left_shift(
                    jnp.bitwise_and(pbq[k + 1], (1 << (s + w - 32)) - 1),
                    32 - s)
                d = jnp.bitwise_or(lo, hi)
            digs.append(d)
        top = digs[nw - 1]
        digs[nw - 1] = top - jnp.left_shift(
            jnp.right_shift(top, w - 1), w)
        return jnp.stack(digs)

    return unpack


def make_replay_stream_executor(ctx: MontyCtx, batch: int, pa_rows: int,
                                pb_rows: int, t_block: int = 65536,
                                n_buffers: int = 8, unroll: int = 1,
                                packed: bool = False, n_acc: int = 1,
                                tree: int = 0,
                                interpret: bool = False, sharder=None):
    """Replay with a MANUAL deep DMA pipeline (the round-3 kernel).

    Measured path to this design (BENCH_NOTES.md round 3): the compute
    floor is 1.88 us per norm1+mulmod at the flagship geometry
    (tools/hw_mulmod_floor.py), the auto-pipelined gather kernel runs at
    4.07 us/entry, and ~13.7 ms PER pallas_call of tunnel/dispatch cost
    makes small blocks dominate (6.86 us/entry at 4k blocks vs 3.72 at
    64k).  So: ONE grid step per 64k-entry block; a fori_loop walks the
    entries with n_buffers Pb rows in flight via explicit
    make_async_copy; the shared Pa row is re-fetched ONLY when the
    v-sorted entry stream changes giant step (~1/100+ entries), stalling
    on that rare fetch instead of paying a per-entry Pa copy.  acc
    multiplies sequentially — mulmod is VPU-throughput-bound (the
    dependency chain costs nothing, hw_mulmod_floor 'indep' == 'mul_only').

    run(acc [NW,B], pa_ext [pa_rows,NW,B], pbx [pb_rows,NW,B],
        idx [1 + t_block] int32: idx[0] = live entry count n (NB <= n <=
        t_block, the loop runs exactly n iterations — a short tail block
        costs n mulmods, not t_block), then PACKED (pa << 16 | pb) per
        entry.  Packing halves SMEM so 128k-entry blocks fit the 1 MB
        budget.  Pad entries with (pa_rows-1) << 16 | 0: pa_ext[-1] is the
        Montgomery one and pbx[0] the zero row (gather-kernel convention).

    packed=True streams DENSE-packed Pb rows (pack_replay_rows: [pb_rows,
    npw, B] 32-bit words instead of [pb_rows, nw, B] w-bit digit planes),
    unpacking in-register after each row DMA — nw/npw (~2.6x) less HBM
    traffic per entry for ~4 VPU ops per digit.  Value-identical results
    (see pack_replay_rows).

    n_acc>1 keeps n_acc INDEPENDENT accumulator chains and retires n_acc
    entries per loop body.  Measured motivation (round 4,
    tools/hw_mulmod_floor.py): fori_loop bodies do not software-pipeline
    across iterations, so a 1-entry body costs its critical path
    (norm1 -> dependent mulmod, ~2.4 us) while the VPU's throughput per
    mulmod with ILP is ~1.1 us (the xadd floor) — independent chains in
    one body fill the gap.  Chains start at the Montgomery one
    (pa_ext[-1]) and combine at block end: total mulmod count T + n_acc -
    1 with n_acc - 1 extra ones cancels exactly (R^(1-T) overall, same as
    serial), so results are value-identical.  Round-4 verdict: NO GAIN —
    the chains RMW rows of one scratch ref, which serializes.

    tree=E>1 instead retires E entries per body as pure VALUES: E diffs,
    a balanced (E-1)-mul product tree, ONE acc multiply — the same
    all-value ILP shape as the xadd body (where the VPU delivers ~1.1
    us/mul vs the serial chain's 2.4).  E muls per E entries, so the
    Montgomery R-power per entry is unchanged and results are value-
    identical mod n (association only; REDC is mod-n associative).
    Tail entries (count % E) run one-by-one.  Requires tree <= n_buffers
    (each body entry holds a distinct ring slot).
    """
    p = ctx.p
    nw = p.nw
    pb_nw = packed_words(p) if packed else nw
    unpack_pb = _make_unpack(p) if packed else (lambda x: x)
    bs = _local_batch(batch, sharder) // LANE
    NB = n_buffers
    NA = max(1, n_acc)
    TREE = max(0, tree)
    assert t_block >= NB
    assert TREE <= NB, "tree body needs a distinct ring slot per entry"
    assert not (TREE > 1 and NA > 1), "tree and n_acc are exclusive"
    assert pa_rows <= (1 << 16) and pb_rows <= (1 << 16)

    def kernel(idx_ref, pa_hbm, pb_hbm, acc_in, acc_out,
               pa_buf, pb_buf, acc_scr, pa_sem, pb_sems):
        mulmod, _, norm1 = _make_arith(ctx)
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
            # extra chains start at the Montgomery one (pa_ext[-1] row)
            cpo = pltpu.make_async_copy(pa_hbm.at[pa_rows - 1],
                                        acc_scr.at[j], pa_sem)
            cpo.start()
            cpo.wait()
        cp = pa_copy(0)
        cp.start()
        cp.wait()
        for k in range(NB):                      # static warm-up
            pb_copy(k, k).start()

        def load_diff(k):
            slot = jax.lax.rem(k, NB)

            # rare: the giant-step row changed — synchronous re-fetch
            # (~1 per 100+ entries under the v-sort; the stall is noise)
            @pl.when(jnp.logical_and(
                k > 0, jnp.right_shift(idx_ref[1 + k], 16)
                != jnp.right_shift(idx_ref[jnp.maximum(k, 1)], 16)))
            def _():
                cpa = pa_copy(k)
                cpa.start()
                cpa.wait()

            pb_copy(k, slot).wait()
            d = norm1(pa_buf[...] - unpack_pb(pb_buf[slot]))

            @pl.when(k + NB < count)
            def _():
                pb_copy(k + NB, slot).start()

            return d

        def entry(k, j=0):
            d = load_diff(k)
            acc_scr[j] = mulmod(acc_scr[j], d, pre=True)

        def body(k, _):
            entry(k)
            return 0

        if TREE > 1:
            # E-entry value-tree body (see docstring)
            def body_t(t, _):
                base = t * TREE
                diffs = [load_diff(base + s) for s in range(TREE)]
                while len(diffs) > 1:
                    diffs = ([mulmod(diffs[j2], diffs[j2 + 1], pre=True)
                              for j2 in range(0, len(diffs) - 1, 2)]
                             + ([diffs[-1]] if len(diffs) % 2 else []))
                acc_scr[0] = mulmod(acc_scr[0], diffs[0], pre=True)
                return 0

            main = count // TREE
            jax.lax.fori_loop(0, main, body_t, 0, unroll=False)
            jax.lax.fori_loop(main * TREE, count, body, 0, unroll=False)
        elif NA > 1:
            # NA independent chains per body (see docstring): per-entry
            # cost drops from the body critical path (norm1 -> dependent
            # mulmod latency) toward VPU throughput; tail entries run
            # one-by-one into chain 0
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
            # body-level unroll: U entries per while iteration amortizes the
            # scalar loop overhead (DMA descriptor issue, SMEM index math)
            # while keeping the trip count dynamic; the tail runs one-by-one
            # so short final blocks still cost exactly `count` mulmods.
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
            res = mulmod(res, acc_scr[j], pre=True)
        acc_out[...] = res

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # pa_ext stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),       # pbx stays in HBM
            pl.BlockSpec((nw, bs, LANE), lambda i, idx: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nw, bs, LANE), lambda i, idx: (0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((nw, bs, LANE), jnp.int32),
                        pltpu.VMEM((NB, pb_nw, bs, LANE), jnp.int32),
                        pltpu.VMEM((NA, nw, bs, LANE), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((NB,))],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nw, bs, LANE), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def body(acc, pa_ext, pbx, idx):
        bl = acc.shape[-1]
        acc4 = acc.reshape(nw, bl // LANE, LANE)
        pa4 = pa_ext.reshape(pa_rows, nw, bl // LANE, LANE)
        pb4 = pbx.reshape(pb_rows, pb_nw, bl // LANE, LANE)
        out = call(idx, pa4, pb4, acc4)
        return out.reshape(nw, bl)

    ax = sharder.axis_name if sharder is not None else None
    return _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, ax), P(None, None, ax), P(None, None, ax),
                  P(None)),
        out_specs=P(None, ax))


def make_replay_resident_executor(ctx: MontyCtx, batch: int, pa_rows: int,
                                  slab_rows: int, t_block: int = 2048,
                                  entries_per_step: int = 8,
                                  interpret: bool = False, sharder=None):
    """Replay variant with the Pb table slab VMEM-RESIDENT.

    The gather executor (make_replay_executor) DMAs one full Pb row
    (nw*B*4 bytes) from HBM per entry — at the flagship geometry that is
    ~295 KB/entry, about a third of the measured 2.13 us/entry.  Entries
    are already sorted by Pa row, so consecutive Pa fetches dedup in the
    pipeline; the Pb fetches cannot (each prime hits a different residue
    row).  Here the Pb rows arrive as a slab in ANY memory space and are
    copied ONCE per call into a VMEM scratch (manual DMA => single
    buffer, no double-buffering blowup); per entry the row is a dynamic
    VMEM index, so steady-state HBM traffic is just the Pa gathers —
    which dedup to ~nothing under the v-sort.  The host partitions
    entries into row slabs sized to the VMEM budget (stage2/exec.py).

    run(acc [NW,B], pa_ext [pa_rows,NW,B], slab [slab_rows,NW,B],
        idx [t_block,2] int32 (pa row, LOCAL slab row)) -> acc.
    Pad entries with (pa_rows-1, 0): pa_ext[-1] is the Montgomery one and
    slab row 0 is held zero by the slab builder.
    """
    p = ctx.p
    nw = p.nw
    assert t_block % entries_per_step == 0
    bs = _local_batch(batch, sharder) // LANE
    E = entries_per_step
    nsteps = t_block // E

    def kernel(idx_ref, *refs):
        pa_rows_in = refs[:E]
        slab_any, acc_in, acc_out = refs[E], refs[E + 1], refs[E + 2]
        slab_vmem, acc_scr, sem = refs[-3], refs[-2], refs[-1]
        mulmod, _, norm1 = _make_arith(ctx)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(slab_any, slab_vmem, sem)
            cp.start()
            cp.wait()
            acc_scr[...] = acc_in[...]

        # one lazy pass per Pa-Pb difference; tree/acc products run on
        # pre-safe operands (see make_replay_executor)
        diffs = []
        for k in range(E):
            u = idx_ref[2 * (E * i + k) + 1]
            diffs.append(norm1(pa_rows_in[k][0] - slab_vmem[u]))
        while len(diffs) > 1:
            diffs = ([mulmod(diffs[j], diffs[j + 1], pre=True)
                      for j in range(0, len(diffs) - 1, 2)]
                     + ([diffs[-1]] if len(diffs) % 2 else []))
        acc_scr[...] = mulmod(acc_scr[...], diffs[0], pre=True)

        @pl.when(i == nsteps - 1)
        def _():
            acc_out[...] = acc_scr[...]

    gather_specs = [
        pl.BlockSpec((1, nw, bs, LANE),
                     lambda i, idx, k=k: (idx[2 * (E * i + k)], 0, 0, 0))
        for k in range(E)
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=gather_specs + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((nw, bs, LANE), lambda i, idx: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nw, bs, LANE), lambda i, idx: (0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((slab_rows, nw, bs, LANE), jnp.int32),
                        pltpu.VMEM((nw, bs, LANE), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nw, bs, LANE), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )

    def body(acc, pa_ext, slab, idx):
        bl = acc.shape[-1]
        acc4 = acc.reshape(nw, bl // LANE, LANE)
        pa4 = pa_ext.reshape(pa_rows, nw, bl // LANE, LANE)
        slab4 = slab.reshape(slab_rows, nw, bl // LANE, LANE)
        out = call(idx.reshape(2 * t_block), *([pa4] * E), slab4, acc4)
        return out.reshape(nw, bl)

    ax = sharder.axis_name if sharder is not None else None
    return _jit_maybe_sharded(
        body, sharder,
        in_specs=(P(None, ax), P(None, None, ax), P(None, None, ax),
                  P(None, None)),
        out_specs=P(None, ax))


def make_tape_executor(ctx: MontyCtx, batch: int, chunk: int = 8192,
                       interpret: bool = False, sharder=None):
    """Returns run(pts [S,2,NW,B], tape [T,5], s_const [NW,B]) -> pts.

    The tape is padded to a multiple of `chunk` with NOP entries and executed
    as an outer Python loop over per-chunk pallas_calls; curve state round-
    trips HBM only at chunk boundaries.  With a Sharder, the per-chunk call
    is shard_mapped over the ('curves',) mesh: each device runs the SAME
    kernel on its local batch/n lanes with the tape replicated — the
    multi-chip analog of all pthreads running the hot loop
    (/root/reference/threadpool.c:202-397)."""
    p = ctx.p
    nw = p.nw
    loc = _local_batch(batch, sharder)
    bs = loc // LANE

    kern = functools.partial(_tape_kernel, ctx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # s_const
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_SLOTS, 2, nw, bs, LANE),
                                       jnp.int32),
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chunk_body(t, pts, s):
        """One tape chunk on the (local) [S, 2, NW, Bl] register file."""
        bl = pts.shape[-1]
        out = call(t, pts.reshape(NUM_SLOTS, 2, nw, bl // LANE, LANE),
                   s.reshape(nw, bl // LANE, LANE))
        return out.reshape(NUM_SLOTS, 2, nw, bl)

    # the chunk loop runs in PYTHON, not lax.scan: the compiled unit is then
    # the fixed-shape per-chunk kernel, reused for EVERY tape length — a
    # lax.scan wrapper re-keys the whole program (and re-runs the expensive
    # Mosaic compile) whenever the tape length changes.  Chunk dispatches
    # enqueue asynchronously; state stays device-resident via the alias.
    ax = sharder.axis_name if sharder is not None else None
    chunk_call = _jit_maybe_sharded(
        chunk_body, sharder,
        in_specs=(P(None), P(None, None, None, ax), P(None, ax)),
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
            pts4 = chunk_call(jnp.asarray(flat[lo:lo + 5 * chunk]), pts4, s4)
        return pts4

    return run


# ---------------------------------------------------------------------------
# Edwards a=-1 stage-1 executor (curve/edops.py's Pallas twin)
# ---------------------------------------------------------------------------

ED_NOP = 4          # matches curve.edwards.ED_NOP


def _ed_tape_kernel(ctx: MontyCtx, tape_ref, acc_in, table_in, acc_out):
    """wNAF tape replay on the extended-coordinate accumulator
    [4, NW, Bs, 128] with the cached window table [Tp, 3, NW, Bs, 128]
    resident in VMEM.  Formulas mirror curve/edops.py exactly (3M+4S
    doubling, 7M cached mixed add, free negation) so the engines stay
    bit-identical."""
    mulmod, sqrmod, norm1 = _make_arith(ctx)

    acc_out[...] = acc_in[...]
    nsteps = tape_ref.shape[0] // 2

    def edbl(want_t):
        X, Y, Z, T = acc_out[0], acc_out[1], acc_out[2], acc_out[3]
        A = sqrmod(X, pre=True)
        B = sqrmod(Y, pre=True)
        C1 = sqrmod(Z, pre=True)
        C = norm1(C1 + C1)
        E0 = sqrmod(norm1(X + Y), pre=True)
        E = norm1(norm1(E0 - A) - B)
        G = norm1(B - A)
        F = norm1(G - C)
        H = -norm1(A + B)
        T3 = mulmod(E, H, pre=True) if want_t else T
        return jnp.stack([mulmod(E, F, pre=True), mulmod(G, H, pre=True),
                          mulmod(F, G, pre=True), T3])

    def eadd(tab, negate):
        X, Y, Z, T = acc_out[0], acc_out[1], acc_out[2], acc_out[3]
        s1, d1 = norm1(Y + X), norm1(Y - X)
        ka, kb = (tab[1], tab[0]) if negate else (tab[0], tab[1])
        A = mulmod(d1, ka, pre=True)
        B = mulmod(s1, kb, pre=True)
        C = mulmod(T, tab[2], pre=True)
        if negate:
            C = -C
        D = norm1(Z + Z)
        H, E = norm1(B + A), norm1(B - A)
        G, F = norm1(D + C), norm1(D - C)
        return jnp.stack([mulmod(E, F, pre=True), mulmod(G, H, pre=True),
                          mulmod(F, G, pre=True), T])

    # window-table row load: moved INSIDE the add branches so doubling
    # steps (the majority) never pay it.  TPU_ECM_ED_GATHER=switch swaps
    # the dynamic index for a lax.switch over static rows — measured
    # SLOWER in isolation (tools/hw_mulmod_floor.py round 4: switchslot
    # 2.98 vs dynslot 2.44 us; dynamic first-axis VMEM reads lower
    # efficiently on Mosaic), so "dyn" is the default.
    import os
    gather_mode = os.environ.get("TPU_ECM_ED_GATHER", "dyn")
    tp = table_in.shape[0]

    def load_tab(arg):
        if gather_mode == "switch":
            return jax.lax.switch(
                arg, [lambda i=i: table_in[i] for i in range(tp)])
        return table_in[arg]

    def step(k, _):
        op = tape_ref[2 * k]
        arg = tape_ref[2 * k + 1]

        new = jax.lax.switch(op, [
            lambda _: edbl(False),
            lambda _: edbl(True),
            lambda _: eadd(load_tab(arg), False),
            lambda _: eadd(load_tab(arg), True),
            lambda _: jnp.stack([acc_out[0], acc_out[1], acc_out[2],
                                 acc_out[3]]),
        ], None)
        acc_out[...] = new
        return 0

    jax.lax.fori_loop(0, nsteps, step, 0)


def make_edwards_executor(ctx: MontyCtx, batch: int, table_pts: int,
                          chunk: int = 8192, interpret: bool = False,
                          sharder=None):
    """Returns run(acc [4,NW,B], tape [T,2], table [Tp,3,NW,B]) -> acc.

    Same chunking contract as make_tape_executor: NOP-padded fixed-size
    chunks driven from Python, accumulator aliased in/out so curve state
    stays in VMEM/HBM, table replicated per device under a Sharder."""
    p = ctx.p
    nw = p.nw
    loc = _local_batch(batch, sharder)
    bs = loc // LANE

    kern = functools.partial(_ed_tape_kernel, ctx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # acc
            pl.BlockSpec(memory_space=pltpu.VMEM),   # table
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, nw, bs, LANE), jnp.int32),
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chunk_body(t, acc, table):
        bl = acc.shape[-1]
        out = call(t, acc.reshape(4, nw, bl // LANE, LANE),
                   table.reshape(table_pts, 3, nw, bl // LANE, LANE))
        return out.reshape(4, nw, bl)

    ax = sharder.axis_name if sharder is not None else None
    chunk_call = _jit_maybe_sharded(
        chunk_body, sharder,
        in_specs=(P(None), P(None, None, ax), P(None, None, None, ax)),
        out_specs=P(None, None, ax), donate=(1,))

    def run(acc, tape, table):
        acc4 = jnp.asarray(acc)
        tab4 = jnp.asarray(table)
        tape_np = np.asarray(tape)
        t = tape_np.shape[0]
        npad = (-t) % chunk
        if npad:
            nop = np.tile(np.asarray([[ED_NOP, 0]], np.int32), (npad, 1))
            tape_np = np.concatenate([tape_np, nop], axis=0)
        flat = tape_np.reshape(-1)
        for lo in range(0, flat.shape[0], 2 * chunk):
            acc4 = chunk_call(jnp.asarray(flat[lo:lo + 2 * chunk]), acc4,
                              tab4)
        return acc4

    return run
