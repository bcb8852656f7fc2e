"""Stage 1: power the curve batch by all prime powers <= B1.

The vececm phase-1 equivalent (/root/reference/ecm.c:1806-1854): the host
plans one ADD/DUP tape per prime chunk (leading 2^k doublings + PRAC chains
with the prime-power repeat rule) and the device replays it in a single
lax.scan over the [S, 2, NW, B] register file.  Prime chunking follows the
reference's PRIME_RANGE protocol so checkpoints land at the same prime
boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .curve import ops, prac
from .limbs import jnp_ops, layout
from .limbs.jnp_ops import DeviceCtx
from .params import MontyCtx
from .primes import PrimeStream


@dataclasses.dataclass
class Stage1State:
    """Device state for a batch of curves: point register file + curve const."""
    pts: jax.Array       # [S, 2, NW, B]
    s_const: jax.Array   # [NW, B]  (A+2)/4 in Montgomery form


def init_state(ctx: MontyCtx, xs: List[int], zs: List[int], ss: List[int],
               sharder=None) -> Stage1State:
    p = ctx.p
    b = len(xs)
    pts = np.zeros((ops.NUM_SLOTS, 2, p.nw, b), dtype=np.int32)
    pts[0, 0] = layout.pack_batch(xs, p.w, p.nw)
    pts[0, 1] = layout.pack_batch(zs, p.w, p.nw)
    s_const = layout.pack_batch(ss, p.w, p.nw)
    if sharder is not None:
        return Stage1State(pts=sharder.device_put_state(pts),
                           s_const=sharder.device_put_plane(s_const))
    return Stage1State(pts=jnp.asarray(pts), s_const=jnp.asarray(s_const))


@dataclasses.dataclass
class Stage1Chunk:
    lo: int
    hi: int
    last_prime: int      # largest prime consumed (for checkpoint labels)
    is_final: bool
    ptadds: int = 0      # ADD steps executed (ecm_work counters,
    ptdups: int = 0      # /root/reference/avx_ecm.h:248-252, ecm.c:1849-1850)
    numprimes: int = 0


def run_stage1(state: Stage1State, dctx: DeviceCtx, b1: int,
               stream: PrimeStream, *, cache_dir: Optional[str] = None,
               run_tape=None, full_prac: Optional[bool] = None,
               progress: bool = False) -> Iterator[Tuple[Stage1Chunk, Stage1State]]:
    """Yield (chunk, state) after each prime chunk — the caller checkpoints
    between chunks exactly like the reference driver
    (/root/reference/ecm.c:1209-1313)."""
    if run_tape is None:
        run_tape = jax.jit(ops.run_tape)
    first = True
    for lo, hi, primes in stream.chunks(0, b1):
        sel = primes[primes < b1]
        if cache_dir:
            tape = prac.cached_stage1_tape(sel, b1, cache_dir,
                                           f"{lo}_{hi}", include_two=first,
                                           full=full_prac)
        else:
            tape = prac.stage1_tape(sel, b1, include_two=first,
                                    full=full_prac)
        first = False
        if tape.shape[0]:
            # tape stays a host numpy array: the pallas executor slices and
            # uploads it per fixed-size chunk (jit converts it for the jnp
            # fallback)
            pts = run_tape(state.pts, tape, state.s_const, dctx)
            state = Stage1State(pts=pts, s_const=state.s_const)
        last_prime = int(sel[-1]) if sel.size else 2
        ops_col = tape[:, 0] if tape.shape[0] else np.zeros(0, np.int32)
        yield Stage1Chunk(lo=lo, hi=hi, last_prime=last_prime,
                          is_final=hi >= b1,
                          ptadds=int(np.count_nonzero(ops_col == ops.OP_ADD)),
                          ptdups=int(np.count_nonzero(ops_col == ops.OP_DUP)),
                          numprimes=int(sel.size)), state


def extract_point(state: Stage1State, ctx: MontyCtx,
                  slot: int = 0) -> Tuple[List[int], List[int]]:
    """Pull (X, Z) canonical integers (mod n, out of Montgomery form) for
    every curve — the savefile normalization step
    (/root/reference/ecm.c:1327-1331)."""
    pts = np.asarray(state.pts[slot])
    xm = layout.unpack_batch(pts[0], ctx.p.w)
    zm = layout.unpack_batch(pts[1], ctx.p.w)
    xs = [ctx.from_mont_int(v % ctx.n_int) for v in xm]
    zs = [ctx.from_mont_int(v % ctx.n_int) for v in zm]
    return xs, zs
