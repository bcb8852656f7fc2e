"""Bisect the RNS stream-replay hardware kernel fault (BENCH_NOTES round
4: first real-hardware run of rns_exec.make_rns_replay_stream_executor
crashed the TPU worker on the 2355-bit row; interpret-mode parity passes).

Hypothesis under test: the kernel's manual make_async_copy moves
[rows, loc] slabs whose leading (sublane-tiled) dim is ODD (rows = 2K+1,
e.g. 481 at 2355 bits, 45 at 256 bits) — unlike the digit twin's
[nw, bs, LANE] slabs whose tiled minor dims are aligned.  If so, ANY
hardware run faults, so a tiny config reproduces in ~1 min.

Usage (idle chip — a crash wedges concurrent clients):
    python tools/debug_rns_stream.py tiny      # N256, tiny idx stream
    python tools/debug_rns_stream.py tiny 1    # same with NB=1
Each variant prints OK + the unpacked check value, or dies with the
worker-crash error.  Compare against the jnp replay_segment reference.
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_ecm import params  # noqa: E402
from tpu_ecm.limbs import rns, rns_exec  # noqa: E402

N256 = (0xC96C5F88B1E3C4D8E7A9B2F1D0C3B4A5968778695A4B3C2D1E0F1A2B3C4D5E7
        | 1)


def dma_probe(rows: int, loc: int = 128, src_rows: int = 7):
    """Minimal kernel: ONE manual make_async_copy of a [rows, loc] slab
    from a dynamically indexed HBM array, no arithmetic.  Crash => the
    non-sublane-aligned (odd-rows) manual DMA is the fault; pass => the
    fault is in the mont_mul/DMA interaction."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, src_hbm, out, buf, sem):
        cp = pltpu.make_async_copy(src_hbm.at[idx_ref[0]], buf, sem)
        cp.start()
        cp.wait()
        out[...] = buf[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows, loc), lambda i, idx: (0, 0)),
        scratch_shapes=[pltpu.VMEM((rows, loc), jnp.int32),
                        pltpu.SemaphoreType.DMA(())])
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, loc), jnp.int32))
    src = np.arange(src_rows * rows * loc, dtype=np.int32).reshape(
        src_rows, rows, loc)
    got = np.asarray(call(jnp.asarray([3], jnp.int32), jnp.asarray(src)))
    ok = bool((got == src[3]).all())
    print(f"dma_probe rows={rows}: match={ok}", flush=True)
    return ok


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    if mode == "dma":
        # 481 = the 2355-bit RNS row count (odd); 480 = aligned control
        dma_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 481)
        return
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if mode == "big":
        # ~2355-bit odd modulus: K=240 -> the bf16 MXU split path of
        # mont_mul (the row-21 geometry that compiled but crashed the
        # worker at runtime); "tiny" (N256, K=24) exercises the int32-dot
        # small-K path, which fails to COMPILE in this kernel (distinct
        # bug, found 2026-08-20: Mosaic "Bad lhs/rhs type
        # vector<32x128xi32> vector<128x128xi32>")
        n_in = (1 << 2354) | (int("9" * 700) & ((1 << 2300) - 1)) | 1
        ctx = params.make_monty(n_in)
    else:
        ctx = params.make_monty(N256)
    h = rns.make_rns(ctx)
    print(f"nbits={ctx.n_int.bit_length()} K={h.K} rows={h.dev.rows} "
          f"(rows mod 8 = {h.dev.rows % 8})", flush=True)
    rng = random.Random(7)
    n = ctx.n_int
    b = 128
    # count = T - 2 must be a power of two (the jnp replay_segment
    # reference builds a balanced product tree)
    PA, PB, T = 9, 7, 18

    def mk(rows):
        return np.stack([h.pack([h.to_mont_int(rng.randrange(n))
                                 for _ in range(b)]) for _ in range(rows)])

    pa, pb = mk(PA), mk(PB)
    pa[-1] = h.pack([h.to_mont_int(1)] * b)
    pb[0] = 0
    acc0 = h.pack([h.to_mont_int(rng.randrange(n)) for _ in range(b)])
    count = T - 2
    pav = np.sort(np.array([rng.randrange(PA - 1) for _ in range(count)]))
    idx = np.stack([np.concatenate([pav, [PA - 1, PA - 1]]),
                    np.array([rng.randrange(1, PB) for _ in range(count)]
                             + [0, 0])], 1).astype(np.int32)
    ref = rns_exec.replay_segment(jnp.asarray(acc0), jnp.asarray(pa),
                                  jnp.asarray(pb),
                                  jnp.asarray(idx[:count]), h.dev)
    want = [v % n for v in h.unpack(np.asarray(ref))]
    packed = ((idx[:, 0] << 16) | idx[:, 1]).astype(np.int32)
    flat = np.concatenate([[np.int32(count)], packed])
    run = rns_exec.make_rns_replay_stream_executor(
        h, b, PA, PB, t_block=T, n_buffers=nb)
    print(f"running stream kernel on hardware: T={T} NB={nb} ...",
          flush=True)
    got = [v % n for v in h.unpack(np.asarray(
        run(jnp.asarray(acc0), jnp.asarray(pa), jnp.asarray(pb),
            jnp.asarray(flat))))]
    print("match:", got == want, flush=True)


if __name__ == "__main__":
    main()
