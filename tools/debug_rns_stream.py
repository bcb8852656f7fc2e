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
import random
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_ecm import params  # noqa: E402
from tpu_ecm.limbs import rns, rns_exec  # noqa: E402

N256 = (0xC96C5F88B1E3C4D8E7A9B2F1D0C3B4A5968778695A4B3C2D1E0F1A2B3C4D5E7
        | 1)


def main():
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ctx = params.make_monty(N256)
    h = rns.make_rns(ctx)
    print(f"nbits={N256.bit_length()} K={h.K} rows={h.dev.rows} "
          f"(odd rows = {h.dev.rows % 8})", flush=True)
    rng = random.Random(7)
    n = ctx.n_int
    b = 128
    PA, PB, T = 9, 7, 64

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
