"""Hardware probe: the RNS stream replay kernel at a SMALL-K geometry
(VERDICT r4 item 5).

Round 4 left small-K forced-RNS runs on the gather kernel because the
direct int32-dot mont_mul did not compile inside the stream kernel
(Mosaic "Bad lhs/rhs type" at K=24).  Round 5 makes the kernel always
use the 7-bit split-table base extensions (value-identical).  This probe
compiles and runs the stream kernel on REAL hardware at a small-K
geometry and checks values against the jnp replay_segment reference —
the gate for flipping the small-K default to stream (interpret-mode
parity cannot catch Mosaic compile or DMA faults; BENCH_NOTES round 4).

    python -u tools/hw_rns_smallk.py [nbits=256]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

cache = os.path.expanduser("~/.cache/tpu_ecm")
try:
    jax.config.update("jax_compilation_cache_dir",
                      f"{cache}/jax-{jax.default_backend()}")
except Exception:
    pass

from tpu_ecm import params  # noqa: E402
from tpu_ecm.limbs import rns, rns_exec  # noqa: E402


def main():
    nbits = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = random.Random(11)
    while True:
        n = rng.getrandbits(nbits) | (1 << (nbits - 1)) | 1
        if n % 3:
            break
    ctx = params.make_monty(n)
    h = rns.make_rns(ctx)
    print(f"nbits={nbits} K={h.dev.K} rows={h.dev.rows} "
          f"use_split={h.dev.use_split}", flush=True)

    b = 128
    PA, PB, T = 9, 7, 4096
    nn = ctx.n_int

    def mk(rows):
        return np.stack([h.pack([h.to_mont_int(rng.randrange(nn))
                                 for _ in range(b)]) for _ in range(rows)])

    pa, pb = mk(PA), mk(PB)
    pa[-1] = h.pack([h.to_mont_int(1)] * b)
    pb[0] = 0
    acc0 = h.pack([h.to_mont_int(rng.randrange(nn)) for _ in range(b)])
    pav = np.sort(np.array([rng.randrange(PA - 1) for _ in range(T)]))
    pbv = np.array([rng.randrange(1, PB) for _ in range(T)])
    idx = np.stack([pav, pbv], 1).astype(np.int32)

    # jnp reference (power-of-two count for the balanced tree)
    ref = rns_exec.replay_segment(jnp.asarray(acc0), jnp.asarray(pa),
                                  jnp.asarray(pb), jnp.asarray(idx), h.dev)
    want = [v % nn for v in h.unpack(np.asarray(ref))]

    run = rns_exec.make_rns_replay_stream_executor(
        h, b, PA, PB, t_block=T, n_buffers=8, interpret=False)
    packed = ((idx[:, 0] << 16) | idx[:, 1]).astype(np.int32)
    flat = np.concatenate([[np.int32(T)], packed])
    t0 = time.time()
    out = run(jnp.asarray(acc0), jnp.asarray(pa), jnp.asarray(pb),
              jnp.asarray(flat))
    got = [v % nn for v in h.unpack(np.asarray(out))]
    dt = time.time() - t0
    assert got == want, "VALUE MISMATCH"
    print(f"HW PARITY OK: {T} entries in {dt:.2f}s (incl. compile)",
          flush=True)
    t0 = time.time()
    out = run(jnp.asarray(acc0), jnp.asarray(pa), jnp.asarray(pb),
              jnp.asarray(flat))
    _ = np.asarray(out)
    print(f"steady: {(time.time() - t0) / T * 1e6:.2f} us/entry at B={b}",
          flush=True)


if __name__ == "__main__":
    main()
