"""Device-mesh sharding of the curve batch.

The reference's two parallelism axes — 8 SIMD lanes per vector and one curve
sub-batch per pthread (SURVEY.md section 2.4) — collapse on TPU into ONE
sharded tensor axis: the trailing batch dimension B of every [.., NW, B]
plane is laid out over a 1-D ('curves',) jax mesh.  Every arithmetic and
curve op is batch-pointwise, so stage 1 and stage 2 run with ZERO cross-
device communication; jit propagates the sharding through the scans.  The
only cross-shard interactions are host-side: the single modular inverse per
stage-2 window (host gathers one [NW, B] plane) and gcd/factor checks at
phase boundaries — the same lane<->scalar crossings as the reference
(/root/reference/main.c:63-138), at the same frequency.

Multi-host: the same program runs under jax.distributed with a global mesh;
each host feeds its local shard of sigmas.  Determinism: fixed sigma =>
bit-exact residues for any mesh shape, since sharding never changes the
arithmetic (tested in tests/test_sharding.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class Sharder:
    """Places [.., B]-trailing-axis arrays over a ('curves',) mesh."""

    def __init__(self, devices: Optional[Sequence] = None,
                 axis_name: str = "curves"):
        devs = list(devices) if devices is not None else jax.devices()
        self.axis_name = axis_name
        self.mesh = Mesh(np.array(devs), (axis_name,))
        self.n = len(devs)

    def spec_for_rank(self, ndim: int) -> NamedSharding:
        spec = [None] * (ndim - 1) + [self.axis_name]
        return NamedSharding(self.mesh, P(*spec))

    def device_put(self, x) -> jax.Array:
        """Shard any array whose LAST axis is the curve batch."""
        x = np.asarray(x)
        assert x.shape[-1] % self.n == 0, (
            f"batch {x.shape[-1]} not divisible by {self.n} devices")
        return jax.device_put(x, self.spec_for_rank(x.ndim))

    # driver hooks (stage1.init_state)
    def device_put_state(self, pts) -> jax.Array:
        return self.device_put(pts)

    def device_put_plane(self, plane) -> jax.Array:
        return self.device_put(plane)

    def round_batch(self, b: int) -> int:
        """Round a requested batch up to a multiple of the mesh size (the
        reference rounds curves up to threads*VECLEN,
        /root/reference/main.c:585-589)."""
        return ((b + self.n - 1) // self.n) * self.n
