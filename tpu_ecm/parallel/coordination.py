"""Cross-host stop-on-factor coordination.

The reference stops its curve loop once any lane/thread finds a factor
(/root/reference/ecm.c:1529-1535).  A multi-host run needs the same
property across processes: when one host hits, the others must not burn
their remaining curve budget.  Curves are fully independent, so the ONLY
cross-host traffic is a single "anyone hit?" bit exchanged at curve-batch
boundaries (the phase granularity the reference uses).

Two interchangeable mechanisms behind one `HitFlag.poll()` interface:

* CollectiveFlag — all-gather of the per-host hit bit over the global
  process set (jax.experimental.multihost_utils, riding DCN).  Collective:
  every host MUST call poll() the same number of times.  Equal curve
  budgets do NOT guarantee equal batch counts (batch size follows the
  LOCAL device count and engine sweet spot), so the driver negotiates a
  poll budget up front — plan(n_batches) all-gathers the max across hosts
  and drain() pads each host's shortfall (early stop-on-factor exits,
  fewer local batches) with extra polls so the all-gather counts always
  match.
* FileFlag — a flag file on a shared filesystem, for launcher-style
  deployments of independent processes (no jax.distributed).  Non-
  collective: any host may poll at any time.
* LocalFlag — the degenerate single-process case (pure local bit).
"""

from __future__ import annotations

import os


class HitFlag:
    """poll(found_local) -> bool: publish this host's hit bit and return
    whether ANY host (including this one) has hit.  Called once per curve-
    batch boundary by the driver, bracketed by plan(n_batches) before the
    loop and drain() after it (no-ops except for collective flags)."""

    def poll(self, found_local: bool) -> bool:
        raise NotImplementedError

    def plan(self, n_batches: int) -> None:
        pass

    def drain(self) -> None:
        pass


class LocalFlag(HitFlag):
    def __init__(self):
        self.hit = False

    def poll(self, found_local: bool) -> bool:
        self.hit = self.hit or bool(found_local)
        return self.hit


class FileFlag(HitFlag):
    """Shared-filesystem flag: `poll` writes the flag file when this host
    has hit and reports whether any host created it."""

    def __init__(self, path: str):
        self.path = path

    def poll(self, found_local: bool) -> bool:
        if found_local and not os.path.exists(self.path):
            tmp = f"{self.path}.{os.getpid()}.tmp"
            try:
                with open(tmp, "w") as f:
                    f.write("hit\n")
                os.replace(tmp, self.path)       # atomic on POSIX
            except OSError:
                pass
        return os.path.exists(self.path)

    def clear(self):
        try:
            os.remove(self.path)
        except FileNotFoundError:
            pass


class CollectiveFlag(HitFlag):
    """jax.distributed collective: one int32 all-gather per poll.  Sticky —
    once any host reports a hit, every poll returns True.  The driver
    negotiates a common poll budget via plan() and pads its shortfall via
    drain(), so the all-gather counts match across hosts even when their
    batch counts differ (unequal local device counts, early exits)."""

    def __init__(self):
        self._hit = False
        self._polls = 0
        self._budget = None

    def plan(self, n_batches: int) -> None:
        import jax

        if jax.process_count() == 1:
            self._budget = int(n_batches)
            return
        import numpy as np
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.asarray([int(n_batches)], dtype=np.int32))
        self._budget = int(counts.max())

    def poll(self, found_local: bool) -> bool:
        self._hit = self._hit or bool(found_local)
        self._polls += 1
        import jax

        if jax.process_count() == 1:
            return self._hit
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([1 if self._hit else 0], dtype=np.int32))
        self._hit = bool(int(flags.max()) > 0)
        return self._hit

    def drain(self) -> None:
        while self._budget is not None and self._polls < self._budget:
            self.poll(self._hit)
