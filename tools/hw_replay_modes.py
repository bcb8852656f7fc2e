"""Measure the stage-2 replay kernel modes back-to-back on real TPU:

  gather   — one Pa + one Pb row DMA'd from HBM per entry (round-1 kernel)
  resident — Pb row slabs VMEM-resident, entries partitioned by slab
             (pallas_ops.make_replay_resident_executor)
  parow    — ONE shared Pa row + E Pb rows per grid step (round-3 kernel,
             pallas_ops.make_replay_parow_executor): exploits the v-sort so
             the per-entry Pa traffic and half the DMA descriptors vanish

Runs the full flagship stage-2 (416-bit, B=2048, B1=1e6, B2=1e8) per mode:
warm pass to compile, then best-of-N steady passes.  Also asserts all
modes produce IDENTICAL canonical accumulators (hardware bit-exactness).

Outcome decides the default in stage2/exec.py::Stage2Runner._replay_mode
(record in BENCH_NOTES.md; tune TPU_ECM_REPLAY_SLAB_MB here if VMEM
compile fails at the default 80 MB budget).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.expanduser("~/.cache/tpu_ecm")
try:
    jax.config.update("jax_compilation_cache_dir",
                      f"{cache}/jax-{jax.default_backend()}")
except Exception:
    pass

from tpu_ecm import params
from tpu_ecm.curve import suyama
from tpu_ecm.limbs import jnp_ops, layout
from tpu_ecm.primes.sieve import PrimeStream
from tpu_ecm.stage2 import exec as s2exec, plan as s2plan

B1 = int(os.environ.get("RM_B1", "1000000"))
B2 = int(os.environ.get("RM_B2", str(100 * B1)))
BATCH = int(os.environ.get("RM_BATCH", "2048"))
REPS = int(os.environ.get("RM_REPS", "2"))

n = (205688069665150755269371147819668813122841983204197482918578443
     * 411376139330301510538742295639337626245683966408394965837157771)
ctx = params.make_monty(n)
p = ctx.p
dctx = jnp_ops.device_ctx(ctx)
curves = [suyama.build_one_curve(ctx, 7000 + i) for i in range(BATCH)]
pts0 = jnp.asarray(np.stack([
    layout.pack_batch([c.x_mont for c in curves], p.w, p.nw),
    layout.pack_batch([c.z_mont for c in curves], p.w, p.nw)]))
s_const = jnp.asarray(layout.pack_batch([c.s_mont for c in curves],
                                        p.w, p.nw))
sp = s2plan.make_stage2_params(B1, B2)
stream = PrimeStream()
chunks = [(lo, min(hi, B2), s2plan.pair(sp, prs, lo, min(hi, B2)))
          for lo, hi, prs in stream.chunks(B1, B2)]
entries = sum(int(np.sum(~((mv == 0) & (mu == 0))))
              for _, _, (mv, mu, _, _) in chunks)
print(f"# D={sp.D} U={sp.U} num_pb={sp.num_pb} entries={entries}",
      flush=True)


def stage2_pass(cache_dict):
    t0 = time.time()
    runner = s2exec.Stage2Runner(ctx, dctx, sp, pts0, s_const, B1,
                                 use_pallas=True,
                                 executor_cache=cache_dict)
    runner.init()
    if os.environ.get("RM_SPLIT"):       # init vs replay attribution
        np.asarray(runner.acc[0, :1])    # sync
        t_init = time.time() - t0
        print(f"#   init={t_init:.2f}s", flush=True)
    for lo, hi, (map_v, map_u, amin0, _s) in chunks:
        runner.run_chunk(map_v, map_u, amin0)
    res = runner.result()
    return time.time() - t0, res


results = {}
# (mode, entries_per_step, replay_block): block only matters for resident
# (it sets how many entries amortize one slab DMA); "" = runner default
SWEEP = (("gather", 16, ""), ("stream", 6, ""), ("stream", 4, ""),
         ("stream", 8, ""), ("stream", 12, ""))
if os.environ.get("RM_ALL"):
    SWEEP += (("gather", 8, ""), ("parow", 16, ""), ("parow", 32, ""),
              ("parow", 8, ""), ("parow", 64, ""), ("resident", 8, ""),
              ("resident", 8, "65536"), ("resident", 16, ""))
if os.environ.get("RM_SWEEP"):       # "mode:e[:blk[:ur[:na]]],..."
    SWEEP = tuple((m, int(e), rest[0] if rest else "",
                   rest[1] if len(rest) > 1 else "",
                   rest[2] if len(rest) > 2 else "")
                  for m, e, *rest in (c.split(":")
                                      for c in os.environ["RM_SWEEP"]
                                      .split(",")))
SWEEP = tuple(t + ("",) * (5 - len(t)) for t in SWEEP)
for mode, e, blk, ur, na in SWEEP:
    # pseudo-mode "streampk": the stream kernel with dense-packed Pb rows
    # (TPU_ECM_REPLAY_PACKED=1; pallas_ops.pack_replay_rows)
    if mode == "streampk":
        os.environ["TPU_ECM_REPLAY_PACKED"] = "1"
        mode = "stream"
    else:
        os.environ.pop("TPU_ECM_REPLAY_PACKED", None)
    os.environ["TPU_ECM_REPLAY"] = mode
    # for stream, e is the buffer depth (NB); otherwise entries/step
    os.environ["TPU_ECM_REPLAY_E" if mode != "stream"
               else "TPU_ECM_REPLAY_NB"] = str(e)
    if blk:
        os.environ["TPU_ECM_REPLAY_BLOCK"] = blk
    else:
        os.environ.pop("TPU_ECM_REPLAY_BLOCK", None)
    if ur:
        os.environ["TPU_ECM_REPLAY_UNROLL"] = ur
    else:
        os.environ.pop("TPU_ECM_REPLAY_UNROLL", None)
    if na:
        os.environ["TPU_ECM_REPLAY_NACC"] = na
    else:
        os.environ.pop("TPU_ECM_REPLAY_NACC", None)
    ec = {}
    pk = os.environ.get("TPU_ECM_REPLAY_PACKED")
    tag = f"{mode}{'(packed)' if pk else ''} " \
        f"{'NB' if mode == 'stream' else 'E'}={e}" \
        + (f" blk={blk}" if blk else "") + (f" ur={ur}" if ur else "") \
        + (f" na={na}" if na else "")
    try:
        warm, res = stage2_pass(ec)
    except Exception as exc:
        print(f"{tag}: FAILED {type(exc).__name__}: "
              f"{str(exc)[:300]}", flush=True)
        continue
    steady = min(stage2_pass(ec)[0] for _ in range(REPS))
    if (mode, e) in (("gather", 16), ("stream", 6)):
        results[mode] = (steady, res)
    print(f"{tag}: warm={warm:.1f}s steady={steady:.2f}s "
          f"({steady / entries * 1e6:.2f} us/entry incl. init/inv)",
          flush=True)

if len(results) == 2:
    same = results["gather"][1].acc == results["stream"][1].acc
    print(f"acc bit-exact across modes: {same}")
    g, r = results["gather"][0], results["stream"][0]
    print(f"stream vs gather stage-2 wall: {r:.2f}s vs {g:.2f}s "
          f"({(g - r) / g * 100:+.1f}%)")
    sys.exit(0 if same else 1)
