"""Feasibility microbench for a pre-scan ancestry GATHER beam step ("ancg").

The anc strategy's +5.3 ms/step residual (vs the no-reorder floor) is the
per-layer cross-beam score/value passes. Since the ancestry map is fixed
BEFORE the trunk's layer loop runs, the routing could instead be ONE
take_along_axis over the layer-stacked gen cache per step (2 ops total),
leaving the per-layer attention identical to the plain split step. Whether
that wins hinges on what the big gather itself costs inside a while_loop on
this backend — this measures exactly that:

  loop A: carry the stacked (L, b, H, nb, G, D) K/V caches, per step do the
          two take_along_axis gathers + a cheap consumer, no trunk;
  loop B: identical but WITHOUT the gathers (loop/consumer overhead floor).

ms/step(A) - ms/step(B) ~= the per-step cost ancg would ADD to the split
floor (5.29 ms/step at B=16 nb=3 G=192). If that delta is >= ~3 ms the
idea cannot beat anc's 10.6 and is dead on arrival.

Usage: python tools/microbench_anc_gather.py [G] [batch] [nb] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    L, H, D = 20, 16, 64

    rng = np.random.default_rng(0)
    shape = (L, b, H, nb, G, D)
    kg = jnp.asarray(rng.standard_normal(shape).astype(ml_dtypes.bfloat16))
    vg = jnp.asarray(rng.standard_normal(shape).astype(ml_dtypes.bfloat16))
    amap = jnp.asarray(rng.integers(0, nb, size=(b, nb, G)).astype(np.int32))
    gb = float(2 * np.prod(shape) * 2 / 1e9)

    def consume(x):
        # cheap consumer keeping the gather live: one slot's mean per beam
        return jnp.mean(x[:, :, :, :, 0].astype(jnp.float32))

    def mk(loop_gather: bool):
        def body(state):
            i, kg, vg, amap, acc = state
            # amap evolves so the gather can't be hoisted out of the loop
            amap = (amap + 1) % nb
            if loop_gather:
                idx = amap[None, :, None, :, :, None]
                kr = jnp.take_along_axis(kg, idx, axis=3)
                vr = jnp.take_along_axis(vg, idx, axis=3)
                acc = acc + consume(kr) + consume(vr)
            else:
                acc = acc + consume(kg) + consume(vg)
            return i + 1, kg, vg, amap, acc

        def run(kg, vg, amap):
            out = jax.lax.while_loop(lambda s: s[0] < steps, body,
                                     (0, kg, vg, amap, 0.0))
            return out[4]

        return jax.jit(run)

    for label, fn in (("gather", mk(True)), ("floor", mk(False))):
        t0 = time.perf_counter()
        np.asarray(fn(kg, vg, amap))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(fn(kg, vg, amap))
        warm = time.perf_counter() - t0
        print(f"{label:7s} {warm / steps * 1e3:7.2f} ms/step "
              f"(cold {cold:.1f}s; caches {gb:.2f} GB K+V)")


if __name__ == "__main__":
    main()
