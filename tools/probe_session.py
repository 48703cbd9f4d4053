"""Measure the remote device-session bring-up IN ISOLATION (r04 verdict #7).

bench.py dispatches a tiny probe op at import so the server session
establishes concurrently with lowering/AOT compiles — yet BENCH_r04 shows
"device session up" at +278 s while compiles finish at +131 s. This script
answers the one open question: is the ~280 s the session's own latency
(irreducible from user code — bench already fully overlaps it), or does
the concurrent compile traffic DELAY it (lever: reorder)?

Run in a FRESH process on the chip:  python tools/probe_session.py
"""
import sys
import time

import numpy as np

T0 = time.perf_counter()


def mark(msg):
    print(f"[probe +{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    mark(f"jax imported (backend list: {jax.default_backend()})")
    x = jnp.zeros(8) + 1            # first dispatch — async
    mark("probe dispatched")
    np.asarray(x)                    # block until the session answers
    mark("probe SYNCED — session up")
    t = time.perf_counter()
    np.asarray(jnp.zeros(8) + 2)
    mark(f"second op round-trip {time.perf_counter() - t:.3f}s")


if __name__ == "__main__":
    sys.exit(main())
