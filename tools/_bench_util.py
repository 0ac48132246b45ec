"""Shared chained-measurement helper for the microbench tools.

On the axon remote-TPU runtime, a bare dispatch loop with one final
``block_until_ready`` is NOT a valid timing fence: unfetched executions
can be elided and each dispatch+fetch costs ~28 ms of tunnel RPC
(PERFORMANCE.md, measurement-protocol section).  ``chain_time`` runs N
iterations serialized by a data dependency inside ONE jit, fetches one
scalar, and subtracts the cost of an empty chain.
"""

import time

import jax
import jax.numpy as jnp


def chain_time(fn, x0, n, unroll=False):
    """Run ``fn`` n times serialized by a data dependency; ms/iter.

    unroll=True chains by Python loop instead of lax.scan: every
    iteration is a separate HLO op that the layout assigner and fusion
    passes see individually — use to cross-check whether a scan body is
    being pessimized (observed: a bare 3x3 conv inside scan timed 15-40x
    its in-model cost; unrolled it matches the HLO-census rate)."""

    def body(carry):
        out = fn(carry)
        # fold a (tiny) function of the output back into the input:
        # serializes iterations and defeats execution dedup/elision
        s = (jnp.sum(out.astype(jnp.float32)) * 1e-24).astype(carry.dtype)
        return carry + s

    def chained(x, steps):
        if unroll:
            for _ in range(steps):
                x = body(x)
        else:
            x, _ = jax.lax.scan(lambda c, _: (body(c), ()), x, (),
                                length=steps)
        return jnp.sum(x.astype(jnp.float32))

    jit0 = jax.jit(lambda x: chained(x, 0))
    jitn = jax.jit(lambda x: chained(x, n))
    float(jit0(x0))
    float(jitn(x0))  # compile + warm
    t0 = time.perf_counter()
    base = float(jit0(x0))
    t_overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(jitn(x0 + jnp.asarray(base * 0).astype(x0.dtype)))
    t_total = time.perf_counter() - t0
    return max(t_total - t_overhead, 0.0) / n * 1e3
