"""Microbenchmark: candidate lowerings for the four Cin=1 stem convs.

The generator encodes x_t + three condition images through four
independent ConvFeatBlocks (models/generator.py:192-198; reference
backbones/ncsnpp_generator_adagn_feat.py:177-184).  Each 256^2 1->64
conv measured ~5 ms @ 0.5 TF/s on v5e (PERFORMANCE.md) — a pathological
lowering for Cin=1.  This bench compares fusions of the four stems at
the flagship shape (B=32, 256^2, nf=64, bf16).

Measurement protocol (axon remote TPU): single dispatches are dominated
by ~28 ms of tunnel RPC, and un-fetched executions can be elided — so
each variant runs CHAIN iterations serialized by a data dependency
inside ONE jit, the final scalar is fetched to host, and the cost of an
empty chain is subtracted.

Run on the real chip: python tools/bench_stem.py [--batch 32]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from tools._bench_util import chain_time

S = 256
NF = 64
N_STEM = 4


def conv(x, k, fgc=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=fgc,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def group_norm(h, groups=32):
    b, hh, ww, c = h.shape
    g = h.reshape(b, hh, ww, groups, c // groups).astype(jnp.float32)
    mean = g.mean(axis=(1, 2, 4), keepdims=True)
    var = g.var(axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + 1e-6)
    return g.reshape(b, hh, ww, c).astype(h.dtype)


def block_diag_kernel(ks):
    """(n,3,3,1,NF) -> (3,3,n,n*NF) with zeros off the diagonal."""
    n = len(ks)
    out = jnp.zeros((3, 3, n, n * NF), ks[0].dtype)
    for i, k in enumerate(ks):
        out = out.at[:, :, i, i * NF:(i + 1) * NF].set(k[:, :, 0, :])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chain", type=int, default=30)
    args = ap.parse_args()

    dtype = jnp.bfloat16
    B = args.batch
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(N_STEM, B, S, S, 1).astype(np.float32), dtype)
    k1 = jnp.asarray(
        rng.randn(N_STEM, 3, 3, 1, NF).astype(np.float32) * 0.1, dtype
    )
    k2 = jnp.asarray(
        rng.randn(N_STEM, 3, 3, NF, NF).astype(np.float32) * 0.05, dtype
    )
    stacked = jnp.concatenate(list(xs), axis=-1)  # (B,S,S,4)
    kd = block_diag_kernel(list(k1))  # (3,3,4,256)
    kg = jnp.concatenate(list(k1), axis=-1)  # (3,3,1,256) fgc=4
    k2g = jnp.concatenate(list(k2), axis=-1)  # (3,3,64,256) fgc=4

    variants = {
        # conv1-only candidates; all consume the carried tensor
        "sep4": (
            lambda st: jnp.concatenate(
                [conv(st[..., i:i + 1], k1[i]) for i in range(N_STEM)],
                axis=-1,
            ),
            stacked,
        ),
        "dense4": (lambda st: conv(st, kd), stacked),
        "grouped": (lambda st: conv(st, kg, fgc=N_STEM), stacked),
        "im2col": (
            lambda st: jnp.einsum(
                "bhwnk,nko->bhwno",
                jax.lax.conv_general_dilated_patches(
                    st, (3, 3), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).reshape(B, S, S, 9, N_STEM).transpose(0, 1, 2, 4, 3),
                k1.reshape(N_STEM, 9, NF),
                preferred_element_type=jnp.float32,
            ).astype(st.dtype).reshape(B, S, S, N_STEM * NF),
            stacked,
        ),
        # whole-stem candidates: conv1 -> GN -> silu -> conv2
        "full_sep": (
            lambda st: jnp.concatenate(
                [
                    conv(
                        jax.nn.silu(
                            group_norm(conv(st[..., i:i + 1], k1[i]))
                        ),
                        k2[i],
                    )
                    for i in range(N_STEM)
                ],
                axis=-1,
            ),
            stacked,
        ),
        "full_fused": (
            lambda st: conv(
                jax.nn.silu(
                    group_norm(conv(st, kd), groups=32 * N_STEM)
                ),
                k2g,
                fgc=N_STEM,
            ),
            stacked,
        ),
    }

    results = {}
    for name, (fn, x0) in variants.items():
        ms = chain_time(fn, x0, args.chain)
        results[name] = ms
        print(f"{name:12s} {ms:8.3f} ms/iter", flush=True)
    print("\nspeedups vs sep4 (conv1 only):")
    for n in ("dense4", "grouped", "im2col"):
        print(f"  {n:12s} {results['sep4'] / results[n]:5.2f}x")
    print("speedups vs full_sep (whole stem):")
    print(f"  full_fused   {results['full_sep'] / results['full_fused']:5.2f}x")


if __name__ == "__main__":
    main()
