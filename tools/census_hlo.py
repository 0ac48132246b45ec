"""Optimized-HLO census of a compiled generator forward (or sampler).

Round-4 verdict #1: attribute where the int8 mode's time goes.  Compiles
one G1/G2 forward (or the fused sampler) in a given serving mode and
reports, from the post-optimization HLO:

* convolutions grouped by (operand dtype, spatial size, Cin->Cout):
  count, GFLOP/conv, group total — the int8 graph's s8 convs and the
  remaining bf16 convs are separately visible;
* reduce ops by input shape (the dynamic-quantize absmax passes show up
  here; the static mode must make the big ones disappear);
* fusion-op count and total FLOPs/bytes from XLA's own cost_analysis.

python tools/census_hlo.py [--mode bf16|int8|int8-static]
    [--min-ch N] [--nf 64] [--batch 32] [--model g1|g2|sampler]
    [--attn einsum|bf16|flash] [--dump /tmp/hlo.txt]
"""

from __future__ import annotations

import argparse
import os
import re
from collections import defaultdict


def _parse_shape(s: str):
    """'s8[32,64,64,256]{3,2,1,0}' -> ('s8', (32,64,64,256))."""
    m = re.match(r"(\w+)\[([\d,]*)\]", s)
    if not m:
        return None, ()
    dims = tuple(int(d) for d in m.group(2).split(",")) if m.group(2) else ()
    return m.group(1), dims


def census(hlo_text: str):
    # pass 1: symbol table %name -> (dtype, shape).  Operand refs in
    # optimized HLO dumps are bare (%fusion.233), so conv operand types
    # must be resolved through their defining lines.
    sym = {}
    lines = hlo_text.splitlines()
    lhs_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(\w+\[[\d,]*\])")
    for line in lines:
        m = lhs_re.match(line)
        if m:
            sym[m.group(1)] = _parse_shape(m.group(2))

    def resolve(ref: str):
        return sym.get(ref.lstrip("%"), ("?", ()))

    convs = defaultdict(lambda: [0, 0.0])
    reduces = defaultdict(int)
    n_fusion = 0
    for line in lines:
        line = line.strip()
        if " = " not in line:
            continue
        lhs, rhs = line.split(" = ", 1)
        opm = re.match(r"\w+\[[\d,]*\]\S*\s+([\w\-]+)\(", rhs)
        if not opm:
            continue
        op = opm.group(1)
        out_dtype, out_shape = _parse_shape(rhs.split(" ", 1)[0])
        # the operand list is the paren group right after the op name —
        # NOT the first '(' in the line, which sits inside the layout
        # annotation (e.g. {3,0,2,1:T(8,128)(2,1)})
        argm = re.search(re.escape(op) + r"\(([^)]*)\)", rhs)
        arg_str = argm.group(1) if argm else ""
        if op == "convolution":
            operands = re.findall(r"%([\w.\-]+)", arg_str)
            if len(operands) >= 2:
                in_dtype, in_shape = resolve(operands[0])
                k_dtype, k_shape = resolve(operands[1])
            else:
                in_dtype, in_shape = "?", ()
                k_dtype, k_shape = "?", ()
            dl = re.search(r"dim_labels=(\S+?)[ ,]", rhs)
            flops = 0.0
            if len(k_shape) == 4 and len(out_shape) == 4:
                import numpy as np

                kh, kw, cin, cout = k_shape
                if "01io" not in (dl.group(1) if dl else ""):
                    srt = sorted(k_shape)
                    kh, kw = srt[0], srt[1]
                    cin, cout = srt[2], srt[3]
                flops = 2.0 * float(np.prod(out_shape)) * kh * kw * cin
            key = (f"{in_dtype}x{k_dtype}->{out_dtype}",
                   "x".join(map(str, in_shape)),
                   "x".join(map(str, k_shape)))
            convs[key][0] += 1
            convs[key][1] += flops
        elif op == "reduce":
            operands = re.findall(r"%([\w.\-]+)", arg_str)
            if operands:
                d, s = resolve(operands[0])
                in_sig = f"{d}[{','.join(map(str, s))}]"
            else:
                in_sig = "?"
            reduces[in_sig] += 1
        elif op == "fusion":
            n_fusion += 1
    return convs, reduces, n_fusion


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="bf16",
                    choices=("bf16", "int8", "int8-static"))
    ap.add_argument("--min-ch", dest="min_ch", type=int, default=None)
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--model", default="g1",
                    choices=("g1", "g2", "sampler"))
    ap.add_argument("--attn", default=None,
                    choices=("einsum", "bf16", "flash"))
    ap.add_argument("--dump", default=None,
                    help="also write the full optimized HLO here")
    args = ap.parse_args()

    if args.attn:
        os.environ["MUDIFF_ATTN"] = args.attn

    import jax
    import jax.numpy as jnp

    from mudiff_tpu.config import brats_recipe
    from mudiff_tpu.models import NCSNppGenerator

    cfg = brats_recipe(
        num_channels_dae=args.nf, image_size=args.image_size,
        use_bf16=True, use_int8=args.mode != "bf16",
    )
    dtype = jnp.bfloat16
    g1 = NCSNppGenerator(config=cfg, dtype=dtype, int8_min_ch=args.min_ch)
    g2 = NCSNppGenerator(config=cfg, adaptive=True, dtype=dtype,
                         int8_min_ch=args.min_ch)

    s, b = cfg.image_size, args.batch
    x1 = jnp.zeros((1, s, s, 1), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    z1 = jnp.zeros((1, cfg.nz), jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = g1.init(k1, x1, x1, x1, x1, t1, z1)["params"]
    p2 = g2.init(k2, x1, x1, x1, x1, t1, z1, pseudo_target=x1)["params"]

    if args.mode == "int8-static":
        from mudiff_tpu.infer.calibrate import synthetic_calib

        c1 = synthetic_calib(g1, p1, (x1, x1, x1, x1, t1, z1),
                             min_ch=args.min_ch)
        c2 = synthetic_calib(g2, p2, (x1, x1, x1, x1, t1, z1),
                             min_ch=args.min_ch, pseudo_target=x1)
        g1 = NCSNppGenerator(config=cfg, dtype=dtype, int8_calib=c1)
        g2 = NCSNppGenerator(config=cfg, adaptive=True, dtype=dtype,
                             int8_calib=c2)

    x = jnp.zeros((b, s, s, 1), jnp.float32)
    t = jnp.zeros((b,), jnp.int32)
    z = jnp.zeros((b, cfg.nz), jnp.float32)

    if args.model == "g1":
        fn = lambda: jax.jit(
            lambda p, xc: g1.apply({"params": p}, xc, xc, xc, xc, t, z)
        ).lower(p1, x)
    elif args.model == "g2":
        fn = lambda: jax.jit(
            lambda p, xc: g2.apply({"params": p}, xc, xc, xc, xc, t, z,
                                   pseudo_target=xc)
        ).lower(p2, x)
    else:
        from mudiff_tpu.diffusion import (
            PosteriorCoefficients,
            sample_from_model,
        )

        post = PosteriorCoefficients.from_config(cfg)

        def _sample(pg1, pg2, xc):
            g1_fn = lambda xx, a, bb, c, tt, zz: g1.apply(
                {"params": pg1}, xx, a, bb, c, tt, zz)
            g2_fn = lambda xx, a, bb, c, tt, zz, ps: g2.apply(
                {"params": pg2}, xx, a, bb, c, tt, zz, pseudo_target=ps)
            return sample_from_model(
                post, g1_fn, g2_fn, xc, xc, xc, xc, cfg.num_timesteps,
                cfg.nz, jax.random.PRNGKey(0),
            )

        fn = lambda: jax.jit(_sample).lower(p1, p2, x)

    lowered = fn()
    compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)
        print(f"wrote {args.dump} ({len(hlo.splitlines())} lines)")

    convs, reduces, n_fusion = census(hlo)
    total_conv_gflop = sum(v[1] for v in convs.values()) / 1e9
    print(f"\n== {args.model} @ nf={args.nf} B={b} mode={args.mode} "
          f"min_ch={args.min_ch} attn={args.attn or 'einsum'} ==")
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print(f"cost_analysis: {ca.get('flops', 0) / 1e12:.2f} TFLOP, "
              f"{ca.get('bytes accessed', 0) / 1e9:.2f} GB accessed")
    except Exception as e:
        print(f"cost_analysis unavailable: {e}")
    print(f"fusions: {n_fusion}   conv total: {total_conv_gflop:.1f} GFLOP")
    print(f"\n{'count':>5} {'dtype sig':<18} {'input':<18} {'kernel':<16} "
          f"{'GFLOP/conv':>10} {'group GFLOP':>11}")
    for key, (cnt, fl) in sorted(convs.items(), key=lambda kv: -kv[1][1]):
        sig, ishape, kshape = key
        print(f"{cnt:>5} {sig:<18} {ishape:<18} {kshape:<16} "
              f"{fl / cnt / 1e9:>10.2f} {fl / 1e9:>11.1f}")
    print("\nreduce ops by input (top 12):")
    for sig, cnt in sorted(reduces.items(),
                           key=lambda kv: -kv[1])[:12]:
        print(f"{cnt:>5}  {sig}")


if __name__ == "__main__":
    main()
