#!/usr/bin/env python
"""Export torchvision VGG16/19 conv weights (+ lpips linear weights) to npz.

Run this on a machine WITH torchvision / lpips installed, then point
``cfg.lpips_weights`` at the output to make the perceptual losses/metrics
numerically match the official pretrained networks:

    python tools/export_vgg_weights.py --net vgg19 --stages 2 --out vgg19_f2.npz
    python tools/export_vgg_weights.py --net vgg16 --stages 5 --lpips --out lpips_vgg.npz

Output keys: w_<stage>_<conv> (kh, kw, Cin, Cout), b_<stage>_<conv>, and
optionally lin_<stage> (lpips channel weights).

The layout mapping is factored into :func:`convert_conv_stack` /
:func:`convert_lpips_lins`, which operate on plain numpy arrays — so the
mapping is testable without torchvision (tests/test_export_vgg.py
round-trips it against real torch convs).
"""
import argparse

import numpy as np

_PLANS = {"vgg16": [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)],
          "vgg19": [(64, 2), (128, 2), (256, 4), (512, 4), (512, 4)]}


def convert_conv_stack(convs, plan, stages):
    """[(weight (Cout,Cin,kh,kw), bias (Cout,))] in torchvision ``features``
    order -> {'w_<s>_<i>': (kh,kw,Cin,Cout), 'b_<s>_<i>': (Cout,)} for
    models.lpips.vgg_load_npz."""
    out = {}
    ci = 0
    for s, (_, n_convs) in enumerate(plan[:stages]):
        for i in range(n_convs):
            w, b = convs[ci]
            out[f"w_{s}_{i}"] = np.transpose(np.asarray(w), (2, 3, 1, 0))
            out[f"b_{s}_{i}"] = np.asarray(b)
            ci += 1
    return out


def convert_lpips_lins(lins):
    """[lpips lin conv weights (1, C, 1, 1)] -> {'lin_<s>': (C,)}."""
    return {f"lin_{s}": np.asarray(w).reshape(-1) for s, w in enumerate(lins)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--net", choices=["vgg16", "vgg19"], default="vgg16")
    p.add_argument("--stages", type=int, default=5)
    p.add_argument("--lpips", action="store_true",
                   help="also export lpips 'vgg' linear weights")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import torchvision.models as tvm
    model = getattr(tvm, args.net)(weights="DEFAULT").features
    convs = [(m.weight.detach().numpy(), m.bias.detach().numpy())
             for m in model if m.__class__.__name__ == "Conv2d"]

    out = convert_conv_stack(convs, _PLANS[args.net], args.stages)
    if args.lpips:
        import lpips as lp
        net = lp.LPIPS(net="vgg", verbose=False)
        out.update(convert_lpips_lins(
            [lin.model[1].weight.detach().numpy() for lin in net.lins]))

    np.savez(args.out, **out)
    print(f"wrote {args.out} with {len(out)} arrays")


if __name__ == "__main__":
    main()
