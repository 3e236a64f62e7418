#!/usr/bin/env python
"""Export torchvision VGG16/19 conv weights (+ lpips linear weights) to npz.

Run this on a machine WITH torchvision / lpips installed, then point
``cfg.lpips_weights`` at the output to make the perceptual losses/metrics
numerically match the official pretrained networks:

    python tools/export_vgg_weights.py --net vgg19 --stages 2 --out vgg19_f2.npz
    python tools/export_vgg_weights.py --net vgg16 --stages 5 --lpips --out lpips_vgg.npz

Output keys: w_<stage>_<conv> (kh, kw, Cin, Cout), b_<stage>_<conv>, and
optionally lin_<stage> (lpips channel weights).
"""
import argparse

import numpy as np

_PLANS = {"vgg16": [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)],
          "vgg19": [(64, 2), (128, 2), (256, 4), (512, 4), (512, 4)]}


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
    convs = [m for m in model if m.__class__.__name__ == "Conv2d"]

    out = {}
    ci = 0
    for s, (c_out, n_convs) in enumerate(_PLANS[args.net][:args.stages]):
        for i in range(n_convs):
            w = convs[ci].weight.detach().numpy()   # (Cout, Cin, kh, kw)
            out[f"w_{s}_{i}"] = np.transpose(w, (2, 3, 1, 0))
            out[f"b_{s}_{i}"] = convs[ci].bias.detach().numpy()
            ci += 1

    if args.lpips:
        import lpips as lp
        net = lp.LPIPS(net="vgg", verbose=False)
        for s, lin in enumerate(net.lins):
            out[f"lin_{s}"] = lin.model[1].weight.detach().numpy().reshape(-1)

    np.savez(args.out, **out)
    print(f"wrote {args.out} with {len(out)} arrays")


if __name__ == "__main__":
    main()
