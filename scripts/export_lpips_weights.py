"""One-off LPIPS weight export (run on a machine WITH network access —
this zero-egress image cannot download pretrained weights).

Produces lpips_vgg.npz in the layout gsvc_tpu.metrics.lpips expects:
  features.<i>.weight  [out, in, kh, kw]   (torchvision VGG16 conv layers)
  features.<i>.bias    [out]
  lin<k>.weight        [1, C, 1, 1]        (the 5 LPIPS linear heads)

Usage:
  pip install lpips torchvision
  python scripts/export_lpips_weights.py --out lpips_vgg.npz

Then on the TPU machine:
  gsvc-train ... --lpips_weights lpips_vgg.npz
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import numpy as np
    import lpips as lpips_pkg  # pip install lpips

    net = lpips_pkg.LPIPS(net="vgg")
    out = {}
    # torchvision VGG16 feature extractor inside lpips' vgg16 wrapper
    vgg = net.net
    slices = [vgg.slice1, vgg.slice2, vgg.slice3, vgg.slice4, vgg.slice5]
    for sl in slices:
        for name, mod in sl._modules.items():
            if hasattr(mod, "weight") and mod.weight is not None:
                i = int(name)
                out[f"features.{i}.weight"] = \
                    mod.weight.detach().cpu().numpy()
                out[f"features.{i}.bias"] = mod.bias.detach().cpu().numpy()
    for k, lin in enumerate(net.lins):
        out[f"lin{k}.weight"] = \
            lin.model[-1].weight.detach().cpu().numpy()

    np.savez(args.out, **out)
    print(f"wrote {args.out}: {sorted(out)}")


if __name__ == "__main__":
    main()
