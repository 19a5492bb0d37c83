"""Convert LPIPS(alex) weights to the npz layout `ops/lpips.py` loads.

Two paths:

1. TORCH-FREE (preferred, works in this environment): point at the raw torch
   files — the torchvision AlexNet state dict and the lpips v0.1 linear
   heads — downloaded elsewhere and copied onto this box:

       python scripts/convert_lpips_weights.py \
           --alexnet_pth alexnet-owt-7be5be79.pth \
           --lins_pth    alex.pth \
           --out assets/lpips/lpips_alex.npz

   (Reads them with gaussianavatar_tpu.utils.torch_pth — no torch import.
   Note: ops/lpips.try_load_lpips also accepts the raw .pth pair dropped
   directly into assets/lpips/, so this conversion is optional.)

2. Via the `lpips` pip package (requires torch + network for the downloads):

       python scripts/convert_lpips_weights.py --out assets/lpips/lpips_alex.npz

Layout: conv{0..4}_w (O,I,kh,kw), conv{0..4}_b (O,), lin{0..4} (C,)
(the nonneg 1x1 linear head weights, squeezed).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def from_lpips_package():
    import lpips as lpips_mod  # requires the pip package + download access

    model = lpips_mod.LPIPS(net="alex")
    model.eval()

    out = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] + \
            [m for m in model.net.slice3] + [m for m in model.net.slice4] + \
            [m for m in model.net.slice5]
    conv_layers = [m for m in convs if m.__class__.__name__ == "Conv2d"]
    assert len(conv_layers) == 5, len(conv_layers)
    for i, c in enumerate(conv_layers):
        out[f"conv{i}_w"] = c.weight.detach().numpy()
        out[f"conv{i}_b"] = c.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}"] = w.reshape(-1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="assets/lpips/lpips_alex.npz")
    ap.add_argument("--alexnet_pth", default=None,
                    help="torchvision AlexNet state dict (torch-free path)")
    ap.add_argument("--lins_pth", default=None,
                    help="lpips v0.1 alex.pth linear heads (torch-free path)")
    args = ap.parse_args()

    if args.alexnet_pth or args.lins_pth:
        if not (args.alexnet_pth and args.lins_pth):
            ap.error("--alexnet_pth and --lins_pth must be given together")
        from gaussianavatar_tpu.ops.lpips import weights_from_pth

        out = weights_from_pth(args.alexnet_pth, args.lins_pth)
    else:
        out = from_lpips_package()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
