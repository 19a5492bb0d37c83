"""Convert torch LPIPS(alex) weights to the npz layout `ops/lpips.py` loads.

Run once in an environment that has the `lpips` pip package (and internet for
the torchvision AlexNet download), then copy the npz next to this repo:

    python scripts/convert_lpips_weights.py --out assets/lpips/lpips_alex.npz

Layout: conv{0..4}_w (O,I,kh,kw), conv{0..4}_b (O,), lin{0..4} (C,)
(the nonneg 1x1 linear head weights, squeezed).
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="assets/lpips/lpips_alex.npz")
    args = ap.parse_args()

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

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
