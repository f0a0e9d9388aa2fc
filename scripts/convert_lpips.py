#!/usr/bin/env python
"""Generate the LPIPS-VGG weight file used by the trainer's perceptual
loss (`utils/lpips.py`, TrainConfig.lpips_weight > 0).

The reference trains with `lpips.LPIPS('vgg')`
(`splatt3r_core/main.py:86-88`), whose weights = torchvision's pretrained
VGG16 `features.*` + the lpips package's `lin{0..4}` calibration tensors.
Neither package ships in this image and there is no network egress, so
this script supports two sources:

  1. An environment WITH the `lpips` pip package (run it on any machine
     with internet, copy the output file over):
         python scripts/convert_lpips.py --from-lpips out.npz
  2. A torch state-dict file saved from the reference module:
         torch.save(lpips.LPIPS(net='vgg').state_dict(), 'lpips_vgg.pt')
         python scripts/convert_lpips.py --from-file lpips_vgg.pt out.npz

Then:  Trainer(..., lpips_params=load_lpips_params('out.npz')).
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def save_tree(params: dict, out: str):
    """Flatten the param tree into the .npz layout `load_lpips_params`
    reads back (conv_{slice}_{i}_{kernel|bias}, lin_{slice})."""
    flat = {}
    for s, block in enumerate(params["convs"]):
        for c, p in enumerate(block):
            flat[f"conv_{s}_{c}_kernel"] = np.asarray(p["kernel"])
            flat[f"conv_{s}_{c}_bias"] = np.asarray(p["bias"])
    for s, lin in enumerate(params["lins"]):
        flat[f"lin_{s}"] = np.asarray(lin)
    np.savez(out, **flat)
    print(f"wrote {out} ({len(flat)} arrays)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-lpips", action="store_true",
                    help="instantiate lpips.LPIPS('vgg') (needs the "
                         "lpips package + torchvision weights)")
    ap.add_argument("--from-file", default=None,
                    help="torch state-dict file of an lpips.LPIPS('vgg')")
    ap.add_argument("out")
    args = ap.parse_args()

    from splatt3r_slam_tpu.utils.lpips import convert_torch_lpips

    if args.from_lpips:
        import lpips as lpips_pkg  # noqa: F401 — external env only

        sd = {k: v.detach().cpu().numpy()
              for k, v in lpips_pkg.LPIPS(net="vgg").state_dict().items()}
    elif args.from_file:
        import torch

        sd = torch.load(args.from_file, map_location="cpu",
                        weights_only=True)
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in sd.items()}
    else:
        ap.error("need --from-lpips or --from-file")

    save_tree(convert_torch_lpips(sd), args.out)


if __name__ == "__main__":
    main()
