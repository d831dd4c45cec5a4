"""Convert the lpips pip package's AlexNet LPIPS weights for bem_tpu.

Run in an environment WITH the lpips package + downloaded weights:
    python tools/convert_lpips.py [out.npz]
then set BEM_LPIPS_WEIGHTS=/path/to/out.npz.

Zero-egress environments can instead generate a fixed-seed bundle that
proves the full LPIPS serving path (NOT meaningful perceptual distances):
    python tools/convert_lpips.py out.npz --seeded 7
"""

import sys

import numpy as np

# AlexNet feature convs (out_ch, in_ch, k) in lpips net='alex' order
_ALEX = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3)]


def main(out_path="lpips_alex.npz", seeded=None):
    import torch

    out = {}
    if seeded is not None:
        # structure-only bundle: torch-default-init convs + |N(0,1)| lins
        # (lin weights must be >= 0 like the trained calibration weights)
        torch.manual_seed(int(seeded))
        for i, (o, c, k) in enumerate(_ALEX):
            conv = torch.nn.Conv2d(c, o, k)
            out[f"conv{i + 1}.kernel"] = (
                conv.weight.detach().numpy().transpose(2, 3, 1, 0))
            out[f"conv{i + 1}.bias"] = conv.bias.detach().numpy()
            out[f"lin{i}.kernel"] = np.abs(
                torch.randn(1, 1, o, 1).numpy().astype(np.float32)) / o
    else:
        import lpips

        model = lpips.LPIPS(net="alex")
        convs = [m for m in model.net.modules()
                 if isinstance(m, torch.nn.Conv2d)]
        for i, conv in enumerate(convs):
            out[f"conv{i + 1}.kernel"] = (
                conv.weight.detach().numpy().transpose(2, 3, 1, 0))
            out[f"conv{i + 1}.bias"] = conv.bias.detach().numpy()
        for i, lin in enumerate(model.lins):
            w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
            out[f"lin{i}.kernel"] = w.transpose(2, 3, 1, 0)
    np.savez(out_path, **out)
    print(f"wrote {out_path} with {len(out)} arrays")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--seeded"]
    seeded = None
    if "--seeded" in sys.argv:
        seeded = args.pop(-1)
    main(*args, seeded=seeded)
