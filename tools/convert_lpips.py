"""Convert the lpips pip package's AlexNet LPIPS weights for bem_tpu.

Run in an environment WITH the lpips package + downloaded weights:
    python tools/convert_lpips.py [out.npz]
then set BEM_LPIPS_WEIGHTS=/path/to/out.npz.
"""

import sys

import numpy as np


def main(out_path="lpips_alex.npz"):
    import lpips
    import torch

    model = lpips.LPIPS(net="alex")
    out = {}
    convs = [m for m in model.net.modules() if isinstance(m, torch.nn.Conv2d)]
    for i, conv in enumerate(convs):
        out[f"conv{i + 1}.kernel"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i + 1}.bias"] = conv.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}.kernel"] = w.transpose(2, 3, 1, 0)
    np.savez(out_path, **out)
    print(f"wrote {out_path} with {len(out)} arrays")


if __name__ == "__main__":
    main(*sys.argv[1:])
