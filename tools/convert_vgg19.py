"""Convert torchvision VGG19 features to the bem_tpu perceptual-loss format.

Run in an environment WITH torchvision + downloaded weights:
    python tools/convert_vgg19.py [out.npz]
then ship the npz and set BEM_VGG19_WEIGHTS=/path/to/out.npz.

Zero-egress environments can generate a fixed-seed variance-preserving
bundle instead (proves the perceptual-loss path, NOT ImageNet features —
tools/ie_wavelet_convergence.py uses the same construction to match torch
training trajectories under the full reference objective):
    python tools/convert_vgg19.py out.npz --seeded 7
"""

import sys

import numpy as np


def main(out_path="vgg19_features.npz", seeded=None):
    import torch

    out = {}
    if seeded is not None:
        from bem_tpu.losses.perceptual import VGG19_LAYERS

        torch.manual_seed(int(seeded))
        in_ch = 3
        for name, out_ch in VGG19_LAYERS:
            if name.startswith("pool"):
                continue
            conv = torch.nn.Conv2d(in_ch, out_ch, 3, padding=1)
            # relu-gain init keeps deep-layer activations O(1) so the
            # conv5_4 perceptual term stays material (torch's default
            # kaiming_uniform(a=sqrt(5)) decays them to ~1e-9 by 16 convs)
            torch.nn.init.kaiming_normal_(conv.weight, nonlinearity="relu")
            out[f"{name}.kernel"] = (
                conv.weight.detach().numpy().transpose(2, 3, 1, 0))
            out[f"{name}.bias"] = conv.bias.detach().numpy()
            in_ch = out_ch
    else:
        from torchvision.models import vgg19

        model = vgg19(weights="IMAGENET1K_V1").features
        # name sequence must match bem_tpu.losses.perceptual.VGG19_LAYERS
        names = [
            "conv1_1", "conv1_2", "conv2_1", "conv2_2",
            "conv3_1", "conv3_2", "conv3_3", "conv3_4",
            "conv4_1", "conv4_2", "conv4_3", "conv4_4",
            "conv5_1", "conv5_2", "conv5_3", "conv5_4",
        ]
        idx = 0
        for layer in model:
            if isinstance(layer, torch.nn.Conv2d):
                name = names[idx]
                out[f"{name}.kernel"] = (
                    layer.weight.detach().numpy().transpose(2, 3, 1, 0))
                out[f"{name}.bias"] = layer.bias.detach().numpy()
                idx += 1
    np.savez(out_path, **out)
    print(f"wrote {out_path} with {len(out)} arrays")


if __name__ == "__main__":
    _args = [a for a in sys.argv[1:] if a != "--seeded"]
    _seeded = None
    if "--seeded" in sys.argv:
        _seeded = _args.pop(-1)
    main(*_args, seeded=_seeded)
