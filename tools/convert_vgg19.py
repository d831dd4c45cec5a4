"""Convert torchvision VGG19 features to the bem_tpu perceptual-loss format.

Run in an environment WITH torchvision + downloaded weights:
    python tools/convert_vgg19.py [out.npz]
then ship the npz and set BEM_VGG19_WEIGHTS=/path/to/out.npz.
"""

import sys

import numpy as np


def main(out_path="vgg19_features.npz"):
    import torch
    from torchvision.models import vgg19

    model = vgg19(weights="IMAGENET1K_V1").features
    # name sequence must match bem_tpu.losses.perceptual.VGG19_LAYERS
    names = [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2",
        "conv3_1", "conv3_2", "conv3_3", "conv3_4",
        "conv4_1", "conv4_2", "conv4_3", "conv4_4",
        "conv5_1", "conv5_2", "conv5_3", "conv5_4",
    ]
    out = {}
    idx = 0
    for layer in model:
        if isinstance(layer, torch.nn.Conv2d):
            name = names[idx]
            out[f"{name}.kernel"] = layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            out[f"{name}.bias"] = layer.bias.detach().numpy()
            idx += 1
    np.savez(out_path, **out)
    print(f"wrote {out_path} with {len(out)} arrays")


if __name__ == "__main__":
    main(*sys.argv[1:])
