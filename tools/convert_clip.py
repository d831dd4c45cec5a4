"""Convert a huggingface CLIP snapshot to the on-device CLIP-IQA bundle.

Run ONCE in an egress-capable environment (or pointed at a local snapshot):

    python tools/convert_clip.py --src openai/clip-vit-base-patch32 \
        --out bem_tpu/enhancement/weights/clip_iqa_vitb32.npz

The bundle holds the flax vision-tower params plus the NORMALIZED text
embeddings of the torchmetrics CLIP-IQA prompt pairs — the text tower and
its BPE tokenizer are conversion-time-only dependencies
(bem_tpu/enhancement/clip_flax.py docstring; reference protocol:
Enhancement/eval.py:122,229-243).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bem_tpu.enhancement.clip_flax import (  # noqa: E402
    convert_clip_vision,
    flatten_params,
    text_embeds_from_torch,
)
from bem_tpu.enhancement.clip_iqa import _PROMPT_PAIRS  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="openai/clip-vit-base-patch32")
    ap.add_argument("--out", default="bem_tpu/enhancement/weights/clip_iqa_vitb32.npz")
    ap.add_argument("--prompts", nargs="+",
                    default=list(_PROMPT_PAIRS))
    ap.add_argument("--seeded", type=int, default=None,
                    help="build a fixed-seed random ViT-B/32 CLIPModel "
                         "instead of downloading: a zero-egress bundle that "
                         "proves the full --no_ref clip serving path "
                         "(scores are NOT meaningful IQA)")
    args = ap.parse_args()

    texts = [t for p in args.prompts for t in _PROMPT_PAIRS[p]]
    if args.seeded is not None:
        import torch
        from transformers import CLIPConfig, CLIPModel

        torch.manual_seed(args.seeded)
        model = CLIPModel(CLIPConfig())  # defaults == ViT-B/32 geometry
        model.eval()
        # deterministic tokenization without the BPE vocab: bos + stable
        # hashed word ids + eot; get_text_features pools at argmax(ids),
        # which is the 49407 eot (the true tokenizer's pooling rule too)
        ids = np.zeros((len(texts), 77), np.int64)
        for i, t in enumerate(texts):
            words = t.split()[:75]
            ids[i, 0] = 49406
            for j, wrd in enumerate(words):
                ids[i, 1 + j] = 1 + sum(wrd.encode()) * 331 % 49000
            ids[i, 1 + len(words)] = 49407
        text_embeds = text_embeds_from_torch(model, ids)
    else:
        from transformers import CLIPModel, CLIPProcessor

        model = CLIPModel.from_pretrained(args.src)
        processor = CLIPProcessor.from_pretrained(args.src)
        tok = processor.tokenizer(texts, padding="max_length", max_length=77,
                                  return_tensors="np")
        text_embeds = text_embeds_from_torch(
            model, tok["input_ids"].astype(np.int64))

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_clip_vision(sd)
    bundle = flatten_params(params)
    bundle["text_embeds"] = text_embeds.astype(np.float32)
    bundle["prompts"] = np.str_(",".join(args.prompts))
    bundle["logit_scale"] = np.float32(np.exp(sd["logit_scale"]))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **bundle)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB, "
          f"{len(bundle)} arrays, prompts={args.prompts})")


if __name__ == "__main__":
    main()
