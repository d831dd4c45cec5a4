"""CLIP-IQA candidate scorer (reference: torchmetrics
CLIPImageQualityAssessment used at Enhancement/eval.py:122,229-243).

Computes prompt-pair scores with a CLIP model: for each built-in prompt pair
(positive, negative), score = softmax over the two text-image similarities,
then averaged over prompts with the reference's brightness*0.7 downscaling
(eval.py:236-242).

Weights: zero-egress environments cannot download CLIP. The scorer loads a
local checkpoint from ``BEM_CLIP_DIR`` (a HuggingFace CLIP snapshot dir,
e.g. openai/clip-vit-base-patch32). Without it, construction raises with
instructions — there is no meaningful fallback for a semantic scorer.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

_PROMPT_PAIRS = {
    "quality": ("Good photo.", "Bad photo."),
    "brightness": ("Bright photo.", "Dark photo."),
    "noisiness": ("Clean photo.", "Noisy photo."),
    "colorfullness": ("Colorful photo.", "Dull photo."),
    "sharpness": ("Sharp photo.", "Blurry photo."),
    "contrast": ("High contrast photo.", "Low contrast photo."),
}


class ClipIQA:
    def __init__(self, prompts: Sequence[str] = ("brightness", "noisiness", "quality")):
        clip_dir = os.environ.get("BEM_CLIP_DIR")
        if not clip_dir or not os.path.isdir(clip_dir):
            raise RuntimeError(
                "CLIP-IQA needs CLIP weights: set BEM_CLIP_DIR to a local "
                "HuggingFace snapshot of openai/clip-vit-base-patch32 "
                "(zero-egress environments cannot download it). Use "
                "--no_ref niqe or --no_ref uiqm_uciqe instead."
            )
        from transformers import CLIPModel, CLIPProcessor

        self.model = CLIPModel.from_pretrained(clip_dir)
        self.processor = CLIPProcessor.from_pretrained(clip_dir)
        self.prompts = list(prompts)
        self.pairs = [_PROMPT_PAIRS[p] for p in self.prompts]

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: (K, H, W, 3) RGB in [0,1] -> (K,) scores, higher better."""
        import torch

        texts = [t for pair in self.pairs for t in pair]
        imgs = [(im * 255).astype(np.uint8) for im in images]
        inputs = self.processor(
            text=texts, images=imgs, return_tensors="pt", padding=True
        )
        with torch.no_grad():
            out = self.model(**inputs)
        logits = out.logits_per_image.float()  # (K, 2 * n_prompts)
        K = logits.shape[0]
        scores = []
        for i, name in enumerate(self.prompts):
            pair_logits = logits[:, 2 * i : 2 * i + 2]
            prob = torch.softmax(pair_logits, dim=-1)[:, 0]
            if name == "brightness":
                prob = prob * 0.7  # eval.py:239 over-exposure guard
            scores.append(prob)
        return torch.stack(scores).mean(dim=0).numpy()
