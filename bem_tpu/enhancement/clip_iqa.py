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


_DEFAULT_NPZ = os.path.join(
    os.path.dirname(__file__), "weights", "clip_iqa_vitb32.npz")


class ClipIQA:
    """Prefers the TPU-native flax scorer (enhancement/clip_flax.py): one
    compiled vision-tower + prompt-pair program over the K batch, using the
    converted bundle at ``BEM_CLIP_NPZ`` (default
    enhancement/weights/clip_iqa_vitb32.npz, produced by
    tools/convert_clip.py). Falls back to the host torch CLIP when only a
    huggingface snapshot dir (``BEM_CLIP_DIR``) is available."""

    def __init__(self, prompts: Sequence[str] = ("brightness", "noisiness", "quality")):
        self.prompts = list(prompts)
        self.pairs = [_PROMPT_PAIRS[p] for p in self.prompts]
        npz = os.environ.get("BEM_CLIP_NPZ", _DEFAULT_NPZ)
        self._fn = None
        if os.path.isfile(npz):
            import jax

            from .clip_flax import clip_iqa_score_fn, load_clip_iqa_npz

            params, text_embeds, avail, scale = load_clip_iqa_npz(npz)
            idx = []
            for p in self.prompts:
                if p not in avail:
                    raise RuntimeError(
                        f"prompt {p!r} not in converted bundle {npz} "
                        f"(has {avail}); re-run tools/convert_clip.py")
                idx += [2 * avail.index(p), 2 * avail.index(p) + 1]
            import jax.numpy as jnp

            # params ride as jit ARGUMENTS (device buffers), not closure
            # constants — see clip_iqa_score_fn's docstring
            self._params = jax.tree.map(jnp.asarray, params)
            self._score = jax.jit(clip_iqa_score_fn(
                text_embeds[idx], self.prompts, scale))
            self._fn = lambda images: self._score(self._params, images)
            return
        clip_dir = os.environ.get("BEM_CLIP_DIR")
        if not clip_dir or not os.path.isdir(clip_dir):
            raise RuntimeError(
                "CLIP-IQA needs CLIP weights: set BEM_CLIP_NPZ to a bundle "
                "converted with tools/convert_clip.py (preferred, runs on "
                "device) or BEM_CLIP_DIR to a local HuggingFace snapshot of "
                "openai/clip-vit-base-patch32 (zero-egress environments "
                "cannot download it). Use --no_ref niqe or "
                "--no_ref uiqm_uciqe instead."
            )
        from transformers import CLIPModel, CLIPProcessor

        self.model = CLIPModel.from_pretrained(clip_dir)
        self.processor = CLIPProcessor.from_pretrained(clip_dir)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: (K, H, W, 3) RGB in [0,1] -> (K,) scores, higher better."""
        if self._fn is not None:
            import jax.numpy as jnp

            return np.asarray(self._fn(jnp.asarray(images)))
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
