"""TPU-native CLIP-IQA: flax CLIP ViT-B/32 vision tower + precomputed
prompt text embeddings.

The reference scores candidates with torchmetrics'
CLIPImageQualityAssessment on the GPU inside the eval loop
(Enhancement/eval.py:122,229-243). Here the whole scorer runs on device as
part of the compiled K-sample program: vision tower forward -> normalized
image embeddings -> logits against the (fixed) prompt-pair text embeddings
-> per-pair softmax -> brightness*0.7 -> mean.

The text tower never runs at inference: prompts are a fixed set, so their
embeddings are computed ONCE at weight-conversion time
(tools/convert_clip.py) and shipped in the same npz as the vision params.
This removes the BPE tokenizer from the runtime entirely (zero-egress
environments cannot fetch its vocab) and saves the text forward.

Weight layout matches huggingface CLIPModel (openai/clip-vit-base-patch32):
quick_gelu MLP, pre-LN encoder, class token + learned position embeddings,
post-LN on the CLS token, bias-free visual projection to 512.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):  # (B, L, D)
        B, L, D = x.shape
        hd = D // self.heads
        q = nn.Dense(D, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(D, name="k_proj")(x)
        v = nn.Dense(D, name="v_proj")(x)

        def split(t):
            return t.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)

        att = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k))
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(D, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    width: int
    heads: int
    mlp_dim: int = 0  # 0 -> 4 * width

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + CLIPAttention(self.width, self.heads, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(self.mlp_dim or 4 * self.width, name="fc1")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.width, name="fc2")(h)
        return x


class CLIPVisionTower(nn.Module):
    """huggingface CLIPVisionTransformer + visual_projection."""

    width: int = 768
    layers: int = 12
    heads: int = 12
    patch: int = 32
    image_size: int = 224
    proj_dim: int = 512
    mlp_dim: int = 0  # 0 -> 4 * width

    @nn.compact
    def __call__(self, pixel_values):  # (B, H, W, 3) normalized
        B = pixel_values.shape[0]
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), use_bias=False,
                    name="patch_embedding")(pixel_values)
        x = x.reshape(B, -1, self.width)  # (B, 49, D)
        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02), (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.width)), x], axis=1)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (x.shape[1], self.width))
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="pre_layrnorm")(x)
        for i in range(self.layers):
            x = CLIPEncoderLayer(self.width, self.heads, self.mlp_dim,
                                 name=f"layer_{i}")(x)
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(x[:, 0])
        return nn.Dense(self.proj_dim, use_bias=False,
                        name="visual_projection")(pooled)


# ---------------------------------------------------------------------------
# Weight conversion (huggingface state_dict -> flax params)
# ---------------------------------------------------------------------------


def convert_clip_vision(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch CLIPModel.state_dict() (numpy values) -> CLIPVisionTower params."""
    p: Dict[str, Any] = {}
    vm = "vision_model."

    def lin(dst, src):
        p[dst] = {"kernel": sd[src + ".weight"].T.copy()}
        if src + ".bias" in sd:
            p[dst]["bias"] = sd[src + ".bias"].copy()

    def ln(dst, src):
        p[dst] = {"scale": sd[src + ".weight"].copy(),
                  "bias": sd[src + ".bias"].copy()}

    p["patch_embedding"] = {
        # OIHW -> HWIO
        "kernel": sd[vm + "embeddings.patch_embedding.weight"]
        .transpose(2, 3, 1, 0).copy()
    }
    p["class_embedding"] = sd[vm + "embeddings.class_embedding"].copy()
    p["position_embedding"] = (
        sd[vm + "embeddings.position_embedding.weight"].copy())
    ln("pre_layrnorm", vm + "pre_layrnorm")
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith(vm + "encoder.layers.")
    )
    for i in range(n_layers):
        src = f"{vm}encoder.layers.{i}"
        layer: Dict[str, Any] = {}
        p[f"layer_{i}"] = layer
        sub = {}
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sub[name] = {
                "kernel": sd[f"{src}.self_attn.{name}.weight"].T.copy(),
                "bias": sd[f"{src}.self_attn.{name}.bias"].copy(),
            }
        layer["self_attn"] = sub
        layer["layer_norm1"] = {
            "scale": sd[f"{src}.layer_norm1.weight"].copy(),
            "bias": sd[f"{src}.layer_norm1.bias"].copy(),
        }
        layer["layer_norm2"] = {
            "scale": sd[f"{src}.layer_norm2.weight"].copy(),
            "bias": sd[f"{src}.layer_norm2.bias"].copy(),
        }
        layer["fc1"] = {"kernel": sd[f"{src}.mlp.fc1.weight"].T.copy(),
                        "bias": sd[f"{src}.mlp.fc1.bias"].copy()}
        layer["fc2"] = {"kernel": sd[f"{src}.mlp.fc2.weight"].T.copy(),
                        "bias": sd[f"{src}.mlp.fc2.bias"].copy()}
    ln("post_layernorm", vm + "post_layernorm")
    p["visual_projection"] = {"kernel": sd["visual_projection.weight"].T.copy()}
    return p


def text_embeds_from_torch(model, token_ids: np.ndarray) -> np.ndarray:
    """Normalized text embeddings for fixed prompts via the torch text
    tower (conversion-time only). token_ids: (n, 77) int64."""
    import torch

    with torch.no_grad():
        emb = model.get_text_features(input_ids=torch.from_numpy(token_ids))
        emb = emb / emb.norm(dim=-1, keepdim=True)
    return emb.float().numpy()


# ---------------------------------------------------------------------------
# Preprocessing + scoring (the on-device pipeline)
# ---------------------------------------------------------------------------


def preprocess(images: jax.Array, image_size: int = 224) -> jax.Array:
    """(K, H, W, 3) RGB [0,1] -> CLIPProcessor-equivalent pixel_values
    (resize shortest side + center crop + normalize). Resize is jnp
    bilinear (the host processor uses PIL bicubic on uint8 — a sub-1e-2
    pixel difference; acceptable for scoring, noted in COVERAGE)."""
    K, H, W, _ = images.shape
    s = image_size / min(H, W)
    nh, nw = max(int(round(H * s)), image_size), max(int(round(W * s)), image_size)
    x = jax.image.resize(images, (K, nh, nw, 3), "bilinear")
    top, left = (nh - image_size) // 2, (nw - image_size) // 2
    x = x[:, top : top + image_size, left : left + image_size, :]
    return (x - CLIP_MEAN) / CLIP_STD


def clip_iqa_score_fn(text_embeds: np.ndarray,
                      prompts: Sequence[str], logit_scale: float,
                      tower: Optional[CLIPVisionTower] = None):
    """Build ``(params, images (K,H,W,3) [0,1]) -> (K,) scores`` (higher =
    better). The vision params are a TRACED argument, not a closure: baking
    the 87M-param tower into the jaxpr as constants inflates the compiled
    program body past remote-compile transport limits (HTTP 413 on the axon
    tunnel, measured round 4) and would re-constant-fold per jit cache entry.

    text_embeds: (2*len(prompts), proj_dim) normalized, pair-ordered
    [pos0, neg0, pos1, neg1, ...] (torchmetrics prompt-pair protocol).
    """
    tower = tower or CLIPVisionTower()
    te = jnp.asarray(text_embeds)
    scale = float(logit_scale)

    def fn(params, images):
        x = preprocess(images.astype(jnp.float32), tower.image_size)
        img = tower.apply({"params": params}, x)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        logits = scale * img @ te.T  # (K, 2P)
        scores = []
        for i, name in enumerate(prompts):
            pair = logits[:, 2 * i : 2 * i + 2]
            prob = jax.nn.softmax(pair, axis=-1)[:, 0]
            if name == "brightness":
                prob = prob * 0.7  # eval.py:239 over-exposure guard
            scores.append(prob)
        return jnp.stack(scores).mean(axis=0)

    return fn


def load_clip_iqa_npz(path: str):
    """Load the converted bundle (tools/convert_clip.py): flat vision
    params + text embeddings + prompt names + logit scale."""
    data = np.load(path, allow_pickle=False)
    params: Dict[str, Any] = {}
    for k in data.files:
        if not k.startswith("v/"):
            continue
        node = params
        parts = k[2:].split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = data[k]
    prompts = [s for s in str(data["prompts"]).split(",") if s]
    return params, data["text_embeds"], prompts, float(data["logit_scale"])


def flatten_params(params: Dict[str, Any], prefix: str = "v") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out
