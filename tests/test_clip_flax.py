"""Flax CLIP vision tower vs huggingface CLIPModel (random-init — the
architecture/conversion parity transfers to the real openai weights, which
zero-egress environments cannot fetch; tools/convert_clip.py produces the
deployable bundle)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def tiny_clip():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    torch.manual_seed(0)
    cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=2,
                       projection_dim=24),
        CLIPVisionConfig(hidden_size=48, intermediate_size=96,
                         num_hidden_layers=3, num_attention_heads=4,
                         image_size=64, patch_size=16, projection_dim=24),
        projection_dim=24,
    )
    m = CLIPModel(cfg)
    m.eval()
    return m, cfg


def _tower_for(cfg):
    from bem_tpu.enhancement.clip_flax import CLIPVisionTower

    v = cfg.vision_config
    return CLIPVisionTower(width=v.hidden_size,
                           layers=v.num_hidden_layers,
                           heads=v.num_attention_heads,
                           patch=v.patch_size,
                           image_size=v.image_size,
                           proj_dim=cfg.projection_dim,
                           mlp_dim=v.intermediate_size)


def test_vision_tower_parity(tiny_clip, rng):
    from bem_tpu.enhancement.clip_flax import convert_clip_vision

    model, cfg = tiny_clip
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_clip_vision(sd)

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy()

    tower = _tower_for(cfg)
    got = np.asarray(tower.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_clip_iqa_pipeline_matches_torchmetrics_protocol(tiny_clip, rng):
    """End-to-end prompt-pair scoring vs a torch re-implementation of the
    torchmetrics CLIPImageQualityAssessment math on the same (random) CLIP,
    with identical preprocessing inputs."""
    from bem_tpu.enhancement.clip_flax import (
        clip_iqa_score_fn,
        convert_clip_vision,
        preprocess,
        text_embeds_from_torch,
    )

    model, cfg = tiny_clip
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_clip_vision(sd)

    token_ids = rng.integers(0, cfg.text_config.vocab_size,
                             size=(6, 12)).astype(np.int64)
    te = text_embeds_from_torch(model, token_ids)
    prompts = ["brightness", "noisiness", "quality"]
    scale = float(np.exp(sd["logit_scale"]))

    imgs = rng.random((4, 64, 64, 3)).astype(np.float32)
    fn = jax.jit(clip_iqa_score_fn(te, prompts, scale,
                                   tower=_tower_for(cfg)))
    got = np.asarray(fn(params, jnp.asarray(imgs)))

    # torch side on the SAME preprocessed pixels (isolates resize choice)
    pix = np.asarray(preprocess(jnp.asarray(imgs), cfg.vision_config.image_size))
    with torch.no_grad():
        img_emb = model.get_image_features(
            pixel_values=torch.from_numpy(pix.transpose(0, 3, 1, 2)))
        img_emb = img_emb / img_emb.norm(dim=-1, keepdim=True)
        logits = scale * img_emb.numpy() @ te.T
    want = []
    for i, name in enumerate(prompts):
        pair = torch.softmax(torch.from_numpy(logits[:, 2 * i : 2 * i + 2]), -1)[:, 0]
        if name == "brightness":
            pair = pair * 0.7
        want.append(pair.numpy())
    want = np.stack(want).mean(axis=0)

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert got.shape == (4,)


def test_bundle_roundtrip(tiny_clip, tmp_path, rng):
    from bem_tpu.enhancement.clip_flax import (
        convert_clip_vision,
        flatten_params,
        load_clip_iqa_npz,
    )

    model, cfg = tiny_clip
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_clip_vision(sd)
    bundle = flatten_params(params)
    bundle["text_embeds"] = rng.standard_normal((6, 24)).astype(np.float32)
    bundle["prompts"] = np.str_("brightness,noisiness,quality")
    bundle["logit_scale"] = np.float32(100.0)
    path = tmp_path / "clip.npz"
    np.savez_compressed(path, **bundle)

    p2, te, prompts, scale = load_clip_iqa_npz(str(path))
    assert prompts == ["brightness", "noisiness", "quality"]
    assert scale == 100.0
    flat1 = flatten_params(params)
    flat2 = flatten_params(p2)
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_array_equal(flat1[k], flat2[k])
