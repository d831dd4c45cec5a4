"""End-to-end training slice: synthetic LOLv1-style data -> train -> validate."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("lol")
    rng = np.random.default_rng(0)
    for split in ("Train", "Test"):
        for kind in ("input", "target"):
            os.makedirs(root / split / kind, exist_ok=True)
        n = 4 if split == "Train" else 2
        for i in range(n):
            gt = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
            lq = (gt * 0.3).astype(np.uint8)
            cv2.imwrite(str(root / split / "target" / f"{i}.png"), gt)
            cv2.imwrite(str(root / split / "input" / f"{i}.png"), lq)
    return root


def make_yaml(root, tmp):
    return f"""
name: debug_tiny
model_type: ImageEnhancer
scale: 1
num_gpu: 1
manual_seed: 100
condition: &condition
  type: mean
  scale_down: 4
  noise_level: 0.1

datasets:
  train:
    name: TrainSet
    type: Dataset_PairedImage_Mask
    dataroot_gt: {root}/Train/target
    dataroot_lq: {root}/Train/input
    geometric_augs: true
    condition: *condition
    mim:
      mask_ratio: 0.75
      mask_patch_size: 1
      model_patch_size: 1
    filename_tmpl: '{{}}'
    io_backend:
      type: disk
    use_shuffle: true
    num_worker_per_gpu: 2
    batch_size_per_gpu: 2
    mini_batch_sizes: [2]
    iters: [6]
    gt_size: 16
    gt_sizes: [16]
    dataset_enlarge_ratio: 1
    prefetch_mode: ~
  val:
    name: ValSet
    type: Dataset_PairedImage_Mask
    dataroot_gt: {root}/Test/target
    dataroot_lq: {root}/Test/input
    condition: *condition
    io_backend:
      type: disk

network_g:
  type: Network
  in_channels: 6
  out_channels: 3
  n_feat: 8
  stage: 1
  num_blocks: [1, 1, 1]
  d_state: [1, 1, 1]
  ssm_ratio: 1
  mlp_ratio: 2
  mlp_type: gdmlp
  use_pixelshuffle: true

path:
  pretrain_network_g: ~
  strict_load_g: true
  resume_state: ~

train:
  total_iter: 6
  warmup_iter: -1
  max_grad_norm: 1
  scheduler:
    type: CosineAnnealingRestartCyclicLR
    periods: [3, 3]
    restart_weights: [1, 1]
    eta_mins: [0.0002, 0.000001]
  optim_g:
    type: AdamW
    lr: 0.0002
    weight_decay: !!float 1e-4
    betas: [0.9, 0.999]
  mixing_augs:
    mixup: false
  pixel_opt:
    type: L1Loss
    loss_weight: 1
    reduction: mean

val:
  window_size: 8
  val_freq: 3
  save_img: false
  rgb2bgr: true
  use_image: true
  metrics:
    psnr:
      type: calculate_psnr
      crop_border: 0
      test_y_channel: false
    ssim:
      type: calculate_ssim
      crop_border: 0
      test_y_channel: false

logger:
  print_freq: 2
  save_checkpoint_freq: 3
  use_tb_logger: false
  wandb:
    project: ~
    resume_id: ~

dist_params:
  backend: nccl
  port: 29500
"""


def test_full_train_pipeline(tiny_dataset, tmp_path):
    from bem_tpu.train import train_pipeline

    yml = tmp_path / "tiny.yml"
    yml.write_text(make_yaml(tiny_dataset, tmp_path))
    model = train_pipeline(str(tmp_path), args_list=["--opt", str(yml)])

    assert int(model.state.step) >= 6
    assert "psnr" in model.metric_results
    assert np.isfinite(model.metric_results["psnr"])
    # checkpoints written
    states = os.listdir(tmp_path / "experiments" / "debug_tiny" / "training_states")
    assert any(s.endswith(".state") for s in states)
    models = os.listdir(tmp_path / "experiments" / "debug_tiny" / "models")
    assert any(m.startswith("net_g_") for m in models)
