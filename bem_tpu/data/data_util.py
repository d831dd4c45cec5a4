"""Path pairing utilities (reference: basicsr/data/data_util.py)."""

from __future__ import annotations

import os
from os import path as osp
from typing import List

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".JPG",
                  ".PNG", ".JPEG")


def scandir(dir_path, suffix=None, recursive=False, full_path=False):
    """Non-hidden file scan (reference utils/misc.py:52-91)."""
    if isinstance(suffix, str):
        suffix = (suffix,)

    def _scandir(dir_path, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith(".") and entry.is_file():
                rel = entry.path if full_path else osp.relpath(entry.path, root)
                if suffix is None or rel.endswith(tuple(suffix)):
                    yield rel
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix, recursive)

    root = dir_path
    return _scandir(dir_path, suffix, recursive)


def paired_paths_from_folder(folders: List[str], keys: List[str], filename_tmpl: str):
    """Pair files in (lq_folder, gt_folder) by stem (data_util.py:208-260)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    input_paths = sorted(scandir(input_folder))
    gt_paths = sorted(scandir(gt_folder))
    assert len(input_paths) == len(gt_paths), (
        f"{input_key} and {gt_key} datasets have different number of images: "
        f"{len(input_paths)}, {len(gt_paths)}."
    )
    paths = []
    for gt_path in gt_paths:
        basename, ext = osp.splitext(osp.basename(gt_path))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        input_path = osp.join(input_folder, input_name)
        if not osp.exists(input_path):
            # fall back to index pairing when stems differ (LOLv2-style dirs)
            input_path = osp.join(input_folder, input_paths[len(paths)])
        paths.append(
            {f"{input_key}_path": input_path, f"{gt_key}_path": osp.join(gt_folder, gt_path)}
        )
    return paths


def paired_paths_from_meta_info_file(folders, keys, meta_info_file, filename_tmpl):
    """(data_util.py:158-205)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    with open(meta_info_file, "r") as f:
        gt_names = [line.strip().split(" ")[0] for line in f if line.strip()]
    paths = []
    for gt_name in gt_names:
        basename, ext = osp.splitext(osp.basename(gt_name))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        paths.append(
            {
                f"{input_key}_path": osp.join(input_folder, input_name),
                f"{gt_key}_path": osp.join(gt_folder, gt_name),
            }
        )
    return paths


def paired_paths_from_lmdb(folders, keys):
    """(data_util.py:92-155)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    if not (input_folder.endswith(".lmdb") and gt_folder.endswith(".lmdb")):
        raise ValueError(f"{input_key} and {gt_key} folders must both end with .lmdb")
    with open(osp.join(input_folder, "meta_info.txt")) as f:
        input_keys = [line.split(".png")[0] for line in f]
    with open(osp.join(gt_folder, "meta_info.txt")) as f:
        gt_keys = [line.split(".png")[0] for line in f]
    if set(input_keys) != set(gt_keys):
        raise ValueError(f"Keys in {input_key} and {gt_key} folders differ.")
    return [
        {f"{input_key}_path": k, f"{gt_key}_path": k} for k in sorted(input_keys)
    ]


def paired_DP_paths_from_folder(folders, keys, filename_tmpl):
    """Triple (lqL, lqR, gt) paths paired by GT stem (data_util.py:255-303)."""
    assert len(folders) == 3 and len(keys) == 3
    inputL_folder, inputR_folder, gt_folder = folders
    inputL_paths = sorted(scandir(inputL_folder))
    inputR_paths = sorted(scandir(inputR_folder))
    gt_paths = sorted(scandir(gt_folder))
    assert len(inputL_paths) == len(inputR_paths) == len(gt_paths), (
        f"{keys} datasets have different number of images: "
        f"{len(inputL_paths)}, {len(inputR_paths)}, {len(gt_paths)}."
    )
    paths = []
    for idx, gt_path in enumerate(gt_paths):
        basename, _ = osp.splitext(osp.basename(gt_path))
        _, extL = osp.splitext(osp.basename(inputL_paths[idx]))
        nameL = f"{filename_tmpl.format(basename)}{extL}"
        assert nameL in inputL_paths, f"{nameL} is not in {keys[0]}_paths."
        _, extR = osp.splitext(osp.basename(inputR_paths[idx]))
        nameR = f"{filename_tmpl.format(basename)}{extR}"
        assert nameR in inputR_paths, f"{nameR} is not in {keys[1]}_paths."
        paths.append({
            f"{keys[0]}_path": osp.join(inputL_folder, nameL),
            f"{keys[1]}_path": osp.join(inputR_folder, nameR),
            f"{keys[2]}_path": osp.join(gt_folder, gt_path),
        })
    return paths
