"""LMDB dataset creation (reference: basicsr/utils/lmdb_util.py, 199 LoC).

Gated on the lmdb package (not shipped in this image).
"""

from __future__ import annotations

import os


def make_lmdb_from_imgs(data_path, lmdb_path, img_path_list, keys,
                        batch: int = 5000, compress_level: int = 1,
                        map_size=None):
    """Write images into an lmdb with the BasicSR meta_info.txt convention."""
    try:
        import lmdb
    except ImportError as e:  # pragma: no cover
        raise ImportError("Please install lmdb to build lmdb datasets.") from e
    import cv2

    assert len(img_path_list) == len(keys)
    if not lmdb_path.endswith(".lmdb"):
        raise ValueError("lmdb_path must end with '.lmdb'.")
    if map_size is None:
        img = cv2.imread(os.path.join(data_path, img_path_list[0]),
                         cv2.IMREAD_UNCHANGED)
        _, img_byte = cv2.imencode(
            ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level]
        )
        map_size = img_byte.nbytes * len(img_path_list) * 10

    env = lmdb.open(lmdb_path, map_size=map_size)
    txn = env.begin(write=True)
    meta = []
    for idx, (path, key) in enumerate(zip(img_path_list, keys)):
        img = cv2.imread(os.path.join(data_path, path), cv2.IMREAD_UNCHANGED)
        h, w = img.shape[:2]
        c = 1 if img.ndim == 2 else img.shape[2]
        _, img_byte = cv2.imencode(
            ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level]
        )
        txn.put(key.encode("ascii"), img_byte)
        meta.append(f"{key}.png ({h},{w},{c}) {compress_level}\n")
        if idx % batch == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    env.close()
    with open(os.path.join(lmdb_path, "meta_info.txt"), "w") as f:
        f.writelines(meta)
