"""Generate a synthetic benchmark directory (images/ + labels.csv).

Mirrors the reference dataset layout (``transferattack/utils.py:108-153``):
``<dir>/images/*.png`` and ``<dir>/labels.csv`` with columns
``filename,label[,targeted_label]`` using 1-indexed classes.
"""
from __future__ import annotations

import csv
import os

import numpy as np
from PIL import Image


def make_fake_dataset(root: str, n: int = 8, size: int = 224,
                      num_classes: int = 1000, targeted: bool = False,
                      seed: int = 0) -> str:
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    for i in range(n):
        name = f"img_{i:04d}.png"
        arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        label = int(rng.randint(0, num_classes)) + 1  # 1-indexed CSV
        row = [name, label]
        if targeted:
            row.append(int(rng.randint(0, num_classes)) + 1)
        rows.append(row)
    with open(os.path.join(root, "labels.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filename", "label"] + (["targeted_label"] if targeted else []))
        w.writerows(rows)
    return root


if __name__ == "__main__":
    import sys

    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fake_data"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    make_fake_dataset(root, n=n)
    print(root)
