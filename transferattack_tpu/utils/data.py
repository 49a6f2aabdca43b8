"""Host-side data pipeline (reference: ``transferattack/utils.py:108-153``).

Images are decoded on host CPU into NHWC float32 ``[0, 1]`` numpy batches; the
device boundary is a single ``jnp.asarray`` per batch.  Layout is NHWC (TPU
conv-friendly) rather than the reference's NCHW.
"""
from __future__ import annotations

import csv
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image


def _read_labels(path: str) -> Tuple[List[str], np.ndarray, Optional[np.ndarray]]:
    """Parse ``labels.csv`` with columns ``filename,label[,targeted_label]``.

    Mirrors the reference loader (``utils.py:142-153``) including its
    label-offset convention: the CSV stores 1-indexed classes, the loader
    subtracts 1.
    """
    names: List[str] = []
    labels: List[int] = []
    tlabels: List[int] = []
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        has_target = len(header) >= 3
        for row in reader:
            if not row:
                continue
            names.append(row[0])
            labels.append(int(row[1]) - 1)
            if has_target:
                tlabels.append(int(row[2]) - 1)
    t = np.asarray(tlabels, np.int32) if has_target else None
    return names, np.asarray(labels, np.int32), t


def load_image(path: str, size: Tuple[int, int] = (224, 224)) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    if img.size != (size[1], size[0]):
        img = img.resize((size[1], size[0]), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


class AdvDataset:
    """The 1000-image benchmark set (reference ``AdvDataset``, ``utils.py:108``).

    ``targeted=True`` uses the third CSV column (or, for generation attacks,
    ``target_class`` overrides every label).  ``eval_mode=True`` reads
    adversarial PNGs from ``output_dir`` while labels come from ``input_dir``
    (``utils.py:115-118``).
    """

    def __init__(
        self,
        input_dir: str,
        output_dir: str = "",
        targeted: bool = False,
        target_class: Optional[int] = None,
        eval_mode: bool = False,
        size: Tuple[int, int] = (224, 224),
    ):
        self.input_dir = input_dir
        self.image_dir = output_dir if eval_mode else os.path.join(input_dir, "images")
        self.size = size
        names, labels, tlabels = _read_labels(os.path.join(input_dir, "labels.csv"))
        self.names = names
        if targeted:
            if target_class is not None:
                self.labels = np.full(len(names), target_class, np.int32)
                self.orig_labels = labels
            else:
                if tlabels is None:
                    raise ValueError("targeted run needs a targeted_label CSV column")
                # targeted mode keeps (label, target) pairs like the reference
                self.labels = np.stack([labels, tlabels], axis=1)
                self.orig_labels = labels
        else:
            self.labels = labels
            self.orig_labels = labels

    def __len__(self) -> int:
        return len(self.names)

    def __getitem__(self, i: int):
        x = load_image(os.path.join(self.image_dir, self.names[i]), self.size)
        return x, self.labels[i], self.names[i]

    def as_batches(
        self, batch_size: int
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, List[str]]]:
        for start in range(0, len(self), batch_size):
            idx = range(start, min(start + batch_size, len(self)))
            xs = np.stack([self[i][0] for i in idx])
            ys = np.stack([self.labels[i] for i in idx])
            names = [self.names[i] for i in idx]
            yield xs, ys, names


def save_images(output_dir: str, images: np.ndarray, names: List[str]) -> None:
    """Write uint8 PNGs (reference ``utils.py:63-66``). ``images``: NHWC [0,1]."""
    os.makedirs(output_dir, exist_ok=True)
    arr = np.asarray(images)
    arr = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    for img, name in zip(arr, names):
        Image.fromarray(img).save(os.path.join(output_dir, name))
