"""Vendor the reference's shipped data assets (pattern:
``scripts/convert_odi_meshes.py``).

* RFCoA per-class robust features — reference
  ``transferattack/ensemble/rfcoa/{24..919}.npz`` (key ``array``,
  (1, 512, 7, 7) float32 NCHW) → ``transferattack_tpu/assets/rfcoa/<cls>.npz``
  with the array stored bit-for-bit (NCHW; the loader transposes to NHWC).
* AIM guide images — reference
  ``transferattack/generation/aim_related/{24..919}.JPEG`` →
  ``transferattack_tpu/assets/aim/<cls>.JPEG`` copied byte-for-byte
  (the reference decodes + PIL-resizes at attack time, ``aim.py:265-268``;
  so does the repo loader).
"""
import os
import shutil

import numpy as np

REF_RFCOA = "/root/reference/transferattack/ensemble/rfcoa"
REF_AIM = "/root/reference/transferattack/generation/aim_related"
PKG = os.path.join(os.path.dirname(__file__), "..", "transferattack_tpu")

CLASSES = [24, 99, 245, 344, 471, 555, 661, 701, 802, 919]


def main():
    out_rfcoa = os.path.join(PKG, "assets", "rfcoa")
    out_aim = os.path.join(PKG, "assets", "aim")
    os.makedirs(out_rfcoa, exist_ok=True)
    os.makedirs(out_aim, exist_ok=True)
    for cls in CLASSES:
        src = os.path.join(REF_RFCOA, f"{cls}.npz")
        if os.path.exists(src):
            arr = np.load(src)["array"]
            np.savez_compressed(os.path.join(out_rfcoa, f"{cls}.npz"), array=arr)
            print(f"rfcoa {cls}: {arr.shape} {arr.dtype}")
        else:
            print(f"rfcoa {cls}: MISSING at {src}")
        src = os.path.join(REF_AIM, f"{cls}.JPEG")
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(out_aim, f"{cls}.JPEG"))
            print(f"aim {cls}: {os.path.getsize(src)} bytes")
        else:
            print(f"aim {cls}: MISSING at {src}")


if __name__ == "__main__":
    main()
