"""Convert ODI's shipped .obj meshes (reference
``transferattack/input_transformation/odi/obj/``) into padded numpy arrays
for the JAX rasterizer (``transferattack_tpu/ops/render3d.py``).

Quads are fan-triangulated; vertex normals are area-weighted face-normal
averages.  Output: ``transferattack_tpu/assets/odi/<name>.npz`` with
verts (V,3) f32, uvs (T,2) f32, faces_v/faces_vt/faces_vn (F,3) i32,
normals (V,3) f32.
"""
import os
import sys

import numpy as np

REF = "/root/reference/transferattack/input_transformation/odi/obj"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "transferattack_tpu", "assets", "odi")

# reference model_settings (odi.py:308-318): name → obj file
OBJECTS = {
    "pack": "pack.obj",
    "cup": "cup.obj",
    "pillow": "pillow.obj",
    "t_shirt": "t_shirt_lowpoly.obj",
    "book": "book.obj",
    "1ball": "1ball.obj",
    "2ball": "2ball.obj",
    "3ball": "3ball.obj",
    "4ball": "4ball.obj",
}


def parse_obj(path):
    verts, uvs, faces = [], [], []
    for line in open(path, errors="ignore"):
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v":
            verts.append([float(v) for v in parts[1:4]])
        elif parts[0] == "vt":
            uvs.append([float(v) for v in parts[1:3]])
        elif parts[0] == "f":
            idx = []
            for tok in parts[1:]:
                sub = tok.split("/")
                vi = int(sub[0])
                ti = int(sub[1]) if len(sub) > 1 and sub[1] else vi
                idx.append((vi - 1, ti - 1))
            for k in range(1, len(idx) - 1):  # fan triangulation
                faces.append([idx[0], idx[k], idx[k + 1]])
    v = np.asarray(verts, np.float32)
    t = np.asarray(uvs, np.float32) if uvs else np.zeros((1, 2), np.float32)
    fv = np.asarray([[a[0] for a in f] for f in faces], np.int32)
    ft = np.asarray([[a[1] for a in f] for f in faces], np.int32)
    return v, t, fv, ft


def vertex_normals(v, fv):
    n = np.zeros_like(v)
    p0, p1, p2 = v[fv[:, 0]], v[fv[:, 1]], v[fv[:, 2]]
    face_n = np.cross(p1 - p0, p2 - p0)  # area-weighted
    for k in range(3):
        np.add.at(n, fv[:, k], face_n)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return (n / np.maximum(norm, 1e-12)).astype(np.float32)


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, fn in OBJECTS.items():
        path = os.path.join(REF, fn)
        if not os.path.exists(path):
            print(f"skip {name}: {path} missing")
            continue
        v, t, fv, ft = parse_obj(path)
        n = vertex_normals(v, fv)
        out = os.path.join(OUT, f"{name}.npz")
        np.savez_compressed(out, verts=v, uvs=t, faces_v=fv, faces_vt=ft,
                            normals=n)
        print(f"{name}: V={len(v)} T={len(t)} F={len(fv)} → {out} "
              f"({os.path.getsize(out) // 1024} KiB)")


if __name__ == "__main__":
    main()
