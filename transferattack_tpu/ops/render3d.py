"""Static-shape 3D mesh rasterizer for ODI (reference
``transferattack/input_transformation/odi/odi.py:238-430`` which uses
pytorch3d; no JAX equivalent exists, so this is a from-scratch TPU renderer).

Design: meshes are pre-converted vertex/uv/normal arrays
(``scripts/convert_odi_meshes.py`` → ``transferattack_tpu/assets/odi``);
the camera is a look-at + FoV-perspective transform; rasterization is a
``lax.scan`` z-buffer over fixed-size face chunks (every shape static, all
per-chunk work vectorized (chunk × pixels) for the VPU); shading is Phong
ambient+diffuse with a point light (ODI config 101 sets specular to 0);
texturing samples the adversarial image inserted into the object's texture
canvas, so gradients flow to the attack delta through the bilinear UV
gather — geometry is constant w.r.t. the input, matching pytorch3d's
behavior under ODI (only the texture is adversarial).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "odi")

# reference model_settings (odi.py:308-318):
# name → (canvas x, y, w, h, base distance, base elev, base azim, translation)
ODI_MODEL_SETTINGS = {
    "pack": (255, 255, 510, 510, 1.2, 0.0, 0.0, (0.0, 0.02, 0.0)),
    "cup": (693, 108, 260, 260, 1.7, 0.0, 0.0, (0.0, -0.1, 0.0)),
    "pillow": (10, 10, 470, 470, 1.7, 0.0, 0.0, (0.0, 0.0, 0.0)),
    "t_shirt": (180, 194, 240, 240, 1.2, 0.0, 0.0, (0.0, 0.05, 0.0)),
    "book": (715, 66, 510, 510, 1.3, 0.0, 0.0, (0.3, 0.0, 0.0)),
    "1ball": (359, 84, 328, 328, 2.1, -40.0, -10.0, (0.0, 0.0, 0.0)),
}
# texture-map canvas sizes of the shipped .mtl textures
ODI_TEXTURE_SIZES = {
    "pack": (1024, 1024), "cup": (512, 1024), "pillow": (512, 512),
    "t_shirt": (512, 1024), "book": (847, 1280), "1ball": (512, 1024),
}


class Mesh(NamedTuple):
    # per-face gathered attributes, padded to a chunk multiple with
    # degenerate (zero-area) faces
    tri_pos: jnp.ndarray    # (F, 3, 3) vertex positions
    tri_uv: jnp.ndarray     # (F, 3, 2) vertex uvs
    tri_normal: jnp.ndarray  # (F, 3, 3) vertex normals


def load_mesh(name: str, chunk: int = 256) -> Mesh:
    data = np.load(os.path.join(ASSET_DIR, f"{name}.npz"))
    v, uv, n = data["verts"], data["uvs"], data["normals"]
    fv, ft = data["faces_v"], data["faces_vt"]
    # normalize the object into a unit-ish box centered at the origin the way
    # pytorch3d's shipped meshes already are (they are modeled around origin)
    tri_pos = v[fv]           # (F, 3, 3)
    tri_uv = uv[ft]           # (F, 3, 2)
    tri_n = n[fv]             # (F, 3, 3)
    F = len(tri_pos)
    pad = (-F) % chunk
    if pad:
        tri_pos = np.concatenate([tri_pos, np.zeros((pad, 3, 3), np.float32)])
        tri_uv = np.concatenate([tri_uv, np.zeros((pad, 3, 2), np.float32)])
        tri_n = np.concatenate([tri_n, np.zeros((pad, 3, 3), np.float32)])
    return Mesh(jnp.asarray(tri_pos), jnp.asarray(tri_uv), jnp.asarray(tri_n))


def look_at(dist, elev_deg, azim_deg, translation):
    """pytorch3d ``look_at_view_transform`` (degrees, up=+y, at=origin):
    returns (R, T) with world→view ``x_v = x_w @ R + T``."""
    elev = jnp.deg2rad(elev_deg)
    azim = jnp.deg2rad(azim_deg)
    cam = dist * jnp.stack([
        jnp.sin(azim) * jnp.cos(elev),
        jnp.sin(elev),
        jnp.cos(azim) * jnp.cos(elev),
    ])
    at = jnp.zeros(3)
    up = jnp.asarray([0.0, 1.0, 0.0])
    z = at - cam
    z = z / (jnp.linalg.norm(z) + 1e-12)
    x = jnp.cross(up, z)
    x = x / (jnp.linalg.norm(x) + 1e-12)
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z], axis=1)  # columns = view axes
    T = -cam @ R + jnp.asarray(translation)
    return R, T


def tilt_matrix(angle_deg):
    """In-plane camera roll (the reference's rand_angle z-rotation)."""
    a = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, zero]),
        jnp.stack([s, c, zero]),
        jnp.stack([zero, zero, one]),
    ])


def rasterize(mesh: Mesh, R, T, H: int = 224, W: int = 224,
              fov_deg: float = 60.0, chunk: int = 256):
    """Z-buffer rasterization.  Returns per-pixel (hit, face_id, bary) with
    static shapes; the scan carry is one (z, id, bary) record per pixel."""
    P = H * W
    tri_view = mesh.tri_pos @ R + T  # (F, 3, 3)
    zv = tri_view[..., 2]
    tanf = jnp.tan(jnp.deg2rad(fov_deg) / 2.0)
    zsafe = jnp.maximum(zv, 1e-4)
    sx = tri_view[..., 0] / (tanf * zsafe)
    sy = tri_view[..., 1] / (tanf * zsafe)

    ys = jnp.linspace(1.0 - 1.0 / H, -1.0 + 1.0 / H, H)  # +y up
    xs = jnp.linspace(-1.0 + 1.0 / W, 1.0 - 1.0 / W, W)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    px, py = px.reshape(-1), py.reshape(-1)  # (P,)

    n_chunks = sx.shape[0] // chunk
    xs_c = sx.reshape(n_chunks, chunk, 3)
    ys_c = sy.reshape(n_chunks, chunk, 3)
    zs_c = zv.reshape(n_chunks, chunk, 3)

    def body(carry, inputs):
        best_z, best_fid, best_b0, best_b1 = carry
        ci, x3, y3, z3 = inputs
        x0, x1, x2 = x3[:, 0:1], x3[:, 1:2], x3[:, 2:3]  # (C, 1)
        y0, y1, y2 = y3[:, 0:1], y3[:, 1:2], y3[:, 2:3]
        # signed edge functions against every pixel (C, P)
        w0 = (x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)
        w1 = (x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)
        w2 = (x0 - px) * (y1 - py) - (x1 - px) * (y0 - py)
        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        s = jnp.sign(area)
        inside = (w0 * s >= 0) & (w1 * s >= 0) & (w2 * s >= 0) & \
            (jnp.abs(area) > 1e-9)
        inv = 1.0 / jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
        b0, b1, b2 = w0 * inv, w1 * inv, w2 * inv
        # perspective-incorrect screen-space depth interpolation (matches
        # faces_per_pixel=1 hard rasterization closely enough at ODI's FoV)
        z = b0 * z3[:, 0:1] + b1 * z3[:, 1:2] + b2 * z3[:, 2:3]
        z = jnp.where(inside & (z > 1e-3), z, jnp.inf)
        kmin = jnp.argmin(z, axis=0)  # (P,)
        pidx = jnp.arange(z.shape[1])
        zmin = z[kmin, pidx]
        better = zmin < best_z
        fid = ci * chunk + kmin
        carry = (
            jnp.where(better, zmin, best_z),
            jnp.where(better, fid, best_fid),
            jnp.where(better, b0[kmin, pidx], best_b0),
            jnp.where(better, b1[kmin, pidx], best_b1),
        )
        return carry, None

    init = (jnp.full((P,), jnp.inf), jnp.zeros((P,), jnp.int32),
            jnp.zeros((P,)), jnp.zeros((P,)))
    (z, fid, b0, b1), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks), xs_c, ys_c, zs_c))
    hit = jnp.isfinite(z)
    b2 = 1.0 - b0 - b1
    return hit, fid, jnp.stack([b0, b1, b2], axis=-1)


def shade(mesh: Mesh, hit, fid, bary, texture, light_pos, ambient, diffuse,
          H: int = 224, W: int = 224):
    """Phong ambient+diffuse with the adversarial texture (specular is 0 in
    ODI config 101).  ``texture``: (th, tw, 3) with v=0 at the bottom row
    (OBJ/pytorch3d convention); gradients flow texture→pixels."""
    tri_uv = mesh.tri_uv[fid]       # (P, 3, 2)
    tri_n = mesh.tri_normal[fid]    # (P, 3, 3)
    tri_p = mesh.tri_pos[fid]       # (P, 3, 3)
    uv = jnp.einsum("pk,pkc->pc", bary, tri_uv)
    normal = jnp.einsum("pk,pkc->pc", bary, tri_n)
    normal = normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-12)
    point = jnp.einsum("pk,pkc->pc", bary, tri_p)

    th, tw = texture.shape[0], texture.shape[1]
    tu = jnp.clip(uv[:, 0], 0.0, 1.0) * (tw - 1)
    tv = (1.0 - jnp.clip(uv[:, 1], 0.0, 1.0)) * (th - 1)
    u0 = jnp.floor(tu)
    v0 = jnp.floor(tv)
    du = (tu - u0)[:, None]
    dv = (tv - v0)[:, None]
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, tw - 1)
    v1 = jnp.minimum(v0 + 1, th - 1)
    tex = (texture[v0, u0] * (1 - du) * (1 - dv)
           + texture[v0, u1] * du * (1 - dv)
           + texture[v1, u0] * (1 - du) * dv
           + texture[v1, u1] * du * dv)

    ldir = light_pos[None] - point
    ldir = ldir / (jnp.linalg.norm(ldir, axis=-1, keepdims=True) + 1e-12)
    # double-sided shading (pytorch3d does not cull back faces here)
    ndl = jnp.abs(jnp.sum(normal * ldir, axis=-1, keepdims=True))
    color = tex * (ambient + diffuse * ndl)
    color = jnp.where(hit[:, None], color, -1.0)
    return color.reshape(H, W, 3)


def render_odi(img, mesh: Mesh, settings, tex_size, key,
               H: int = 224, W: int = 224):
    """One ODI render (``odi.py:345-430``): random solid texture with the
    adversarial image inserted into the object's canvas, random camera
    (elev/azim/tilt ±35°, dist·U(0.8,1.2)), random point light, random-pixel
    background.  ``img``: (h, w, 3) single image in [0, 1]."""
    (cx, cy, cw, ch, base_dist, base_elev, base_azim, trans) = settings
    th, tw = tex_size
    keys = jax.random.split(key, 8)
    solid = jax.random.uniform(keys[0], (1, 1, 3)) * 0.6 + 0.1
    texture = jnp.ones((th, tw, 3)) * solid
    patch = jax.image.resize(img, (ch, cw, 3), method="bilinear")
    texture = jax.lax.dynamic_update_slice(texture, patch, (cy, cx, 0))

    elev = base_elev + jax.random.randint(keys[1], (), -35, 36)
    azim = base_azim + jax.random.randint(keys[2], (), -35, 36)
    dist = base_dist * (0.8 + 0.4 * jax.random.uniform(keys[3], ()))
    angle = jax.random.randint(keys[4], (), -35, 36).astype(jnp.float32)
    R, T = look_at(dist, jnp.float32(elev), jnp.float32(azim), trans)
    R = R @ tilt_matrix(angle).T

    light = (jnp.asarray([0.0, 0.0, 4.0])
             + jax.random.uniform(keys[5], (3,)) * 4.0 - 2.0)
    ambient = 0.6 + jax.random.uniform(keys[6], ()) * 0.3
    diffuse = 0.0 + jax.random.uniform(keys[7], ()) * 0.5

    hit, fid, bary = rasterize(mesh, R, T, H, W)
    rendered = shade(mesh, hit, fid, bary, texture, light, ambient, diffuse,
                     H, W)
    mask = 1.0 - (jnp.sum(rendered, axis=-1, keepdims=True) == -3.0)\
        .astype(img.dtype)
    rendered = jnp.clip(rendered, 0.0, 1.0)
    background = jax.random.uniform(jax.random.fold_in(key, 99),
                                    rendered.shape, img.dtype)
    return background * (1 - mask) + rendered * mask
