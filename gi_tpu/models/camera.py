"""Eye-ray generation, mirroring the reference's per-pixel world-ray
construction (render.cpp:64-117): image plane at FOCUS_DEPTH spanned by
tan(FOV)-scaled camera axes, integer-pixel sampling (anti-aliasing comes from
supersampled rendering + box downsample, not pixel jitter), and uniform-disk
aperture jitter for depth of field.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import sampling as S
from ..scene.types import Scene
from ..utils.config import RenderConfig


def eye_rays(scene: Scene, cfg: RenderConfig, key, pixel_idx: jnp.ndarray,
             width: int, height: int, n_dof: int):
    """Generate rays for pixel indices [B] at supersampled resolution
    (width, height).  Returns (origins [B,n_dof,3], dirs [B,n_dof,3]).

    Pixel index = j * width + i with row j=0 at the image *bottom*
    (reference R2Image/PNG row order, R2Image.cpp:1390+).
    """
    cam = scene.camera
    i = (pixel_idx % width).astype(jnp.float32)
    j = (pixel_idx // width).astype(jnp.float32)

    fd = cfg.focus_depth
    far_org = cam.eye + cam.towards * fd
    far_right = cam.right * jnp.tan(cam.xfov) * fd
    far_up = cam.up * jnp.tan(cam.yfov) * fd

    dx = 2.0 * (i - 0.5 * width) / width     # render.cpp:96-97
    dy = 2.0 * (j - 0.5 * height) / height
    far_point = (far_org + far_right * dx[:, None] + far_up * dy[:, None])

    B = pixel_idx.shape[0]
    if cfg.depth_of_field:
        u = jax.random.uniform(key, (B, n_dof, 2))
        r1, r2 = S.uniform_disk(u[..., 0], u[..., 1])
        ap_u = cam.up * cfg.aperture_radius
        ap_v = cam.right * cfg.aperture_radius
        origins = (cam.eye + r1[..., None] * ap_u + r2[..., None] * ap_v)
    else:
        origins = jnp.broadcast_to(cam.eye, (B, n_dof, 3))
    dirs = S.normalize(far_point[:, None, :] - origins)
    return origins, dirs
