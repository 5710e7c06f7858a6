"""On-device chroma upsampling and color conversion.

The production tail of a decode-for-training pipeline: decoded YUV planes
(already in HBM) → 4:4:4 → RGB tensors, without a host round trip. The
resampling kernels are bit-identical to the CPU tools
(tools/planar_444.py, mirroring reference tools/src/planar_444.ml
avg2/avg4 co-located kernels with edge replication).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _avg2(a, b):
    return (a.astype(jnp.int32) + b.astype(jnp.int32) + 1) >> 1


def _avg4(a, b, c, d):
    return (a.astype(jnp.int32) + b + c + d + 2) >> 2


def upsample_h2(plane):
    """(h, w) → (h, 2w): planar_444.ml supersample_h2 semantics."""
    right = jnp.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)
    h, w = plane.shape
    out = jnp.stack([plane.astype(jnp.int32), _avg2(plane, right)], axis=2)
    return out.reshape(h, 2 * w)


def upsample_hv2(plane):
    """(h, w) → (2h, 2w): planar_444.ml supersample_hv2 semantics."""
    b = jnp.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)
    c = jnp.concatenate([plane[1:, :], plane[-1:, :]], axis=0)
    d = jnp.concatenate([b[1:, :], b[-1:, :]], axis=0)
    h, w = plane.shape
    p = plane.astype(jnp.int32)
    top = jnp.stack([p, _avg2(plane, b)], axis=2).reshape(h, 2 * w)
    bot = jnp.stack([_avg2(plane, c), _avg4(plane, b, c, d)],
                    axis=2).reshape(h, 2 * w)
    return jnp.stack([top, bot], axis=1).reshape(2 * h, 2 * w)


def upsample_v2(plane):
    """(h, w) → (2h, w): vertical-only supersample (the 4:4:0 analog of
    supersample_h2 — planar_444.ml has no 440 mode; same replicate-then-
    average-with-next semantics along the column axis)."""
    below = jnp.concatenate([plane[1:, :], plane[-1:, :]], axis=0)
    h, w = plane.shape
    out = jnp.stack([plane.astype(jnp.int32), _avg2(plane, below)],
                    axis=1)
    return out.reshape(2 * h, w)


def downsample_h2(plane):
    """(h, 2w) → (h, w): subsample_h2."""
    return _avg2(plane[:, 0::2], plane[:, 1::2])


def downsample_hv2(plane):
    """(2h, 2w) → (h, w): subsample_hv2."""
    return _avg4(plane[0::2, 0::2], plane[0::2, 1::2],
                 plane[1::2, 0::2], plane[1::2, 1::2])


def yuv444_to_rgb(y, u, v, dtype=jnp.uint8):
    """BT.601 full-range YUV→RGB, (h, w) planes → (h, w, 3)."""
    yf = y.astype(jnp.float32)
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(dtype)


@jax.jit
def yuv420_to_rgb(y, u, v):
    """Decoded 4:2:0 planes → (h, w, 3) uint8 RGB, all on device."""
    return yuv444_to_rgb(y, upsample_hv2(u), upsample_hv2(v))


@jax.jit
def yuv422_to_rgb(y, u, v):
    return yuv444_to_rgb(y, upsample_h2(u), upsample_h2(v))
