"""Device mesh construction for the codec pipelines."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(shape: tuple[int, ...], axis_names: tuple[str, ...],
              devices=None) -> Mesh:
    """Build a Mesh of the given logical shape over the first
    prod(shape) devices."""
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, axis_names)


def codec_mesh(n_devices: int | None = None, seg_parallel: int | None = None,
               devices=None) -> Mesh:
    """Standard codec mesh: ('data', 'seg').

    'data' shards frames (DP analog), 'seg' shards restart segments within
    a frame (SP analog). seg_parallel defaults to the largest power-of-two
    divisor of n_devices up to 4."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if seg_parallel is None:
        seg_parallel = 1
        for cand in (4, 2):
            if n_devices % cand == 0:
                seg_parallel = cand
                break
    return make_mesh((n_devices // seg_parallel, seg_parallel),
                     ("data", "seg"), devices[:n_devices])
