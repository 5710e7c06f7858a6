"""ops/lookup.py: the Mosaic in-register lane-gather table lookup."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_coding_tpu.ops import lookup


@pytest.mark.parametrize("tsize,n", [(528, 8192), (12, 999), (640, 128)])
def test_lookup_kernel_matches_gather(tsize, n):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 1 << 20, tsize).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, tsize, n).astype(np.int32))
    ref = np.asarray(tab)[np.asarray(idx)]
    k = -(-tsize // 128)
    tab128 = jnp.pad(tab, (0, k * 128 - tsize)).reshape(k, 128)
    got = np.asarray(lookup._lookup_pallas(tab128, idx, interpret=True))
    assert np.array_equal(got, ref)


def test_table_lookup_fallback_matches():
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.integers(0, 99, 37).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 37, (17, 5)).astype(np.int32))
    got = np.asarray(lookup.table_lookup(tab, idx))
    assert np.array_equal(got, np.asarray(tab)[np.asarray(idx)])
