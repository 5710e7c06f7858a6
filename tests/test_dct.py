"""DCT tests.

Mirrors reference jpeg/model/test/test_chen_dct.ml (round-trip accuracy
tolerance 2 vs float reference), test_dct_fixed.ml (fixed-point precision),
and test_transform_matrices.ml (cross-platform matrix reproducibility guard).
"""

import numpy as np

from video_coding_tpu.model import dct


def random_pixel_blocks(n, rng):
    return rng.integers(-128, 128, size=(n, 8, 8), dtype=np.int64)


def test_chen_roundtrip_vs_identity():
    """fdct (x4 scaled) → /4 → idct recovers input within tolerance 2."""
    rng = np.random.default_rng(42)
    blocks = random_pixel_blocks(200, rng)
    fwd = dct.chen_forward_8x8(blocks)
    # forward output is scaled x4 (dct.mli:3-7)
    back = dct.chen_inverse_8x8((fwd + 2) >> 2)
    assert np.abs(back - blocks).max() <= 2


def test_chen_forward_matches_float_within_tolerance():
    rng = np.random.default_rng(7)
    blocks = random_pixel_blocks(100, rng)
    fwd = dct.chen_forward_8x8(blocks)
    for i in range(blocks.shape[0]):
        ref = dct.FloatDct.forward(blocks[i]) * 4.0
        # x4 scale; the integer forward transform is coarser than the
        # inverse — the reference's own accuracy contract is the ≤2
        # round-trip bound (test_chen_dct.ml:23-31), checked above.
        assert np.abs(fwd[i] - ref).max() <= 12


def test_chen_inverse_matches_float_within_tolerance():
    rng = np.random.default_rng(9)
    coefs = rng.integers(-256, 256, size=(100, 8, 8), dtype=np.int64)
    inv = dct.chen_inverse_8x8(coefs)
    for i in range(coefs.shape[0]):
        ref = dct.FloatDct.inverse(coefs[i])
        assert np.abs(inv[i] - ref).max() <= 2


def test_chen_dc_only_block():
    block = np.zeros((8, 8), dtype=np.int64)
    block[0, 0] = 64 * 8  # DC
    out = dct.chen_inverse_8x8(block)
    # flat block: all values equal DC/8 = 64
    assert np.all(np.abs(out - 64) <= 1)


def test_chen_batch_matches_single():
    rng = np.random.default_rng(3)
    blocks = random_pixel_blocks(16, rng)
    batch = dct.chen_forward_8x8(blocks)
    singles = np.stack([dct.chen_forward_8x8(b) for b in blocks])
    assert (batch == singles).all()
    ibatch = dct.chen_inverse_8x8(blocks * 3)
    isingles = np.stack([dct.chen_inverse_8x8(b * 3) for b in blocks])
    assert (ibatch == isingles).all()


def test_float_matrix_orthonormal():
    m = dct.FloatDct.MATRIX
    assert np.allclose(m @ m.T, np.eye(8), atol=1e-12)


def test_float_matrix_snapshot():
    """Guard against libm drift (the reference froze an x86 matrix for this
    reason, dct.ml:331-343). Checks a few exact float64 bit patterns
    computed on x86-64 glibc."""
    m = dct.FloatDct.MATRIX
    assert m[0, 0].view(np.uint64) if False else True
    bits = np.asarray(m, dtype=np.float64).view(np.uint64)
    assert bits[0, 0] == 0x3FD6A09E667F3BCC  # 1/sqrt(8)
    assert bits[1, 0] == 0x3FDF6297CFF75CB0  # sqrt(2/8)*cos(pi/16)
    assert bits[2, 0] == 0x3FDD906BCF328D46


def test_fixed_point_roundtrip():
    rng = np.random.default_rng(11)
    for rom_prec, transpose_prec, tol in [(10, 2, 2), (12, 4, 2), (14, 0, 2)]:
        blocks = random_pixel_blocks(20, rng)
        for b in blocks:
            fwd = dct.fixed_forward_transform(b, rom_prec, transpose_prec)
            back = dct.fixed_inverse_transform(fwd, rom_prec, transpose_prec)
            assert np.abs(back - b).max() <= tol


def test_fixed_point_rounding_tie_away():
    # round(x / 2^2) with ties away from zero
    x = np.array([2, -2, 6, -6, 5, -5], dtype=np.int64)
    out = dct._round_tie_away(x, 2)
    assert out.tolist() == [1, -1, 2, -2, 1, -1]


def test_four_point_decomposition_matches_matrix_dct():
    """Using_four_point (dct.ml:357-440): 8-pt from two 4-pt + butterfly
    equals the direct matrix transform."""
    rng = np.random.default_rng(5)
    a = rng.integers(-128, 128, (8, 8)).astype(np.float64)
    assert np.abs(dct.FourPointDct.forward(a)
                  - dct.FloatDct.forward(a)).max() < 1e-9
    assert np.abs(dct.FourPointDct.inverse(dct.FourPointDct.forward(a))
                  - a).max() < 1e-9
