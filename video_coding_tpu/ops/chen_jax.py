"""Integer Chen DCT butterflies in JAX, coefficient-major layout.

Bit-exact re-expression of the golden model's integer transforms
(model/dct.py, mirroring reference jpeg/model/src/dct.ml Chen) as pure
jnp int32 ops on (8, 8, N) tiles:

- axis 0 = block row (0..7), axis 1 = block column (0..7), axis 2 = batch
  lane. Every butterfly stage is an elementwise op between (8, N) slices —
  the natural VPU shape. The same functions serve both the XLA path and the
  Pallas kernel bodies (traced inside the kernel over VMEM-resident arrays).

int32 range contract: inputs must fit the accelerator coefficient width
(12-bit signed dequantized coefficients, like the reference RTL datapath —
jpeg/hardcaml/src/codeblock_decoder.ml Idct_coefs coef[11:0] and
dct.ml Idct_config input_bits=12); then every intermediate fits int32.
"""

from __future__ import annotations

import jax.numpy as jnp

W1 = 2841
W2 = 2676
W3 = 2408
W5 = 1609
W6 = 1108
W7 = 565


def _mul181_shift8(a):
    """Exact (181*a + 128) >> 8 without int32 overflow.

    |a| can reach ~2^27 in the column pass with worst-case 12-bit
    coefficients, overflowing 181*a in int32. Split a = ah*2^16 + al
    (al = low 16 bits, non-negative); 181*ah*2^16 is 256-aligned, so the
    arithmetic shift distributes exactly:
        (181*a + 128) >> 8 == 181*ah*256 + ((181*al + 128) >> 8).
    """
    ah = a >> 16
    al = a & 0xFFFF
    return 181 * ah * 256 + ((181 * al + 128) >> 8)


def _idct_pass_rows(b):
    """Horizontal Chen IDCT pass: transform along axis 1 (columns within a
    row), vectorized over axis 0 (rows) and axis 2 (lanes).

    b: (8, 8, N) int32 — b[r, c, n]. Mirrors model/dct.py _idct_rows."""
    x0 = (b[:, 0] << 11) + 128
    x1 = b[:, 4] << 11
    x2 = b[:, 6]
    x3 = b[:, 2]
    x4 = b[:, 1]
    x5 = b[:, 7]
    x6 = b[:, 5]
    x7 = b[:, 3]
    x8 = W7 * (x4 + x5)
    x4 = x8 + (W1 - W7) * x4
    x5 = x8 - (W1 + W7) * x5
    x8 = W3 * (x6 + x7)
    x6 = x8 - (W3 - W5) * x6
    x7 = x8 - (W3 + W5) * x7
    x8 = x0 + x1
    x0 = x0 - x1
    x1 = W6 * (x3 + x2)
    x2 = x1 - (W2 + W6) * x2
    x3 = x1 + (W2 - W6) * x3
    x1 = x4 + x6
    x4 = x4 - x6
    x6 = x5 + x7
    x5 = x5 - x7
    x7 = x8 + x3
    x8 = x8 - x3
    x3 = x0 + x2
    x0 = x0 - x2
    x2 = _mul181_shift8(x4 + x5)
    x4 = _mul181_shift8(x4 - x5)
    return jnp.stack([
        (x7 + x1) >> 8,
        (x3 + x2) >> 8,
        (x0 + x4) >> 8,
        (x8 + x6) >> 8,
        (x8 - x6) >> 8,
        (x0 - x4) >> 8,
        (x3 - x2) >> 8,
        (x7 - x1) >> 8,
    ], axis=1)


def _idct_pass_cols(b):
    """Vertical Chen IDCT pass: transform along axis 0 (rows), vectorized
    over axis 1 and lanes. Mirrors model/dct.py _idct_cols."""
    x0 = (b[0] << 8) + 8192
    x1 = b[4] << 8
    x2 = b[6]
    x3 = b[2]
    x4 = b[1]
    x5 = b[7]
    x6 = b[5]
    x7 = b[3]
    x8 = (W7 * (x4 + x5)) + 4
    x4 = (x8 + (W1 - W7) * x4) >> 3
    x5 = (x8 - (W1 + W7) * x5) >> 3
    x8 = (W3 * (x6 + x7)) + 4
    x6 = (x8 - (W3 - W5) * x6) >> 3
    x7 = (x8 - (W3 + W5) * x7) >> 3
    x8 = x0 + x1
    x0 = x0 - x1
    x1 = (W6 * (x3 + x2)) + 4
    x2 = (x1 - (W2 + W6) * x2) >> 3
    x3 = (x1 + (W2 - W6) * x3) >> 3
    x1 = x4 + x6
    x4 = x4 - x6
    x6 = x5 + x7
    x5 = x5 - x7
    x7 = x8 + x3
    x8 = x8 - x3
    x3 = x0 + x2
    x0 = x0 - x2
    x2 = _mul181_shift8(x4 + x5)
    x4 = _mul181_shift8(x4 - x5)
    return jnp.stack([
        (x7 + x1) >> 14,
        (x3 + x2) >> 14,
        (x0 + x4) >> 14,
        (x8 + x6) >> 14,
        (x8 - x6) >> 14,
        (x0 - x4) >> 14,
        (x3 - x2) >> 14,
        (x7 - x1) >> 14,
    ], axis=0)


def chen_inverse(b):
    """Full integer Chen IDCT on an (8, 8, N) int32 tile: rows pass then
    columns pass (dct.ml:100-107 order, bit-exact)."""
    return _idct_pass_cols(_idct_pass_rows(b))


def _fdct_pass_cols(b):
    """Forward Chen pass along axis 0 (dct.ml dct_col:114-149)."""
    a0 = b[0] + b[7]
    c3 = b[0] - b[7]
    a1 = b[1] + b[6]
    c2 = b[1] - b[6]
    a2 = b[2] + b[5]
    c1 = b[2] - b[5]
    a3 = b[3] + b[4]
    c0 = b[3] - b[4]
    b0 = a0 + a3
    b1 = a1 + a2
    b2 = a1 - a2
    b3 = a0 - a3
    o0 = (362 * (b0 + b1)) >> 9
    o4 = (362 * (b0 - b1)) >> 9
    o2 = (196 * b2 + 473 * b3) >> 9
    o6 = (196 * b3 - 473 * b2) >> 9
    b0 = (362 * (c2 - c1)) >> 9
    b1 = (362 * (c2 + c1)) >> 9
    a0 = c0 + b0
    a1 = c0 - b0
    a2 = c3 - b1
    a3 = c3 + b1
    o1 = (100 * a0 + 502 * a3) >> 9
    o5 = (426 * a1 + 284 * a2) >> 9
    o3 = (426 * a2 - 284 * a1) >> 9
    o7 = (100 * a3 - 502 * a0) >> 9
    return jnp.stack([o0, o1, o2, o3, o4, o5, o6, o7], axis=0)


def _fdct_pass_rows(b):
    """Forward Chen pass along axis 1 (dct.ml dct_row:151-187)."""
    a0 = b[:, 0] + b[:, 7]
    c3 = b[:, 0] - b[:, 7]
    a1 = b[:, 1] + b[:, 6]
    c2 = b[:, 1] - b[:, 6]
    a2 = b[:, 2] + b[:, 5]
    c1 = b[:, 2] - b[:, 5]
    a3 = b[:, 3] + b[:, 4]
    c0 = b[:, 3] - b[:, 4]
    b0 = a0 + a3
    b1 = a1 + a2
    b2 = a1 - a2
    b3 = a0 - a3
    o0 = (362 * (b0 + b1)) >> 9
    o4 = (362 * (b0 - b1)) >> 9
    o2 = (196 * b2 + 473 * b3) >> 9
    o6 = (196 * b3 - 473 * b2) >> 9
    b0 = (362 * (c2 - c1)) >> 9
    b1 = (362 * (c2 + c1)) >> 9
    a0 = c0 + b0
    a1 = c0 - b0
    a2 = c3 - b1
    a3 = c3 + b1
    o1 = (100 * a0 + 502 * a3) >> 9
    o5 = (426 * a1 + 284 * a2) >> 9
    o3 = (426 * a2 - 284 * a1) >> 9
    o7 = (100 * a3 - 502 * a0) >> 9
    return jnp.stack([o0, o1, o2, o3, o4, o5, o6, o7], axis=1)


def chen_forward(b):
    """Full integer Chen fDCT (x4 scaled) on an (8, 8, N) int32 tile:
    columns pass then rows pass (dct.ml:189-196 order, bit-exact)."""
    return _fdct_pass_rows(_fdct_pass_cols(b))
