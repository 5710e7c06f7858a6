"""Fused block-datapath kernels: the TPU equivalent of the reference RTL
decoder/encoder datapaths.

Decode (reference Decoder_datapath, jpeg/hardcaml/src/decoder_datapath.ml:
codeblock→dequant→inverse-zigzag→IDCT→level shift):
    coefs (N, 64) zigzag int32  ×  quant (N, 64) zigzag int32
      → dequant → clamp to accelerator coef width → dezigzag
      → integer Chen IDCT → clip ±128 → +128 → pixels (N, 8, 8) int32.

Encode (reference Encoder_datapath, encoder_datapath.ml:129-187:
level-shift→fDCT→quant→RLE feed):
    pixels (N, 8, 8) uint8/int32  ×  quant (N, 64) zigzag int32
      → −128 → integer Chen fDCT (x4) → round-half-away quant
      → forward zigzag → qcoefs (N, 64) int32.

Both are bit-exact with the golden model (model/decoder.py, model/encoder.py)
for streams whose dequantized coefficients fit the 12-bit accelerator
coefficient width (the same width the reference RTL carries:
codeblock_decoder.ml Idct_coefs coef[11:0]).

Two implementations with identical semantics:
- ``*_jnp``: pure jnp graphs — XLA fuses the whole pipeline; runs anywhere.
- ``*_pallas``: hand-tiled Pallas TPU kernels in coefficient-major (8,8,N)
  layout, grid over lane tiles, VMEM-resident butterflies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..model.zigzag import FORWARD, INVERSE
from . import chen_jax

# Static permutations as numpy — baked into the jit'd graphs.
_INVERSE = np.asarray(INVERSE)   # natural index of zigzag position i
_FORWARD = np.asarray(FORWARD)   # zigzag position of natural index i

LANE_TILE = 512  # blocks per pallas grid step (N axis tile)

# Accelerator coefficient width: 12-bit signed, matching the reference RTL
# datapath coefficient bus (codeblock_decoder.ml Idct_coefs coef[11:0]).
COEF_MIN = -2048
COEF_MAX = 2047


def _quant_round_half_away(fdct, q):
    """Quantize x4-scaled fDCT output, rounding half away from zero with
    truncating division (model encoder.ml:98-101 semantics), in int32.

    The division is an f32 reciprocal-multiply with a one-step exact
    floor correction — the device analog of the reference accelerator's
    quantizer, which also replaces the divider with a reciprocal
    multiply (SURVEY §2.3 'Quant'). Exact for this range: the dividend
    is < 2^17 and the divisor < 2^11, so the correctly-rounded f32
    quotient is within 2^-7 of the true ratio and truncation is off by
    at most one, fixed by the two integer-multiply checks. A plain int32
    `//` lowers to a long shift-subtract sequence on the TPU VPU."""
    q4 = q * 4
    n = jnp.abs(fdct) + q * 2
    t = (n.astype(jnp.float32) / q4.astype(jnp.float32)).astype(jnp.int32)
    t = t - (t * q4 > n).astype(jnp.int32)
    t = t + ((t + 1) * q4 <= n).astype(jnp.int32)
    return jnp.where(fdct < 0, -t, t)


# --------------------------------------------------------------------------
# jnp (XLA-fused) implementations
# --------------------------------------------------------------------------

@jax.jit
def decode_datapath_jnp(coefs: jax.Array, quant: jax.Array) -> jax.Array:
    """(N,64) zigzag coefs × (N,64) zigzag quant → (N,8,8) int32 pixels."""
    deq = coefs.astype(jnp.int32) * quant.astype(jnp.int32)
    deq = jnp.clip(deq, COEF_MIN, COEF_MAX)
    nat = deq[:, _FORWARD]                       # natural[k] = zz[FORWARD[k]]
    tile = jnp.transpose(nat.reshape(-1, 8, 8), (1, 2, 0))
    out = chen_jax.chen_inverse(tile)
    out = jnp.clip(out, -128, 127) + 128
    return jnp.transpose(out, (2, 0, 1))


@jax.jit
def encode_datapath_jnp(pixels: jax.Array, quant: jax.Array) -> jax.Array:
    """(N,8,8) pixels × (N,64) zigzag quant → (N,64) int32 zigzag qcoefs."""
    tile = jnp.transpose(pixels.astype(jnp.int32), (1, 2, 0)) - 128
    fdct = chen_jax.chen_forward(tile)
    fdct_flat = jnp.transpose(fdct, (2, 0, 1)).reshape(-1, 64)
    # zigzag position p quantizes natural index INVERSE[p]
    fdct_zz = fdct_flat[:, _INVERSE]
    return _quant_round_half_away(fdct_zz, quant.astype(jnp.int32))


# --------------------------------------------------------------------------
# Pallas TPU kernels
# --------------------------------------------------------------------------

def _decode_kernel(coefs_ref, quant_ref, out_ref):
    """Fused dequant→clamp→IDCT→recon on an (8,8,TILE) VMEM tile.

    Inputs arrive already dezigzagged (natural order) — the zigzag gather is
    a pure data-movement op left to XLA outside the kernel."""
    deq = coefs_ref[...] * quant_ref[...]
    deq = jnp.clip(deq, COEF_MIN, COEF_MAX)
    out = chen_jax.chen_inverse(deq)
    out_ref[...] = jnp.clip(out, -128, 127) + 128


def _encode_kernel(pixels_ref, out_ref):
    """Fused level-shift→fDCT on an (8,8,TILE) VMEM tile. Quantization and
    zigzag happen outside (they need the zigzag gather anyway)."""
    out_ref[...] = chen_jax.chen_forward(pixels_ref[...] - 128)


def _pad_lanes(n: int, tile: int) -> int:
    return (n + tile - 1) // tile * tile


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_datapath_pallas(coefs: jax.Array, quant: jax.Array,
                           *, interpret: bool = False) -> jax.Array:
    """Pallas decode datapath; same contract as decode_datapath_jnp."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = coefs.shape[0]
    npad = _pad_lanes(max(n, 1), LANE_TILE)
    # dezigzag + pad + to coefficient-major (XLA data movement)
    nat = coefs.astype(jnp.int32)[:, _FORWARD]
    qnat = quant.astype(jnp.int32)[:, _FORWARD]
    nat = jnp.pad(nat, ((0, npad - n), (0, 0)))
    # quant pad must be ≥1 so padded-lane clip math stays in range
    qnat = jnp.pad(qnat, ((0, npad - n), (0, 0)), constant_values=1)
    tile = jnp.transpose(nat.reshape(npad, 8, 8), (1, 2, 0))
    qtile = jnp.transpose(qnat.reshape(npad, 8, 8), (1, 2, 0))

    grid = (npad // LANE_TILE,)
    spec = pl.BlockSpec((8, 8, LANE_TILE), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 8, npad), jnp.int32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(tile, qtile)
    return jnp.transpose(out, (2, 0, 1))[:n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_datapath_pallas(pixels: jax.Array, quant: jax.Array,
                           *, interpret: bool = False) -> jax.Array:
    """Pallas encode datapath; same contract as encode_datapath_jnp."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pixels.shape[0]
    npad = _pad_lanes(max(n, 1), LANE_TILE)
    px = jnp.pad(pixels.astype(jnp.int32), ((0, npad - n), (0, 0), (0, 0)))
    tile = jnp.transpose(px, (1, 2, 0))

    grid = (npad // LANE_TILE,)
    spec = pl.BlockSpec((8, 8, LANE_TILE), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    fdct = pl.pallas_call(
        _encode_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 8, npad), jnp.int32),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(tile)
    fdct_flat = jnp.transpose(fdct, (2, 0, 1)).reshape(npad, 64)[:n]
    fdct_zz = fdct_flat[:, _INVERSE]
    return _quant_round_half_away(fdct_zz, quant.astype(jnp.int32))


# --------------------------------------------------------------------------
# dispatchers
# --------------------------------------------------------------------------

def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def decode_datapath(coefs, quant, impl: str = "auto"):
    """Decode datapath with implementation selection:
    'auto' → pallas on TPU, jnp elsewhere."""
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "jnp"
    if impl == "pallas":
        return decode_datapath_pallas(coefs, quant)
    return decode_datapath_jnp(coefs, quant)


def encode_datapath(pixels, quant, impl: str = "auto"):
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "jnp"
    if impl == "pallas":
        return encode_datapath_pallas(pixels, quant)
    return encode_datapath_jnp(pixels, quant)
