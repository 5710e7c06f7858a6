"""TPU kernels for the JPEG block datapath.

This is the TPU-native equivalent of the reference's hardware tier
(jpeg/hardcaml/src): where the reference implements the block numerics as
RTL (Dct, Dequant, Quant, Decoder_datapath, Encoder_datapath), this package
implements them as Pallas kernels and XLA-compiled jnp graphs operating on
*batches of thousands of blocks* in coefficient-major layout.

Layout convention: a batch of N 8x8 blocks is carried as an (8, 8, N) int32
array ("coefficient-major"): position (r, c) of every block forms a vector
of N lanes — elementwise butterfly stages run at full VPU width, and N is
padded to a multiple of 128 lanes.
"""

from .datapath import (
    decode_datapath,
    encode_datapath,
    decode_datapath_jnp,
    encode_datapath_jnp,
    decode_datapath_pallas,
    encode_datapath_pallas,
)

__all__ = [
    "decode_datapath",
    "encode_datapath",
    "decode_datapath_jnp",
    "encode_datapath_jnp",
    "decode_datapath_pallas",
    "encode_datapath_pallas",
]
