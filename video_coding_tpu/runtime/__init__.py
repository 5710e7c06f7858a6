"""Host↔device runtime: sessions, sequencing, plane assembly.

The TPU equivalent of the reference's host-managed accelerator split
(jpeg/hardcaml/src/decoder_accelerator.ml + test driver
test_decoder_accelerator.ml:54-192): the host parses headers, plans MCU
geometry, programs tables as device arrays and carries entropy state; the
device runs the batched block numerics and assembles planes.
"""

from .engine import JpegDecoderSession, JpegEncoderSession, decode_jpeg, encode_jpeg

__all__ = ["JpegDecoderSession", "JpegEncoderSession", "decode_jpeg",
           "encode_jpeg"]
