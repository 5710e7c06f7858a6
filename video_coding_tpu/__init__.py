"""video_coding_tpu — a TPU-native baseline JPEG video coding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hardcamls/video-coding (OCaml software model + Hardcaml RTL codec + YUV tools):

- ``common``   — planes, frames, bitstream I/O, size utilities
  (capability parity with reference ``common/src``).
- ``model``    — bit-accurate software JPEG encoder+decoder, the golden
  reference for every accelerated path (parity with ``jpeg/model/src``).
- ``ops``      — TPU kernels (Pallas + XLA) for the block datapath:
  level-shift/fDCT/quant/zigzag and dezigzag/dequant/iDCT/recon
  (the TPU-native equivalent of the reference RTL tier ``jpeg/hardcaml/src``).
- ``entropy``  — Huffman/RLE entropy coding engines: vectorized host path,
  native C++ hot path, and restart-interval segmentation for parallelism.
- ``runtime``  — host↔device drivers mirroring the reference's
  Decoder_accelerator split (host: headers/tables/sequencing; device: numerics).
- ``parallel`` — jax.sharding Mesh pipelines: frame-sharded (data) and
  restart-segment-sharded (sequence) encode/decode across chips.
- ``tools``    — YUV utilities: compare (PSNR/MSE), convert (420/422/444,
  packed 4:2:2), playback helpers (parity with reference ``tools/src``).
- ``cli``      — command line front-ends (``model`` and ``oyuv`` equivalents).
"""

__version__ = "0.1.0"
