"""Multi-chip parallel layer: mesh construction and sharded codec pipelines.

This is the capability the reference lacks entirely (SURVEY.md §2.6: a
single-process, single-clock system whose only parallelism is RTL pipeline
stages). Here it generalizes to jax.sharding over a device Mesh:

- **data axis**: frames of a Motion-JPEG stream sharded across chips
  (the reference analog: multiple accelerator instances).
- **seg axis**: restart-interval segments *within* a frame sharded across
  chips — the sequence-parallel dimension the JPEG standard enables via
  DRI/RSTn, which the reference parses but never uses
  (jpeg/README.md:36, model markers.ml:186-198).

Collectives ride ICI: psum for distributed quality metrics, all_gather for
segment length/offset exchange during parallel bitstream assembly.
"""

from .mesh import make_mesh, codec_mesh
from .pipeline import (
    sharded_decode_datapath,
    sharded_encode_datapath,
    sharded_decode_e2e,
    mjpeg_codec_step,
    distributed_psnr,
    rate_estimate_bits,
    rate_exact_bits,
)
from .multihost import (
    global_codec_mesh,
    local_frames_to_global,
    mjpeg_multihost_step,
)

__all__ = [
    "make_mesh",
    "codec_mesh",
    "sharded_decode_datapath",
    "sharded_encode_datapath",
    "sharded_decode_e2e",
    "mjpeg_codec_step",
    "distributed_psnr",
    "rate_estimate_bits",
    "rate_exact_bits",
    "global_codec_mesh",
    "local_frames_to_global",
    "mjpeg_multihost_step",
]
