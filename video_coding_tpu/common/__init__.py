"""Common runtime: planes, frames, bitstream I/O, sizes.

Capability parity with reference ``common/src`` (lib hardcaml_video_common).
"""

from .plane import Plane
from .frame import Frame, ChromaSubsampling
from .bitstream import BitReader, BitWriter
from .size import Size, Range, Offset
from . import stdsizes

__all__ = [
    "Plane",
    "Frame",
    "ChromaSubsampling",
    "BitReader",
    "BitWriter",
    "Size",
    "Range",
    "Offset",
    "stdsizes",
]
