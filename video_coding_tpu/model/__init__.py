"""Bit-accurate software baseline JPEG codec (the golden model).

Capability parity with reference jpeg/model/src (lib hardcaml_jpeg_model):
markers, Annex-K tables, canonical Huffman spec→LUT, Chen/float/fixed-point
DCTs, quality scaling, RLE/magnitude coding, header writer, full decoder and
encoder with a sequenced per-block debug API for lockstep testing of the
accelerated TPU paths.
"""

from . import marker_codes
from . import markers
from . import zigzag
from . import quant_tables
from . import huffman
from . import dct
from .decoder import Decoder, Header
from .encoder import Encoder, Parameters

__all__ = [
    "marker_codes",
    "markers",
    "zigzag",
    "quant_tables",
    "huffman",
    "dct",
    "Decoder",
    "Header",
    "Encoder",
    "Parameters",
]
