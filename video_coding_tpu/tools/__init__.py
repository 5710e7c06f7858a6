"""YUV tools: containers, packed/planar formats, chroma resampling,
comparison metrics, conversion pipeline, playback.

Capability parity with reference tools/src (lib hardcaml_video_tools):
Yuv, Yuv_format, Packed_422, Planar_444, Ocompare, Oconv, Oplay.
"""

from .yuv import Yuv
from . import yuv_format
from . import packed_422
from . import planar_444
from . import compare
from . import convert

__all__ = ["Yuv", "yuv_format", "packed_422", "planar_444", "compare",
           "convert"]
