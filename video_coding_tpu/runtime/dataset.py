"""JPEG → device-tensor input pipeline (the decode-for-training path).

A TPU-framework capability with no reference analog: compressed frames
(a Motion-JPEG stream, a list of JPEG byte strings, or files) become
batched ``(B, H, W, 3)`` uint8 RGB tensors decoded entirely on device —
entropy, datapath, chroma upsample and color conversion in fused jit
graphs — with host work limited to header checks and byte slicing.
Batches are prefetched on worker threads (decode of batch i+1 overlaps
the consumer's step on batch i), and can be resharded over a
``jax.sharding.Mesh`` axis to feed a data-parallel training step.

All frames must share headers (the MJPEG steady state); the first frame
fixes the session geometry.
"""

from __future__ import annotations

import jax
import numpy as np

from ..common.bitstream import BitReader
from ..model.decoder import DecodeError, Header
from .engine import JpegDecoderSession, _pipelined_map


def _payload(frame_bytes: bytes) -> tuple[Header, bytes]:
    bits = BitReader(frame_bytes)
    header = Header.decode(bits)
    return header, frame_bytes[bits.bit_pos >> 3:]


class JpegRgbDataset:
    """Iterable of device-resident RGB batches from compressed frames.

    frames: list of complete JPEG byte strings, or a raw MJPEG stream
            (concatenated JPEGs) as a single ``bytes``.
    batch_size: frames per yielded ``(B, H, W, 3)`` tensor. A short final
            batch is yielded as-is unless ``drop_remainder``.
    sharding: optional ``jax.sharding.Sharding`` (e.g. ``NamedSharding(
            mesh, P('data'))``) applied to each batch — the hand-off
            point to a pjit training step.
    prefetch: batches in flight on worker threads.
    """

    def __init__(self, frames, batch_size: int = 8,
                 sharding=None, drop_remainder: bool = False,
                 prefetch: int = 2, session: JpegDecoderSession | None = None):
        if isinstance(frames, (bytes, bytearray)):
            from ..tools.mjpeg import split_stream

            frames = split_stream(bytes(frames))
        if not frames:
            raise ValueError("no frames")
        self.batch_size = batch_size
        self.sharding = sharding
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        header, first_payload = _payload(frames[0])
        if session is None:
            session = JpegDecoderSession(header)
        if len(session.components) != 3:
            raise DecodeError("RGB dataset needs 3-component scans")
        self.session = session
        self.payloads = [first_payload] + [_payload(fb)[1]
                                           for fb in frames[1:]]

    def __len__(self) -> int:
        n = len(self.payloads)
        return (n // self.batch_size if self.drop_remainder
                else -(-n // self.batch_size))

    @property
    def frame_shape(self) -> tuple[int, int, int]:
        c = self.session.components[0]
        return (c.actual_height, c.actual_width, 3)

    def _batches(self):
        b = self.batch_size
        n = len(self.payloads)
        end = (n // b) * b if self.drop_remainder else n
        for i in range(0, end, b):
            yield self.payloads[i:i + b]

    def _decode_batch(self, payloads):
        rgb = self.session.decode_device_rgb_batch(payloads)
        if self.sharding is not None:
            rgb = jax.device_put(np.asarray(rgb), self.sharding)
        return rgb

    def __iter__(self):
        return _pipelined_map(self._decode_batch, self._batches(),
                              self.prefetch)
