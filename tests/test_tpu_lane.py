"""Opt-in real-TPU test lane (VERDICT r1 item 8).

Run with:  VCT_TPU_TESTS=1 timeout 590 python -m pytest -m tpu -q

Everything here exercises the Mosaic-compiled kernels and fused sessions
on the actual chip — the behaviors the hermetic CPU mesh cannot reach
(Pallas lowering, VMEM limits, real gather/scatter support). Tests
self-skip when the backend is not TPU (e.g. when the axon tunnel is
down), so the default CI tier is unaffected.

Per CLAUDE.md tunnel discipline: wrap the pytest invocation in `timeout`;
first compiles go through the remote-compile relay and are cached in
.jax_cache.
"""

import numpy as np
import pytest

import jax

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                       reason="real TPU backend required"),
]


@pytest.fixture(scope="module")
def small_stream():
    """A 192x128 q75 ri=1 stream (96 segments) + its golden frame."""
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.model.decoder import Header, decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import JpegEncoderSession

    rng = np.random.default_rng(0)
    w, h = 192, 128
    frame = Frame(
        Plane(data=rng.integers(0, 256, (h, w)).astype(np.uint8)),
        Plane(data=rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)),
        Plane(data=rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)),
        ChromaSubsampling.C420)
    params = Parameters.c420(w, h, 75)
    stream = JpegEncoderSession(params, restart_interval=1).encode(frame)
    bits = BitReader(stream)
    header = Header.decode(bits)
    payload = stream[bits.bit_pos >> 3:]
    golden = decode_a_frame(stream)
    return frame, params, stream, header, payload, golden


def test_pallas_datapath_bit_exact_on_chip():
    from video_coding_tpu.ops import datapath

    rng = np.random.default_rng(1)
    n = 2048
    coefs = rng.integers(-500, 500, size=(n, 64)).astype(np.int32)
    quant = rng.integers(1, 256, size=(n, 64)).astype(np.int32)
    ref = np.asarray(datapath.decode_datapath_jnp(coefs, quant))
    got = np.asarray(datapath.decode_datapath_pallas(coefs, quant))
    assert np.array_equal(got, ref)
    pixels = rng.integers(0, 256, size=(n, 8, 8)).astype(np.int32)
    ref = np.asarray(datapath.encode_datapath_jnp(pixels, quant))
    got = np.asarray(datapath.encode_datapath_pallas(pixels, quant))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("mode", ["range", "lut", "pallas"])
def test_device_entropy_decode_on_chip(small_stream, mode):
    from video_coding_tpu.entropy import scan as escan
    from video_coding_tpu.runtime.engine import JpegDecoderSession

    _frame, _params, _stream, header, payload, _golden = small_stream
    session = JpegDecoderSession(header, device_huffman=mode)
    golden_coefs = escan.destuff_and_decode_scan(
        payload, session.comp_idx, session.blocks_per_segment,
        session.tables)
    if mode == "pallas":
        from video_coding_tpu.entropy.pallas_decode import decode_scan_pallas

        got = decode_scan_pallas(
            escan.destuff_segments(payload), session.comp_idx,
            session.blocks_per_segment, session.tables, interpret=False)
    else:
        from video_coding_tpu.entropy.tpu_decode import decode_scan_tpu

        got = decode_scan_tpu(
            escan.destuff_segments(payload), session.comp_idx,
            session.blocks_per_segment, session.tables, mode=mode)
    assert np.array_equal(got, golden_coefs)


def test_fused_sessions_on_chip(small_stream):
    frame, params, stream, header, payload, golden = small_stream
    from video_coding_tpu.runtime.engine import (JpegDecoderSession,
                                                 JpegEncoderSession)

    dec = JpegDecoderSession(header)
    got = dec.decode_device(payload)
    for p in "yuv":
        assert np.array_equal(getattr(got, p).data, getattr(golden, p).data)

    enc = JpegEncoderSession(params, restart_interval=1)
    assert enc.encode_device(frame) == stream


def test_transcode_on_chip(small_stream):
    _frame, _params, stream, header, payload, _golden = small_stream
    from video_coding_tpu.runtime.engine import JpegTranscodeSession

    trans = JpegTranscodeSession(header, quality=50, restart_interval=1,
                                 entropy_out="device")
    out = trans.transcode(payload)
    # gate: the transcoded stream must itself decode bit-exactly
    from video_coding_tpu.model.decoder import decode_a_frame
    from video_coding_tpu.runtime.engine import decode_jpeg

    a = decode_a_frame(out)
    b = decode_jpeg(out)
    for p in "yuv":
        assert np.array_equal(getattr(a, p).data, getattr(b, p).data)


def test_pallas_packer_on_chip(small_stream):
    """The Mosaic-compiled pack+stuff kernel emits byte-identical streams
    on the real chip."""
    frame, params, stream, _header, _payload, _golden = small_stream
    from video_coding_tpu.runtime.engine import JpegEncoderSession

    enc = JpegEncoderSession(params, restart_interval=1,
                             device_pack="pallas")
    assert enc.encode_device(frame) == stream
