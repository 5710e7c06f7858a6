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
    """The fused one-dispatch transcode graph is BYTE-identical to the
    host round-trip re-encode on the real chip (VERDICT r4 item 5 — the
    CPU sweep's assert, test_quality_sweep.py
    test_transcode_fused_single_dispatch_byte_identical, run on the
    Mosaic-compiled graph)."""
    _frame, _params, stream, header, payload, _golden = small_stream
    from video_coding_tpu.model import encoder as menc
    from video_coding_tpu.model.decoder import decode_a_frame
    from video_coding_tpu.runtime.engine import JpegTranscodeSession

    trans = JpegTranscodeSession(header, quality=50, restart_interval=1,
                                 entropy_out="device")
    out = trans.transcode(payload)
    ref = menc.encode_420(decode_a_frame(stream), 50, restart_interval=1)
    assert out == ref
    assert trans.transcode(payload) == ref  # steady-state path too


def test_foreign_transcode_segmented_on_chip():
    """Mouse480 (foreign camera JPEG, no restart markers) transcodes on
    chip into a restart-segmented stream byte-identical to the host
    re-encode — indexed parallel entropy decode feeding the fused
    encode (VERDICT r4 item 5, second half)."""
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.entropy import native as entropy_native
    from video_coding_tpu.model import decoder as mdec
    from video_coding_tpu.model import encoder as menc
    from video_coding_tpu.runtime.engine import JpegTranscodeSession

    if entropy_native.load() is None:
        pytest.skip("native engine unavailable")
    data = open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read()
    bits = BitReader(data)
    header = mdec.Header.decode(bits)
    payload = data[bits.bit_pos >> 3:]
    trans = JpegTranscodeSession(header, quality=75, restart_interval=4,
                                 entropy_out="device")
    out = trans.transcode(payload)
    ref = menc.encode_420(mdec.decode_a_frame(data), 75,
                          restart_interval=4)
    assert out == ref


@pytest.mark.parametrize("sub,interval,q", [
    ("420", "1", 10), ("420", "1", 95),
    ("420", "row", 10), ("420", "row", 95),
    ("444", "1", 50), ("422", "1", 50),
])
def test_decode_quality_sweep_on_chip(sub, interval, q):
    """On-chip mirror of tests/test_quality_sweep.py (the reference's
    cram q-sweep, test-toplevel-decoder.t:14-25): the Mosaic-compiled
    decode path is bit-exact across quality/subsampling/segmentation.
    Kept compact — each (geometry, q) is a fresh on-chip compile."""
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.model import decoder as mdec
    from video_coding_tpu.model import encoder as menc
    from video_coding_tpu.runtime.engine import JpegDecoderSession

    rng = np.random.default_rng(3)
    w, h = 96, 64
    subs = {"420": (ChromaSubsampling.C420, menc.encode_420, 16),
            "422": (ChromaSubsampling.C422, menc.encode_422, 16),
            "444": (ChromaSubsampling.C444, menc.encode_444, 8)}
    cs, encode, mcu_w = subs[sub]
    cw, chh = cs.chroma_width(w), cs.chroma_height(h)
    frame = Frame(
        Plane(data=rng.integers(0, 256, (h, w)).astype(np.uint8)),
        Plane(data=rng.integers(0, 256, (chh, cw)).astype(np.uint8)),
        Plane(data=rng.integers(0, 256, (chh, cw)).astype(np.uint8)), cs)
    ri = 1 if interval == "1" else (w + mcu_w - 1) // mcu_w
    stream = encode(frame, q, restart_interval=ri)
    bits = BitReader(stream)
    header = mdec.Header.decode(bits)
    payload = stream[bits.bit_pos >> 3:]
    golden = mdec.decode_a_frame(stream)
    got = JpegDecoderSession(header).decode_device(payload)
    for p in "yuv":
        assert np.array_equal(getattr(got, p).data, getattr(golden, p).data)


@pytest.mark.parametrize("sub,q", [("420", 50), ("444", 95)])
def test_encode_quality_sweep_on_chip(sub, q):
    """Device encode is byte-identical to the model across the encode
    sweep (model-encode-and-decode.t) on chip."""
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.model import encoder as menc
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import JpegEncoderSession

    rng = np.random.default_rng(4)
    w, h = 96, 64
    subs = {"420": (ChromaSubsampling.C420, menc.encode_420,
                    Parameters.c420),
            "444": (ChromaSubsampling.C444, menc.encode_444,
                    Parameters.c444)}
    cs, encode, params = subs[sub]
    cw, chh = cs.chroma_width(w), cs.chroma_height(h)
    frame = Frame(
        Plane(data=rng.integers(0, 256, (h, w)).astype(np.uint8)),
        Plane(data=rng.integers(0, 256, (chh, cw)).astype(np.uint8)),
        Plane(data=rng.integers(0, 256, (chh, cw)).astype(np.uint8)), cs)
    ref = encode(frame, q, restart_interval=1)
    sess = JpegEncoderSession(params(w, h, q), restart_interval=1)
    assert sess.encode_device(frame) == ref


def test_pallas_packer_on_chip(small_stream):
    """The Mosaic-compiled pack+stuff kernel emits byte-identical streams
    on the real chip."""
    frame, params, stream, _header, _payload, _golden = small_stream
    from video_coding_tpu.runtime.engine import JpegEncoderSession

    enc = JpegEncoderSession(params, restart_interval=1,
                             device_pack="pallas")
    assert enc.encode_device(frame) == stream


def test_mesh_sessions_on_chip(small_stream):
    """Mesh-sharded sessions on the REAL chip (1-device mesh): the
    shard_map-wrapped Pallas entropy kernels must lower and stay
    bit/byte-exact. The CPU mesh tier cannot cover this combination —
    _pallas_eligible requires the tpu backend, so its mesh graphs take
    the XLA route (a checked-shard_map vma rejection hid here until
    round 5)."""
    frame, params, stream, header, payload, golden = small_stream
    from video_coding_tpu.parallel import codec_mesh
    from video_coding_tpu.runtime.engine import (JpegDecoderSession,
                                                 JpegEncoderSession)

    mesh = codec_mesh(1)
    dec = JpegDecoderSession(header, mesh=mesh)
    got = dec.decode_device(payload)
    for p in "yuv":
        assert np.array_equal(getattr(got, p).data, getattr(golden, p).data)
    enc = JpegEncoderSession(params, restart_interval=1, mesh=mesh)
    assert enc.encode_device(frame) == stream


def test_indexed_foreign_stream_on_chip():
    """Mouse480 — a real camera JPEG with no restart markers — decodes
    through the indexed parallel device path bit-exactly on chip
    (entropy/scan.py index_scan + per-lane init state in the
    lanes-major kernel)."""
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.entropy import native as entropy_native
    from video_coding_tpu.model import decoder as mdec
    from video_coding_tpu.runtime.engine import JpegDecoderSession

    if entropy_native.load() is None:
        pytest.skip("native engine unavailable")
    data = open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read()
    golden = mdec.decode_a_frame(data)
    bits = BitReader(data)
    header = mdec.Header.decode(bits)
    sess = JpegDecoderSession(header)
    assert not sess.device_entropy_parallel
    assert sess.n_blocks >= 8 * sess._index_stride()
    got = sess.decode_device(data[bits.bit_pos >> 3:])
    for p in "yuv":
        assert np.array_equal(getattr(got, p).data,
                              getattr(golden, p).data)
