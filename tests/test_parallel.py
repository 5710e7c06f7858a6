"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference's "multi-node without a cluster" analog (SURVEY.md §4: RTL
under Cyclesim): the sharded pipelines compile and execute on 8 virtual
devices and must produce results bit-identical to the single-device path.
"""

import numpy as np
import pytest

import jax

from video_coding_tpu.ops import datapath
from video_coding_tpu.parallel import (codec_mesh, distributed_psnr,
                                       make_mesh, mjpeg_codec_step,
                                       sharded_decode_datapath,
                                       sharded_encode_datapath)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    return codec_mesh(8)


def test_mesh_shape(mesh):
    assert dict(mesh.shape) == {"data": 2, "seg": 4}


def test_make_mesh_too_many_devices():
    with pytest.raises(ValueError):
        make_mesh((64,), ("x",))


def test_sharded_decode_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    coefs = rng.integers(-500, 500, size=(256, 64)).astype(np.int32)
    quant = rng.integers(1, 256, size=(256, 64)).astype(np.int32)
    out = np.asarray(sharded_decode_datapath(mesh, coefs, quant))
    ref = np.asarray(datapath.decode_datapath_jnp(coefs, quant))
    assert np.array_equal(out, ref)


def test_sharded_encode_matches_single_device(mesh):
    rng = np.random.default_rng(1)
    pixels = rng.integers(0, 256, size=(128, 8, 8)).astype(np.uint8)
    quant = rng.integers(1, 256, size=(128, 64)).astype(np.int32)
    out = np.asarray(sharded_encode_datapath(mesh, pixels, quant))
    ref = np.asarray(datapath.encode_datapath_jnp(pixels, quant))
    assert np.array_equal(out, ref)


def test_mjpeg_codec_step_exactness(mesh):
    rng = np.random.default_rng(2)
    F, N = 4, 16
    frames = rng.integers(0, 256, size=(F, N, 8, 8)).astype(np.uint8)
    quant = rng.integers(1, 64, size=(N, 64)).astype(np.int32)
    qc, recon, rates, psnr = mjpeg_codec_step(mesh, frames, quant)
    flat = frames.reshape(F * N, 8, 8)
    qrep = np.tile(quant, (F, 1))
    qc_ref = np.asarray(datapath.encode_datapath_jnp(flat, qrep))
    assert np.array_equal(np.asarray(qc).reshape(-1, 64), qc_ref)
    recon_ref = np.asarray(datapath.decode_datapath_jnp(qc_ref, qrep))
    assert np.array_equal(np.asarray(recon).reshape(-1, 8, 8), recon_ref)
    assert np.isfinite(float(psnr))


def test_rate_exchange_is_exact_coded_bits(mesh):
    """The psum'd rates are true coded bits: each block's rate, rounded up
    to the byte boundary, equals the host coder's (destuffed) segment size
    for that block as a 1-block restart segment under the Annex-K luma
    tables — the restart_interval=1 stream this framework emits by
    default (VERDICT r1 item 7: no more magnitude-bit proxy)."""
    import jax.numpy as jnp

    from video_coding_tpu.entropy import destuff_segments
    from video_coding_tpu.entropy.scan import encode_scan
    from video_coding_tpu.entropy.tables import pack_encoder_tables
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.parallel.pipeline import (_luma_rate_tables,
                                                    rate_exact_bits)

    rng = np.random.default_rng(3)
    F, N = 2, 8
    frames = rng.integers(0, 256, size=(F, N, 8, 8)).astype(np.uint8)
    quant = rng.integers(1, 64, size=(N, 64)).astype(np.int32)
    qc, _recon, rates, _psnr = mjpeg_codec_step(mesh, frames, quant)
    qc = np.asarray(qc)
    p = Parameters.c420(16, 16, 75)
    tabs = pack_encoder_tables([p.dc_huffman_tables[0].data],
                               [p.ac_huffman_tables[0].data])
    for f in range(F):
        per_block = np.asarray(rate_exact_bits(
            jnp.asarray(qc[f].reshape(-1, 64)),
            *map(jnp.asarray, _luma_rate_tables())))
        assert int(np.asarray(rates)[f]) == int(per_block.sum())
        segments = encode_scan(qc[f].reshape(-1, 64),
                               np.zeros(N, np.int32), 1, tabs)
        for b, seg in enumerate(segments):
            raw = destuff_segments(seg)[0]  # un-stuffed wire bytes
            assert (int(per_block[b]) + 7) // 8 == len(raw)


def test_distributed_psnr_matches_numpy(mesh):
    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-5, 6, a.shape), 0, 255)
    got = float(distributed_psnr(mesh, a.astype(np.int32),
                                 b.astype(np.int32)))
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    expect = 10 * np.log10(255.0 ** 2 / mse)
    assert abs(got - expect) < 1e-3


def test_graft_entry_and_dryrun():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[0].shape[0], 8, 8)
    for n in (1, 2, 4, 8):
        mod.dryrun_multichip(n)


def _tiled_frame(w, h):
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.model.decoder import decode_a_frame

    mouse = decode_a_frame(
        open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read())

    def tile(d, th, tw):
        ph, pw = d.shape
        return np.tile(d, ((th + ph - 1) // ph,
                           (tw + pw - 1) // pw))[:th, :tw]

    return Frame(Plane(data=tile(mouse.y.data, h, w).copy()),
                 Plane(data=tile(mouse.u.data, h // 2, w // 2).copy()),
                 Plane(data=tile(mouse.v.data, h // 2, w // 2).copy()),
                 ChromaSubsampling.C420)


@pytest.mark.parametrize("wh,ri", [((192, 128), 1),   # 96 segs, even split
                                   ((208, 112), 1),   # 91 segs → mesh pad
                                   ((208, 112), 4)])  # short tail + pad
def test_sharded_sessions_real_bitstream(mesh, wh, ri):
    """Mesh-sharded codec sessions over a REAL restart-segmented stream
    (VERDICT r1 item 1): the sharded device encode is byte-identical to
    the host encoder, and the sharded fused decode is bit-exact vs the
    golden model, including non-divisible segment counts (mesh padding)
    and a short tail segment."""
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.model.decoder import Header, decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import (JpegDecoderSession,
                                                 JpegEncoderSession)

    w, h = wh
    frame = _tiled_frame(w, h)
    params = Parameters.c420(w, h, 75)
    stream_ref = JpegEncoderSession(params, restart_interval=ri).encode(
        frame)

    enc = JpegEncoderSession(params, restart_interval=ri, mesh=mesh)
    assert enc.encode_device(frame) == stream_ref
    outs = enc.encode_device_batch([frame] * 2)
    assert all(o == stream_ref for o in outs)

    bits = BitReader(stream_ref)
    header = Header.decode(bits)
    payload = stream_ref[bits.bit_pos >> 3:]
    golden = decode_a_frame(stream_ref)
    dec = JpegDecoderSession(header, mesh=mesh)
    got = dec.decode_device(payload)
    for p in "yuv":
        assert np.array_equal(getattr(got, p).data, getattr(golden, p).data)
    for f in dec.decode_device_batch([payload] * 2):
        planes = dec._to_frame(f)
        for p in "yuv":
            assert np.array_equal(getattr(planes, p).data,
                                  getattr(golden, p).data)


def test_mesh_batch_sharded_outputs(mesh):
    """When the batch size divides the mesh, the batched mesh decode
    keeps output planes sharded over the frame axis (no all-gather of
    ~F x 3 MPix uint8 back onto every device — VERDICT r4 item 3);
    results stay bit-exact vs the golden model."""
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.model.decoder import Header, decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import (JpegDecoderSession,
                                                 JpegEncoderSession)

    w, h = 192, 128
    frame = _tiled_frame(w, h)
    params = Parameters.c420(w, h, 75)
    stream = JpegEncoderSession(params, restart_interval=1).encode(frame)
    bits = BitReader(stream)
    header = Header.decode(bits)
    payload = stream[bits.bit_pos >> 3:]
    golden = decode_a_frame(stream)
    dec = JpegDecoderSession(header, mesh=mesh)
    F = mesh.size
    planes = dec.decode_device_batch_stacked([payload] * F)
    gp = [golden.y.data, golden.u.data, golden.v.data]
    for stack, g in zip(planes, gp):
        sh = stack.sharding
        assert not sh.is_fully_replicated  # frame-axis sharded
        arr = np.asarray(stack)
        assert arr.shape[0] == F
        for i in range(F):
            assert np.array_equal(arr[i, :g.shape[0], :g.shape[1]], g)


def test_sharded_transcode_real_bitstream(mesh):
    """Sharded JPEG→JPEG transcode (device entropy out: the assembled wire
    stream comes off the mesh via the length-exchange collective) matches
    the single-device transcode byte for byte."""
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.model.decoder import Header
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import (JpegEncoderSession,
                                                 JpegTranscodeSession)

    frame = _tiled_frame(192, 128)
    stream = JpegEncoderSession(Parameters.c420(192, 128, 75),
                                restart_interval=1).encode(frame)
    bits = BitReader(stream)
    header = Header.decode(bits)
    payload = stream[bits.bit_pos >> 3:]
    ref = JpegTranscodeSession(header, quality=50, restart_interval=1,
                               entropy_out="device").transcode(payload)
    got = JpegTranscodeSession(header, quality=50, restart_interval=1,
                               entropy_out="device", mesh=mesh
                               ).transcode(payload)
    assert got == ref


def test_sharded_decode_e2e_with_entropy(mesh, mini64_frames):
    """Full bytes→pixels decode (Huffman loop included) sharded over the
    mesh equals the single-device result bit-for-bit."""
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.common.frame import ChromaSubsampling
    from video_coding_tpu.entropy import destuff_segments, tpu_decode
    from video_coding_tpu.entropy.tables import pack_decoder_tables
    from video_coding_tpu.model import decoder as mdec
    from video_coding_tpu.model import encoder as menc
    from video_coding_tpu.parallel import sharded_decode_e2e

    src = mini64_frames[ChromaSubsampling.C420]
    stream = menc.encode_420(src, 75, restart_interval=1)  # 16 segments
    bits = BitReader(stream)
    dec = mdec.Decoder(mdec.Header.decode(bits), bits)
    segments = dec.entropy_segments
    assert len(segments) == 16  # divisible by the 8-device mesh
    segbytes, _ = tpu_decode.pack_segments(segments)
    B = 6  # one 4:2:0 MCU per segment
    seg_blocks = np.full(16, B, dtype=np.int32)
    comp_idx = np.array([s[0] for s in dec.block_schedule()], np.int32)
    tables = pack_decoder_tables([c.dc_tab for c in dec.components],
                                 [c.ac_tab for c in dec.components])
    dc_lut, ac_lut = tpu_decode.expand_luts(tables)
    qtabs = np.stack([c.quant_table for c in dec.components]).astype(np.int32)
    quant = qtabs[comp_idx[:B]]

    pixels = np.asarray(sharded_decode_e2e(
        mesh, segbytes, seg_blocks, comp_idx[:B], dc_lut, ac_lut, quant,
        blocks_per_segment=B))
    # single-device reference
    golden_coefs = dec.decode_entropy()
    from video_coding_tpu.ops import datapath as dp
    golden = np.asarray(dp.decode_datapath_jnp(
        golden_coefs, qtabs[comp_idx]))
    assert np.array_equal(pixels.reshape(-1, 8, 8), golden)
