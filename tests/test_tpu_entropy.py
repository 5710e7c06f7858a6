"""On-device entropy tier tests: vectorized Huffman decode and parallel
bitstream packing, bit-identical to the host engines.

This is the TPU-native equivalent of the reference entropy RTL
(codeword_decoder.ml 16-way matchers → 2^16 LUT gather; encoder chain →
scan+scatter packing), tested in lockstep like the RTL testbenches."""

import numpy as np
import pytest

from video_coding_tpu.common.bitstream import BitReader
from video_coding_tpu.common.frame import ChromaSubsampling
from video_coding_tpu.entropy import scan as entropy_scan
from video_coding_tpu.entropy.tables import (pack_decoder_tables,
                                             pack_encoder_tables)
from video_coding_tpu.entropy.tpu_decode import decode_scan_tpu
from video_coding_tpu.entropy.tpu_encode import encode_scan_tpu
from video_coding_tpu.model import decoder as mdec
from video_coding_tpu.model import encoder as menc
from video_coding_tpu.model.huffman import (AC_CHROMA, AC_LUMA, DC_CHROMA,
                                            DC_LUMA, Lut)


def decoder_for(data: bytes) -> mdec.Decoder:
    bits = BitReader(data)
    return mdec.Decoder(mdec.Header.decode(bits), bits)


def dec_tables(dec):
    return pack_decoder_tables([c.dc_tab for c in dec.components],
                               [c.ac_tab for c in dec.components])


def test_tpu_decode_single_segment(mouse_jpg):
    dec = decoder_for(mouse_jpg)
    golden = dec.decode_entropy()
    comp_idx = np.array([s[0] for s in dec.block_schedule()], dtype=np.int32)
    out = decode_scan_tpu(dec.entropy_segments, comp_idx, len(comp_idx),
                          dec_tables(dec))
    assert np.array_equal(out, golden)


@pytest.mark.parametrize("ri,q", [(1, 75), (2, 95), (4, 30)])
def test_tpu_decode_restart_segments(ri, q, mini64_frames):
    src = mini64_frames[ChromaSubsampling.C420]
    data = menc.encode_420(src, q, restart_interval=ri)
    dec = decoder_for(data)
    golden = dec.decode_entropy()
    comp_idx = np.array([s[0] for s in dec.block_schedule()], dtype=np.int32)
    mcu = sum(c.component.horizontal_sampling_factor
              * c.component.vertical_sampling_factor
              for c in dec.components)
    out = decode_scan_tpu(dec.entropy_segments, comp_idx, ri * mcu,
                          dec_tables(dec))
    assert np.array_equal(out, golden)


@pytest.mark.parametrize("gather_impl", ["native", "onehot"])
def test_pallas_decode_restart_segments(gather_impl, mini64_frames):
    """The Pallas symbol-loop kernel is bit-identical to the host scan
    decoder (and hence the XLA while_loop path) on segmented streams,
    for both per-lane gather strategies."""
    from video_coding_tpu.entropy.pallas_decode import decode_scan_pallas

    src = mini64_frames[ChromaSubsampling.C420]
    for ri, q in [(1, 75), (3, 95)]:
        data = menc.encode_420(src, q, restart_interval=ri)
        dec = decoder_for(data)
        golden = dec.decode_entropy()
        comp_idx = np.array([s[0] for s in dec.block_schedule()],
                            dtype=np.int32)
        mcu = sum(c.component.horizontal_sampling_factor
                  * c.component.vertical_sampling_factor
                  for c in dec.components)
        out = decode_scan_pallas(dec.entropy_segments, comp_idx, ri * mcu,
                                 dec_tables(dec), gather_impl=gather_impl)
        assert np.array_equal(out, golden)


@pytest.mark.parametrize("layout", ["lanes", "bs"])
@pytest.mark.parametrize("sub", [ChromaSubsampling.C420,
                                 ChromaSubsampling.C444])
def test_pallas_decode_kernel_layouts(layout, sub, mini64_frames):
    """The lanes-major and block-synchronized kernels are bit-identical
    to the host decoder (interpret mode), including windows that cross
    the bs kernel's block-window boundary (ri=4) and the odd-period
    4:4:4 schedule (MCU = 3 blocks — exercises the window/period
    alignment)."""
    from video_coding_tpu.entropy.pallas_decode import decode_scan_pallas

    src = mini64_frames[sub]
    enc = (menc.encode_420 if sub is ChromaSubsampling.C420
           else menc.encode_444)
    for ri, q in [(1, 75), (4, 30)]:
        data = enc(src, q, restart_interval=ri)
        dec = decoder_for(data)
        golden = dec.decode_entropy()
        comp_idx = np.array([s[0] for s in dec.block_schedule()],
                            dtype=np.int32)
        mcu = sum(c.component.horizontal_sampling_factor
                  * c.component.vertical_sampling_factor
                  for c in dec.components)
        out = decode_scan_pallas(dec.entropy_segments, comp_idx, ri * mcu,
                                 dec_tables(dec), layout=layout)
        assert np.array_equal(out, golden)


def test_pallas_decode_corrupt_stream_terminates():
    """Garbage lanes stop at max_iters instead of hanging (the error-
    strobe analog, codeblock_decoder.ml:19-26)."""
    from video_coding_tpu.entropy.pallas_decode import decode_scan_pallas

    dec_tabs = pack_decoder_tables(
        [Lut(DC_LUMA.dc_code_table(), ac=False)],
        [Lut(AC_LUMA.ac_code_table(), ac=True)])
    comp_idx = np.zeros(4, dtype=np.int32)
    out = decode_scan_pallas([b"\xaa\x55" * 8], comp_idx, 4, dec_tabs)
    assert out.shape == (4, 64)


def test_tpu_encode_matches_host():
    rng = np.random.default_rng(0)
    tables = pack_encoder_tables([DC_LUMA, DC_CHROMA, DC_CHROMA],
                                 [AC_LUMA, AC_CHROMA, AC_CHROMA])
    n = 96
    q = rng.integers(-40, 40, size=(n, 64)).astype(np.int32)
    q[:, 20:60] = 0
    q[5] = 0
    q[7, :] = 0
    q[7, 63] = 3
    q[9, 1:63] = 0
    q[9, 63] = -1
    ci = np.tile(np.array([0, 0, 0, 0, 1, 2], dtype=np.int32), 16)
    for bps in (96, 6, 36):
        host = entropy_scan.encode_scan(q, ci, bps, tables)
        dev = encode_scan_tpu(q, ci, bps, tables)
        assert host == dev, f"bps={bps}"


def test_tpu_encode_dense_worst_case():
    rng = np.random.default_rng(1)
    tables = pack_encoder_tables([DC_LUMA], [AC_LUMA])
    q = rng.integers(-1000, 1000, size=(24, 64)).astype(np.int32)
    ci = np.zeros(24, dtype=np.int32)
    for bps in (24, 5):
        assert (entropy_scan.encode_scan(q, ci, bps, tables)
                == encode_scan_tpu(q, ci, bps, tables))


def test_engine_with_tpu_entropy_end_to_end(mini64_frames):
    """Full streams through the engine with entropy='tpu' on both sides —
    byte-identical encode and bit-exact decode vs the golden model."""
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime import engine

    src = mini64_frames[ChromaSubsampling.C420]
    enc = engine.JpegEncoderSession(Parameters.c420(64, 64, 75),
                                    restart_interval=2, entropy="tpu")
    stream = enc.encode(src)
    assert stream == menc.encode_420(src, 75, restart_interval=2)

    bits = BitReader(stream)
    header = mdec.Header.decode(bits)
    dsess = engine.JpegDecoderSession(header, entropy="tpu")
    out = dsess.decode(stream[bits.bit_pos >> 3:])
    ref = mdec.decode_a_frame(stream)
    for p in "yuv":
        assert (getattr(out, p).data == getattr(ref, p).data).all()


def test_tpu_decode_corrupt_stream_terminates():
    """Garbage input must terminate (graceful, like RTL error strobes),
    not hang the while_loop."""
    dec_tabs = pack_decoder_tables(
        [Lut(DC_LUMA.dc_code_table(), ac=False)],
        [Lut(AC_LUMA.ac_code_table(), ac=True)])
    comp_idx = np.zeros(4, dtype=np.int32)
    out = decode_scan_tpu([b"\xaa\x55" * 8], comp_idx, 4, dec_tabs)
    assert out.shape == (4, 64)


def test_pallas_packer_bit_identical_to_xla():
    """entropy/pallas_encode: the VMEM-resident pack+stuff kernel matches
    the XLA gather packer byte for byte (interpret mode on CPU), across
    sparse→dense content, a valid mask, and overflow reporting."""
    import jax.numpy as jnp

    from video_coding_tpu.entropy import pallas_encode, tpu_encode
    from video_coding_tpu.entropy.tables import pack_encoder_tables
    from video_coding_tpu.model.encoder import Parameters

    rng = np.random.default_rng(0)
    p = Parameters.c420(16, 16, 75)
    tabs = pack_encoder_tables([p.dc_huffman_tables[0].data],
                               [p.ac_huffman_tables[0].data])
    dcb, dcl, acb, acl = map(jnp.asarray,
                             tpu_encode.device_encoder_tables(tabs))
    N, B = 48, 6
    prev = np.full(B, -1, np.int32)
    prev[1:] = np.arange(B - 1)
    for density in (0.05, 0.4, 0.9):
        q = rng.integers(-80, 80, size=(N, 64)).astype(np.int32)
        q[rng.random((N, 64)) > density] = 0
        valid = np.arange(N) < N - 3
        args = (jnp.asarray(q), jnp.asarray(np.zeros(N, np.int32)),
                jnp.asarray(prev), dcb, dcl, acb, acl)
        kw = dict(blocks_per_segment=B, max_seg_bytes=B * 512 + 64,
                  valid=jnp.asarray(valid))
        o1, l1, v1 = tpu_encode.encode_segments_device(*args, **kw)
        o2, l2, v2 = pallas_encode.encode_segments_pallas(*args, **kw)
        assert not bool(v1) and not bool(v2)
        o1, l1, o2, l2 = map(np.asarray, (o1, l1, o2, l2))
        assert np.array_equal(l1, l2)
        for s in range(N // B):
            assert np.array_equal(o1[s, :l1[s]], o2[s, :l2[s]])
    # overflow reporting parity on an impossible budget
    q = rng.integers(-1000, 1000, size=(12, 64)).astype(np.int32)
    args = (jnp.asarray(q), jnp.asarray(np.zeros(12, np.int32)),
            jnp.asarray(prev), dcb, dcl, acb, acl)
    _, _, vx = tpu_encode.encode_segments_device(
        *args, blocks_per_segment=B, max_seg_bytes=80)
    _, _, vp = pallas_encode.encode_segments_pallas(
        *args, blocks_per_segment=B, max_seg_bytes=80)
    assert bool(vx) and bool(vp)


def test_pallas_packer_through_session(mini64_frames):
    """encode_device(device_pack='pallas') emits byte-identical streams."""
    from video_coding_tpu.common.frame import ChromaSubsampling
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import JpegEncoderSession

    src = mini64_frames[ChromaSubsampling.C420]
    params = Parameters.c420(64, 64, 75)
    ref = JpegEncoderSession(params, restart_interval=2).encode(src)
    got = JpegEncoderSession(params, restart_interval=2,
                             device_pack="pallas").encode_device(src)
    assert got == ref


def test_assemble_stream_device_matches_naive_join():
    """The word-packed wire assembly (re-aligned int32 scatter + reshape
    unpack) equals the naive bytes join with RSTn markers, across odd
    offsets, 0xFF-heavy content and varied segment lengths."""
    import jax.numpy as jnp

    from video_coding_tpu.entropy.tpu_encode import assemble_stream_device

    rng = np.random.default_rng(5)
    S, M = 37, 23
    out = np.zeros((S, M), np.uint8)
    lens = rng.integers(1, M + 1, size=S).astype(np.int32)
    for s in range(S):
        out[s, :lens[s]] = rng.integers(0, 256, lens[s])
        out[s, lens[s]:] = 0
    out[3, :lens[3]] = 0xFF  # stuffing-ish content crossing words
    cap = int(lens.sum() + 2 * S + 16)
    buf, total = assemble_stream_device(jnp.asarray(out),
                                        jnp.asarray(lens), cap=cap)
    got = np.asarray(buf)[:int(total)].tobytes()
    ref = bytearray()
    for s in range(S):
        if s > 0:
            ref += bytes((0xFF, 0xD0 + ((s - 1) & 7)))
        ref += out[s, :lens[s]].tobytes()
    assert got == bytes(ref)


def test_assemble_stream_device_packed_matches_byte_form():
    """The packed-input assembly (int32 word grids straight from the
    kernels, shift-combined to wire alignment) is byte-identical to the
    byte-form assembly and to the naive join, across every offset
    alignment (lens chosen to hit all four sh values), 0xFF content and
    a trailing spill word."""
    import jax.numpy as jnp

    from video_coding_tpu.entropy.tpu_encode import (
        assemble_stream_device, assemble_stream_device_packed,
        pack_byte_words)

    rng = np.random.default_rng(9)
    S, M = 41, 23
    out = np.zeros((S, M), np.uint8)
    lens = rng.integers(1, M + 1, size=S).astype(np.int32)
    for s_ in range(S):
        out[s_, :lens[s_]] = rng.integers(0, 256, lens[s_])
    out[5, :lens[5]] = 0xFF
    cap = int(lens.sum() + 2 * S + 16)
    ref, ref_total = assemble_stream_device(jnp.asarray(out),
                                            jnp.asarray(lens), cap=cap)
    words = pack_byte_words(jnp.asarray(out))
    got, total = assemble_stream_device_packed(words, jnp.asarray(lens),
                                               cap=cap)
    assert int(total) == int(ref_total)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
