"""TPU datapath kernel tests — lockstep against the golden model.

The analog of the reference's RTL-vs-model testbenches
(jpeg/hardcaml/test/test_decoder.ml, test_dct.ml): the accelerated path is
driven with the same inputs as the software model and compared bit-for-bit
(the reference tolerates diff ≤ 2; our integer kernels are exactly equal).
Runs on CPU (jnp + pallas interpret mode); the same kernels compile
unchanged for TPU.
"""

import numpy as np
import pytest

from video_coding_tpu.model import dct as mdct
from video_coding_tpu.model.decoder import Decoder, Header
from video_coding_tpu.model.encoder import quant_and_scale
from video_coding_tpu.model.zigzag import INVERSE
from video_coding_tpu.common.bitstream import BitReader
from video_coding_tpu.ops import datapath


def golden_decode(coefs, quant):
    deq_zz = np.clip(coefs.astype(np.int64) * quant, datapath.COEF_MIN,
                     datapath.COEF_MAX)
    dequant = np.zeros_like(deq_zz)
    dequant[:, INVERSE] = deq_zz
    idct = mdct.chen_inverse_8x8(dequant.reshape(-1, 8, 8))
    return np.clip(idct, -128, 127) + 128


def golden_encode(pixels, quant):
    fdct = mdct.chen_forward_8x8(
        pixels.astype(np.int64) - 128).reshape(len(pixels), 64)
    return quant_and_scale(fdct[:, INVERSE], quant)


@pytest.fixture(scope="module")
def random_inputs():
    rng = np.random.default_rng(0)
    n = 700  # deliberately not a multiple of the lane tile
    coefs = rng.integers(-2047, 2048, size=(n, 64)).astype(np.int32)
    quant = rng.integers(1, 256, size=(n, 64)).astype(np.int32)
    pixels = rng.integers(0, 256, size=(n, 8, 8)).astype(np.uint8)
    return coefs, quant, pixels


def test_decode_jnp_bit_exact(random_inputs):
    coefs, quant, _ = random_inputs
    out = np.asarray(datapath.decode_datapath_jnp(coefs, quant))
    assert np.array_equal(out, golden_decode(coefs, quant))


def test_decode_pallas_bit_exact(random_inputs):
    coefs, quant, _ = random_inputs
    out = np.asarray(
        datapath.decode_datapath_pallas(coefs, quant, interpret=True))
    assert np.array_equal(out, golden_decode(coefs, quant))


def test_encode_jnp_bit_exact(random_inputs):
    _, quant, pixels = random_inputs
    out = np.asarray(datapath.encode_datapath_jnp(pixels, quant))
    assert np.array_equal(out, golden_encode(pixels, quant))


def test_encode_pallas_bit_exact(random_inputs):
    _, quant, pixels = random_inputs
    out = np.asarray(
        datapath.encode_datapath_pallas(pixels, quant, interpret=True))
    assert np.array_equal(out, golden_encode(pixels, quant))


def test_decode_single_block():
    coefs = np.zeros((1, 64), np.int32)
    quant = np.ones((1, 64), np.int32)
    out = np.asarray(datapath.decode_datapath_jnp(coefs, quant))
    assert out.shape == (1, 8, 8)
    assert (out == 128).all()  # all-zero coefs → flat mid-gray


def test_decode_worst_case_coefficients():
    """Max-magnitude 12-bit coefficients everywhere — the int32 overflow
    stress case that motivated the split 181-multiply."""
    for sign in (1, -1):
        coefs = np.full((8, 64), sign * 2047, dtype=np.int32)
        quant = np.full((8, 64), 255, dtype=np.int32)
        out = np.asarray(datapath.decode_datapath_jnp(coefs, quant))
        assert np.array_equal(out, golden_decode(coefs, quant))


def test_full_frame_lockstep_decode(mouse_jpg):
    """test_decoder.ml analog: whole real-JPEG frame through the
    accelerated datapath, compared block-locked against the model."""
    bits = BitReader(mouse_jpg)
    dec = Decoder(Header.decode(bits), bits)
    coefs = dec.decode_entropy()
    sched = dec.block_schedule()
    comp_idx = np.array([s[0] for s in sched], dtype=np.int32)
    qtabs = np.stack([c.quant_table for c in dec.components]).astype(np.int32)
    quant = qtabs[comp_idx]
    pixels = np.asarray(datapath.decode_datapath_jnp(coefs, quant))
    for i, (ci, x, y) in enumerate(sched):
        dec.components[ci].plane.data[y:y + 8, x:x + 8] = (
            pixels[i].astype(np.uint8))
    accel = dec.get_yuv_frame()

    bits2 = BitReader(mouse_jpg)
    model = Decoder(Header.decode(bits2), bits2)
    model.decode()
    ref = model.get_yuv_frame()
    for p in "yuv":
        assert (getattr(accel, p).data == getattr(ref, p).data).all()


def test_full_frame_lockstep_encode(mini64_frames):
    """Encoder datapath lockstep: quantized coefficients from the kernel
    equal the model encoder's quantized_blocks."""
    from video_coding_tpu.common.frame import ChromaSubsampling
    from video_coding_tpu.model.encoder import Encoder, Parameters

    src = mini64_frames[ChromaSubsampling.C420]
    enc = Encoder(Parameters.c420(64, 64, 75))
    enc.load_frame(src)
    golden_q = enc.quantized_blocks()
    sched = enc.block_schedule()
    pixels = np.stack([enc.scans[si].plane.data[y:y + 8, x:x + 8]
                       for si, x, y in sched])
    qtabs = np.stack([s.quant_table for s in enc.scans]).astype(np.int32)
    quant = qtabs[np.array([s[0] for s in sched])]
    out = np.asarray(datapath.encode_datapath_jnp(pixels, quant))
    assert np.array_equal(out, golden_q)
