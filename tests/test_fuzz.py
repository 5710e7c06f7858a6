"""Randomized regression sweeps.

The analog of the reference's randomized backpressure/valid-ready
regressions (test_filter_stuffed_bytes.ml:315-530,
test_bytestream_decoder.ml random_ready): random frames, sizes, qualities,
subsamplings and restart intervals through every engine combination, each
result checked bit-exactly against the golden model and (for streams)
against libjpeg."""

import io

import numpy as np
import pytest
from PIL import Image

from video_coding_tpu.common.frame import ChromaSubsampling, Frame
from video_coding_tpu.common.plane import Plane
from video_coding_tpu.model import decoder as mdec
from video_coding_tpu.model import encoder as menc
from video_coding_tpu.runtime import engine

ENCODERS = {
    ChromaSubsampling.C420: menc.encode_420,
    ChromaSubsampling.C422: menc.encode_422,
    ChromaSubsampling.C444: menc.encode_444,
}


def random_frame(rng, sub, w, h) -> Frame:
    f = Frame.create(sub, w, h)
    # smooth-ish random content (pure noise stresses worst-case rates)
    base = rng.integers(0, 256, (h // 4 + 2, w // 4 + 2))
    up = np.kron(base, np.ones((4, 4)))[:h, :w]
    f.y.data[...] = np.clip(
        up + rng.integers(-10, 10, (h, w)), 0, 255).astype(np.uint8)
    cw, ch = f.u.width, f.u.height
    f.u.data[...] = rng.integers(80, 180, (ch, cw), dtype=np.uint8)
    f.v.data[...] = rng.integers(80, 180, (ch, cw), dtype=np.uint8)
    return f


CASES = [
    (ChromaSubsampling.C420, 48, 32, 75, 0),
    (ChromaSubsampling.C420, 52, 44, 30, 1),
    (ChromaSubsampling.C420, 160, 96, 95, 3),
    (ChromaSubsampling.C422, 64, 48, 50, 2),
    (ChromaSubsampling.C422, 36, 20, 85, 1),
    (ChromaSubsampling.C444, 40, 40, 60, 5),
    (ChromaSubsampling.C444, 24, 16, 90, 0),
]


@pytest.mark.parametrize("sub,w,h,q,ri", CASES)
def test_fuzz_engine_vs_model(sub, w, h, q, ri):
    rng = np.random.default_rng(hash((w, h, q, ri)) % 2**32)
    frame = random_frame(rng, sub, w, h)
    model_bytes = ENCODERS[sub](frame, q, restart_interval=ri)
    engine_bytes = engine.encode_jpeg(frame, q, sub, restart_interval=ri)
    assert engine_bytes == model_bytes
    ref = mdec.decode_a_frame(model_bytes)
    out = engine.decode_jpeg(engine_bytes)
    for p in "yuv":
        assert (getattr(out, p).data == getattr(ref, p).data).all()
    # libjpeg accepts the stream and agrees on luma within ±1
    im = Image.open(io.BytesIO(engine_bytes))
    im.draft("YCbCr", im.size)
    luma = np.asarray(im.convert("YCbCr"))[:, :, 0]
    assert np.abs(out.y.data.astype(int) - luma.astype(int)).max() <= 1


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_tpu_entropy_roundtrip(seed):
    """Random quantized coefficients through TPU encode → destuff → TPU
    decode recovers them exactly (all segment shapes)."""
    from video_coding_tpu.entropy import destuff_segments
    from video_coding_tpu.entropy.tables import (pack_decoder_tables,
                                                 pack_encoder_tables)
    from video_coding_tpu.entropy.tpu_decode import decode_scan_tpu
    from video_coding_tpu.entropy.tpu_encode import encode_scan_tpu
    from video_coding_tpu.model.huffman import (AC_CHROMA, AC_LUMA,
                                                DC_CHROMA, DC_LUMA, Lut)

    rng = np.random.default_rng(seed)
    n = 48
    q = rng.integers(-200, 200, size=(n, 64)).astype(np.int32)
    # random sparsity patterns incl. long runs
    mask = rng.random((n, 64)) < rng.uniform(0.05, 0.9)
    q = np.where(mask, q, 0)
    q[:, 0] = rng.integers(-500, 500, n)  # DC always meaningful
    ci = np.tile(np.array([0, 0, 1, 2], dtype=np.int32), 12)
    enc_t = pack_encoder_tables([DC_LUMA, DC_CHROMA, DC_CHROMA],
                                [AC_LUMA, AC_CHROMA, AC_CHROMA])
    dec_t = pack_decoder_tables(
        [Lut(DC_LUMA.dc_code_table(), ac=False),
         Lut(DC_CHROMA.dc_code_table(), ac=False),
         Lut(DC_CHROMA.dc_code_table(), ac=False)],
        [Lut(AC_LUMA.ac_code_table(), ac=True),
         Lut(AC_CHROMA.ac_code_table(), ac=True),
         Lut(AC_CHROMA.ac_code_table(), ac=True)])
    bps = int(rng.choice([4, 8, 16, 48]))
    segments = encode_scan_tpu(q, ci, bps, enc_t)
    destuffed = [destuff_segments(s)[0] for s in segments]
    decoded = decode_scan_tpu(destuffed, ci, bps, dec_t)
    assert np.array_equal(decoded, q)
