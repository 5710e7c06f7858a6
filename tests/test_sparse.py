"""Sparse coefficient transfer (ops/sparse.py + engine integration).

The mixed pipelines move quantized coefficients host↔device; packing them
as bitmask+nonzeros shrinks that ~4-6x. Results must be exactly equal to
the dense paths: byte-identical encodes, bit-exact decodes.
"""

import numpy as np
import pytest

from video_coding_tpu.common.bitstream import BitReader
from video_coding_tpu.common.frame import ChromaSubsampling
from video_coding_tpu.model import decoder as mdec
from video_coding_tpu.model import encoder as menc
from video_coding_tpu.ops import sparse
from video_coding_tpu.runtime import engine


def _random_coefs(rng, n_blocks=97, density=0.12):
    qc = rng.integers(-1024, 1025, size=(n_blocks, 64), dtype=np.int32)
    keep = rng.random((n_blocks, 64)) < density
    return np.where(keep, qc, 0).astype(np.int32)


def test_host_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    qc = _random_coefs(rng)
    mask, values, nnz = sparse.pack_host(qc)
    assert nnz == int((qc != 0).sum())
    out = sparse.unpack_host(mask, values, nnz, qc.shape[0])
    assert np.array_equal(out, qc)


def test_device_pack_host_unpack_and_back():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    qc = _random_coefs(rng)
    nnz_true = int((qc != 0).sum())
    cap = 1 << (nnz_true - 1).bit_length()
    mask, values, nnz = sparse.pack_device(jnp.asarray(qc), cap)
    assert int(nnz) == nnz_true
    out = sparse.unpack_host(np.asarray(mask), np.asarray(values),
                             int(nnz), qc.shape[0])
    assert np.array_equal(out, qc)
    # and device unpack of a host pack
    hmask, hvalues, hnnz = sparse.pack_host(qc)
    hvalues = np.pad(hvalues, (0, cap - hnnz))
    out_dev = sparse.unpack_device(jnp.asarray(hmask), jnp.asarray(hvalues),
                                   qc.shape[0])
    assert np.array_equal(np.asarray(out_dev), qc)


def test_device_pack_overflow_reports_nnz():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    qc = _random_coefs(rng, density=0.5)
    nnz_true = int((qc != 0).sum())
    _mask, _values, nnz = sparse.pack_device(jnp.asarray(qc), cap=16)
    assert int(nnz) == nnz_true  # caller sees nnz > cap and falls back


def test_all_zero_blocks():
    import jax.numpy as jnp

    qc = np.zeros((5, 64), np.int32)
    mask, values, nnz = sparse.pack_host(qc)
    assert nnz == 0
    assert np.array_equal(sparse.unpack_host(mask, values, 0, 5), qc)
    m, v, n = sparse.pack_device(jnp.asarray(qc), cap=256)
    assert int(n) == 0
    assert np.array_equal(
        np.asarray(sparse.unpack_device(m, v, 5)), qc)


def test_encoder_sparse_byte_identical(mini64_frames):
    f = mini64_frames[ChromaSubsampling.C420]
    from video_coding_tpu.model.encoder import Parameters

    params = Parameters.c420(64, 64, 75)
    dense = engine.JpegEncoderSession(params, restart_interval=2,
                                      coef_transfer="dense")
    sp = engine.JpegEncoderSession(params, restart_interval=2,
                                   coef_transfer="sparse")
    assert sp.encode(f) == dense.encode(f)
    assert sp.encode_batch([f, f, f]) == dense.encode_batch([f, f, f])


def test_encoder_sparse_overflow_falls_back(mini64_frames):
    f = mini64_frames[ChromaSubsampling.C420]
    from video_coding_tpu.model.encoder import Parameters

    params = Parameters.c420(64, 64, 10)  # low q → but force tiny cap
    sp = engine.JpegEncoderSession(params, coef_transfer="sparse")
    sp._cap_per_block = 0  # guarantee overflow on any nonzero frame
    ref = engine.JpegEncoderSession(params, coef_transfer="dense")
    assert sp.encode(f) == ref.encode(f)  # dense fallback, same bytes
    assert sp._cap_per_block > 0  # budget bumped for later frames


def test_decoder_sparse_bit_exact(mouse_jpg, mini64_frames):
    # restart stream (sparse batch path) + foreign stream (single path)
    f = mini64_frames[ChromaSubsampling.C420]
    rst = engine.encode_jpeg(f, 75, restart_interval=2)
    for data in (mouse_jpg, rst):
        bits = BitReader(data)
        header = mdec.Header.decode(bits)
        payload = data[bits.bit_pos >> 3:]
        golden = mdec.decode_a_frame(data)
        sp = engine.JpegDecoderSession(header, coef_transfer="sparse")
        got = sp.decode(payload)
        for p in "yuv":
            assert np.array_equal(getattr(got, p).data,
                                  getattr(golden, p).data)
        got_batch = sp.decode_batch([payload, payload])
        for g in got_batch:
            for p in "yuv":
                assert np.array_equal(getattr(g, p).data,
                                      getattr(golden, p).data)
