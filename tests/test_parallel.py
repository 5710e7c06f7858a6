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


def test_rate_exchange_matches_model_size_categories(mesh):
    from video_coding_tpu.model.encoder import size_category

    rng = np.random.default_rng(3)
    F, N = 2, 8
    frames = rng.integers(0, 256, size=(F, N, 8, 8)).astype(np.uint8)
    quant = rng.integers(1, 64, size=(N, 64)).astype(np.int32)
    qc, _recon, rates, _psnr = mjpeg_codec_step(mesh, frames, quant)
    qc = np.asarray(qc)
    for f in range(F):
        expect = sum(size_category(int(v)) for v in qc[f].ravel())
        assert int(np.asarray(rates)[f]) == expect


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
