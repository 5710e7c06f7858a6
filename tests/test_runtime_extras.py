"""Batch sessions, tracing, generate/dct CLI tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from video_coding_tpu.common.bitstream import BitReader
from video_coding_tpu.common.frame import ChromaSubsampling
from video_coding_tpu.model import decoder as mdec
from video_coding_tpu.model.encoder import Parameters
from video_coding_tpu.runtime import engine
from video_coding_tpu.runtime.trace import pipeline_trace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(module, *args):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", module, *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)


@pytest.fixture(scope="module")
def frame_batch(mini64_frames):
    rng = np.random.default_rng(0)
    base = mini64_frames[ChromaSubsampling.C420]
    frames = []
    for _ in range(3):
        g = base.copy()
        g.y.data[...] = np.clip(
            g.y.data.astype(int) + rng.integers(0, 6, g.y.data.shape),
            0, 255)
        frames.append(g)
    return frames


def test_encode_batch_matches_singles(frame_batch):
    sess = engine.JpegEncoderSession(Parameters.c420(64, 64, 75),
                                     restart_interval=2)
    assert sess.encode_batch(frame_batch) == [
        sess.encode(f) for f in frame_batch]


def test_decode_batch_bit_exact(frame_batch):
    sess = engine.JpegEncoderSession(Parameters.c420(64, 64, 75),
                                     restart_interval=2)
    streams = sess.encode_batch(frame_batch)
    bits = BitReader(streams[0])
    dsess = engine.JpegDecoderSession(mdec.Header.decode(bits))
    payloads = []
    for s in streams:
        r = BitReader(s)
        mdec.Header.decode(r)
        payloads.append(s[r.bit_pos >> 3:])
    out = dsess.decode_batch(payloads)
    for i, s in enumerate(streams):
        ref = mdec.decode_a_frame(s)
        for p in "yuv":
            assert (getattr(out[i], p).data == getattr(ref, p).data).all()


def test_pipeline_trace_matches_datapath():
    from video_coding_tpu.ops import datapath

    rng = np.random.default_rng(0)
    coefs = rng.integers(-300, 300, size=(16, 64)).astype(np.int32)
    quant = rng.integers(1, 64, size=(16, 64)).astype(np.int32)
    tr = pipeline_trace(coefs, quant)
    ref = np.asarray(datapath.decode_datapath_jnp(coefs, quant))
    assert np.array_equal(tr.recon, ref)
    # intermediates have sane shapes and the stages chain
    assert tr.after_row_pass.shape == (16, 8, 8)
    assert (tr.clipped <= 127).all() and (tr.clipped >= -128).all()


def test_generate_cli_decoder():
    r = run_cli("video_coding_tpu.cli.generate_cli", "decoder",
                "--blocks", "128")
    assert r.returncode == 0, r.stderr
    assert "stablehlo" in r.stdout or "module" in r.stdout


def test_generate_cli_entropy_decoder():
    r = run_cli("video_coding_tpu.cli.generate_cli", "entropy-decoder",
                "--blocks", "8")
    assert r.returncode == 0, r.stderr
    assert "while" in r.stdout  # the vectorized Huffman loop lowers to a while op


def test_dct_tool_eval():
    r = run_cli("video_coding_tpu.cli.dct_tool", "both",
                "--rom-prec", "12", "--transpose-prec", "2",
                "--count", "50")
    assert r.returncode == 0, r.stderr
    assert "max_err=" in r.stdout
    # 12-bit ROM round trip is accurate to ≤ 2 (the reference tolerance)
    max_err = int(r.stdout.split("max_err=")[1].split()[0])
    assert max_err <= 2


def test_dct_tool_search():
    r = run_cli("video_coding_tpu.cli.dct_tool", "search",
                "--rom-min", "10", "--rom-max", "11",
                "--transpose-min", "0", "--transpose-max", "1",
                "--count", "20")
    assert r.returncode == 0, r.stderr
    assert len(r.stdout.strip().splitlines()) == 5  # header + 4 rows


def test_transcode_session_matches_model_roundtrip(mini64_frames):
    """JPEG->JPEG transcode with device-resident pixels must equal the
    model's decode-then-encode byte-for-byte."""
    from video_coding_tpu.common.frame import ChromaSubsampling
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.model import decoder as mdec_mod
    from video_coding_tpu.model import encoder as menc_mod

    src = mini64_frames[ChromaSubsampling.C420]
    stream = menc_mod.encode_420(src, 90, restart_interval=2)
    bits = BitReader(stream)
    header = mdec_mod.Header.decode(bits)
    t = engine.JpegTranscodeSession(header, quality=60, restart_interval=3)
    out = t.transcode(stream[bits.bit_pos >> 3:])
    ref = menc_mod.encode_420(mdec_mod.decode_a_frame(stream), 60,
                              restart_interval=3)
    assert out == ref
    # pipelined streaming transcode: ordered and byte-identical
    outs = list(t.transcode_iter([stream[bits.bit_pos >> 3:]] * 3, depth=2))
    assert outs == [ref] * 3


def test_decode_device_rgb_batch_matches_single(mini64_frames):
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.common.frame import ChromaSubsampling
    from video_coding_tpu.model.decoder import Header

    f = mini64_frames[ChromaSubsampling.C420]
    data = engine.encode_jpeg(f, 75, restart_interval=2)
    bits = BitReader(data)
    header = Header.decode(bits)
    payload = data[bits.bit_pos >> 3:]
    sess = engine.JpegDecoderSession(header, impl="jnp")
    single = np.asarray(sess.decode_device_rgb(payload))
    batch = np.asarray(sess.decode_device_rgb_batch([payload] * 3))
    assert batch.shape == (3,) + single.shape
    for i in range(3):
        assert np.array_equal(batch[i], single)


def test_jpeg_rgb_dataset(mini64_frames):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_coding_tpu.common.frame import ChromaSubsampling
    from video_coding_tpu.parallel.mesh import make_mesh
    from video_coding_tpu.runtime.dataset import JpegRgbDataset
    from video_coding_tpu.tools import mjpeg

    f = mini64_frames[ChromaSubsampling.C420]
    stream = mjpeg.encode_stream([f] * 10, 75, restart_interval=2)
    ds = JpegRgbDataset(stream, batch_size=4, prefetch=2)
    assert len(ds) == 3 and ds.frame_shape == (64, 64, 3)
    batches = list(ds)
    assert [b.shape[0] for b in batches] == [4, 4, 2]
    # values match the single-frame RGB decode
    single = np.asarray(ds.session.decode_device_rgb(ds.payloads[0]))
    assert np.array_equal(np.asarray(batches[0][0]), single)
    # drop_remainder
    assert [b.shape[0] for b in
            JpegRgbDataset(stream, batch_size=4, drop_remainder=True)] \
        == [4, 4]
    # sharded hand-off over the virtual 8-device mesh's data axis
    mesh = make_mesh((8,), ("data",))
    ds8 = JpegRgbDataset(stream[:0] + stream, batch_size=8,
                         drop_remainder=True,
                         sharding=NamedSharding(mesh, P("data")))
    (b,) = list(ds8)
    assert b.shape[0] == 8
    assert len(b.sharding.device_set) == 8
