"""MJPEG container + multi-host pipeline tests (BASELINE configs 2/4/5)."""

import numpy as np
import pytest

import jax

from video_coding_tpu.common.frame import ChromaSubsampling, Frame
from video_coding_tpu.common.plane import Plane
from video_coding_tpu.model import decoder as mdec
from video_coding_tpu.tools import mjpeg


@pytest.fixture(scope="module")
def frames(mini64_frames):
    rng = np.random.default_rng(0)
    base = mini64_frames[ChromaSubsampling.C420]
    out = []
    for _ in range(4):
        g = base.copy()
        g.y.data[...] = np.clip(
            g.y.data.astype(int) + rng.integers(0, 9, g.y.data.shape),
            0, 255)
        out.append(g)
    return out


def test_mjpeg_roundtrip(frames):
    stream = mjpeg.encode_stream(frames, quality=80, restart_interval=2)
    parts = mjpeg.split_stream(stream)
    assert len(parts) == 4
    for part in parts:
        assert part.startswith(b"\xff\xd8") and part.endswith(b"\xff\xd9")
    decoded = mjpeg.decode_stream(stream)
    for f, part in zip(decoded, parts):
        ref = mdec.decode_a_frame(part)
        for p in "yuv":
            assert (getattr(f, p).data == getattr(ref, p).data).all()


def test_mjpeg_split_handles_marker_like_payload():
    """A quant table value of 0xD9 after 0xFF must not fake an EOI: header
    segments are skipped via length fields."""
    from video_coding_tpu.model.encoder import Encoder, Parameters, Identified
    from video_coding_tpu.model.huffman import (AC_LUMA, DC_LUMA)

    qt = np.full(64, 255, dtype=np.int32)
    qt[1] = 217  # 0xD9
    params = Parameters(
        width=16, height=16,
        quant_tables=(Identified(0, qt),),
        dc_huffman_tables=(Identified(0, DC_LUMA),),
        ac_huffman_tables=(Identified(0, AC_LUMA),),
        scan_components=(
            __import__("video_coding_tpu.model.encoder",
                       fromlist=["ScanComponentParams"])
            .ScanComponentParams(0, 0, 0, 1, 1, 1),),
    )
    enc = Encoder(params)
    enc.load_plane(Plane(data=np.full((16, 16), 255, dtype=np.uint8)))
    enc.write_headers()
    enc.encode()
    enc.complete_and_write_eoi()
    data = enc.writer.get_buffer()
    parts = mjpeg.split_stream(data + data)
    assert len(parts) == 2
    assert parts[0] == data


def test_512x512_q75_psnr_config(psnr_fn):
    """BASELINE config 2: 512x512 4:2:0 Q=75 — engine bytes are identical
    to the model's, hence PSNR is exactly the reference encoder's."""
    from video_coding_tpu.model import encoder as menc
    from video_coding_tpu.runtime import engine

    rng = np.random.default_rng(1)
    base = rng.integers(0, 250, (128, 128))
    up = np.kron(base, np.ones((4, 4)))[:512, :512]
    f = Frame.create(ChromaSubsampling.C420, 512, 512)
    f.y.data[...] = np.clip(up + rng.integers(-5, 5, (512, 512)),
                            0, 255).astype(np.uint8)
    f.u.data[...] = 128
    f.v.data[...] = 128
    ours = engine.encode_jpeg(f, 75)
    model = menc.encode_420(f, 75)
    assert ours == model
    dec = mdec.decode_a_frame(ours)
    assert psnr_fn(f.y.data, dec.y.data) > 30


def test_multihost_step_single_process(frames):
    """multihost pipeline degenerates correctly to the local mesh."""
    from video_coding_tpu.model import quant_tables
    from video_coding_tpu.parallel import multihost
    from video_coding_tpu.parallel.pipeline import mjpeg_codec_step
    from video_coding_tpu.ops import datapath

    mesh = multihost.global_codec_mesh(seg_parallel=2)
    rng = np.random.default_rng(2)
    F, N = 4, 8
    local = rng.integers(0, 256, size=(F, N, 8, 8)).astype(np.uint8)
    quant = np.tile(quant_tables.scale(quant_tables.LUMA, 75),
                    (N, 1)).astype(np.int32)
    qc, recon, rates, psnr = multihost.mjpeg_multihost_step(
        mesh, local, quant)
    flat = local.reshape(F * N, 8, 8)
    qrep = np.tile(quant, (F, 1))
    qc_ref = np.asarray(datapath.encode_datapath_jnp(flat, qrep))
    assert np.array_equal(np.asarray(qc).reshape(-1, 64), qc_ref)


def test_scaling_benchmark_runs():
    import subprocess
    import sys
    import os

    repo = __import__("pathlib").Path(__file__).parent.parent
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = str(repo)
    r = subprocess.run(
        [sys.executable, str(repo / "benchmarks" / "scaling.py"),
         "--resolution", "64x64", "--frames", "8", "--qualities", "75",
         "--iters", "1"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    import json
    lines = [json.loads(l) for l in r.stdout.strip().splitlines()]
    assert any(row["devices"] == 8 for row in lines)


def test_mjpeg_stream_iter_matches_batch(mini64_frames):
    from video_coding_tpu.common.frame import ChromaSubsampling
    from video_coding_tpu.tools import mjpeg

    f = mini64_frames[ChromaSubsampling.C420]
    frames = [f] * 4
    stream = mjpeg.encode_stream(frames, 75, restart_interval=2)
    parts = list(mjpeg.encode_stream_iter(frames, 75, restart_interval=2,
                                          depth=3))
    assert mjpeg.join_stream(parts) == stream
    batch = mjpeg.decode_stream(stream)
    for got, ref in zip(mjpeg.decode_stream_iter(stream, depth=3), batch,
                        strict=True):
        for p in "yuv":
            assert np.array_equal(getattr(got, p).data,
                                  getattr(ref, p).data)


def test_mjpeg_decode_stream_resync(mini64_frames):
    """A corrupt frame in an MJPEG stream concealed, others exact."""
    from video_coding_tpu.common.frame import ChromaSubsampling
    from video_coding_tpu.tools import mjpeg

    f = mini64_frames[ChromaSubsampling.C420]
    stream = mjpeg.encode_stream([f] * 4, 75, restart_interval=2)
    parts = mjpeg.split_stream(stream)
    clean = mjpeg.decode_stream(stream)
    # corrupt frame 2's entropy mid-way
    bad2 = bytearray(parts[2])
    bad2[len(bad2) // 2:len(bad2) // 2 + 6] = b"\xff\x00" * 3
    bad_stream = mjpeg.join_stream(
        [parts[0], parts[1], bytes(bad2), parts[3]])
    got = mjpeg.decode_stream(bad_stream, resync=True)
    assert len(got) == 4
    for i in (0, 1, 3):
        for p in "yuv":
            assert np.array_equal(getattr(got[i], p).data,
                                  getattr(clean[i], p).data)
    # damaged frame still full-size output
    assert got[2].y.data.shape == clean[2].y.data.shape
