"""CLI end-to-end tests — the analog of the reference cram tier
(jpeg/test/*.t driven through the built executables)."""

import subprocess
import sys
import os

import numpy as np
import pytest

from video_coding_tpu.common.frame import ChromaSubsampling, Frame

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(module, *args):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", module, *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)


def test_model_cli_encode_decode_roundtrip(tmp_path, mini64_frames,
                                           psnr_fn):
    src = mini64_frames[ChromaSubsampling.C420]
    raw = tmp_path / "in.yuv"
    with open(raw, "wb") as f:
        src.output(f)
    jpg = tmp_path / "out.jpg"
    r = run_cli("video_coding_tpu.cli.model_cli", "encode", "frame",
                str(raw), str(jpg), "--size", "64x64", "--quality", "95",
                "--chroma", "420")
    assert r.returncode == 0, r.stderr
    out = tmp_path / "out.yuv"
    r = run_cli("video_coding_tpu.cli.model_cli", "decode", "frame",
                str(jpg), str(out))
    assert r.returncode == 0, r.stderr
    dec = Frame.create(ChromaSubsampling.C420, 64, 64)
    with open(out, "rb") as f:
        dec.input(f)
    assert psnr_fn(src.y.data, dec.y.data) > 46  # q=95 golden ~46.77


def test_model_cli_decode_header():
    r = run_cli("video_coding_tpu.cli.model_cli", "decode", "header",
                "/root/reference/jpeg/test_data/Mouse480.jpg")
    assert r.returncode == 0, r.stderr
    assert "width=480" in r.stdout and "height=320" in r.stdout


def test_model_cli_decode_log():
    r = run_cli("video_coding_tpu.cli.model_cli", "decode", "log",
                "/root/reference/jpeg/test_data/Mouse480.jpg",
                "--num-blocks", "2")
    assert r.returncode == 0, r.stderr
    assert "block 0" in r.stdout and "recon:" in r.stdout


def test_model_cli_encode_log(tmp_path, mini64_frames):
    src = mini64_frames[ChromaSubsampling.C420]
    raw = tmp_path / "in.yuv"
    with open(raw, "wb") as f:
        src.output(f)
    r = run_cli("video_coding_tpu.cli.model_cli", "encode", "log",
                str(raw), "--size", "64x64", "--quality", "75",
                "--chroma", "420", "--num-blocks", "1", "--verbose")
    assert r.returncode == 0, r.stderr
    assert "quant (zigzag):" in r.stdout and "error:" in r.stdout


def test_oyuv_compare(tmp_path, mini64_frames):
    src = mini64_frames[ChromaSubsampling.C420]
    a = tmp_path / "a.yuv"
    with open(a, "wb") as f:
        src.output(f)
    r = run_cli("video_coding_tpu.cli.oyuv", "compare", "max-difference",
                "yuv", str(a), str(a), "--size", "64x64",
                "--format", "420")
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "0: 0 0 0"
    r = run_cli("video_coding_tpu.cli.oyuv", "compare", "psnr", "y",
                str(a), str(a), "--size", "64x64", "--format", "420")
    assert "inf" in r.stdout


def test_oyuv_convert_420_444_roundtrip(tmp_path, mini64_frames, psnr_fn):
    src = mini64_frames[ChromaSubsampling.C420]
    a = tmp_path / "a.yuv"
    with open(a, "wb") as f:
        src.output(f)
    b = tmp_path / "b.yuv"
    r = run_cli("video_coding_tpu.cli.oyuv", "convert", str(a), str(b),
                "--size", "64x64", "--in-format", "420",
                "--out-format", "444")
    assert r.returncode == 0, r.stderr
    c444 = Frame.create(ChromaSubsampling.C444, 64, 64)
    with open(b, "rb") as f:
        c444.input(f)
    assert (c444.y.data == src.y.data).all()
    # back to 420
    c = tmp_path / "c.yuv"
    r = run_cli("video_coding_tpu.cli.oyuv", "convert", str(b), str(c),
                "--size", "64x64", "--in-format", "444",
                "--out-format", "420")
    assert r.returncode == 0, r.stderr
    back = Frame.create(ChromaSubsampling.C420, 64, 64)
    with open(c, "rb") as f:
        back.input(f)
    # co-located resample round trip is near-lossless on smooth chroma
    assert psnr_fn(src.u.data, back.u.data) > 30


def test_oyuv_convert_packed(tmp_path, mini64_frames):
    src = mini64_frames[ChromaSubsampling.C422]
    a = tmp_path / "a.yuv"
    with open(a, "wb") as f:
        src.output(f)
    b = tmp_path / "b.yuy2"
    r = run_cli("video_coding_tpu.cli.oyuv", "convert", str(a), str(b),
                "--size", "64x64", "--in-format", "422",
                "--out-format", "yuy2")
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(b) == 64 * 64 * 2
    c = tmp_path / "c.yuv"
    r = run_cli("video_coding_tpu.cli.oyuv", "convert", str(b), str(c),
                "--size", "64x64", "--in-format", "yuy2",
                "--out-format", "422")
    assert r.returncode == 0, r.stderr
    back = Frame.create(ChromaSubsampling.C422, 64, 64)
    with open(c, "rb") as f:
        back.input(f)
    assert (back.y.data == src.y.data).all()
    # chroma passes through the 4:4:4 intermediate (up+downsample), so it
    # is near- but not bit-identical — same as the reference oconv pipeline
    d = np.abs(back.u.data.astype(int) - src.u.data.astype(int))
    assert d.mean() < 3


def test_oyuv_play_headless(tmp_path, mini64_frames):
    src = mini64_frames[ChromaSubsampling.C420]
    a = tmp_path / "a.yuv"
    with open(a, "wb") as f:
        src.output(f)
        src.output(f)  # two frames
    out = tmp_path / "frames"
    r = run_cli("video_coding_tpu.cli.oyuv", "play", str(a),
                "--size", "64x64", "--format", "420",
                "--out-dir", str(out))
    assert r.returncode == 0, r.stderr
    assert sorted(os.listdir(out)) == ["frame_00000.png", "frame_00001.png"]


def test_simulate_cli_decoder(tmp_path):
    r = run_cli("video_coding_tpu.cli.simulate_cli", "decoder",
                "/root/reference/jpeg/test_data/mini.jpg",
                "--yuv", str(tmp_path / "out.yuv"))
    assert r.returncode == 0, r.stderr
    assert "PASS" in r.stdout
    assert (tmp_path / "out.yuv").exists()


def test_simulate_cli_encoder_accelerator(tmp_path, mini64_frames):
    src = mini64_frames[ChromaSubsampling.C420]
    raw = tmp_path / "in.yuv"
    with open(raw, "wb") as f:
        src.output(f)
    r = run_cli("video_coding_tpu.cli.simulate_cli", "encoder-accelerator",
                str(raw), "--size", "64x64", "--quality", "75",
                "--restart-interval", "2")
    assert r.returncode == 0, r.stderr
    assert "byte-identical" in r.stdout


def test_simulate_cli_inspect(tmp_path, mini64_frames):
    """The per-block inspector (waveform-viewer analog): one-shot block
    dump with stages, and the interactive stdin command loop."""
    from video_coding_tpu.runtime.engine import encode_jpeg

    src = mini64_frames[ChromaSubsampling.C420]
    jpg = tmp_path / "f.jpg"
    jpg.write_bytes(encode_jpeg(src, quality=75, restart_interval=1))

    r = run_cli("video_coding_tpu.cli.simulate_cli", "inspect", str(jpg),
                "--block", "2", "--stages")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "0 differ" in r.stdout
    assert "identical coefficients" in r.stdout
    assert "reconstruction:" in r.stdout

    # interactive: next / goto / next-diff / quit through stdin
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "video_coding_tpu.cli.simulate_cli",
         "inspect", str(jpg)],
        input="n\ng 5\nd\nq\n", capture_output=True, text=True, env=env,
        cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "block 1/" in r.stdout
    assert "block 5/" in r.stdout
    assert "no differing block" in r.stdout
