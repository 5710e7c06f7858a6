"""Worker for the two-process jax.distributed validation test.

Launched (twice) by tests/test_multiprocess.py with a scrubbed
environment: CPU backend, 2 local devices per process, jax.distributed
over localhost. Exercises the multi-controller code paths for real:
make_array_from_process_local_data, make_array_from_callback, global-mesh
shard_map collectives, and the mesh-sharded sessions over a real
bitstream — asserting bit/byte-identity with the single-process results.

Usage: python _multiproc_worker.py <coordinator> <num_processes> <pid>
"""

import sys

import numpy as np


def main() -> int:
    coordinator, num_processes, pid = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=pid)
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.devices()) == 2 * num_processes  # 2 local devices each

    import jax.numpy as jnp

    from video_coding_tpu.ops import datapath
    from video_coding_tpu.parallel import (global_codec_mesh,
                                           mjpeg_multihost_step)
    from video_coding_tpu.parallel.pipeline import (_luma_rate_tables,
                                                    rate_exact_bits)

    # ---- frame-sharded codec step across the processes ------------------
    mesh = global_codec_mesh(seg_parallel=2)
    n_dev = 2 * num_processes
    assert dict(mesh.shape) == {"data": n_dev // 2, "seg": 2}
    rng = np.random.default_rng(7)
    F, N = 4, 8
    frames_global = rng.integers(0, 256, size=(F, N, 8, 8)).astype(np.uint8)
    quant = rng.integers(1, 64, size=(N, 64)).astype(np.int32)
    # each process feeds only its local half of the frames
    f_local = F // num_processes
    local = frames_global[pid * f_local:(pid + 1) * f_local]
    qc, recon, rates, psnr = mjpeg_multihost_step(mesh, local, quant)
    jax.block_until_ready((qc, recon, rates, psnr))
    # rates is sharded over 'data' (spans both processes) — gather it
    from jax.experimental import multihost_utils

    rates = multihost_utils.process_allgather(rates, tiled=True)

    # single-device golden (computed independently in this process)
    flat = frames_global.reshape(F * N, 8, 8)
    qrep = np.tile(quant, (F, 1))
    qc_ref = np.asarray(datapath.decode_datapath_jnp(
        np.zeros((1, 64), np.int32), np.ones((1, 64), np.int32)))  # warm
    qc_ref = np.asarray(datapath.encode_datapath_jnp(flat, qrep))
    rates_ref = np.asarray(rate_exact_bits(
        jnp.asarray(qc_ref), *map(jnp.asarray, _luma_rate_tables())))
    rates_ref = rates_ref.reshape(F, N).sum(axis=1)
    assert np.array_equal(np.asarray(rates), rates_ref), \
        (np.asarray(rates), rates_ref)

    recon_ref = np.asarray(datapath.decode_datapath_jnp(qc_ref, qrep))
    mse = np.mean((flat.astype(np.float64) - recon_ref) ** 2)
    psnr_ref = 10 * np.log10(255.0 ** 2 / mse)
    assert abs(float(psnr) - psnr_ref) < 1e-3, (float(psnr), psnr_ref)

    # ---- mesh-sharded sessions over a real bitstream --------------------
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.model.decoder import Header, decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import (JpegDecoderSession,
                                                 JpegEncoderSession)

    w, h = 96, 64  # 24 one-MCU restart segments over 4 devices
    frame = Frame(
        Plane(data=rng.integers(0, 256, (h, w)).astype(np.uint8)),
        Plane(data=rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)),
        Plane(data=rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)),
        ChromaSubsampling.C420)
    params = Parameters.c420(w, h, 75)
    stream_ref = JpegEncoderSession(params, restart_interval=1,
                                    entropy="python").encode(frame)

    enc = JpegEncoderSession(params, restart_interval=1, mesh=mesh)
    assert enc.encode_device(frame) == stream_ref, "sharded encode diverged"

    bits = BitReader(stream_ref)
    header = Header.decode(bits)
    payload = stream_ref[bits.bit_pos >> 3:]
    golden = decode_a_frame(stream_ref)
    dec = JpegDecoderSession(header, mesh=mesh)
    got = dec.decode_device(payload)
    for p in "yuv":
        assert np.array_equal(getattr(got, p).data,
                              getattr(golden, p).data), p

    print(f"WORKER{pid} OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
