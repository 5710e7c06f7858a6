"""Benchmark: bit-exact baseline JPEG decode+encode throughput per chip.

Workload (BASELINE.json config 3 analog): 1080p 4:2:0, quality 75,
restart interval = 1 MCU (maximally parallel-decodable stream), through
the production engine:
- encode: planes → device block numerics → threaded C++ entropy
- decode: fused on-device graph (vectorized Huffman + datapath + plane
  assembly), batched over frames

Prints ONE JSON line:
  {"metric": ..., "value": MPix/s (decode+encode pipeline, all planes,
   host-to-host), "unit": "MPix/s", "vs_baseline": value / 13.7}
plus detail fields (device-resident decode rate, per-stage times,
platform). vs_baseline compares against the reference RTL accelerator's
serial-IDCT bound of 13.7 MPix/s per instance (BASELINE.md).

Environment resilience: the tunneled TPU in this container intermittently
wedges. The bench probes the device first; if unresponsive it re-executes
itself on the CPU backend (clearly labeled "cpu-fallback") rather than
reporting nothing. A watchdog guarantees one JSON line either way.
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

WATCHDOG_SECS = 540
METRIC = "decode+encode MPix/s/chip (bit-exact baseline JPEG, 1080p q75)"


def _watchdog():
    print(json.dumps({
        "metric": METRIC, "value": 0.0, "unit": "MPix/s",
        "vs_baseline": 0.0,
        "error": "watchdog timeout (TPU tunnel stalled)",
    }), flush=True)
    os._exit(2)


def probe_tpu(timeout_s: float = 150.0) -> bool:
    """Run a trivial device op in a subprocess with a timeout — a wedged
    tunnel hangs the process, so probing in-process is not safe."""
    code = ("import jax, jax.numpy as jnp;"
            "print(int(jnp.arange(8).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return r.returncode == 0 and b"28" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def cpu_fallback() -> int:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["VCT_BENCH_PLATFORM"] = "cpu-fallback"
    r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
    return r.returncode


def main() -> int:
    timer = threading.Timer(WATCHDOG_SECS, _watchdog)
    timer.daemon = True
    timer.start()

    t_wall0 = time.perf_counter()
    platform = os.environ.get("VCT_BENCH_PLATFORM", "tpu")
    if platform == "tpu" and os.environ.get("PALLAS_AXON_POOL_IPS"):
        if not probe_tpu():
            timer.cancel()
            return cpu_fallback()

    import jax
    # per-platform cache dir: CPU AOT artifacts are machine-feature
    # sensitive and must not mix with the remote-compiled TPU entries.
    # The CPU dir is additionally keyed by the host's CPU feature flags:
    # XLA will happily *load* AOT artifacts compiled on a different
    # machine type (with a warning) and run them with degraded codegen —
    # measured ~2.5x slower here when a stale cache from another host was
    # reused.
    if platform == "tpu":
        cache_name = ".jax_cache"
    else:
        import hashlib
        try:
            with open("/proc/cpuinfo") as f:
                flags = next((l for l in f if l.startswith("flags")), "")
        except OSError:
            flags = ""
        cache_name = ".jax_cache_cpu-" + hashlib.sha1(
            flags.encode()).hexdigest()[:8]
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   cache_name))

    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.model.decoder import Header, decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import (JpegDecoderSession,
                                                 JpegEncoderSession)

    W, H = 1920, 1080
    mouse = decode_a_frame(
        open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read())

    def tile(d, h, w):
        ph, pw = d.shape
        return np.tile(d, ((h + ph - 1) // ph, (w + pw - 1) // pw))[:h, :w]

    frame = Frame(
        Plane(data=tile(mouse.y.data, H, W).copy()),
        Plane(data=tile(mouse.u.data, H // 2, W // 2).copy()),
        Plane(data=tile(mouse.v.data, H // 2, W // 2).copy()),
        ChromaSubsampling.C420)
    px = W * H * 3 // 2

    enc = JpegEncoderSession(Parameters.c420(W, H, 75), restart_interval=1)
    stream = enc.encode(frame)  # host-entropy path (C++ threads)

    bits = BitReader(stream)
    header = Header.decode(bits)
    dec = JpegDecoderSession(header)
    payload = stream[bits.bit_pos >> 3:]

    # correctness gate: fused device decode must be bit-exact vs model
    model_frame = decode_a_frame(stream)
    eng_frame = dec.decode_device(payload)
    for p in "yuv":
        if not np.array_equal(getattr(eng_frame, p).data,
                              getattr(model_frame, p).data):
            print(json.dumps({
                "metric": METRIC, "value": 0.0, "unit": "MPix/s",
                "vs_baseline": 0.0,
                "error": f"bit-exactness check failed on plane {p}",
            }), flush=True)
            return 1

    # ---- encode: device numerics + threaded host entropy ---------------
    iters = 6
    enc.encode(frame)
    enc.encode(frame)  # second warmup: sparse-cap adaptation recompiles once
    t0 = time.perf_counter()
    for _ in range(iters):
        enc.encode(frame)
    t_enc_single = (time.perf_counter() - t0) / iters

    FE = 4
    enc_frames = [frame] * FE
    enc.encode_batch(enc_frames)
    t0 = time.perf_counter()
    for _ in range(2):
        enc.encode_batch(enc_frames)
    t_enc_batch = (time.perf_counter() - t0) / (2 * FE)
    # streaming encode: frames in flight (host entropy ∥ device numerics)
    t0 = time.perf_counter()
    for _ in enc.encode_iter(enc_frames + enc_frames, depth=3):
        pass
    t_enc_iter = (time.perf_counter() - t0) / (2 * FE)
    t_enc = min(t_enc_single, t_enc_batch, t_enc_iter)

    # ---- decode: fused on-device, batched ------------------------------
    F = 8
    payloads = [payload] * F
    # stacked form: per-frame device slicing (decode_device_batch) costs
    # one relay dispatch per slice; the stacked planes are the resident
    # consumer shape
    r = dec.decode_device_batch_stacked(payloads)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = dec.decode_device_batch_stacked(payloads)
        jax.block_until_ready(r)
    t_dec_dev = (time.perf_counter() - t0) / (reps * F)

    # pipelined batches of the resident decode (host prep/upload of
    # chunk i+1 overlaps chunk i's device graph)
    def time_dec_dev_stream():
        n = 2 * F
        t0 = time.perf_counter()
        for planes in dec.decode_device_batch_iter([payload] * n,
                                                   batch=F, depth=2):
            jax.block_until_ready(planes)
        return (time.perf_counter() - t0) / n

    dwindows = sorted(time_dec_dev_stream() for _ in range(3))
    t_dec_dev_stream = dwindows[len(dwindows) // 2]

    t0 = time.perf_counter()
    for _ in range(reps):
        r = dec.decode_device_batch(payloads)
        _ = [[np.asarray(p) for p in planes] for planes in r]
    t_dec_fused = (time.perf_counter() - t0) / (reps * F)

    # ---- decode: host C++ entropy + device datapath (alternative) ------
    dec.decode(payload)
    t0 = time.perf_counter()
    for _ in range(4):
        dec.decode(payload)
    t_dec_mixed = (time.perf_counter() - t0) / 4

    # streaming decode: frames in flight (host entropy ∥ device datapath)
    t0 = time.perf_counter()
    for _ in dec.decode_iter([payload] * 6, depth=3):
        pass
    t_dec_iter = (time.perf_counter() - t0) / 6

    t_dec = min(t_dec_fused, t_dec_mixed, t_dec_iter)

    # ---- speed-of-light tracking details (VERDICT r3 item 7) -----------
    # single-frame fused e2e (planes stay in HBM) and the entropy kernel
    # alone: the gap between them is the per-round fusion headroom.
    r = dec.decode_device_e2e(payload)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(4):
        r = dec.decode_device_e2e(payload)
        jax.block_until_ready(r)
    t_dec_e2e = (time.perf_counter() - t0) / 4

    kernel_ms = None
    elapsed = time.perf_counter() - t_wall0
    # (tpu only: the CPU fallback would run the kernel in interpret mode,
    # minutes of pure-Python per frame — not a meaningful detail number)
    if platform == "tpu" \
            and os.environ.get("VCT_BENCH_KERNEL_DETAIL", "1") != "0" \
            and elapsed < 330.0:
        # separate process: a fresh kernel compile through a wedged relay
        # can hang; its own timeout keeps the watchdog safe
        try:
            rp = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "decode_profile.py"),
                 "--kernel-only", "--iters", "3"],
                capture_output=True,
                timeout=min(150.0, 420.0 - elapsed))
            if rp.returncode == 0:
                detail = json.loads(
                    rp.stdout.decode().strip().splitlines()[-1])
                kernel_ms = detail.get("ms_entropy_kernel")
        except (subprocess.TimeoutExpired, ValueError, IndexError):
            pass

    # ---- decode+encode per chip, pixels device-resident -----------------
    # The transcode session is the faithful per-chip decode+encode
    # measurement: the full decode (entropy + datapath) chains into the
    # full encode (datapath + entropy) through device-resident planes,
    # and only compressed bitstreams cross the host boundary — the shape
    # of a production decode+encode service (and of this container, where
    # the tunneled host link is ~3 orders of magnitude slower than PCIe).
    from video_coding_tpu.runtime.engine import JpegTranscodeSession

    trans = JpegTranscodeSession(header, quality=75, restart_interval=1)
    out0 = trans.transcode(payload)
    # second warm: the first call runs the encode budget ladder and locks
    # a (smaller) per-segment buffer; the locked-budget graph compiles on
    # the next call — timing after one warm call would include it
    trans.transcode(payload)
    # correctness gate: device transcode == host-roundtrip re-encode
    ref = enc.encode(dec.decode(payload))
    if out0 != ref:
        print(json.dumps({
            "metric": METRIC, "value": 0.0, "unit": "MPix/s",
            "vs_baseline": 0.0,
            "error": "transcode bytes differ from host re-encode",
        }), flush=True)
        return 1
    reps_t = 4

    def time_trans_sync():
        t0 = time.perf_counter()
        for _ in range(reps_t):
            trans.transcode(payload)
        return (time.perf_counter() - t0) / reps_t

    t_trans_sync = time_trans_sync()

    # streaming transcode: frames in flight — host entropy re-encode of
    # frame i overlaps frame i+1's device decode (the steady state of a
    # production re-encode service)
    FT = 6

    def time_trans_iter():
        t0 = time.perf_counter()
        for _ in trans.transcode_iter([payload] * FT, depth=3):
            pass
        return (time.perf_counter() - t0) / FT

    # five measurement windows, HEADLINE = MEDIAN (VERDICT r4: min() of
    # two windows was a best-case estimator on a ±40% timeshared chip —
    # the recorded number must be a defensible statistic, like the
    # reference's deterministic synthesis facts, decoder_accelerator.ml:4-5).
    # The per-window raw values ride along as detail fields.
    windows = sorted(time_trans_iter() for _ in range(5))
    t_trans_iter = windows[len(windows) // 2]

    # batched fused transcode: F frames in ONE device dispatch (the
    # transcode analog of the batched decode/encode paths — amortizes
    # the per-dispatch relay cost F-fold). Byte-gated against the
    # per-frame output above.
    # batch=16 beat 8 (175.8 vs 156.5 median) and 32 on the dispatch/
    # compile tradeoff sweep (BENCH_NOTES round 5)
    FB = 16
    outs_b = trans.transcode_batch([payload] * FB)  # compile + ladder
    if any(o != ref for o in outs_b):
        print(json.dumps({
            "metric": METRIC, "value": 0.0, "unit": "MPix/s",
            "vs_baseline": 0.0,
            "error": "batched transcode bytes differ from host re-encode",
        }), flush=True)
        return 1
    trans.transcode_batch([payload] * FB)  # locked-budget graph warm

    def time_trans_batch():
        t0 = time.perf_counter()
        trans.transcode_batch([payload] * FB)
        return (time.perf_counter() - t0) / FB

    bwindows = sorted(time_trans_batch() for _ in range(5))
    t_trans_batch = bwindows[len(bwindows) // 2]

    # pipelined batches: chunk i's host prep/fetch overlaps chunk i+1's
    # device graph — the production steady state (dispatch amortization
    # AND host/device overlap)
    def time_trans_batch_iter():
        n = 2 * FB
        t0 = time.perf_counter()
        for _ in trans.transcode_batch_iter([payload] * n, batch=FB,
                                            depth=2):
            pass
        return (time.perf_counter() - t0) / n

    sbwindows = sorted(time_trans_batch_iter() for _ in range(5))
    t_trans_bstream = sbwindows[len(sbwindows) // 2]
    # sanity (VERDICT r3 weak #2): the sync and streamed transcode differ
    # only in overlap — a sync rate below 0.3x the streamed one means a
    # relay stall landed inside the measurement. Re-measure once; if it
    # persists, flag the line rather than letting the anomaly pass silent.
    anomaly = None
    if t_trans_sync > t_trans_iter / 0.3:
        t_trans_sync = time_trans_sync()
        if t_trans_sync > t_trans_iter / 0.3:
            anomaly = "transcode_sync stalled (re-measured, still <0.3x stream)"
    t_trans = min(t_trans_sync, t_trans_iter, t_trans_batch,
                  t_trans_bstream)

    # calibration kernel: a fixed bf16 matmul chain timed in the same
    # window, so cross-round headline comparisons can cancel the chip's
    # timeshare drift (VERDICT r4 item 2). 8 chained 2048^2 dots ≈
    # 137 GFLOP; the carried value is a fixpoint (a[i,j] = 1/2048) so the
    # loop is hoist-proof but numerically stable.
    calib_ms = None
    if platform == "tpu":
        import jax.numpy as jnp

        a_cal = jnp.full((2048, 2048), 1.0 / 2048.0, jnp.bfloat16)

        @jax.jit
        def _calib(y):
            return jax.lax.fori_loop(
                0, 8, lambda i, x: jnp.dot(
                    x, a_cal, preferred_element_type=jnp.bfloat16), y)

        jax.block_until_ready(_calib(a_cal))
        t0 = time.perf_counter()
        jax.block_until_ready(_calib(a_cal))
        calib_ms = round((time.perf_counter() - t0) * 1e3 / 8, 3)

    # headline: best decode+encode path (each frame fully decoded and
    # re-encoded, bit-exactness gated above)
    t_pipeline = t_enc + t_dec
    value = px / min(t_pipeline, t_trans) / 1e6
    path = "transcode" if t_trans < t_pipeline else "host-to-host"
    timer.cancel()
    print(json.dumps({
        "metric": METRIC,
        "value": round(value, 2),
        "unit": "MPix/s",
        "vs_baseline": round(value / 13.7, 2),
        "path": path,
        "pipeline_mpix_s": round(px / t_pipeline / 1e6, 2),
        "transcode_mpix_s": round(px / t_trans / 1e6, 2),
        "transcode_sync_mpix_s": round(px / t_trans_sync / 1e6, 2),
        "transcode_stream_mpix_s": round(px / t_trans_iter / 1e6, 2),
        "transcode_stream_windows_mpix_s": [
            round(px / w / 1e6, 2) for w in windows],
        "transcode_batch_mpix_s": round(px / t_trans_batch / 1e6, 2),
        "transcode_batch_windows_mpix_s": [
            round(px / w / 1e6, 2) for w in bwindows],
        "transcode_batch_stream_mpix_s": round(
            px / t_trans_bstream / 1e6, 2),
        "transcode_batch_stream_windows_mpix_s": [
            round(px / w / 1e6, 2) for w in sbwindows],
        "calib_matmul_ms": calib_ms,
        "platform": platform,
        "encode_mpix_s": round(px / t_enc / 1e6, 2),
        "encode_single_mpix_s": round(px / t_enc_single / 1e6, 2),
        "encode_batch_mpix_s": round(px / t_enc_batch / 1e6, 2),
        "decode_mpix_s": round(px / t_dec / 1e6, 2),
        "decode_fused_mpix_s": round(px / t_dec_fused / 1e6, 2),
        "decode_mixed_mpix_s": round(px / t_dec_mixed / 1e6, 2),
        "decode_stream_mpix_s": round(px / t_dec_iter / 1e6, 2),
        "encode_stream_mpix_s": round(px / t_enc_iter / 1e6, 2),
        "decode_device_resident_mpix_s": round(px / t_dec_dev / 1e6, 2),
        "decode_device_stream_mpix_s": round(
            px / t_dec_dev_stream / 1e6, 2),
        "decode_device_e2e_mpix_s": round(px / t_dec_e2e / 1e6, 2),
        "entropy_kernel_ms": kernel_ms,
        "encode_ms_per_frame": round(t_enc * 1e3, 2),
        "decode_ms_per_frame": round(t_dec * 1e3, 2),
        "stream_bytes": len(stream),
        "restart_segments": enc.n_blocks // enc.blocks_per_segment,
        "decode_batch": F,
        **({"anomaly": anomaly} if anomaly else {}),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
