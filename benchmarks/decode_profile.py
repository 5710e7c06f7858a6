"""Stage profile of the fused device decode: host prep (destuff + pack +
balance), upload, entropy kernel, datapath+assembly — to find where
decode_device_e2e's wall time goes.

    timeout 560 python benchmarks/decode_profile.py --iters 5
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--quality", type=int, default=75)
    p.add_argument("--resolution", default="1920x1080")
    p.add_argument("--kernel-only", action="store_true",
                   help="measure just the entropy kernel (skips the fused "
                        "device-graph stages; used by bench.py to report "
                        "the speed-of-light detail field cheaply)")
    p.add_argument("--flat", action="store_true",
                   help="profile the flat-upload path stage by stage "
                        "(destuff_flat, host prep, upload, byte-lane vs "
                        "word-row materialization, kernel, full e2e) — "
                        "the ladder VERDICT r3 item 2 asks for")
    p.add_argument("--datapath", action="store_true",
                   help="dispatch-free stage ladder of the decode "
                        "datapath (dequant+IDCT+recon) and plane "
                        "assembly: full pallas path, kernel-only on "
                        "pre-formatted tiles, coef prep, quant prep, "
                        "epilogue, assembly gather (VERDICT r4 item 6)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.entropy import scan as entropy_scan
    from video_coding_tpu.entropy import tpu_decode
    from video_coding_tpu.model.decoder import Header, decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime import engine as eng

    W, H = (int(x) for x in args.resolution.split("x"))
    mpix = W * H * 1.5 / 1e6
    platform = jax.devices()[0].platform
    mouse = decode_a_frame(
        open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read())

    def tile(d, h, w):
        ph, pw = d.shape
        return np.tile(d, ((h + ph - 1) // ph, (w + pw - 1) // pw))[:h, :w]

    frame = Frame(Plane(data=tile(mouse.y.data, H, W).copy()),
                  Plane(data=tile(mouse.u.data, H // 2, W // 2).copy()),
                  Plane(data=tile(mouse.v.data, H // 2, W // 2).copy()),
                  ChromaSubsampling.C420)
    params = Parameters.c420(W, H, args.quality)
    stream = eng.JpegEncoderSession(params, restart_interval=1).encode(frame)
    bits = BitReader(stream)
    header = Header.decode(bits)
    payload = stream[bits.bit_pos >> 3:]

    sess = eng.JpegDecoderSession(header)

    def t(fn, n=args.iters):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        jax.block_until_ready(r) if hasattr(r, "block_until_ready") or \
            isinstance(r, (tuple, list)) else None
        return (time.perf_counter() - t0) / n * 1e3, r

    if args.flat:
        return profile_flat(args, sess, payload, mpix, platform, t)
    if args.datapath:
        return profile_datapath(args, sess, payload, mpix, platform, t)

    # stage 1: host destuff (C++)
    ms_destuff, segments = t(lambda: entropy_scan.destuff_segments(payload))
    # stage 2: host pack to (S, L)
    ms_pack, (segbytes, lens) = t(lambda: tpu_decode.pack_segments(segments))
    S = len(segments)
    B = sess.blocks_per_segment
    seg_blocks = np.full(S, B, dtype=np.int32)
    if sess.n_blocks % B:
        seg_blocks[-1] = sess.n_blocks % B
    # stage 3: balance + pad (host)
    ms_bal, (sb2, sgb2, inv) = t(lambda: eng._balance_segments(
        segbytes, seg_blocks, np.asarray(lens), 1))
    L = 1 << max(8, (sb2.shape[1] - 1).bit_length())
    sb2p = np.pad(sb2, ((0, 0), (0, L - sb2.shape[1])))
    # stage 4: upload
    ms_up, dev = t(lambda: jax.block_until_ready(
        (jnp.asarray(sb2p), jnp.asarray(sgb2), jnp.asarray(inv))))
    dsb, dsgb, dinv = dev

    # stage 5: full device graph from resident arrays
    if not args.kernel_only:
        fn = sess._device_e2e_jit(L)
        ms_dev, _ = t(lambda: jax.block_until_ready(fn(dsb, dsgb, dinv)))
    else:
        ms_dev = float("nan")

    # stage 5a: entropy kernel only, resident — timed as 8 iterations
    # inside ONE jit (lax.fori_loop, hoist-proof) so relay/dispatch
    # latency doesn't pollute the device number (BENCH_NOTES round 4:
    # single-call timings carry 10s of ms of relay jitter)
    from video_coding_tpu.entropy import pallas_decode
    lo, hi, off, values = map(jnp.asarray,
                              tpu_decode.range_tables(sess.tables))
    sched = jnp.asarray(sess.comp_idx[:B])
    n_comp = len(sess.components)
    interp = jax.default_backend() == "cpu"
    REPS = 1 if interp else 8

    @jax.jit
    def kernel_loop(segb_in, sgb):
        def body(i, acc):
            sb = jnp.where(acc < 0, segb_in ^ 1, segb_in)
            out = pallas_decode.decode_segments_pallas_t(
                sb, sgb, sched, lo, hi, off, values,
                blocks_per_segment=B, n_components=n_comp,
                interpret=interp)
            return acc + out.sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    ms_ent, _ = t(lambda: jax.block_until_ready(kernel_loop(dsb, dsgb)))
    ms_ent /= REPS

    # end to end (the bench number)
    if not args.kernel_only:
        ms_e2e, _ = t(lambda: jax.block_until_ready(
            sess.decode_device_e2e(payload)))
    else:
        ms_e2e = float("nan")

    out = {
        "bench": "decode_profile", "platform": platform, "S": S, "L": L,
        "ms_destuff": round(ms_destuff, 2), "ms_pack": round(ms_pack, 2),
        "ms_balance": round(ms_bal, 2), "ms_upload": round(ms_up, 2),
        "ms_entropy_kernel": round(ms_ent, 2)}
    if not args.kernel_only:
        out.update({"ms_device_graph": round(ms_dev, 2),
                    "ms_e2e": round(ms_e2e, 2),
                    "mpix_s_e2e": round(mpix / (ms_e2e / 1e3), 1)})
    print(json.dumps(out), flush=True)
    return 0


def profile_flat(args, sess, payload, mpix, platform, t):
    """Stage ladder for the flat-upload fused decode (the bench path):
    host destuff, host lane prep, upload, byte-lane vs word-row
    materialization, kernel from each, and the full e2e graph."""
    import json as _json

    import jax
    import jax.numpy as jnp

    from video_coding_tpu.entropy import pallas_decode, scan as entropy_scan
    from video_coding_tpu.entropy import tpu_decode

    ms_destuff, (flat, lens64) = t(
        lambda: entropy_scan.destuff_flat(payload))
    seg_blocks = sess._expected_seg_blocks(len(lens64))
    ms_prep, (flat_p, starts, lens, segb, inv_perm, L, M) = t(
        lambda: sess._flat_lane_inputs(flat, lens64, seg_blocks))
    S = len(lens)
    B = sess.blocks_per_segment
    ms_up, dev = t(lambda: jax.block_until_ready(tuple(map(
        jnp.asarray, (flat_p, starts, lens, segb, inv_perm)))))
    dflat, dstarts, dlens, dsegb, dinv = dev

    interp = jax.default_backend() == "cpu"
    REPS = 1 if interp else 8

    def dev_loop(stage):
        """Time `stage(starts) -> array` as REPS hoist-proof iterations
        inside one jit — relay dispatch latency (10s of ms per call in
        this container) otherwise swamps the device number."""
        @jax.jit
        def loop(s):
            def body(i, acc):
                return acc + stage(s + (i & 1)).sum()
            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

        ms, _ = t(lambda: jax.block_until_ready(loop(dstarts)))
        return ms / REPS

    # lane materialization alone: byte gather vs word-row gather
    ms_bytes = dev_loop(
        lambda s: sess._gather_lanes(dflat, s, dlens, L).astype(jnp.int32))
    ms_words = dev_loop(
        lambda s: pallas_decode.flat_word_rows(dflat, s, dlens, L)[0])

    # materialization + kernel. Hoist-proofing must keep the DECODE
    # valid (garbage windows would run every lane to max_iters): the
    # per-lane DC init takes a runtime-zero perturbation derived from
    # the carried accumulator instead of shifting the starts.
    lut_args = tuple(map(jnp.asarray, tpu_decode.range_tables(sess.tables)))
    sched = jnp.asarray(sess.comp_idx[:B])
    lanes = pallas_decode.max_lanes_t(L + 24, B)
    S = dstarts.shape[0]
    n_comp = len(sess.components)

    @jax.jit
    def kloop(s):
        def body(i, acc):
            dc0 = jnp.full((S, n_comp),
                           jnp.where(acc == jnp.int32(-12345), 1, 0),
                           jnp.int32)
            out = pallas_decode.decode_flat_pallas_t(
                dflat, s, dlens, dsegb, sched, *lut_args, L=L,
                blocks_per_segment=B, n_components=n_comp,
                init_dc=dc0, lanes=min(lanes, 512),
                interpret=interp)
            return acc + out.sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    if lanes == 0:  # over VMEM budget — same bail-out as the engine
        ms_kernel = float("nan")
    else:
        ms_kernel, _ = t(lambda: jax.block_until_ready(kloop(dstarts)))
        ms_kernel /= REPS

    # padded route (round-5 default): host C++ pack at stride Lp, free
    # device reshape, kernel straight from the (S, Lp) matrix
    ms_prep_pad, pad_inputs = t(
        lambda: sess._padded_lane_inputs(flat, lens64, seg_blocks))
    lanebuf_p, p_starts, p_lens, p_segb, p_inv, Lp, Mp = pad_inputs
    ms_up_pad, pdev = t(lambda: jax.block_until_ready(tuple(map(
        jnp.asarray, (lanebuf_p, p_segb, p_inv)))))
    dlane, dpsegb, dpinv = pdev
    lanes_p = pallas_decode.max_lanes_t(Lp, B)

    @jax.jit
    def kloop_pad(lb):
        def body(i, acc):
            dc0 = jnp.full((S, n_comp),
                           jnp.where(acc == jnp.int32(-12345), 1, 0),
                           jnp.int32)
            out = pallas_decode.decode_segments_pallas_t(
                lb.reshape(-1, Lp), dpsegb, sched, *lut_args,
                blocks_per_segment=B, n_components=n_comp,
                init_dc=dc0, lanes=min(lanes_p, 512),
                interpret=interp)
            return acc + out.sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    if lanes_p == 0:
        # per-lane kernel state exceeds the VMEM budget at this geometry
        # — every engine call site treats this as ineligible; launching
        # anyway would be an over-budget Mosaic launch, not a data point
        ms_kernel_pad = float("nan")
    else:
        ms_kernel_pad, _ = t(
            lambda: jax.block_until_ready(kloop_pad(dlane)))
        ms_kernel_pad /= REPS

    # full fused graph from resident arrays, and end to end
    fn = sess._device_e2e_flat_jit(L, M)
    ms_graph, _ = t(lambda: jax.block_until_ready(
        fn(dflat, dstarts, dlens, dsegb, dinv)))
    fnp = sess._device_e2e_flat_jit(Lp, Mp, True)
    ms_graph_pad, _ = t(lambda: jax.block_until_ready(
        fnp(dlane, jnp.asarray(p_starts), jnp.asarray(p_lens),
            dpsegb, dpinv)))
    ms_e2e, _ = t(lambda: jax.block_until_ready(
        sess.decode_device_e2e(payload)))

    print(_json.dumps({
        "bench": "decode_profile_flat", "platform": platform, "S": S,
        "L": L, "M": M,
        "ms_destuff_flat": round(ms_destuff, 2),
        "ms_host_prep": round(ms_prep, 2),
        "ms_upload": round(ms_up, 2),
        "ms_byte_lane_gather": round(ms_bytes, 2),
        "ms_word_row_gather": round(ms_words, 2),
        "ms_words_plus_kernel": round(ms_kernel, 2),
        "Lp": Lp,
        "ms_host_prep_padded": round(ms_prep_pad, 2),
        "ms_upload_padded": round(ms_up_pad, 2),
        "ms_kernel_padded": round(ms_kernel_pad, 2),
        "ms_device_graph_padded": round(ms_graph_pad, 2),
        "ms_device_graph": round(ms_graph, 2),
        "ms_e2e": round(ms_e2e, 2),
        "mpix_s_e2e": round(mpix / (ms_e2e / 1e3), 1)}), flush=True)
    return 0


def profile_datapath(args, sess, payload, mpix, platform, t):
    """Dispatch-free decode-datapath ladder (VERDICT r4 item 6): where
    the 1.18 ms/frame goes — prep relayouts vs butterflies vs epilogue
    vs plane assembly."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_coding_tpu.ops import datapath
    from video_coding_tpu.ops.datapath import (_FORWARD, LANE_TILE,
                                               _pad_lanes)
    from video_coding_tpu.runtime.engine import _plane_from_blocks

    coefs = jnp.asarray(sess.decode_entropy(payload))
    quant = sess._quant_dev
    n = coefs.shape[0]
    npad = _pad_lanes(n, LANE_TILE)
    interp = jax.default_backend() == "cpu"

    def dev_loop(stage, *operands):
        """Slope timing: run the hoist-proof loop at two trip counts and
        take (t_hi - t_lo) / (hi - lo) — the per-call relay dispatch
        (10-30 ms here) cancels exactly instead of leaving a
        dispatch/REPS floor under each stage."""
        import functools as _ft

        @_ft.partial(jax.jit, static_argnames=("reps",))
        def loop(*ops, reps):
            def body(i, acc):
                perturbed = tuple(o + (acc & 1).astype(o.dtype)
                                  for o in ops)
                return acc + stage(*perturbed).sum().astype(jnp.int32)
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        if interp:
            ms, _ = t(lambda: jax.block_until_ready(
                loop(*operands, reps=1)))
            return ms
        times = {}
        for reps in (8, 40):
            jax.block_until_ready(loop(*operands, reps=reps))
            ms, _ = t(lambda: jax.block_until_ready(
                loop(*operands, reps=reps)))
            times[reps] = ms
        return (times[40] - times[8]) / 32

    def prep(z):
        natv = z.astype(jnp.int32)[:, _FORWARD]
        natv = jnp.pad(natv, ((0, npad - n), (0, 0)))
        return jnp.transpose(natv.reshape(npad, 8, 8), (1, 2, 0))

    ms_full = dev_loop(
        lambda c: datapath.decode_datapath_pallas(c, quant,
                                                  interpret=interp),
        coefs)
    # pre-formatted tiles: kernel body alone
    tile = jax.block_until_ready(prep(coefs))
    qtile = jax.block_until_ready(prep(quant))

    def kernel_only(tl):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        grid = (npad // LANE_TILE,)
        spec = pl.BlockSpec((8, 8, LANE_TILE), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            datapath._decode_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 8, npad), jnp.int32),
            grid=grid, in_specs=[spec, spec], out_specs=spec,
            interpret=interp)(tl, qtile)

    ms_kernel = dev_loop(kernel_only, tile)
    ms_coef_prep = dev_loop(prep, coefs)
    ms_quant_prep = dev_loop(prep, quant)
    ms_epilogue = dev_loop(
        lambda tl: jnp.transpose(tl, (2, 0, 1))[:n].astype(jnp.uint8),
        tile)

    pixels = jax.block_until_ready(
        jnp.transpose(tile, (2, 0, 1))[:n].astype(jnp.uint8))
    geoms = sess._geom_dev

    def assembly(px):
        return sum(_plane_from_blocks(px, idx, nby, nbx).sum()
                   for idx, nby, nbx in geoms)

    def assembly_words(px):
        # int32-word form: gather + transpose act on (N, 8, 2) int32
        # views (8 uint8 = 2 words), so the relayout's inner dims are
        # 4x wider than the uint8 form
        pw = jax.lax.bitcast_convert_type(
            px.reshape(px.shape[0], 8, 2, 4), jnp.int32)
        tot = jnp.int32(0)
        for idx, nby, nbx in geoms:
            b = pw[idx].reshape(nby, nbx, 8, 2).transpose(0, 2, 1, 3)
            plane = jax.lax.bitcast_convert_type(
                b.reshape(nby * 8, nbx * 2), jnp.uint8).reshape(
                    nby * 8, nbx * 8)
            tot += plane.sum().astype(jnp.int32)
        return tot[None]

    def gather_only(px):
        return sum(px[idx].sum() for idx, _nby, _nbx in geoms)

    def transpose_only(px):
        tot = jnp.int32(0)
        off = 0
        for idx, nby, nbx in geoms:
            nbk = nby * nbx
            b = px[off:off + nbk].reshape(nby, nbx, 8, 8)
            off += nbk
            tot += b.transpose(0, 2, 1, 3).reshape(
                nby * 8, nbx * 8).sum().astype(jnp.int32)
        return tot[None]

    ms_assembly = dev_loop(assembly, pixels)
    ms_assembly_words = dev_loop(assembly_words, pixels)
    ms_gather_only = dev_loop(gather_only, pixels)
    ms_transpose_only = dev_loop(transpose_only, pixels)
    ms_tail = dev_loop(lambda c: sess._decode_tail(c)[0], coefs)

    print(_json.dumps({
        "bench": "decode_profile_datapath", "platform": platform,
        "n_blocks": int(n), "npad": int(npad),
        "ms_full_pallas": round(ms_full, 3),
        "ms_kernel_only": round(ms_kernel, 3),
        "ms_coef_prep": round(ms_coef_prep, 3),
        "ms_quant_prep": round(ms_quant_prep, 3),
        "ms_epilogue": round(ms_epilogue, 3),
        "ms_assembly": round(ms_assembly, 3),
        "ms_assembly_words": round(ms_assembly_words, 3),
        "ms_gather_only": round(ms_gather_only, 3),
        "ms_transpose_only": round(ms_transpose_only, 3),
        "ms_decode_tail_full": round(ms_tail, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
