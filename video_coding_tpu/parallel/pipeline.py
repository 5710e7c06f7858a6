"""Sharded codec pipelines over a device mesh.

Design notes (the scaling-book recipe): pick a mesh, annotate shardings,
let XLA insert collectives; explicit shard_map only where the collective
pattern is part of the algorithm (rate exchange, metric reduction).

- Block batches shard along the block axis: every stage of the datapath is
  per-block, so the only cross-device traffic is whatever the caller's
  layout requires — for MCU-row restart segments, plane bands are local to
  their shard.
- The per-segment rate/offset exchange of parallel bitstream assembly is a
  psum/all_gather over the 'seg' axis — the TPU-native replacement for the
  reference's ready/valid FIFO chain between entropy stages
  (SURVEY.md §5 "distributed communication backend").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import datapath


def _flat_axes(mesh: Mesh) -> tuple[str, ...]:
    return tuple(mesh.axis_names)


def sharded_decode_datapath(mesh: Mesh, coefs, quant):
    """Decode datapath with the block axis sharded over every mesh axis.

    coefs, quant: (N, 64) int32, N divisible by mesh size. Returns
    (N, 8, 8) int32 pixels with the same sharding."""
    axes = _flat_axes(mesh)
    sh_in = NamedSharding(mesh, P(axes, None))
    sh_out = NamedSharding(mesh, P(axes, None, None))
    fn = jax.jit(datapath.decode_datapath_jnp,
                 in_shardings=(sh_in, sh_in), out_shardings=sh_out)
    return fn(jax.device_put(coefs, sh_in), jax.device_put(quant, sh_in))


def sharded_encode_datapath(mesh: Mesh, pixels, quant):
    """Encode datapath with the block axis sharded over every mesh axis."""
    axes = _flat_axes(mesh)
    sh_px = NamedSharding(mesh, P(axes, None, None))
    sh_q = NamedSharding(mesh, P(axes, None))
    sh_out = NamedSharding(mesh, P(axes, None))
    fn = jax.jit(datapath.encode_datapath_jnp,
                 in_shardings=(sh_px, sh_q), out_shardings=sh_out)
    return fn(jax.device_put(pixels, sh_px), jax.device_put(quant, sh_q))


def distributed_psnr(mesh: Mesh, a, b):
    """PSNR between two pixel tensors sharded over the whole mesh.

    SSE is reduced with psum across every mesh axis — the distributed
    version of tools ocompare.ml:8-68."""
    axes = _flat_axes(mesh)
    spec = P(axes)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec),
                       out_specs=P())
    def sse(x, y):
        d = x.astype(jnp.float32) - y.astype(jnp.float32)
        return jax.lax.psum(jnp.sum(d * d), axes)

    total = sse(a.reshape(-1), b.reshape(-1))
    n = a.size
    mse = total / n
    return 10.0 * jnp.log10(255.0 ** 2 / mse)


def rate_estimate_bits(qcoefs):
    """Entropy-rate proxy per block: total magnitude size categories,
    computed with integer compares (no float log2 drift hazard).

    Matches the magnitude-bit count of the real coder exactly (code bits
    excluded). For the true coded size including Huffman code bits, ZRL
    splitting and EOB, see rate_exact_bits / tpu_encode.segment_coded_bits.
    """
    from ..entropy.tpu_encode import _size_category

    return jnp.sum(_size_category(qcoefs), axis=-1)


@functools.lru_cache(maxsize=1)
def _luma_rate_tables():
    """Annex-K luma encoder tables in device layout — the default tables
    for exact rate estimation on raw block batches (no header context)."""
    from ..entropy.tables import pack_encoder_tables
    from ..entropy.tpu_encode import device_encoder_tables
    from ..model.encoder import Parameters

    p = Parameters.c420(16, 16, 75)
    tabs = pack_encoder_tables([p.dc_huffman_tables[0].data],
                               [p.ac_huffman_tables[0].data])
    import numpy as np

    return tuple(np.asarray(t) for t in device_encoder_tables(tabs))


def rate_exact_bits(qcoefs, dc_bits, dc_len, ac_bits, ac_len):
    """Exact coded bits per block, each block treated as its own restart
    segment (DC predictor resets, so DC diff = DC — the maximally
    parallel-decodable stream this framework emits at restart_interval=1).
    Equals 8·len(segment) − flush padding of the host coder per block."""
    from ..entropy import tpu_encode

    n = qcoefs.shape[0]
    return tpu_encode.segment_coded_bits(
        qcoefs, jnp.zeros(n, jnp.int32), jnp.full((1,), -1, jnp.int32),
        dc_bits, dc_len, ac_bits, ac_len, blocks_per_segment=1)


def sharded_decode_e2e(mesh: Mesh, segbytes, seg_blocks, comp_sched,
                       dc_lut, ac_lut, quant, blocks_per_segment: int):
    """Full decode — vectorized Huffman *and* block datapath — with
    restart segments sharded over every mesh axis.

    segbytes: (S, L) uint8 destuffed segments, S divisible by mesh size;
    seg_blocks: (S,); comp_sched: (B,); dc/ac_lut: (C, 65536) expanded
    LUTs (replicated); quant: (B, 64) per-segment-position quant rows
    (replicated). Returns (S, B, 64→8x8) pixels sharded like the input —
    the multi-chip analog of the RTL's single entropy pipe."""
    from ..entropy import tpu_decode

    axes = _flat_axes(mesh)
    sspec = P(axes, None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(sspec, P(axes), P(None), P(None, None), P(None, None),
                  P(None, None)),
        out_specs=P(axes, None, None, None),
    )
    def step(seg_local, blocks_local, sched, dc, ac, q):
        coefs = tpu_decode.decode_segments_device(
            seg_local, blocks_local, sched, dc, ac,
            blocks_per_segment=blocks_per_segment)
        s = coefs.shape[0]
        flat = coefs.reshape(s * blocks_per_segment, 64)
        qrep = jnp.tile(q, (s, 1))
        pixels = datapath.decode_datapath_jnp(flat, qrep)
        return pixels.reshape(s, blocks_per_segment, 8, 8)

    return step(segbytes, seg_blocks, comp_sched, dc_lut, ac_lut, quant)


def mjpeg_codec_step(mesh: Mesh, frames_pixels, quant):
    """One full codec step over a ('data', 'seg') mesh — the framework's
    'training step' analog, exercising every parallel dimension:

    - frames sharded over 'data' (Motion-JPEG frame parallelism)
    - blocks within each frame sharded over 'seg' (restart-segment
      parallelism)
    - encode datapath → rate exchange (psum over 'seg', all_gather over
      'data') → decode datapath → distortion psum over the whole mesh.

    frames_pixels: (F, N, 8, 8) uint8/int32, F % data == 0, N % seg == 0.
    quant: (N, 64) int32, replicated.
    Returns (qcoefs, recon, rates, psnr):
      qcoefs (F, N, 64) sharded; recon (F, N, 8, 8) sharded;
      rates (F,) exact coded bits per frame (replicated) — every block a
      1-block restart segment under the Annex-K luma tables, i.e. the true
      pre-padding wire size of the restart_interval=1 stream;
      psnr scalar.
    """
    fspec = P("data", "seg", None, None)
    # quant rows follow the block axis → sharded over 'seg' like the blocks
    qspec = P("seg", None)
    tabs = tuple(map(jnp.asarray, _luma_rate_tables()))
    tab_specs = tuple(P(*([None] * t.ndim)) for t in tabs)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(fspec, qspec) + tab_specs,
        out_specs=(P("data", "seg", None), fspec, P("data")),
    )
    def step(px, q, *tabs):
        f, n = px.shape[0], px.shape[1]
        flat = px.reshape(f * n, 8, 8)
        qrep = jnp.tile(q, (f, 1))
        qc = datapath.encode_datapath_jnp(flat, qrep)
        # rate exchange: exact per-frame coded bits, summed across segments
        rate_local = jnp.sum(rate_exact_bits(qc, *tabs).reshape(f, n),
                             axis=1)
        rate_frame = jax.lax.psum(rate_local, "seg")
        recon = datapath.decode_datapath_jnp(qc, qrep)
        return (qc.reshape(f, n, 64), recon.reshape(f, n, 8, 8), rate_frame)

    qcoefs, recon, rates = step(frames_pixels, quant, *tabs)
    psnr = distributed_psnr(
        mesh,
        frames_pixels.astype(jnp.int32).reshape(-1),
        recon.reshape(-1))
    return qcoefs, recon, rates, psnr
