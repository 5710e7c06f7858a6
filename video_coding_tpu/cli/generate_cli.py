"""generate: emit compiled kernel artifacts.

Capability parity with reference jpeg/bin/generate.ml (:4-72), which
elaborates the RTL and prints Verilog. The TPU analog of "RTL generation"
is jit lowering: this tool prints the StableHLO (and optionally the
backend-compiled text) of the framework's device graphs — decoder
datapath, encoder datapath, the vectorized entropy decoder, and the full
sharded codec step.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _lower(fn, *args):
    import jax

    return jax.jit(fn).lower(*args)


def art_decoder(n: int):
    from ..ops import datapath

    coefs = np.zeros((n, 64), np.int32)
    quant = np.ones((n, 64), np.int32)
    return _lower(datapath.decode_datapath_jnp, coefs, quant)


def art_encoder(n: int):
    from ..ops import datapath

    pixels = np.zeros((n, 8, 8), np.uint8)
    quant = np.ones((n, 64), np.int32)
    return _lower(datapath.encode_datapath_jnp, pixels, quant)


def art_entropy_decoder(n: int):
    import jax

    from ..entropy import tpu_decode
    from ..entropy.tables import pack_decoder_tables
    from ..model.huffman import AC_LUMA, DC_LUMA, Lut

    tables = pack_decoder_tables(
        [Lut(DC_LUMA.dc_code_table(), ac=False)],
        [Lut(AC_LUMA.ac_code_table(), ac=True)])
    dc_lut, ac_lut = tpu_decode.expand_luts(tables)
    segbytes = np.zeros((n, 256), np.uint8)
    seg_blocks = np.full(n, 4, np.int32)
    comp_sched = np.zeros(4, np.int32)
    fn = tpu_decode.decode_segments_device

    def wrapped(segbytes, seg_blocks, comp_sched, dc_lut, ac_lut):
        return fn(segbytes, seg_blocks, comp_sched, dc_lut, ac_lut,
                  blocks_per_segment=4)

    return _lower(wrapped, segbytes, seg_blocks, comp_sched, dc_lut, ac_lut)


def art_codec_step(n_devices: int):
    import jax

    from ..parallel import codec_mesh, mjpeg_codec_step

    mesh = codec_mesh(min(n_devices, len(jax.devices())))
    data = mesh.shape["data"]
    seg = mesh.shape["seg"]
    frames = np.zeros((data * 2, seg * 4, 8, 8), np.uint8)
    quant = np.ones((seg * 4, 64), np.int32)

    def step(frames, quant):
        return mjpeg_codec_step(mesh, frames, quant)

    return _lower(step, frames, quant)


ARTIFACTS = {
    "decoder": art_decoder,
    "encoder": art_encoder,
    "entropy-decoder": art_entropy_decoder,
    "codec-step": art_codec_step,
}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="vct-generate",
        description="emit compiled device-graph artifacts (StableHLO)")
    p.add_argument("artifact", choices=sorted(ARTIFACTS))
    p.add_argument("--blocks", type=int, default=512,
                   help="batch size to lower for (decoder/encoder) or "
                        "device count (codec-step)")
    p.add_argument("--compiled", action="store_true",
                   help="also print the backend-compiled executable text")
    args = p.parse_args(argv)
    lowered = ARTIFACTS[args.artifact](args.blocks)
    print(lowered.as_text())
    if args.compiled:
        compiled = lowered.compile()
        print(compiled.as_text())
    return 0


if __name__ == "__main__":
    sys.exit(main())
