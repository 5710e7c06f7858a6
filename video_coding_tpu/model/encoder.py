"""Baseline JPEG software encoder (golden model).

Capability parity with reference jpeg/model/src/encoder.ml: level shift →
Chen fDCT (x4 scaled) → quantize with scale compensation and
round-half-away → forward zigzag → DC-pred differencing + RLE →
size/magnitude + Huffman with ZRL splitting and EOB → stuffed bitstream;
header writer (SOI/APP0/DQT/SOF0/DHT/SOS); 420/422/444/monochrome presets;
optional decode-back reconstruction-error path (encoder.ml:110-125).

Extensions over the reference:
- optional ``restart_interval``: emits DRI and RSTn markers every N MCUs,
  resetting DC predictors — giving every stream this encoder produces a
  parallel-decodable segment structure (the framework's entropy-parallel
  mechanism; the reference leaves this as a TODO, jpeg/README.md:36).
- the block numerics run batched over all blocks (the same (N,64) tensor
  contract as the TPU encode kernels); entropy packing stays sequential.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..common.bitstream import BitWriter
from ..common.frame import Frame
from ..common.plane import Plane
from . import marker_codes
from . import markers
from . import quant_tables
from .dct import chen_forward_8x8, chen_inverse_8x8
from .huffman import (AC_CHROMA, AC_LUMA, DC_CHROMA, DC_LUMA,
                      encoder_ac_table, encoder_dc_table)
from .zigzag import INVERSE as ZIGZAG_INVERSE


def size_category(value: int) -> int:
    """Bit-size category of a coefficient (encoder.ml:143)."""
    return 0 if value == 0 else int(abs(value)).bit_length()


def magnitude_bits(size: int, value: int) -> int:
    """Magnitude code for a value of the given size (encoder.ml:145-147)."""
    mask = (1 << size) - 1
    return value & mask if value >= 0 else (value - 1) & mask


def quant_and_scale(fdct: np.ndarray, qnt: np.ndarray) -> np.ndarray:
    """Quantize x4-scaled fDCT coefs, rounding half away from zero with
    truncating division (encoder.ml:98-101)."""
    fdct = fdct.astype(np.int64)
    qnt = qnt.astype(np.int64)
    pos = (fdct + qnt * 2) // (qnt * 4)
    neg = -((-fdct + qnt * 2) // (qnt * 4))
    return np.where(fdct < 0, neg, pos)


@dataclasses.dataclass(frozen=True)
class Identified:
    identifier: int
    data: object


@dataclasses.dataclass(frozen=True)
class ScanComponentParams:
    """Scan structure description (encoder.ml Parameters:287-305)."""

    quant_table: int
    dc_huffman_table: int
    ac_huffman_table: int
    component: int
    horizontal_sampling_factor: int
    vertical_sampling_factor: int


@dataclasses.dataclass(frozen=True)
class Parameters:
    width: int
    height: int
    quant_tables: tuple      # Identified[np.ndarray (64, zigzag order)]
    dc_huffman_tables: tuple  # Identified[Spec]
    ac_huffman_tables: tuple  # Identified[Spec]
    scan_components: tuple   # ScanComponentParams

    @classmethod
    def yuv(cls, width: int, height: int, quality: int,
            scales: tuple) -> "Parameters":
        qnt_luma = quant_tables.scale(quant_tables.LUMA, quality)
        qnt_chroma = quant_tables.scale(quant_tables.CHROMA, quality)
        return cls(
            width=width, height=height,
            quant_tables=(Identified(0, qnt_luma), Identified(1, qnt_chroma)),
            dc_huffman_tables=(Identified(0, DC_LUMA), Identified(1, DC_CHROMA)),
            ac_huffman_tables=(Identified(0, AC_LUMA), Identified(1, AC_CHROMA)),
            scan_components=(
                ScanComponentParams(0, 0, 0, 1, scales[0], scales[1]),
                ScanComponentParams(1, 1, 1, 2, scales[2], scales[3]),
                ScanComponentParams(1, 1, 1, 3, scales[4], scales[5]),
            ),
        )

    @classmethod
    def c420(cls, width: int, height: int, quality: int) -> "Parameters":
        return cls.yuv(width, height, quality, (2, 2, 1, 1, 1, 1))

    @classmethod
    def c422(cls, width: int, height: int, quality: int) -> "Parameters":
        return cls.yuv(width, height, quality, (2, 2, 1, 2, 1, 2))

    @classmethod
    def c440(cls, width: int, height: int, quality: int) -> "Parameters":
        """Vertical-only chroma subsampling (4:4:0): Y 2x2, C 2x1 — the
        (2,1) factor mix the SOF grammar allows beyond the reference's
        encoder presets (encoder.ml:287-305 covers 420/422/444)."""
        return cls.yuv(width, height, quality, (2, 2, 2, 1, 2, 1))

    @classmethod
    def c444(cls, width: int, height: int, quality: int) -> "Parameters":
        return cls.yuv(width, height, quality, (1, 1, 1, 1, 1, 1))

    @classmethod
    def monochrome(cls, width: int, height: int, quality: int) -> "Parameters":
        qnt_luma = quant_tables.scale(quant_tables.LUMA, quality)
        return cls(
            width=width, height=height,
            quant_tables=(Identified(0, qnt_luma),),
            dc_huffman_tables=(Identified(0, DC_LUMA),),
            ac_huffman_tables=(Identified(0, AC_LUMA),),
            scan_components=(ScanComponentParams(0, 0, 0, 1, 1, 1),),
        )


def _find_identified(kind: str, ident: int, items) -> object:
    for it in items:
        if it.identifier == ident:
            return it.data
    raise KeyError(f"Failed to find {kind} identifier {ident}")


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


@dataclasses.dataclass
class Scan:
    """Per-component encode state (encoder.ml:420-428)."""

    hscale: int
    vscale: int
    plane: Plane
    quant_table: np.ndarray
    dc_huffman_table: list     # Code, indexed by size
    ac_huffman_table: list     # Code, indexed [run][size]
    dc_pred: int = 0


class Encoder:
    """Streaming JPEG encoder over padded planes (encoder.ml:437-520)."""

    def __init__(self, params: Parameters, writer: BitWriter | None = None,
                 *, compute_reconstruction_error: bool = False,
                 restart_interval: int = 0, interleaved: bool = True):
        """``interleaved=False`` emits one single-component SOS per
        component (T.81 non-interleaved scans, each rastering its own
        ceil(xi/8)×ceil(yi/8) block grid) — a capability the reference
        lists as unsupported (jpeg/README.md:15-45)."""
        self.params = params
        self.writer = writer if writer is not None else BitWriter()
        self.compute_reconstruction_error = compute_reconstruction_error
        self.restart_interval = restart_interval
        self.interleaved = interleaved
        dc_tables = [Identified(t.identifier, encoder_dc_table(t.data))
                     for t in params.dc_huffman_tables]
        ac_tables = [Identified(t.identifier, encoder_ac_table(t.data))
                     for t in params.ac_huffman_tables]
        max_h = max(sc.horizontal_sampling_factor
                    for sc in params.scan_components)
        max_v = max(sc.vertical_sampling_factor
                    for sc in params.scan_components)
        # Round the luma (MCU) grid first, then scale per component — the
        # same geometry the decoder derives (decoder.ml:304-320). Rounding
        # each component's unrounded dims independently (the reference's
        # encoder.ml:452-459) under-sizes chroma by one block when a luma
        # dimension is ≡1..7 mod (8·max_scale) — the reference's "known
        # bug on the last block(s)" (jpeg/README.md:22).
        rounded_w = _round_up(params.width, 8 * max_h)
        rounded_h = _round_up(params.height, 8 * max_v)
        self.scans: list[Scan] = []
        for sc in params.scan_components:
            w = rounded_w * sc.horizontal_sampling_factor // max_h
            h = rounded_h * sc.vertical_sampling_factor // max_v
            self.scans.append(Scan(
                hscale=sc.horizontal_sampling_factor,
                vscale=sc.vertical_sampling_factor,
                plane=Plane(w, h),
                quant_table=_find_identified(
                    "quant", sc.quant_table, params.quant_tables),
                dc_huffman_table=_find_identified(
                    "dc_huffman", sc.dc_huffman_table, dc_tables),
                ac_huffman_table=_find_identified(
                    "ac_huffman", sc.ac_huffman_table, ac_tables),
            ))
        # debug state filled by encode() when reconstruction error requested
        self.last_error_sum = 0

    # -- geometry ---------------------------------------------------------
    @property
    def macroblocks_wide(self) -> int:
        s = self.scans[0]
        return s.plane.width // (8 * s.hscale)

    @property
    def macroblocks_high(self) -> int:
        s = self.scans[0]
        return s.plane.height // (8 * s.vscale)

    def block_schedule(self) -> list[tuple[int, int, int]]:
        """Flat (scan_index, x, y) schedule in scan order
        (encoder.ml:476-505). Memoized."""
        cached = getattr(self, "_schedule", None)
        if cached is not None:
            return cached
        sched = []
        for y_mb in range(self.macroblocks_high):
            for x_mb in range(self.macroblocks_wide):
                for si, s in enumerate(self.scans):
                    for y_sub in range(s.vscale):
                        for x_sub in range(s.hscale):
                            sched.append((si,
                                          (x_mb * s.hscale + x_sub) * 8,
                                          (y_mb * s.vscale + y_sub) * 8))
        self._schedule = sched
        return sched

    # -- input ------------------------------------------------------------
    def load_frame(self, frame: Frame) -> None:
        frame.y.blit_available(self.scans[0].plane)
        frame.u.blit_available(self.scans[1].plane)
        frame.v.blit_available(self.scans[2].plane)

    def load_plane(self, plane: Plane) -> None:
        plane.blit_available(self.scans[0].plane)

    # -- headers -----------------------------------------------------------
    def _write_marker(self, code: int) -> None:
        self.writer.put_bits(0xFF, 8, stuffing=False)
        self.writer.put_bits(code, 8, stuffing=False)

    def write_headers(self) -> None:
        """SOI, APP0, DQTs, [DRI], SOF0, DHTs, SOS (encoder.ml:371-418)."""
        w = self.writer
        p = self.params
        self._write_marker(marker_codes.SOI)
        # APP0 identification string
        app0 = b"video-coding-tpu"
        self._write_marker(marker_codes.APP0)
        w.put_bits(2 + len(app0), 16, stuffing=False)
        for b in app0:
            w.put_bits(b, 8, stuffing=False)
        for qt in p.quant_tables:
            self._write_marker(marker_codes.DQT)
            markers.Dqt(0, 8, qt.identifier, list(qt.data)).encode(w)
        if self.restart_interval:
            self._write_marker(marker_codes.DRI)
            markers.Dri(4, self.restart_interval).encode(w)
        self._write_marker(marker_codes.SOF0)
        markers.Sof(
            length=0, sample_precision=8, width=p.width, height=p.height,
            number_of_components=len(p.scan_components),
            components=[
                markers.Component(
                    identifier=sc.component,
                    horizontal_sampling_factor=sc.horizontal_sampling_factor,
                    vertical_sampling_factor=sc.vertical_sampling_factor,
                    quantization_table_identifier=sc.quant_table)
                for sc in p.scan_components],
        ).encode(w)
        for t in p.dc_huffman_tables:
            self._write_marker(marker_codes.DHT)
            markers.Dht(0, 0, t.identifier, list(t.data.lengths),
                        list(t.data.values)).encode(w)
        for t in p.ac_huffman_tables:
            self._write_marker(marker_codes.DHT)
            markers.Dht(0, 1, t.identifier, list(t.data.lengths),
                        list(t.data.values)).encode(w)
        if self.interleaved:
            self._write_sos(p.scan_components)

    def _write_sos(self, scan_components) -> None:
        self._write_marker(marker_codes.SOS)
        markers.Sos(
            length=0,
            number_of_image_components=len(scan_components),
            scan_components=[
                markers.ScanComponent(
                    selector=sc.component,
                    dc_coef_selector=sc.dc_huffman_table,
                    ac_coef_selector=sc.ac_huffman_table)
                for sc in scan_components],
            start_of_predictor_selection=0,
            end_of_predictor_selection=63,
            successive_approximation_bit_high=0,
            successive_approximation_bit_low=0,
        ).encode(self.writer)

    # -- numerics (batched) -----------------------------------------------
    def quantized_blocks(self) -> np.ndarray:
        """Level shift → batched Chen fDCT → quant → zigzag for every block
        in schedule order. Returns (num_blocks, 64) int32 zigzag coefs —
        the tensor contract shared with the TPU encode kernel."""
        sched = self.block_schedule()
        pixels = np.empty((len(sched), 8, 8), dtype=np.int64)
        for i, (si, x, y) in enumerate(sched):
            pixels[i] = self.scans[si].plane.data[y:y + 8, x:x + 8]
        fdct = chen_forward_8x8(pixels - 128).reshape(len(sched), 64)
        qtabs = np.stack([s.quant_table for s in self.scans])
        scan_idx = np.array([s[0] for s in sched], dtype=np.int32)
        q = qtabs[scan_idx]  # zigzag-ordered quant values per block
        # quant output is zigzag-ordered: position p quantizes natural
        # index ZIGZAG_INVERSE[p] (encoder.ml:103-108).
        qzz = quant_and_scale(fdct[:, ZIGZAG_INVERSE], q)
        return qzz.astype(np.int32)

    # -- entropy -----------------------------------------------------------
    def _write_block(self, scan: Scan, qcoefs: np.ndarray) -> None:
        """RLE + Huffman + magnitude write of one quantized block
        (encoder.ml:127-193)."""
        w = self.writer
        put = w.put_bits

        def write_code(code, size, value):
            put(code.bits, code.length, stuffing=True)
            put(magnitude_bits(size, value), size, stuffing=True)

        dc = int(qcoefs[0])
        diff = dc - scan.dc_pred
        scan.dc_pred = dc
        size = size_category(diff)
        write_code(scan.dc_huffman_table[size], size, diff)
        ac_table = scan.ac_huffman_table
        run = 0
        nz = np.nonzero(qcoefs[1:])[0]
        if len(nz) == 0:
            write_code(ac_table[0][0], 0, 0)  # EOB
            return
        last_nz = int(nz[-1]) + 1
        pos = 1
        for pos in range(1, last_nz + 1):
            value = int(qcoefs[pos])
            if value == 0:
                run += 1
                continue
            while run >= 16:
                write_code(ac_table[15][0], 0, 0)  # ZRL
                run -= 16
            size = size_category(value)
            write_code(ac_table[run][size], size, value)
            run = 0
        if last_nz < 63:
            write_code(ac_table[0][0], 0, 0)  # EOB

    # -- non-interleaved (one scan per component) ---------------------------
    def _noninterleaved_schedule(self, si: int) -> list[tuple[int, int]]:
        """Raster block (x, y) positions of component ``si``'s own scan:
        ceil(xi/8) × ceil(yi/8) blocks over its ceil-scaled dims (T.81
        A.2.2)."""
        p = self.params
        max_h = max(sc.horizontal_sampling_factor
                    for sc in p.scan_components)
        max_v = max(sc.vertical_sampling_factor
                    for sc in p.scan_components)
        sc = p.scan_components[si]
        aw = -(-p.width * sc.horizontal_sampling_factor // max_h)
        ah = -(-p.height * sc.vertical_sampling_factor // max_v)
        bw, bh = -(-aw // 8), -(-ah // 8)
        return [(bx * 8, by * 8) for by in range(bh) for bx in range(bw)]

    def _encode_noninterleaved(self) -> None:
        for si, (scan, sc) in enumerate(zip(self.scans,
                                            self.params.scan_components)):
            self._write_sos([sc])
            sched = self._noninterleaved_schedule(si)
            pixels = np.empty((len(sched), 8, 8), dtype=np.int64)
            for i, (x, y) in enumerate(sched):
                pixels[i] = scan.plane.data[y:y + 8, x:x + 8]
            fdct = chen_forward_8x8(pixels - 128).reshape(len(sched), 64)
            qall = quant_and_scale(fdct[:, ZIGZAG_INVERSE],
                                   np.broadcast_to(scan.quant_table,
                                                   (len(sched), 64)))
            scan.dc_pred = 0
            rst_n = 0
            for i, _xy in enumerate(sched):
                if (self.restart_interval and i > 0
                        and i % self.restart_interval == 0):
                    self.writer.flush_with_1s(stuffing=True)
                    self._write_marker(marker_codes.RST0 + rst_n)
                    rst_n = (rst_n + 1) & 7
                    scan.dc_pred = 0
                self._write_block(scan, qall[i])
            # byte-align before the next SOS / EOI marker
            self.writer.flush_with_1s(stuffing=True)

    def encode(self) -> None:
        """Entropy-encode the whole image (headers must be written first)."""
        if not self.interleaved:
            self._encode_noninterleaved()
            return
        sched = self.block_schedule()
        qall = self.quantized_blocks()
        mcu_size = sum(s.hscale * s.vscale for s in self.scans)
        blocks_per_mcu = mcu_size
        rst_blocks = (self.restart_interval * blocks_per_mcu
                      if self.restart_interval else 0)
        rst_n = 0
        for s in self.scans:
            s.dc_pred = 0
        for i, (si, _x, _y) in enumerate(sched):
            if rst_blocks and i > 0 and i % rst_blocks == 0:
                self.writer.flush_with_1s(stuffing=True)
                self._write_marker(marker_codes.RST0 + rst_n)
                rst_n = (rst_n + 1) & 7
                for s in self.scans:
                    s.dc_pred = 0
            self._write_block(self.scans[si], qall[i])
        if self.compute_reconstruction_error:
            self._compute_reconstruction_error(sched, qall)

    def _compute_reconstruction_error(self, sched, qall) -> None:
        """Decode-back path for debugging (encoder.ml:110-125)."""
        qtabs = np.stack([s.quant_table for s in self.scans])
        scan_idx = np.array([s[0] for s in sched], dtype=np.int32)
        dequant_zz = qall.astype(np.int64) * qtabs[scan_idx]
        dequant = np.zeros_like(dequant_zz)
        dequant[:, ZIGZAG_INVERSE] = dequant_zz
        idct = chen_inverse_8x8(dequant.reshape(-1, 8, 8))
        recon = np.clip(idct + 128, 0, 255)
        err = 0
        for i, (si, x, y) in enumerate(sched):
            src = self.scans[si].plane.data[y:y + 8, x:x + 8].astype(np.int64)
            err += int(np.abs(recon[i] - src).sum())
        self.last_error_sum = err

    def complete_and_write_eoi(self) -> None:
        """Flush with 1-bits and write EOI (encoder.ml:507-510)."""
        self.writer.flush_with_1s(stuffing=True)
        self._write_marker(marker_codes.EOI)


def _encode_with_params(frame: Frame, params: Parameters,
                        restart_interval: int = 0,
                        interleaved: bool = True) -> bytes:
    enc = Encoder(params, restart_interval=restart_interval,
                  interleaved=interleaved)
    enc.load_frame(frame)
    enc.write_headers()
    enc.encode()
    enc.complete_and_write_eoi()
    return enc.writer.get_buffer()


def encode_420(frame: Frame, quality: int, restart_interval: int = 0,
               interleaved: bool = True) -> bytes:
    return _encode_with_params(
        frame, Parameters.c420(frame.width, frame.height, quality),
        restart_interval, interleaved)


def encode_422(frame: Frame, quality: int, restart_interval: int = 0,
               interleaved: bool = True) -> bytes:
    return _encode_with_params(
        frame, Parameters.c422(frame.width, frame.height, quality),
        restart_interval, interleaved)


def encode_440(frame: Frame, quality: int, restart_interval: int = 0,
               interleaved: bool = True) -> bytes:
    return _encode_with_params(
        frame, Parameters.c440(frame.width, frame.height, quality),
        restart_interval, interleaved)


def encode_444(frame: Frame, quality: int, restart_interval: int = 0,
               interleaved: bool = True) -> bytes:
    return _encode_with_params(
        frame, Parameters.c444(frame.width, frame.height, quality),
        restart_interval, interleaved)


def encode_monochrome(plane: Plane, quality: int,
                      restart_interval: int = 0) -> bytes:
    params = Parameters.monochrome(plane.width, plane.height, quality)
    enc = Encoder(params, restart_interval=restart_interval)
    enc.load_plane(plane)
    enc.write_headers()
    enc.encode()
    enc.complete_and_write_eoi()
    return enc.writer.get_buffer()
