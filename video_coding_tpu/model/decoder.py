"""Baseline JPEG software decoder (golden model).

Capability parity with reference jpeg/model/src/decoder.ml: header marker
loop, per-component setup with sampling-factor geometry, stuffed-byte
removal, Huffman + magnitude decode, dequant + DC prediction + inverse
zigzag, integer Chen IDCT, clip/level-shift reconstruction, final crop, and
a sequenced per-block API for lockstep testing (decoder.ml:429-436).

Extensions over the reference:
- restart markers (DRI/RSTn) are honored: the entropy stream is split into
  segments at RSTn boundaries and DC predictors reset per segment (the
  reference parses DRI but ignores it — jpeg/README.md:36). This is the
  foundation of this framework's parallel entropy decode.
- the bulk decode path is phase-split: sequential entropy decode into a
  (num_blocks, 64) coefficient tensor, then batched vectorized
  dequant→dezigzag→IDCT→recon — the same tensor contract the TPU datapath
  kernels consume.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..common.bitstream import BitReader
from ..common.frame import Frame
from ..common.plane import Plane
from . import marker_codes
from . import markers
from .dct import chen_inverse_8x8
from .huffman import Lut, Spec
from .zigzag import INVERSE as ZIGZAG_INVERSE


class DecodeError(Exception):
    pass


@dataclasses.dataclass
class Header:
    """Parsed headers up to (and including) SOS (decoder.ml:5-71)."""

    frame: markers.Sof | None = None
    quant_tables: list = dataclasses.field(default_factory=list)
    huffman_tables: list = dataclasses.field(default_factory=list)
    restart_interval: markers.Dri | None = None
    scan: markers.Sos | None = None

    @classmethod
    def decode(cls, bits: BitReader) -> "Header":
        """Marker scan loop: find 0xFF, dispatch, stop at SOS
        (decoder.ml:24-70). Truncated input raises DecodeError."""
        try:
            return cls._decode(bits)
        except ValueError as e:
            raise DecodeError(f"truncated or invalid header: {e}") from e

    @classmethod
    def _decode(cls, bits: BitReader) -> "Header":
        t = cls()
        while True:
            bits.align_to_byte()
            while bits.get(8) != 0xFF:
                pass
            code = bits.get(8)
            if code == marker_codes.SOF0:
                t.frame = markers.Sof.decode(bits)
            elif code == marker_codes.SOS:
                t.scan = markers.Sos.decode(bits)
                return t
            elif code == marker_codes.DQT:
                t.quant_tables.extend(markers.Dqt.decode_segment(bits))
            elif code == marker_codes.DHT:
                t.huffman_tables.extend(markers.Dht.decode_segment(bits))
            elif code == marker_codes.DRI:
                t.restart_interval = markers.Dri.decode(bits)
            elif code == marker_codes.SOI:
                pass
            elif marker_codes.is_app(code) or code == marker_codes.COM:
                length = bits.show(16)
                bits.advance(length * 8)
            else:
                raise DecodeError(f"unsupported marker code 0x{code:02x}")

    def decode_next_scan(self, bits: BitReader) -> bool:
        """Resume the marker loop after a scan's entropy data (``bits``
        positioned at the terminating marker's 0xFF): table segments
        update this header, the next SOS replaces ``self.scan`` and
        returns True, EOI returns False. The hook for non-interleaved
        (multi-scan) streams — beyond the reference's scope
        (jpeg/README.md:15-45 lists non-interleaved as unsupported)."""
        try:
            while True:
                bits.align_to_byte()
                while bits.get(8) != 0xFF:
                    pass
                code = bits.get(8)
                if code == 0xFF:  # fill byte
                    bits.advance(-8)
                    continue
                if code == marker_codes.EOI:
                    return False
                if code == marker_codes.SOS:
                    self.scan = markers.Sos.decode(bits)
                    return True
                if code == marker_codes.DQT:
                    self.quant_tables.extend(markers.Dqt.decode_segment(bits))
                elif code == marker_codes.DHT:
                    self.huffman_tables.extend(
                        markers.Dht.decode_segment(bits))
                elif code == marker_codes.DRI:
                    self.restart_interval = markers.Dri.decode(bits)
                elif marker_codes.is_app(code) or code == marker_codes.COM:
                    length = bits.show(16)
                    bits.advance(length * 8)
                else:
                    raise DecodeError(
                        f"unsupported marker code 0x{code:02x} between scans")
        except ValueError as e:
            raise DecodeError(f"truncated stream between scans: {e}") from e


def mag(cat: int, code: int) -> int:
    """Magnitude (sign-extension) decode of a size-``cat`` value
    (decoder.ml:73-79)."""
    if cat == 0:
        return 0
    if code & (1 << (cat - 1)):
        return code
    return (code | (-1 << cat)) + 1


def extract_entropy_segments_span(
        bits: BitReader) -> tuple[list[bytes], list[int], int]:
    """De-stuff the entropy-coded data, splitting at RSTn markers.

    Generalizes decoder.ml:261-281 extract_entropy_coded_bits: 0xFF00 →
    0xFF; RST0-7 ends the current segment and starts the next; any other
    marker terminates the scan. Also returns the RSTn modulo-8 index of
    each segment terminator (len = len(segments) - 1) — the standard's
    hook for re-aligning segments after marker loss (resync) — and the
    byte offset of the terminating marker's 0xFF (== len(buf) when the
    scan runs to the end), so multi-scan decoding can resume the marker
    loop there."""
    buf = bits.buffer
    pos = bits.bit_pos >> 3
    segments: list[bytes] = []
    marker_indices: list[int] = []
    out = bytearray()
    n = len(buf)
    end = n
    while True:
        # Fast scan to the next 0xFF.
        nxt = buf.find(b"\xff", pos)
        if nxt == -1:
            out.extend(buf[pos:])
            break
        out.extend(buf[pos:nxt])
        marker = buf[nxt + 1] if nxt + 1 < n else 0xD9
        if marker == 0x00:
            out.append(0xFF)
            pos = nxt + 2
        elif marker_codes.is_rst(marker):
            segments.append(bytes(out))
            marker_indices.append(marker & 7)
            out = bytearray()
            pos = nxt + 2
        elif marker == 0xFF:
            # Fill bytes before a marker are legal; keep scanning.
            pos = nxt + 1
        else:
            end = nxt
            break
    segments.append(bytes(out))
    return segments, marker_indices, end


def extract_entropy_segments_with_markers(
        bits: BitReader) -> tuple[list[bytes], list[int]]:
    segments, marker_indices, _end = extract_entropy_segments_span(bits)
    return segments, marker_indices


def extract_entropy_segments(bits: BitReader) -> list[bytes]:
    return extract_entropy_segments_span(bits)[0]


def plan_segment_alignment(marker_indices: list[int], n_received: int,
                           expected: int) -> tuple[list, list[int]]:
    """Assign received restart segments to expected segment slots using
    the RSTn modulo-8 marker indices (segment s is terminated by RST(s%8)).

    This is what makes resync robust to *marker* damage, not just payload
    damage: a destroyed RSTn merges two received segments, and without the
    index check every later segment would shift — corrupting the rest of
    the frame. With it, a merged segment is detected (its terminator index
    jumps by k) and decoded as a run of k+1 slots (the payload bytes are
    still intact, so the data is fully recovered), and later segments stay
    aligned.

    Returns ``(items, uncovered)``: items are ``(slot0, n_slots, j)`` —
    received segment j holds slots [slot0, slot0+n_slots) — and uncovered
    lists slots no received segment claims (to be concealed)."""
    items = []
    p = 0
    for j in range(n_received):
        if p >= expected:
            break  # extra trailing segments: ignore
        m = marker_indices[j] if j < len(marker_indices) else None
        if m is None or m == p % 8:
            items.append((p, 1, j))
            p += 1
            continue
        k = (m - p) % 8
        # cross-check against the *next* terminator: if it matches the
        # single-slot continuation, this marker's index byte was merely
        # corrupted (the split position is right) — don't hypothesize a
        # merge, which would mis-place every later segment
        nxt = marker_indices[j + 1] if j + 1 < len(marker_indices) else None
        if nxt is not None and nxt == (p + 1) % 8:
            items.append((p, 1, j))
            p += 1
        elif p + k < expected:
            # k markers lost: segment j carries slots p..p+k back to back
            items.append((p, k + 1, j))
            p += k + 1
        else:
            # index jump past the scan end: unreliable, best-effort single
            items.append((p, 1, j))
            p += 1
    slots = set()
    for slot0, n_slots, _j in items:
        slots.update(range(slot0, slot0 + n_slots))
    uncovered = [s for s in range(expected) if s not in slots]
    return items, uncovered


@dataclasses.dataclass
class Component:
    """Per-scan-component decode state (decoder.ml:167-204)."""

    plane: Plane
    decoded_width: int
    decoded_height: int
    actual_width: int
    actual_height: int
    component: markers.Component
    scan: markers.ScanComponent
    quant_table: np.ndarray  # 64 entries, zigzag order
    dc_tab: Lut
    ac_tab: Lut
    dc_pred: int = 0
    x: int = 0
    y: int = 0
    # per-block scratch, exposed by the sequenced debug API
    coefs: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(64, dtype=np.int32))
    dequant: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(64, dtype=np.int64))
    idct: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(64, dtype=np.int64))
    recon: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(64, dtype=np.int64))


def _find_component(scan: markers.ScanComponent,
                    frame: markers.Sof) -> markers.Component:
    for c in frame.components:
        if c.identifier == scan.selector:
            return c
    raise DecodeError("unable to find component identifier")


def _find_quant_table(quant_tables, ident) -> np.ndarray:
    # last match: a later DQT legally redefines the identifier (T.81
    # B.2.4.1 — tables take effect for following scans)
    for q in reversed(quant_tables):
        if q.table_identifier == ident:
            return np.asarray(q.elements, dtype=np.int64)
    raise DecodeError("unable to find quantisation table")


def _find_huffman_lut(huffman_tables, table_class, ident, ac: bool) -> Lut:
    # last match: a later DHT legally redefines the identifier
    for h in reversed(huffman_tables):
        if h.table_class == table_class and h.destination_identifier == ident:
            spec = Spec(lengths=tuple(h.lengths), values=tuple(h.values))
            codes = spec.ac_code_table() if ac else spec.dc_code_table()
            return Lut(codes, ac=ac)
    raise DecodeError("unable to find huffman table")


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def huffman_decode_block(bits: BitReader, dc_tab: Lut, ac_tab: Lut,
                         coefs: np.ndarray) -> None:
    """One 8x8 block of Huffman + magnitude decode into zigzag-order
    ``coefs`` (decoder.ml:118-140). Exhausting the reader (cursor past
    the end — reads *starting* inside zero-fill, like the native tiers)
    is a DecodeError."""
    try:
        _huffman_decode_block_inner(bits, dc_tab, ac_tab, coefs)
    except DecodeError:
        raise
    except ValueError as e:
        raise DecodeError(f"entropy data exhausted: {e}") from e


def _huffman_decode_block_inner(bits: BitReader, dc_tab: Lut, ac_tab: Lut,
                                coefs: np.ndarray) -> None:
    length, data = dc_tab.lookup(bits.show(dc_tab.max_bits))
    if length == 0:
        raise DecodeError("Can't find dc code")
    bits.advance(length)
    coefs[0] = mag(data, bits.get(data) if data else 0)
    cof_cnt = 1
    ac_max = ac_tab.max_bits
    while cof_cnt < 64:
        length, data = ac_tab.lookup(bits.show(ac_max))
        if length == 0:
            raise DecodeError("Can't find ac code")
        bits.advance(length)
        run, size = (data >> 4) & 0xF, data & 0xF
        value = mag(size, bits.get(size) if size else 0)
        if value == 0 and run == 0:
            break  # EOB
        cof_cnt += run
        if cof_cnt >= 64:
            raise DecodeError(
                f"coefficient index out of range: {cof_cnt}")
        coefs[cof_cnt] = value
        cof_cnt += 1


class Decoder:
    """Full-frame decoder (decoder.ml init/decode/get_yuv_frame)."""

    def __init__(self, header: Header, bits: BitReader):
        frame, scan = header.frame, header.scan
        if frame is None or scan is None:
            raise DecodeError("missing start of frame or start of scan")
        max_h = max(c.horizontal_sampling_factor for c in frame.components)
        max_v = max(c.vertical_sampling_factor for c in frame.components)
        rounded_w = _round_up(frame.width, max_h * 8)
        rounded_h = _round_up(frame.height, max_v * 8)
        self.header = header
        self.components: list[Component] = []
        for sc in scan.scan_components:
            comp = _find_component(sc, frame)
            dw = rounded_w * comp.horizontal_sampling_factor // max_h
            dh = rounded_h * comp.vertical_sampling_factor // max_v
            aw = frame.width * comp.horizontal_sampling_factor // max_h
            ah = frame.height * comp.vertical_sampling_factor // max_v
            self.components.append(Component(
                plane=Plane(dw, dh),
                decoded_width=dw, decoded_height=dh,
                actual_width=aw, actual_height=ah,
                component=comp, scan=sc,
                quant_table=_find_quant_table(
                    header.quant_tables, comp.quantization_table_identifier),
                dc_tab=_find_huffman_lut(
                    header.huffman_tables, 0, sc.dc_coef_selector, ac=False),
                ac_tab=_find_huffman_lut(
                    header.huffman_tables, 1, sc.ac_coef_selector, ac=True),
            ))
        self.entropy_segments, self.entropy_marker_indices = (
            extract_entropy_segments_with_markers(bits))
        self.restart_interval = (
            header.restart_interval.restart_interval
            if header.restart_interval else 0)

    # -- geometry ---------------------------------------------------------
    @property
    def macroblocks_wide(self) -> int:
        c = self.components[0]
        return c.decoded_width // (8 * c.component.horizontal_sampling_factor)

    @property
    def macroblocks_high(self) -> int:
        c = self.components[0]
        return c.decoded_height // (8 * c.component.vertical_sampling_factor)

    def block_schedule(self) -> list[tuple[int, int, int]]:
        """Flat (component_index, x, y) schedule in scan order — the MCU
        iteration of decoder.ml:374-395. Memoized (several pipeline stages
        walk it per frame)."""
        cached = getattr(self, "_schedule", None)
        if cached is not None:
            return cached
        sched = []
        for mcu_y in range(self.macroblocks_high):
            for mcu_x in range(self.macroblocks_wide):
                for ci, comp in enumerate(self.components):
                    hs = comp.component.horizontal_sampling_factor
                    vs = comp.component.vertical_sampling_factor
                    for v in range(vs):
                        for h in range(hs):
                            sched.append((ci,
                                          (mcu_x * hs + h) * 8,
                                          (mcu_y * vs + v) * 8))
        self._schedule = sched
        return sched

    # -- entropy ----------------------------------------------------------
    def _huffman_decode_block(self, bits: BitReader, comp: Component,
                              coefs: np.ndarray) -> None:
        huffman_decode_block(bits, comp.dc_tab, comp.ac_tab, coefs)

    def decode_entropy(self, resync: bool = False) -> np.ndarray:
        """Sequential entropy decode of the whole scan.

        Returns (num_blocks, 64) int32 zigzag-order coefficients with DC
        prediction already resolved, in block_schedule order. Restart
        segments reset DC predictors and bit alignment.

        With ``resync=True``, decode errors are concealed using restart-
        marker resynchronization (the standard's recovery mechanism, TODO
        in the reference — jpeg/README.md:36): the damaged segment is
        zeroed from the failing block onward and decode resumes at the
        next RSTn; missing segments (truncated stream) decode as all-zero
        blocks. ``self.damaged_segments`` lists concealed segment
        indices."""
        sched = self.block_schedule()
        coefs = np.zeros((len(sched), 64), dtype=np.int32)
        mcu_size = sum(c.component.horizontal_sampling_factor
                       * c.component.vertical_sampling_factor
                       for c in self.components)
        blocks_per_segment = (self.restart_interval * mcu_size
                              if self.restart_interval else len(sched))
        n_segments = -(-len(sched) // blocks_per_segment)
        self.damaged_segments: list[int] = []

        def decode_slot(bits, slot, bit_limit=None):
            """Decode one slot's blocks. Returns None, or the global index
            of the failing block (zeroed; earlier blocks are valid).
            ``bit_limit`` (resync) flags data exhaustion: consuming past
            the segment's real bits means zero-fill garbage, an error."""
            first = slot * blocks_per_segment
            count = min(blocks_per_segment, len(sched) - first)
            dc_preds = [0] * len(self.components)
            for i in range(first, first + count):
                ci = sched[i][0]
                row = coefs[i]
                try:
                    self._huffman_decode_block(
                        bits, self.components[ci], row)
                    if bit_limit is not None and bits.bit_pos > bit_limit:
                        raise DecodeError("segment data exhausted")
                except DecodeError:
                    row[:] = 0  # failing block may be partially written
                    return i
                dc_preds[ci] += int(row[0])
                row[0] = dc_preds[ci]
            return None

        if not resync:
            for slot in range(n_segments):
                if slot >= len(self.entropy_segments):
                    raise DecodeError(f"missing restart segment {slot}")
                bad = decode_slot(BitReader(self.entropy_segments[slot]),
                                  slot)
                if bad is not None:
                    raise DecodeError(
                        f"entropy decode failed at block {bad}")
            return coefs

        # resync: re-align received segments by RSTn modulo-8 index, then
        # decode each (possibly multi-slot, after marker loss) run,
        # concealing from the first error to the end of the run
        items, uncovered = plan_segment_alignment(
            self.entropy_marker_indices, len(self.entropy_segments),
            n_segments)
        damaged = set(uncovered)
        for slot0, n_slots, j in items:
            seg = self.entropy_segments[j]
            bits = BitReader(seg)
            for t in range(n_slots):
                slot = slot0 + t
                if slot * blocks_per_segment >= len(sched):
                    break
                if t:
                    bits.align_to_byte()  # slots are 1-padded to bytes
                bad = decode_slot(bits, slot, bit_limit=8 * len(seg))
                if bad is not None:
                    run_end = min((slot0 + n_slots) * blocks_per_segment,
                                  len(sched))
                    coefs[bad:run_end] = 0
                    damaged.update(
                        s for s in range(slot, slot0 + n_slots)
                        if s * blocks_per_segment < len(sched))
                    break
        self.damaged_segments = sorted(damaged)
        return coefs

    # -- numerics (batched) ----------------------------------------------
    def reconstruct(self, coefs: np.ndarray) -> None:
        """Batched dequant → dezigzag → Chen IDCT → clip/level-shift →
        plane writes. Bit-exact with the reference per-block pipeline
        (decoder.ml:142-149, :215-224, :347-360)."""
        sched = self.block_schedule()
        comp_idx = np.array([s[0] for s in sched], dtype=np.int32)
        qtabs = np.stack([c.quant_table for c in self.components])
        dequant_zz = coefs.astype(np.int64) * qtabs[comp_idx]
        # accelerator coefficient width: 12-bit signed, like the reference
        # RTL coefficient bus (codeblock_decoder.ml Idct_coefs coef[11:0]).
        # Valid streams always fit; hostile/corrupt streams saturate here
        # identically in every tier (model, XLA, Pallas).
        np.clip(dequant_zz, -2048, 2047, out=dequant_zz)
        # inverse zigzag: natural[ZIGZAG_INVERSE[i]] = zigzag[i]
        dequant = np.zeros_like(dequant_zz)
        dequant[:, ZIGZAG_INVERSE] = dequant_zz
        idct = chen_inverse_8x8(dequant.reshape(-1, 8, 8))
        recon = np.clip(idct, -128, 127) + 128
        recon = recon.astype(np.uint8)
        for i, (ci, x, y) in enumerate(sched):
            comp = self.components[ci]
            comp.plane.data[y:y + 8, x:x + 8] = recon[i]

    def decode(self, resync: bool = False) -> None:
        self.reconstruct(self.decode_entropy(resync=resync))

    # -- sequenced per-block API (lockstep testing hook) ------------------
    def decode_blocks_seq(self):
        """Generator yielding the Component after each block decode, with
        coefs/dequant/idct/recon scratch filled — mirror of
        For_testing.Sequenced.decode (decoder.ml:429-436)."""
        sched = self.block_schedule()
        coefs_all = self.decode_entropy()
        for i, (ci, x, y) in enumerate(sched):
            comp = self.components[ci]
            comp.x, comp.y = x, y
            comp.coefs[:] = coefs_all[i]
            comp.dc_pred = int(coefs_all[i][0])
            dq = comp.coefs.astype(np.int64) * comp.quant_table
            np.clip(dq, -2048, 2047, out=dq)  # 12-bit accelerator width
            comp.dequant[ZIGZAG_INVERSE] = dq
            comp.idct[:] = chen_inverse_8x8(
                comp.dequant.reshape(8, 8)).reshape(64)
            comp.recon[:] = np.clip(comp.idct, -128, 127) + 128
            comp.plane.data[y:y + 8, x:x + 8] = (
                comp.recon.reshape(8, 8).astype(np.uint8))
            yield comp

    # -- output -----------------------------------------------------------
    def _crop(self, comp: Component) -> Plane:
        """Crop decoded plane to actual size (decoder.ml:403-413)."""
        if (comp.decoded_width != comp.actual_width
                or comp.decoded_height != comp.actual_height):
            out = Plane(comp.actual_width, comp.actual_height)
            comp.plane.blit_available(out)
            return out
        return comp.plane

    def get_decoded_planes(self) -> list[Plane]:
        return [c.plane for c in self.components]

    def get_planes(self) -> list[Plane]:
        return [self._crop(c) for c in self.components]

    def get_yuv_frame(self) -> Frame:
        planes = self.get_planes()
        return Frame.of_planes(planes[0], planes[1], planes[2])


class MultiScanDecoder:
    """General baseline decoder for multi-scan streams — non-interleaved
    (one component per SOS) or mixed. A capability beyond the reference's
    scope (jpeg/README.md:15-45 lists non-interleaved scans as
    unsupported).

    Per T.81: each frame component appears in exactly one scan; a scan
    with Ns>1 is interleaved in MCU order over the frame grid, a scan
    with Ns=1 rasters over ceil(xi/8) × ceil(yi/8) blocks of that
    component alone (A.2.2, with xi = ceil(X·Hi/Hmax)); DRI applies per
    scan with the restart interval counted in that scan's MCUs, and
    tables may be (re)defined between scans."""

    def __init__(self, header: Header, bits: BitReader):
        frame = header.frame
        if frame is None or header.scan is None:
            raise DecodeError("missing start of frame or start of scan")
        self.header = header
        self.bits = bits
        self.max_h = max(c.horizontal_sampling_factor
                         for c in frame.components)
        self.max_v = max(c.vertical_sampling_factor
                         for c in frame.components)
        self.rounded_w = _round_up(frame.width, self.max_h * 8)
        self.rounded_h = _round_up(frame.height, self.max_v * 8)
        self.planes: dict[int, Plane] = {}
        self.actual_dims: dict[int, tuple[int, int]] = {}
        for comp in frame.components:
            dw = self.rounded_w * comp.horizontal_sampling_factor // self.max_h
            dh = self.rounded_h * comp.vertical_sampling_factor // self.max_v
            # T.81 A.1.1: xi = ceil(X·Hi/Hmax)
            aw = -(-frame.width * comp.horizontal_sampling_factor
                   // self.max_h)
            ah = -(-frame.height * comp.vertical_sampling_factor
                   // self.max_v)
            self.planes[comp.identifier] = Plane(dw, dh)
            self.actual_dims[comp.identifier] = (aw, ah)
        self.decoded_components: list[int] = []

    def _scan_schedule(self, scan: markers.Sos
                       ) -> tuple[list[tuple[int, int, int]], int]:
        """Coded-order [(identifier, x, y)] plus blocks per MCU."""
        frame = self.header.frame
        if len(scan.scan_components) > 1:
            comps = [_find_component(sc, frame)
                     for sc in scan.scan_components]
            mcus_w = self.rounded_w // (8 * self.max_h)
            mcus_h = self.rounded_h // (8 * self.max_v)
            sched = []
            for my in range(mcus_h):
                for mx in range(mcus_w):
                    for comp in comps:
                        hs = comp.horizontal_sampling_factor
                        vs = comp.vertical_sampling_factor
                        for v in range(vs):
                            for h in range(hs):
                                sched.append((comp.identifier,
                                              (mx * hs + h) * 8,
                                              (my * vs + v) * 8))
            return sched, sum(c.horizontal_sampling_factor
                              * c.vertical_sampling_factor for c in comps)
        comp = _find_component(scan.scan_components[0], frame)
        aw, ah = self.actual_dims[comp.identifier]
        bw, bh = -(-aw // 8), -(-ah // 8)
        sched = [(comp.identifier, bx * 8, by * 8)
                 for by in range(bh) for bx in range(bw)]
        return sched, 1

    def _decode_scan(self, scan_idx: int = 0,
                     resync: bool = False) -> None:
        header = self.header
        scan = header.scan
        sched, mcu_blocks = self._scan_schedule(scan)
        tabs: dict[int, tuple] = {}
        for sc in scan.scan_components:
            comp = _find_component(sc, header.frame)
            tabs[sc.selector] = (
                _find_quant_table(header.quant_tables,
                                  comp.quantization_table_identifier),
                _find_huffman_lut(header.huffman_tables, 0,
                                  sc.dc_coef_selector, ac=False),
                _find_huffman_lut(header.huffman_tables, 1,
                                  sc.ac_coef_selector, ac=True),
            )
            self.decoded_components.append(sc.selector)
        segments, marks, end = extract_entropy_segments_span(self.bits)
        self.bits.bit_pos = end * 8  # resume the marker loop here
        ri = (header.restart_interval.restart_interval
              if header.restart_interval else 0)
        bps = ri * mcu_blocks if ri else len(sched)
        n_segments = -(-len(sched) // bps)
        coefs = np.zeros((len(sched), 64), dtype=np.int32)

        def decode_slot(rdr, slot, bit_limit=None):
            first = slot * bps
            count = min(bps, len(sched) - first)
            dc_preds = {k: 0 for k in tabs}
            for i in range(first, first + count):
                ident = sched[i][0]
                row = coefs[i]
                try:
                    huffman_decode_block(rdr, tabs[ident][1],
                                         tabs[ident][2], row)
                    if bit_limit is not None and rdr.bit_pos > bit_limit:
                        raise DecodeError("segment data exhausted")
                except DecodeError:
                    row[:] = 0
                    return i
                dc_preds[ident] += int(row[0])
                row[0] = dc_preds[ident]
            return None

        if not resync:
            for slot in range(n_segments):
                if slot >= len(segments):
                    raise DecodeError(f"missing restart segment {slot}")
                bad = decode_slot(BitReader(segments[slot]), slot)
                if bad is not None:
                    raise DecodeError(
                        f"entropy decode failed at block {bad}")
        else:
            # same restart-resync concealment as Decoder.decode_entropy,
            # per scan: realign by RSTn index, conceal damaged runs
            items, uncovered = plan_segment_alignment(
                marks, len(segments), n_segments)
            damaged = set(uncovered)
            for slot0, n_slots, j in items:
                seg = segments[j]
                rdr = BitReader(seg)
                for t in range(n_slots):
                    slot = slot0 + t
                    if slot * bps >= len(sched):
                        break
                    if t:
                        rdr.align_to_byte()
                    bad = decode_slot(rdr, slot, bit_limit=8 * len(seg))
                    if bad is not None:
                        run_end = min((slot0 + n_slots) * bps, len(sched))
                        coefs[bad:run_end] = 0
                        damaged.update(
                            s for s in range(slot, slot0 + n_slots)
                            if s * bps < len(sched))
                        break
            self.damaged_segments.extend(
                (scan_idx, s) for s in sorted(damaged))
        # batched dequant → dezigzag → IDCT → recon (same numerics contract
        # as Decoder.reconstruct)
        qarr = np.stack([tabs[ident][0] for ident, _x, _y in sched])
        dequant_zz = coefs.astype(np.int64) * qarr
        np.clip(dequant_zz, -2048, 2047, out=dequant_zz)  # 12-bit width
        dequant = np.zeros_like(dequant_zz)
        dequant[:, ZIGZAG_INVERSE] = dequant_zz
        idct = chen_inverse_8x8(dequant.reshape(-1, 8, 8))
        recon = (np.clip(idct, -128, 127) + 128).astype(np.uint8)
        for i, (ident, x, y) in enumerate(sched):
            self.planes[ident].data[y:y + 8, x:x + 8] = recon[i]

    def decode(self, resync: bool = False) -> None:
        """With ``resync=True``, damaged restart segments are concealed
        per scan (``self.damaged_segments`` lists (scan, segment) pairs),
        inter-scan header damage stops cleanly, and components whose scan
        never arrived fill mid-gray."""
        self.damaged_segments: list[tuple[int, int]] = []
        scan_idx = 0
        while True:
            self._decode_scan(scan_idx, resync=resync)
            try:
                more = self.header.decode_next_scan(self.bits)
            except DecodeError:
                if not resync:
                    raise
                more = False
            if not more:
                break
            scan_idx += 1
        missing = [c.identifier for c in self.header.frame.components
                   if c.identifier not in self.decoded_components]
        if missing:
            if not resync:
                raise DecodeError(f"components never scanned: {missing}")
            for ident in missing:  # conceal never-scanned planes mid-gray
                self.planes[ident].data[:] = 128
            self.missing_components = missing

    def get_planes(self) -> list[Plane]:
        out = []
        for comp in self.header.frame.components:
            p = self.planes[comp.identifier]
            aw, ah = self.actual_dims[comp.identifier]
            if (p.width, p.height) != (aw, ah):
                cropped = Plane(aw, ah)
                p.blit_available(cropped)
                p = cropped
            out.append(p)
        return out

    def get_yuv_frame(self) -> Frame:
        planes = self.get_planes()
        if len(planes) != 3:
            raise DecodeError("YUV frame needs 3 components")
        return Frame.of_planes(planes[0], planes[1], planes[2])


def decode_a_frame(data: bytes) -> Frame:
    """One-shot full decode (decoder.ml:422-427). Streams whose first
    scan covers only part of the frame's components (non-interleaved /
    multi-scan) route to MultiScanDecoder."""
    bits = BitReader(data)
    header = Header.decode(bits)
    if (header.frame is not None and header.scan is not None
            and len(header.scan.scan_components)
            < len(header.frame.components)):
        mdec = MultiScanDecoder(header, bits)
        mdec.decode()
        return mdec.get_yuv_frame()
    dec = Decoder(header, bits)
    dec.decode()
    return dec.get_yuv_frame()


def decode_frame_bytes(path: str) -> Frame:
    with open(path, "rb") as f:
        return decode_a_frame(f.read())
