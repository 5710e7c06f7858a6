"""Bitstream reader/writer tests.

Mirrors the reference's test strategy: jpeg/model/test/test_bits.ml —
round-trip of 10k random (width, value) pairs, stuffing behavior,
flush-with-1s padding.
"""

import random

import pytest

from video_coding_tpu.common.bitstream import BitReader, BitWriter


def test_roundtrip_random_widths():
    rng = random.Random(1234)
    pairs = [(w := rng.randint(1, 16), rng.getrandbits(w))
             for _ in range(10_000)]
    w = BitWriter()
    for bits, value in pairs:
        w.put_bits(value, bits, stuffing=False)
    w.flush_with_1s(stuffing=False)
    r = BitReader(w.get_buffer())
    for bits, value in pairs:
        assert r.get(bits) == value


def test_stuffing_inserts_zero_after_ff():
    w = BitWriter()
    w.put_bits(0xFF, 8, stuffing=True)
    w.put_bits(0xAB, 8, stuffing=True)
    assert w.get_buffer() == b"\xff\x00\xab"


def test_no_stuffing():
    w = BitWriter()
    w.put_bits(0xFF, 8, stuffing=False)
    w.put_bits(0xAB, 8, stuffing=False)
    assert w.get_buffer() == b"\xff\xab"


def test_stuffing_across_put_boundaries():
    # 4 bits of 0xF then 4+4 bits completing 0xFF then more
    w = BitWriter()
    w.put_bits(0xF, 4, stuffing=True)
    w.put_bits(0xF, 4, stuffing=True)
    w.put_bits(0x0, 8, stuffing=True)
    assert w.get_buffer() == b"\xff\x00\x00"


def test_flush_with_1s_pads_to_byte():
    w = BitWriter()
    w.put_bits(0, 3, stuffing=True)
    w.flush_with_1s(stuffing=True)
    assert w.get_buffer() == b"\x1f"
    assert w.bits_written() == 8


def test_reader_show_does_not_advance():
    r = BitReader(b"\xa5\x5a\x00")
    assert r.show(8) == 0xA5
    assert r.show(8) == 0xA5
    assert r.get(4) == 0xA
    assert r.get(4) == 0x5
    assert r.get(8) == 0x5A


def test_reader_reads_zero_past_end():
    r = BitReader(b"\xff\xff\xff\x00")
    r.advance(20)
    # A read that *starts* inside the buffer zero-fills past the end…
    assert r.get(12) == 0xF00
    # …but once the cursor itself is past the end, reads raise (stricter
    # than the reference, which loops forever on truncated headers).
    with pytest.raises(ValueError):
        r.get(4)


def test_reader_out_of_bounds_raises():
    # reads that *start* inside the buffer zero-fill past the end (the
    # reference decoder relies on this, bitstream_reader.ml:19-22 — and
    # one-byte restart segments must peek 16 bits)
    r = BitReader(b"\x01")
    assert r.show(8) == 0x01
    assert r.show(16) == 0x0100  # zero-filled tail
    r.advance(8)
    with pytest.raises(ValueError):
        r.show(1)  # cursor past the end: truncated-stream guard


def test_align_to_byte():
    r = BitReader(b"\x12\x34\x56")
    r.get(3)
    r.align_to_byte()
    assert r.get(8) == 0x34
    r.align_to_byte()  # already aligned: no-op
    assert r.get(8) == 0x56


def test_unaligned_16bit_peek():
    r = BitReader(b"\x12\x34\x56\x78")
    r.advance(5)
    # bits 5..20 of 0x12345678
    full = int.from_bytes(b"\x12\x34\x56\x78", "big")
    expect = (full >> (32 - 5 - 16)) & 0xFFFF
    assert r.show(16) == expect
