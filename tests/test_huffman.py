"""Huffman table and magnitude coding tests.

Mirrors reference jpeg/model/test/test_tables.ml (canonical code goldens),
test_encode_codewords.ml (size/magnitude encode↔decode inverse property).
"""

import numpy as np

from video_coding_tpu.model import huffman
from video_coding_tpu.model.decoder import mag
from video_coding_tpu.model.encoder import magnitude_bits, size_category


def test_dc_luma_canonical_codes():
    codes = huffman.DC_LUMA.dc_code_table()
    # Annex-K DC luma: category 0 gets the single 2-bit code 00,
    # categories 1-5 the 3-bit codes 010..110, etc.
    by_data = {c.data: c for c in codes}
    assert (by_data[0].length, by_data[0].bits) == (2, 0b00)
    assert (by_data[1].length, by_data[1].bits) == (3, 0b010)
    assert (by_data[5].length, by_data[5].bits) == (3, 0b110)
    assert (by_data[6].length, by_data[6].bits) == (4, 0b1110)
    assert (by_data[11].length, by_data[11].bits) == (9, 0b111111110)


def test_ac_luma_well_known_codes():
    codes = huffman.AC_LUMA.ac_code_table()
    by_data = {c.data: c for c in codes}
    # EOB (0,0) = 1010 (4 bits); ZRL (15,0) = 11111111001 (11 bits)
    assert (by_data[(0, 0)].length, by_data[(0, 0)].bits) == (4, 0b1010)
    assert (by_data[(15, 0)].length, by_data[(15, 0)].bits) == (11, 0b11111111001)
    assert (by_data[(0, 1)].length, by_data[(0, 1)].bits) == (2, 0b00)


def test_codes_are_prefix_free():
    for spec, ac in [(huffman.DC_LUMA, False), (huffman.DC_CHROMA, False),
                     (huffman.AC_LUMA, True), (huffman.AC_CHROMA, True)]:
        codes = spec.ac_code_table() if ac else spec.dc_code_table()
        seen = set()
        for c in codes:
            padded = format(c.bits, f"0{c.length}b")
            seen.add(padded)
        for a in seen:
            for b in seen:
                if a != b:
                    assert not b.startswith(a) or len(b) == len(a)


def test_lut_decodes_every_code():
    for spec, ac in [(huffman.DC_LUMA, False), (huffman.AC_LUMA, True),
                     (huffman.DC_CHROMA, False), (huffman.AC_CHROMA, True)]:
        codes = spec.ac_code_table() if ac else spec.dc_code_table()
        lut = huffman.Lut(codes, ac=ac)
        for c in codes:
            peek = c.bits << (lut.max_bits - c.length)
            length, data = lut.lookup(peek)
            assert length == c.length
            if ac:
                assert ((data >> 4) & 0xF, data & 0xF) == c.data
            else:
                assert data == c.data


def test_encoder_dc_table_indexed_by_size():
    table = huffman.encoder_dc_table(huffman.DC_LUMA)
    assert [c.data for c in table] == list(range(12))


def test_encoder_ac_table_placeholder_normalization():
    table = huffman.encoder_ac_table(huffman.AC_LUMA)
    # every run group indexes sizes at their index
    for run, group in enumerate(table):
        for size, code in enumerate(group):
            assert code.data == (run, size)
    # run=0 size=0 (EOB) and run=15 size=0 (ZRL) are real codes
    assert table[0][0].length == 4
    assert table[15][0].length == 11
    # other runs have zero-length placeholders at size 0
    assert table[1][0].length == 0


def test_magnitude_roundtrip_small_range():
    """encode(mag) then decode recovers value for [-15, 15]
    (test_encode_codewords.ml:10-50)."""
    for v in range(-15, 16):
        s = size_category(v)
        m = magnitude_bits(s, v)
        assert mag(s, m) == v


def test_magnitude_roundtrip_category_ranges():
    rng = np.random.default_rng(5)
    for cat in range(1, 12):
        lo, hi = 1 << (cat - 1), (1 << cat) - 1
        for v in set(rng.integers(lo, hi + 1, size=20).tolist()) | {lo, hi}:
            for sv in (v, -v):
                s = size_category(sv)
                assert s == cat
                assert mag(s, magnitude_bits(s, sv)) == sv


def test_size_category():
    assert size_category(0) == 0
    assert size_category(1) == 1
    assert size_category(-1) == 1
    assert size_category(2) == 2
    assert size_category(-3) == 2
    assert size_category(1023) == 10
    assert size_category(-2047) == 11
