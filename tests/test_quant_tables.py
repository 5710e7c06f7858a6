"""Quality scaling tests (mirrors jpeg/model/test/test_quant_tables.ml
goldens at q=1/25/50/75/95/100)."""

import numpy as np

from video_coding_tpu.model import quant_tables


def test_q50_is_identity():
    # s = 200 - 100 = 100 → d' = (d*100+50)/100 = d (for d in 1..255)
    assert (quant_tables.scale(quant_tables.LUMA, 50)
            == quant_tables.LUMA).all()
    assert (quant_tables.scale(quant_tables.CHROMA, 50)
            == quant_tables.CHROMA).all()


def test_q100_all_ones():
    assert (quant_tables.scale(quant_tables.LUMA, 100) == 1).all()
    assert (quant_tables.scale(quant_tables.CHROMA, 100) == 1).all()


def test_q1_saturates_255():
    scaled = quant_tables.scale(quant_tables.LUMA, 1)
    # s = 5000 → d' = clip(50*d + 0.5, 1, 255): every entry ≥ 10*50 → 255
    assert (scaled == 255).all()


def test_q25_exact_values():
    # s = 200, d' = (d*200+50)//100 = 2d (for the first entries)
    scaled = quant_tables.scale(quant_tables.LUMA, 25)
    assert scaled[0] == 32 and scaled[1] == 22 and scaled[2] == 20


def test_q95():
    # s = 10 → d' = (10d+50)//100
    scaled = quant_tables.scale(quant_tables.LUMA, 95)
    expect = np.clip((quant_tables.LUMA * 10 + 50) // 100, 1, 255)
    assert (scaled == expect).all()
    assert scaled[0] == 2  # (160+50)//100


def test_clip_lower_bound():
    assert quant_tables.scale(quant_tables.LUMA, 99).min() >= 1


def test_out_of_range_quality_clamped():
    assert (quant_tables.scale(quant_tables.LUMA, 0)
            == quant_tables.scale(quant_tables.LUMA, 1)).all()
    assert (quant_tables.scale(quant_tables.LUMA, 200)
            == quant_tables.scale(quant_tables.LUMA, 100)).all()


def test_annex_k_first_rows():
    assert quant_tables.LUMA[:8].tolist() == [16, 11, 10, 16, 24, 40, 51, 61]
    assert quant_tables.CHROMA[:8].tolist() == [17, 18, 24, 47, 99, 99, 99, 99]
