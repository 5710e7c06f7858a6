"""Header segment encode→decode round trips (mirrors
jpeg/model/test/test_encode_headers.ml)."""

from video_coding_tpu.common.bitstream import BitReader, BitWriter
from video_coding_tpu.model import markers


def roundtrip(segment, cls):
    w = BitWriter()
    segment.encode(w)
    return cls.decode(BitReader(w.get_buffer()))


def test_sof_roundtrip():
    sof = markers.Sof(
        length=0, sample_precision=8, width=480, height=320,
        number_of_components=3,
        components=[
            markers.Component(1, 2, 2, 0),
            markers.Component(2, 1, 1, 1),
            markers.Component(3, 1, 1, 1),
        ])
    out = roundtrip(sof, markers.Sof)
    assert out.width == 480 and out.height == 320
    assert out.length == 2 + 6 + 9
    assert [ (c.identifier, c.horizontal_sampling_factor,
              c.vertical_sampling_factor, c.quantization_table_identifier)
             for c in out.components ] == [(1, 2, 2, 0), (2, 1, 1, 1),
                                           (3, 1, 1, 1)]


def test_sos_roundtrip():
    sos = markers.Sos(
        length=0, number_of_image_components=3,
        scan_components=[markers.ScanComponent(1, 0, 0),
                         markers.ScanComponent(2, 1, 1),
                         markers.ScanComponent(3, 1, 1)],
        start_of_predictor_selection=0,
        end_of_predictor_selection=63,
        successive_approximation_bit_high=0,
        successive_approximation_bit_low=0)
    out = roundtrip(sos, markers.Sos)
    assert out.number_of_image_components == 3
    assert out.end_of_predictor_selection == 63
    assert out.scan_components[1].dc_coef_selector == 1


def test_dqt_roundtrip():
    dqt = markers.Dqt(0, 8, 1, list(range(1, 65)))
    out = roundtrip(dqt, markers.Dqt)
    assert out.table_identifier == 1
    assert out.element_precision == 8
    assert out.elements == list(range(1, 65))


def test_dqt_16bit_roundtrip():
    dqt = markers.Dqt(0, 16, 0, [300 + i for i in range(64)])
    out = roundtrip(dqt, markers.Dqt)
    assert out.element_precision == 16
    assert out.elements == [300 + i for i in range(64)]


def test_dht_roundtrip():
    lengths = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    values = list(range(12))
    dht = markers.Dht(0, 0, 1, lengths, values)
    out = roundtrip(dht, markers.Dht)
    assert out.table_class == 0
    assert out.destination_identifier == 1
    assert out.lengths == lengths
    assert out.values == values


def test_dri_roundtrip():
    out = roundtrip(markers.Dri(4, 123), markers.Dri)
    assert out.restart_interval == 123
