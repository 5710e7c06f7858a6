"""Restart-marker resynchronization (error concealment) tests.

The JPEG standard's recovery mechanism — resume decode at the next RSTn
after corrupt data — is TODO in the reference (jpeg/README.md:36). Here
restart segments are independent by construction, so a damaged segment is
concealed (zero coefficients from the failing block onward → mid-gray) and
every other segment decodes exactly. Concealment must be bit-identical
across all host tiers: golden model, Python scan fallback, native C++.
"""

import numpy as np
import pytest

from video_coding_tpu.common.bitstream import BitReader
from video_coding_tpu.common.frame import ChromaSubsampling
from video_coding_tpu.entropy import scan as entropy_scan
from video_coding_tpu.model import decoder as mdec
from video_coding_tpu.runtime import engine


RI = 2  # restart interval (MCUs) used throughout


@pytest.fixture(scope="module")
def stream(mini64_frames):
    """A restart-segmented 4:2:0 stream plus its decode-session plumbing."""
    f = mini64_frames[ChromaSubsampling.C420]
    data = engine.encode_jpeg(f, 75, restart_interval=RI)
    bits = BitReader(data)
    header = mdec.Header.decode(bits)
    session = engine.JpegDecoderSession(header, impl="jnp")
    entropy = data[bits.bit_pos >> 3:]
    segments = entropy_scan.destuff_segments(entropy)
    clean = entropy_scan.decode_scan(
        segments, session.comp_idx, session.blocks_per_segment,
        session.tables)
    return data, session, segments, clean


def assemble_stream(original: bytes, segments: list[bytes],
                    terminators: list = None) -> bytes:
    """Re-assemble a full JPEG from (possibly corrupted) destuffed
    segments: re-stuff, join with RSTn, close with EOI. ``terminators[i]``
    overrides segment i's RSTn index; None drops the marker entirely
    (merging it with the next segment on the wire)."""
    bits = BitReader(original)
    mdec.Header.decode(bits)
    out = bytearray(original[:bits.bit_pos >> 3])
    for i, seg in enumerate(segments):
        out += seg.replace(b"\xff", b"\xff\x00")
        if i < len(segments) - 1:
            t = terminators[i] if terminators is not None else i & 7
            if t is not None:
                out += bytes([0xFF, 0xD0 + t])
    out += b"\xff\xd9"
    return bytes(out)


def rebuild_stream(original: bytes, segments: list[bytes]) -> bytes:
    return assemble_stream(original, segments)


def corrupt(segments: list[bytes], k: int, keep: int = 0) -> list[bytes]:
    """Replace segment ``k`` past its first ``keep`` bytes with 0xFF fill
    (the all-ones codeword is reserved in JPEG Huffman tables, so this is
    guaranteed-detectable corruption)."""
    segs = list(segments)
    segs[k] = segs[k][:keep] + b"\xff" * (len(segs[k]) - keep)
    return segs


def test_scan_resync_native_python_identical(stream):
    _data, session, segments, clean = stream
    k = len(segments) // 2
    bad = corrupt(segments, k)
    args = (bad, session.comp_idx, session.blocks_per_segment,
            session.tables)
    coefs_n, dmg_n = entropy_scan.decode_scan_resync(*args, use_native=True)
    coefs_p, dmg_p = entropy_scan.decode_scan_resync(*args, use_native=False)
    assert dmg_n == dmg_p == [k]
    assert np.array_equal(coefs_n, coefs_p)
    # every other segment is exact; the damaged one is fully concealed
    B = session.blocks_per_segment
    assert np.array_equal(np.delete(coefs_n, np.s_[k * B:(k + 1) * B], 0),
                          np.delete(clean, np.s_[k * B:(k + 1) * B], 0))
    assert not coefs_n[k * B:(k + 1) * B].any()


def test_scan_resync_keeps_valid_prefix(stream):
    _data, session, segments, clean = stream
    k = 1
    keep = len(segments[k]) // 2
    bad = corrupt(segments, k, keep=keep)
    args = (bad, session.comp_idx, session.blocks_per_segment,
            session.tables)
    coefs_n, dmg_n = entropy_scan.decode_scan_resync(*args, use_native=True)
    coefs_p, dmg_p = entropy_scan.decode_scan_resync(*args, use_native=False)
    assert dmg_n == dmg_p == [k]
    assert np.array_equal(coefs_n, coefs_p)
    B = session.blocks_per_segment
    seg = coefs_n[k * B:(k + 1) * B]
    seg_clean = clean[k * B:(k + 1) * B]
    # the blocks decoded entirely from intact bytes are exact, and the
    # concealed suffix is zero; garbage is confined to the boundary block(s)
    assert np.array_equal(seg[0], seg_clean[0])
    diff = [b for b in range(B) if not np.array_equal(seg[b], seg_clean[b])]
    assert diff, "corruption must damage at least one block"
    assert not seg[diff[0] + 2:].any()


def test_scan_resync_truncated_stream(stream):
    _data, session, segments, clean = stream
    n = len(segments)
    bad = segments[:n - 3]
    coefs, dmg = entropy_scan.decode_scan_resync(
        bad, session.comp_idx, session.blocks_per_segment, session.tables)
    assert dmg == [n - 3, n - 2, n - 1]
    B = session.blocks_per_segment
    assert np.array_equal(coefs[:(n - 3) * B], clean[:(n - 3) * B])
    assert not coefs[(n - 3) * B:].any()


def test_strict_mode_still_raises(stream):
    _data, session, segments, _clean = stream
    bad = corrupt(segments, 0)
    for use_native in (True, False):
        with pytest.raises(ValueError):
            entropy_scan.decode_scan(
                bad, session.comp_idx, session.blocks_per_segment,
                session.tables, use_native=use_native)
    with pytest.raises(ValueError):
        entropy_scan.decode_scan(
            segments[:-1], session.comp_idx, session.blocks_per_segment,
            session.tables)


def test_model_and_engine_resync_bit_identical(stream):
    data, _session, segments, _clean = stream
    k = 2
    bad_stream = rebuild_stream(data, corrupt(segments, k))

    # golden model with resync
    bits = BitReader(bad_stream)
    header = mdec.Header.decode(bits)
    dec = mdec.Decoder(header, bits)
    dec.decode(resync=True)
    assert dec.damaged_segments == [k]
    model_frame = dec.get_yuv_frame()

    # accelerated engine with resync
    eng_frame = engine.decode_jpeg(bad_stream, impl="jnp", resync=True)
    for p in "yuv":
        assert np.array_equal(getattr(model_frame, p).data,
                              getattr(eng_frame, p).data)

    # strict modes raise on the same stream
    with pytest.raises(mdec.DecodeError):
        mdec.decode_a_frame(bad_stream)
    with pytest.raises(ValueError):
        engine.decode_jpeg(bad_stream, impl="jnp")


def test_model_resync_concealed_region_is_gray(stream):
    data, session, segments, _clean = stream
    k = 0
    bad_stream = rebuild_stream(data, corrupt(segments, k))
    frame = engine.decode_jpeg(bad_stream, impl="jnp", resync=True)
    clean_frame = engine.decode_jpeg(data, impl="jnp")
    # segment 0 covers the first RI MCUs → first 16 rows, first 32 columns
    # of luma at 4:2:0 (MCU = 16x16); those concealed pixels are mid-gray
    assert (frame.y.data[:16, :32] == 128).all()
    # pixels outside the damaged MCUs are untouched
    assert np.array_equal(frame.y.data[16:], clean_frame.y.data[16:])


def test_model_resync_truncated_stream(stream):
    data, _session, segments, _clean = stream
    bad_stream = rebuild_stream(data, segments[:4])
    bits = BitReader(bad_stream)
    header = mdec.Header.decode(bits)
    dec = mdec.Decoder(header, bits)
    dec.decode(resync=True)
    assert dec.damaged_segments == list(range(4, len(segments)))
    eng_frame = engine.decode_jpeg(bad_stream, impl="jnp", resync=True)
    model_frame = dec.get_yuv_frame()
    for p in "yuv":
        assert np.array_equal(getattr(model_frame, p).data,
                              getattr(eng_frame, p).data)


def _decode_pair(bad_stream):
    """Decode via golden model (resync) and engine (resync); assert the
    frames are bit-identical and return (frame, model_damaged)."""
    bits = BitReader(bad_stream)
    header = mdec.Header.decode(bits)
    dec = mdec.Decoder(header, bits)
    dec.decode(resync=True)
    model_frame = dec.get_yuv_frame()
    eng_frame = engine.decode_jpeg(bad_stream, impl="jnp", resync=True)
    for p in "yuv":
        assert np.array_equal(getattr(model_frame, p).data,
                              getattr(eng_frame, p).data)
    return eng_frame, dec.damaged_segments


def test_dropped_rst_marker_fully_recovered(stream):
    """A destroyed RSTn merges two segments on the wire; the modulo-8
    index realignment detects the jump and recovers the payload exactly —
    zero damage, instead of shifting (garbling) every later segment."""
    data, _session, segments, _clean = stream
    term = [i & 7 for i in range(len(segments) - 1)]
    term[5] = None
    bad_stream = assemble_stream(data, segments, term)
    frame, damaged = _decode_pair(bad_stream)
    assert damaged == []
    clean_frame = engine.decode_jpeg(data, impl="jnp")
    for p in "yuv":
        assert np.array_equal(getattr(frame, p).data,
                              getattr(clean_frame, p).data)


def test_two_dropped_rst_markers(stream):
    data, _session, segments, _clean = stream
    term = [i & 7 for i in range(len(segments) - 1)]
    term[3] = None
    term[4] = None  # segments 3,4,5 merge into one wire segment
    bad_stream = assemble_stream(data, segments, term)
    frame, damaged = _decode_pair(bad_stream)
    assert damaged == []
    clean_frame = engine.decode_jpeg(data, impl="jnp")
    assert np.array_equal(frame.y.data, clean_frame.y.data)


def test_corrupted_rst_marker_index(stream):
    """A flipped RSTn index byte (split position still right) is detected
    by cross-checking the next terminator — full recovery."""
    data, _session, segments, _clean = stream
    term = [i & 7 for i in range(len(segments) - 1)]
    term[5] = (term[5] + 3) % 8
    bad_stream = assemble_stream(data, segments, term)
    frame, damaged = _decode_pair(bad_stream)
    assert damaged == []
    clean_frame = engine.decode_jpeg(data, impl="jnp")
    assert np.array_equal(frame.y.data, clean_frame.y.data)


def test_marker_and_payload_damage_combined(stream):
    """Drop one marker AND corrupt another segment's payload: damage stays
    local, tiers stay bit-identical."""
    data, _session, segments, _clean = stream
    segs = corrupt(segments, 6)
    term = [i & 7 for i in range(len(segs) - 1)]
    term[2] = None
    bad_stream = assemble_stream(data, segs, term)
    frame, damaged = _decode_pair(bad_stream)
    assert damaged == [6]
    clean_frame = engine.decode_jpeg(data, impl="jnp")
    # everything outside segment 9's MCUs matches the clean decode
    total = frame.y.data.size
    wrong = int((frame.y.data != clean_frame.y.data).sum())
    assert wrong <= 16 * 32  # ≤ RI MCUs of luma


def test_resync_random_corruption_never_fails(stream):
    """Fuzz: arbitrary byte corruption in the entropy region must never
    raise under resync, and the model and engine tiers must agree
    bit-exactly on the concealed output."""
    data, _session, _segments, _clean = stream
    rng = np.random.default_rng(42)
    bits = BitReader(data)
    mdec.Header.decode(bits)
    off = bits.bit_pos >> 3
    for _trial in range(40):
        bad = bytearray(data)
        for _ in range(int(rng.integers(1, 6))):
            p = int(rng.integers(off, len(data) - 2))
            bad[p] = int(rng.integers(0, 256))
        bad = bytes(bad)
        eng = engine.decode_jpeg(bad, impl="jnp", resync=True)
        b2 = BitReader(bad)
        h2 = mdec.Header.decode(b2)
        d2 = mdec.Decoder(h2, b2)
        d2.decode(resync=True)
        mf = d2.get_yuv_frame()
        for p in "yuv":
            assert np.array_equal(getattr(mf, p).data,
                                  getattr(eng, p).data)


def test_cli_decode_resync(stream, tmp_path):
    from video_coding_tpu.cli import model_cli

    data, _session, segments, _clean = stream
    bad = rebuild_stream(data, corrupt(segments, 1))
    src = tmp_path / "bad.jpg"
    out = tmp_path / "out.yuv"
    src.write_bytes(bad)
    assert model_cli.main(["decode", "frame", str(src), str(out),
                           "--resync"]) == 0
    assert out.stat().st_size == 64 * 64 * 3 // 2
