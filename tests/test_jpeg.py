"""Baseline JPEG codec unit tests (operators/jpeg.py): constant-tile
bit-exactness (the property the multimodal_decode_jpeg oracle relies
on), lossy round-trip tolerances, restart intervals, 4:2:0
subsampling, and malformed-input rejection. Pure numpy — no Spark
session needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from project_2_semantic_similarity_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _const_tiles(tiles: np.ndarray, tile: int = 8) -> np.ndarray:
    return np.repeat(np.repeat(tiles, tile, axis=0), tile, axis=1)


def test_constant_tiles_roundtrip_bit_exact():
    """Constant 8x8 blocks carry only an integer DC coefficient, so
    quality=100 files round-trip exactly — the lossy codec's one
    SQL-stateable surface (and the fixture contract of the
    multimodal_decode_jpeg oracle)."""
    tiles = np.array([[0, 255, 77], [128, 1, 200]], dtype=np.uint8)
    img = _const_tiles(tiles)
    w, h, out = decode_jpeg(encode_jpeg(img))
    assert (w, h) == (24, 16)
    assert np.array_equal(out[:, :, 0], img)
    # gray RGB constant tiles: Cb=Cr=128 exactly, still bit-exact
    rgb = np.stack([img] * 3, axis=2)
    _, _, out = decode_jpeg(encode_jpeg(rgb))
    assert np.array_equal(out, rgb)


def test_lossy_roundtrip_tolerances():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    _, _, out = decode_jpeg(encode_jpeg(g, quality=100))
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 1
    c = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    _, _, out = decode_jpeg(encode_jpeg(c, quality=100))
    assert np.abs(out.astype(int) - c.astype(int)).max() <= 2
    # smooth gradient at default-table qualities stays close
    y, x = np.mgrid[0:32, 0:32]
    smooth = (x * 2 + y * 1.5).astype(np.uint8)
    _, _, out = decode_jpeg(encode_jpeg(smooth, quality=50))
    assert np.abs(out[:, :, 0].astype(int) - smooth.astype(int)).max() <= 3


def test_non_multiple_of_8_dimensions():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(g))
    assert (w, h) == (21, 13) and out.shape == (13, 21, 1)


def test_restart_intervals_reset_predictors():
    """DRI + RSTn: every interval the decoder must re-align to a
    byte boundary, consume the marker, and reset DC predictors —
    any slip corrupts all following blocks, so a tight tolerance
    across several interval lengths pins the whole path."""
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)  # 15 MCUs
    for ri in (1, 2, 4, 7):
        _, _, out = decode_jpeg(encode_jpeg(g, restart_interval=ri))
        assert np.abs(
            out[:, :, 0].astype(int) - g.astype(int)).max() <= 1, ri


def test_420_subsampling():
    # constant 16x16 gray tiles: chroma is exactly 128 everywhere,
    # box downsample + upsample are identity -> bit-exact even 4:2:0
    tiles = np.array([[40, 210], [130, 5]], dtype=np.uint8)
    rgb = np.stack([_const_tiles(tiles, 16)] * 3, axis=2)
    _, _, out = decode_jpeg(encode_jpeg(rgb, subsample=True))
    assert np.array_equal(out, rgb)
    # colored content: subsampled chroma within a small tolerance
    c = np.zeros((32, 32, 3), np.uint8)
    y, x = np.mgrid[0:32, 0:32]
    c[:, :, 0] = (x * 4) % 256
    c[:, :, 1] = (y * 4) % 256
    c[:, :, 2] = 128
    _, _, out = decode_jpeg(encode_jpeg(c, subsample=True))
    assert np.abs(out.astype(int) - c.astype(int)).max() <= 8
    # odd dimensions + restart + subsampling compose
    rng = np.random.default_rng(9)
    c2 = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    w, h, out = decode_jpeg(
        encode_jpeg(c2, subsample=True, restart_interval=3))
    assert (w, h) == (47, 33) and out.shape == (33, 47, 3)


def test_decoder_rejects_malformed():
    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00" + good[2:])
    # flip SOF0 -> SOF2: the body is still one full-band 0..63 scan,
    # which is invalid inside a progressive frame (a progressive scan
    # is either DC-only or a pure AC band)
    prog = good.replace(b"\xFF\xC0", b"\xFF\xC2", 1)
    with pytest.raises(ValueError, match="progressive|mixes"):
        decode_jpeg(prog)
    # truncate inside a marker segment
    with pytest.raises(ValueError):
        decode_jpeg(good[:8])
    # 12-bit precision flag
    i = good.index(b"\xFF\xC0")
    bad = bytearray(good)
    bad[i + 4] = 12          # precision byte of SOF
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(bad))
    # truncated mid-entropy-stream: ValueError, not IndexError
    with pytest.raises(ValueError, match="truncated|marker"):
        decode_jpeg(encode_jpeg(
            np.arange(64, dtype=np.uint8).reshape(8, 8))[:-4])


def test_decoder_skips_appn_and_com_segments():
    """Real-world files lead with APPn/COM metadata; the parser must
    skip any number of them before SOF."""
    good = encode_jpeg(np.full((8, 8), 99, dtype=np.uint8))
    app0 = b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    com = b"\xFF\xFE" + struct.pack(">H", 9) + b"comment"
    spliced = good[:2] + app0 + com + good[2:]
    _, _, out = decode_jpeg(spliced)
    assert np.array_equal(out[:, :, 0], np.full((8, 8), 99))


# ------------------------------------------------- progressive (SOF2)


def test_progressive_constant_tiles_bit_exact():
    """The multimodal_decode_jpeg_progressive oracle contract:
    constant 8x8 tiles at quality=100 survive the full scan script
    (DC point transform + refinement, AC bands, AC refinement)
    bit-exactly."""
    tiles = np.array([[3, 250, 66, 129], [190, 0, 255, 17]],
                     dtype=np.uint8)
    img = _const_tiles(tiles)
    payload = encode_jpeg_progressive(img)
    assert b"\xFF\xC2" in payload            # really SOF2
    w, h, px = decode_jpeg(payload)
    assert (w, h) == (32, 16)
    assert np.array_equal(px[:, :, 0], img)


@pytest.mark.parametrize("shape,quality,subsample", [
    ((21, 37), 80, False),        # grayscale, non-multiple-of-8
    ((16, 24, 3), 90, False),     # RGB 4:4:4
    ((19, 29, 3), 75, True),      # RGB 4:2:0, odd dims
])
def test_progressive_matches_baseline_decode(shape, quality, subsample):
    """The complete scan script restores every coefficient bit, so a
    progressive file must decode to EXACTLY the pixels the baseline
    encoding of the same input decodes to — a differential that
    pins DC/AC first+refinement and EOB-run handling at once."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    _, _, base = decode_jpeg(encode_jpeg(img, quality=quality,
                                         subsample=subsample))
    _, _, prog = decode_jpeg(encode_jpeg_progressive(
        img, quality=quality, subsample=subsample))
    assert np.array_equal(base, prog)


def test_progressive_long_eob_runs():
    """A mostly-flat image with sparse detail makes the AC scans
    almost entirely EOB runs (EOBn symbols with extension bits) and
    the refinement scan buffer correction bits across blocks —
    the cross-block state the per-block tests can't reach."""
    img = np.full((64, 96), 130, dtype=np.uint8)
    img[30:34, 50:54] = 255
    img[10, 10] = 0
    _, _, base = decode_jpeg(encode_jpeg(img, quality=60))
    _, _, prog = decode_jpeg(encode_jpeg_progressive(img, quality=60))
    assert np.array_equal(base, prog)


def test_progressive_stray_inter_scan_bytes_resynced():
    """Real web-crawl progressive files sometimes carry stray bytes
    between a scan's entropy data and the next marker; libjpeg
    resyncs to the next 0xFF. Injecting junk immediately before a
    later scan's SOS must not change the decoded pixels."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    payload = encode_jpeg_progressive(img, quality=85)
    _, _, clean = decode_jpeg(payload)
    # entropy data byte-stuffs 0xFF as 0xFF00, so the second
    # \xFF\xDA in the stream is a genuine inter-scan SOS marker
    second_sos = payload.index(b"\xFF\xDA", payload.index(
        b"\xFF\xDA") + 2)
    dirty = payload[:second_sos] + b"\x13\x37\x00" + payload[
        second_sos:]
    _, _, got = decode_jpeg(dirty)
    assert np.array_equal(clean, got)


def test_progressive_resync_skip_is_bounded():
    """The inter-scan resync tolerates crawl junk (bytes) but not a
    kilobytes-long run of non-marker data — that signature means the
    entropy decoder desynced, and decoding wrong pixels silently is
    worse than raising (r10 advice: keep the desync tripwire)."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    payload = encode_jpeg_progressive(img, quality=85)
    second_sos = payload.index(b"\xFF\xDA", payload.index(
        b"\xFF\xDA") + 2)
    junk = bytes([0x13, 0x37, 0x00] * 400)  # 1200 B > 512-byte cap
    dirty = payload[:second_sos] + junk + payload[second_sos:]
    with pytest.raises(ValueError, match="resync skipped"):
        decode_jpeg(dirty)


def test_progressive_truncation_rejected():
    img = np.arange(192, dtype=np.uint8).reshape(12, 16)
    payload = encode_jpeg_progressive(img, quality=85)
    with pytest.raises(ValueError, match="truncated|marker|Huffman"):
        decode_jpeg(payload[:len(payload) // 2])
    # dropping EOI leaves the scan loop without its terminator
    with pytest.raises(ValueError):
        decode_jpeg(payload[:-2])


# --------------------------------------------------- MJPEG-in-AVI


def test_avi_mjpeg_roundtrip_and_structure():
    """encode_avi_mjpeg/parse_avi_mjpeg: RIFF structure (hdrl, movi,
    idx1, odd-size padding), per-frame JPEG integrity in both
    baseline and progressive modes, and MJPG validation."""
    from project_2_semantic_similarity_spark.operators.multimodal import (
        encode_avi_mjpeg, parse_avi_mjpeg)

    rng = np.random.default_rng(21)
    frames = [rng.integers(0, 256, (16, 24), dtype=np.uint8)
              for _ in range(5)]
    avi = encode_avi_mjpeg(frames, fps=12)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    w, h, fps, jpegs = parse_avi_mjpeg(avi)
    assert (w, h, fps, len(jpegs)) == (24, 16, 12, 5)
    for f, j in zip(frames, jpegs):
        _, _, px = decode_jpeg(j)
        assert np.abs(px[:, :, 0].astype(int) - f.astype(int)).max() <= 1

    # constant tiles, progressive frames: bit-exact through container
    tiles = [np.full((1, 2), v, np.uint8) for v in (0, 77, 255)]
    const = [_const_tiles(t) for t in tiles]
    _, _, _, jpegs = parse_avi_mjpeg(
        encode_avi_mjpeg(const, progressive=True))
    for f, j in zip(const, jpegs):
        assert j[:4] == b"\xFF\xD8\xFF\xDB" and b"\xFF\xC2" in j
        _, _, px = decode_jpeg(j)
        assert np.array_equal(px[:, :, 0], f)

    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="MJPEG"):
        # rewrite both fourccs to an unsupported codec
        parse_avi_mjpeg(avi.replace(b"MJPG", b"H264"))
    with pytest.raises(ValueError, match="truncated"):
        parse_avi_mjpeg(avi[:40])
    with pytest.raises(ValueError):
        encode_avi_mjpeg([])


def test_progressive_restart_intervals_hand_built():
    """Progressive scans honor DRI too (G.1.2: RSTn resets the DC
    predictor AND the EOB run). Our progressive encoder never emits
    restarts, so this hand-assembles a DC-only SOF2 file (a valid
    progressive file may stop after any scan; uncoded AC stays zero)
    with DRI=2 and checks the decoder reproduces the tiles — a
    missed predictor reset corrupts every block after the first
    marker."""
    from project_2_semantic_similarity_spark.operators.jpeg import (
        _BitWriter,
        _DC_SYMBOLS,
        _fixed_table,
        _huff_from_spec,
        _mag_category,
        _seg,
    )

    tiles = np.array([[8, 250, 99, 31, 170, 2]], dtype=np.uint8)
    img = _const_tiles(tiles)                  # 8x48: 6 MCUs
    dc_bits, dc_vals = _fixed_table(_DC_SYMBOLS)
    dc_t = _huff_from_spec(bytes(dc_bits) + bytes(dc_vals))

    bw = _BitWriter()
    pred = 0
    for i, v in enumerate(tiles[0]):
        if i and i % 2 == 0:                   # DRI = 2
            bw.raw_marker(0xD0 + (i // 2 - 1) % 8)
            pred = 0
        dc = 8 * (int(v) - 128)                # q=1 DC of constant blk
        diff = dc - pred
        pred = dc
        s = _mag_category(diff)
        code, ln = dc_t.encode[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)

    dqt = _seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = _seg(0xC2, struct.pack(">BHHB", 8, 8, 48, 1) + bytes([1, 0x11, 0]))
    dht = _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    dri = _seg(0xDD, struct.pack(">H", 2))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    payload = (b"\xFF\xD8" + dqt + sof + dht + dri + sos
               + bw.flush() + b"\xFF\xD9")
    w, h, px = decode_jpeg(payload)
    assert (w, h) == (48, 8)
    assert np.array_equal(px[:, :, 0], img)
