"""Property-based tests for the r9 codec + tokenizer surfaces —
pure numpy/duckdb, no Spark session, so hypothesis can afford real
example counts:

- PNG: every (dims, channels, dtype, interlace) combination
  round-trips bit-exactly, including sub-8px images where most
  Adam7 passes are empty; palette images round-trip through the
  narrowest fitting bit depth.
- JPEG: a progressive (SOF2) encoding decodes to EXACTLY the same
  pixels as the baseline encoding of the same input — the full
  Annex-G scan script restores every coefficient bit, so any
  EOB-run/refinement/band bug shows as a pixel diff.
- MJPEG-AVI: container round-trip preserves frame count, dims, fps,
  and per-frame decoded pixels.
- BPE: the DuckDB RECURSIVE single-replace oracle (generated from
  BPE_MERGES) agrees with an independent pure-Python left-fold on
  arbitrary words over the merge alphabet — pinning the oracle
  GENERATOR, not just the fixture vocabulary.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 17),
    w=st.integers(1, 17),
    ch=st.sampled_from([1, 3, 4]),
    wide=st.booleans(),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, wide, interlace, seed):
    from project_2_semantic_similarity_spark.operators.multimodal import (
        decode_png, encode_png)

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    dt = np.uint16 if wide else np.uint8
    px = rng.integers(0, 65536 if wide else 256, shape, dtype=dt)
    _, _, out = decode_png(encode_png(px, interlace=interlace))
    want = px[:, :, None] if px.ndim == 2 else px
    assert out.dtype == dt
    assert np.array_equal(out, want)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    n=st.integers(1, 40),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_palette_roundtrip_property(h, w, n, interlace, seed):
    from project_2_semantic_similarity_spark.operators.multimodal import (
        decode_png, encode_png_palette)

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    _, _, out = decode_png(encode_png_palette(idx, pal,
                                              interlace=interlace))
    assert np.array_equal(out, pal[idx])


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    color=st.booleans(),
    subsample=st.booleans(),
    quality=st.integers(50, 100),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_equals_baseline_property(
        h, w, color, subsample, quality, seed):
    from project_2_semantic_similarity_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    sub = subsample and color
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    _, _, base = decode_jpeg(encode_jpeg(px, quality=quality,
                                         subsample=sub))
    _, _, prog = decode_jpeg(encode_jpeg_progressive(
        px, quality=quality, subsample=sub))
    assert np.array_equal(base, prog)


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 6),
    h=st.integers(8, 24),
    w=st.integers(8, 24),
    fps=st.integers(1, 60),
    progressive=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_property(n, h, w, fps, progressive, seed):
    from project_2_semantic_similarity_spark.operators.jpeg import (
        decode_jpeg)
    from project_2_semantic_similarity_spark.operators.multimodal import (
        encode_avi_mjpeg, parse_avi_mjpeg)

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w), dtype=np.uint8)
              for _ in range(n)]
    gw, gh, gfps, jpegs = parse_avi_mjpeg(
        encode_avi_mjpeg(frames, fps=fps, progressive=progressive))
    assert (gw, gh, gfps, len(jpegs)) == (w, h, fps, n)
    for f, j in zip(frames, jpegs):
        _, _, px = decode_jpeg(j)
        err = np.abs(px[:, :, 0].astype(int) - f.astype(int))
        # quality=100 is NOT bit-exact on random inputs: coefficient
        # quantization rounds each of 64 DCT coeffs by up to 0.5 and
        # the IDCT output rounds once more — the accumulated error is
        # ~N(0, 0.29²) per pixel, so |err|=2 occurs at real (if rare)
        # rates over the ~50k pixels a hypothesis run decodes (first
        # seen r12: seed 54692, 10x18). Bound the tail at 3 and the
        # mean tightly instead of pretending the max is 1.
        assert err.max() <= 3, err.max()
        assert err.mean() <= 0.5, err.mean()


_BPE_ALPHABET = "tablevuriscownhdkqfy"


def _python_fold(word: str, merges) -> list[str]:
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms


@settings(max_examples=25, deadline=None)
@given(words=st.lists(
    st.text(alphabet=_BPE_ALPHABET, min_size=1, max_size=14),
    min_size=1, max_size=12))
def test_bpe_duckdb_oracle_matches_python_fold(words):
    """The recursive single-replace CTE that every BPE oracle embeds
    must equal the left-fold on ARBITRARY words, not just the
    fixture vocabulary — merge chains, repeats ('tata'), and words
    created by concatenating merge outputs all land here."""
    import duckdb

    from project_2_semantic_similarity_spark.operators.text import (
        BPE_MERGES, bpe_merges_values_sql)

    n = len(BPE_MERGES)
    con = duckdb.connect()
    con.execute("CREATE TABLE w (word VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)",
                    [(w,) for w in set(words)])
    rows = con.execute(f"""
WITH RECURSIVE merges(rank, pat, rep) AS (
    VALUES {bpe_merges_values_sql()}
),
seed AS (
    SELECT word, 1 AS rank,
           ' ' || array_to_string(
               list_transform(range(length(word)),
                              i -> substr(word, CAST(i + 1 AS INT), 1)),
               ' ') || ' ' AS s
    FROM w
),
bpe AS (
    SELECT * FROM seed
    UNION ALL
    SELECT b.word,
           CASE WHEN strpos(b.s, m.pat) > 0
                THEN b.rank ELSE b.rank + 1 END,
           CASE WHEN strpos(b.s, m.pat) > 0
                THEN substr(b.s, 1, strpos(b.s, m.pat) - 1) || m.rep
                     || substr(b.s, strpos(b.s, m.pat) + length(m.pat))
                ELSE b.s END
    FROM bpe b JOIN merges m ON m.rank = b.rank
    WHERE b.rank <= {n}
)
SELECT word, list_filter(string_split(trim(s, ' '), ' '),
                         x -> x <> '') AS toks
FROM bpe WHERE rank = {n + 1}
""").fetchall()
    got = {w: list(t) for w, t in rows}
    for w in set(words):
        assert got[w] == _python_fold(w, BPE_MERGES), w


def test_bpe_merge_table_wellformed():
    """Structural invariant that makes rank-ordered application equal
    greedy min-rank BPE: every merge input is a single character or
    the output of a strictly earlier rank."""
    from project_2_semantic_similarity_spark.operators.text import (
        BPE_MERGES)

    known: set[str] = set()
    for a, b in BPE_MERGES:
        for s in (a, b):
            assert len(s) == 1 or s in known, (a, b)
        known.add(a + b)
    # no duplicate merge outputs (a duplicate would shadow a rank)
    assert len({a + b for a, b in BPE_MERGES}) == len(BPE_MERGES)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray_expansion_exact(depth):
    """Sample expansion v*255/(2^d-1) is exact integer scaling."""
    import struct
    import zlib

    from project_2_semantic_similarity_spark.operators.multimodal import (
        decode_png)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    per = 8 // depth
    maxv = (1 << depth) - 1
    vals = [i % (maxv + 1) for i in range(per)]
    packed = 0
    for i, v in enumerate(vals):
        packed |= v << (8 - (i + 1) * depth)
    scan = bytes([0, packed])
    ihdr = struct.pack(">IIBBBBB", per, 1, depth, 0, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(scan))
               + chunk(b"IEND", b""))
    _, _, out = decode_png(payload)
    scale = 255 // maxv
    assert np.array_equal(out[0, :, 0], np.array(vals) * scale)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    depth=st.sampled_from([1, 2, 3, 4, 6, 8]),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, depth, seed):
    from project_2_semantic_similarity_spark.operators.multimodal import (
        decode_gif, encode_gif)

    rng = np.random.default_rng(seed)
    n = 1 << depth
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    w2, h2, pal2, idx2 = decode_gif(encode_gif(idx, pal))
    assert (w2, h2) == (w, h)
    assert np.array_equal(pal2, pal)
    assert np.array_equal(idx2, idx)


def test_gif_lzw_width_boundary_and_saturation():
    """The classic GIF traps, pinned deterministically: (1) a stream
    whose LAST data code lands exactly on a width-bump boundary (the
    EOI desync an encoder-side add-timing width schedule produces);
    (2) repetitive input saturating the 4096-entry table at width
    12; (3) the KwKwK immediate-reuse code."""
    from project_2_semantic_similarity_spark.operators.multimodal import (
        decode_gif, encode_gif)

    pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    # sweep lengths around every early width boundary so SOME length
    # puts the final code exactly on a bump
    for n_px in range(2, 70):
        idx = (np.arange(n_px, dtype=np.int64) % 2).astype(
            np.uint8).reshape(1, n_px)
        assert np.array_equal(decode_gif(encode_gif(idx, pal2))[3],
                              idx), n_px
    # KwKwK: 'aaaa...' forces the decoder's c == len(table) case
    idx = np.zeros((1, 50), np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal2))[3], idx)
    # saturation: 600x600 structured 2-color image exceeds 4096
    # entries; width pegs at 12 and both sides stop growing
    big = np.fromfunction(lambda y, x: ((x * y) // 7) % 2,
                          (600, 600)).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(big, pal2))[3], big)


def test_gif_interlaced_decodes_to_same_pixels():
    """r12 verdict #6: interlaced GIFs (the one formerly-declared
    hole in the codec family) decode to the SAME pixels as the
    sequential serialization of the same image — heights spanning
    all four pass patterns, including h < 8 where late passes start
    mid-sequence and h=1/2 where early passes are empty."""
    from project_2_semantic_similarity_spark.operators.multimodal import (
        _gif_interlace_order, decode_gif, encode_gif)
    import pytest as _pytest

    for h in (1, 2, 3, 4, 5, 7, 8, 9, 16, 23):
        w = 5
        idx = ((7 * np.arange(w)[None, :]
                + 13 * np.arange(h)[:, None]) % 8).astype(np.uint8)
        cs = np.arange(8, dtype=np.int64)
        pal = np.stack([(17 * cs) % 256, (41 * cs) % 256,
                        (59 * cs) % 256], axis=1)
        seq = decode_gif(encode_gif(idx, pal, interlace=False))
        itl = decode_gif(encode_gif(idx, pal, interlace=True))
        assert np.array_equal(seq[3], idx)
        assert np.array_equal(itl[3], idx)
        # the permutation really is a permutation (bijective on rows)
        assert sorted(_gif_interlace_order(h)) == list(range(h))

    pal2 = np.arange(6, dtype=np.uint8).reshape(2, 3)
    payload = bytearray(encode_gif(np.zeros((2, 3), np.uint8), pal2))
    with _pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + bytes(payload[6:]))


def test_gif_truncation_raises_valueerror_never_indexerror():
    """r12 ADVICE: every truncation point in the GIF walk must raise
    the ValueError contract of the LZW path (or the declared
    NotImplementedError), never a raw IndexError/struct.error —
    exhaustively, by decoding every strict prefix of a real file."""
    import numpy as np
    import pytest

    from project_2_semantic_similarity_spark.operators.multimodal import (
        decode_gif, encode_gif)

    cs = np.arange(8, dtype=np.int64)
    pal = np.stack([(17 * cs) % 256, (41 * cs) % 256,
                    (59 * cs) % 256], axis=1)
    idx = (7 * np.arange(5)[None, :] + 13 * np.arange(4)[:, None]) % 8
    payload = encode_gif(idx.astype(np.uint8), pal)
    # sanity: the full file decodes
    assert np.array_equal(decode_gif(payload)[3], idx)
    for cut in range(len(payload)):
        # a prefix either still decodes to the right pixels (cuts
        # past the data terminator only drop the trailer) or raises
        # the declared error types — never IndexError/struct.error
        try:
            out = decode_gif(payload[:cut])
        except (ValueError, NotImplementedError):
            continue
        assert np.array_equal(out[3], idx), cut

    # post-CLEAR out-of-range first code: craft an LZW stream whose
    # first code after CLEAR points past the root table
    from project_2_semantic_similarity_spark.operators.multimodal import (
        _lzw_decode_gif)
    mcs = 3
    bits = 0
    acc = 0
    stream = bytearray()
    for code in (1 << mcs, (1 << mcs) + 3):  # CLEAR, then code 11
        acc |= code << bits
        bits += mcs + 1
        while bits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        stream.append(acc & 0xFF)
    with pytest.raises(ValueError):
        _lzw_decode_gif(bytes(stream), mcs)


def test_bmp_roundtrip_both_layouts_and_truncation():
    """r13 BMP codec: uncompressed and RLE8 serializations of the
    same pixels decode identically (runs, absolute mode, EOL/EOB,
    bottom-up rows), and every strict prefix either decodes to the
    right pixels or raises ValueError — never IndexError/
    struct.error (the decode_gif contract)."""
    import pytest

    from project_2_semantic_similarity_spark.operators.multimodal import (
        decode_bmp, encode_bmp)

    for did in (0, 1, 2, 5, 7, 11):
        w, h = 5 + did % 6, 3 + did % 5
        ys = np.arange(h, dtype=np.int64)[:, None]
        xs = np.arange(w, dtype=np.int64)[None, :]
        runs = (2 * did + 3 * (xs // 3) + 7 * ys) % 8
        lits = (2 * did + 5 * xs + 7 * ys) % 8
        idx = np.where((ys + did) % 2 == 1, lits, runs).astype(np.uint8)
        cs = np.arange(8, dtype=np.int64)
        pal = np.stack([(23 * did + 29 * cs) % 256,
                        (53 * did + 31 * cs) % 256,
                        (17 * did + 43 * cs) % 256], axis=1)
        flat = decode_bmp(encode_bmp(idx, pal, rle=False))
        rle = decode_bmp(encode_bmp(idx, pal, rle=True))
        assert np.array_equal(flat[3], idx)
        assert np.array_equal(rle[3], idx)
        assert np.array_equal(flat[2][:8], pal)
        assert np.array_equal(rle[2], flat[2])

    payload = encode_bmp(idx, pal, rle=True)
    for cut in range(len(payload)):
        with pytest.raises(ValueError):
            decode_bmp(payload[:cut])

    # delta escape: jump over a gap (gap pixels stay index 0)
    body = bytes([3, 5, 0, 2, 2, 1, 2, 6, 0, 0, 0, 1])
    hdr = encode_bmp(np.zeros((2, 8), np.uint8), pal, rle=True)
    offset = 14 + 40 + 256 * 4
    crafted = hdr[:offset] + body
    w2, h2, _, img = decode_bmp(crafted)
    # bottom row (storage row 0): 3x index5, skip (2,1) -> row 1
    assert list(img[1][:3]) == [5, 5, 5]
    assert list(img[0][5:7]) == [6, 6]


def test_bmp_rgb_layouts_roundtrip_and_truncation():
    """r14 BMP layouts (r13 verdict #3): 24-bit truecolor (bottom-up
    AND top-down), 4-bit nibble-packed BI_RGB, and BI_RLE4 all
    decode to the same pixels the arithmetic fixture prescribes;
    decode_bmp_rgb serves every supported bpp uniformly; and every
    strict prefix of each layout raises ValueError — never
    IndexError/struct.error (the decode_gif contract)."""
    import pytest

    from project_2_semantic_similarity_spark.operators.multimodal import (
        decode_bmp, decode_bmp_rgb, encode_bmp, encode_bmp24)

    last = {}
    for did in (0, 1, 2, 3, 5, 7, 11, 14):
        w, h = 5 + did % 6, 3 + did % 5
        ys = np.arange(h, dtype=np.int64)[:, None]
        xs = np.arange(w, dtype=np.int64)[None, :]
        runs = (2 * did + 3 * (xs // 3) + 7 * ys) % 8
        lits = (2 * did + 5 * xs + 7 * ys) % 8
        idx = np.where((ys + did) % 2 == 1, lits, runs).astype(np.uint8)
        cs = np.arange(8, dtype=np.int64)
        pal = np.stack([(23 * did + 29 * cs) % 256,
                        (53 * did + 31 * cs) % 256,
                        (17 * did + 43 * cs) % 256],
                       axis=1).astype(np.uint8)
        expect = pal[idx]
        for td in (False, True):  # 24-bit, both row orders
            w2, h2, px = decode_bmp_rgb(encode_bmp24(expect, top_down=td))
            assert (w2, h2) == (w, h)
            assert np.array_equal(px, expect)
        for rle in (False, True):  # 4-bit, both containers
            payload = encode_bmp(idx, pal, rle=rle, bpp=4)
            w2, h2, p2, i2 = decode_bmp(payload)
            assert np.array_equal(i2, idx)
            assert np.array_equal(p2[:8], pal)
            _, _, px = decode_bmp_rgb(payload)
            assert np.array_equal(px, expect)
        # 8-bit payloads flow through decode_bmp_rgb unchanged
        _, _, px8 = decode_bmp_rgb(encode_bmp(idx, pal, rle=bool(did % 2)))
        assert np.array_equal(px8, expect)
        last = {"expect": expect, "idx": idx, "pal": pal}

    for payload in (encode_bmp24(last["expect"]),
                    encode_bmp24(last["expect"], top_down=True),
                    encode_bmp(last["idx"], last["pal"], rle=True, bpp=4),
                    encode_bmp(last["idx"], last["pal"], rle=False, bpp=4)):
        for cut in range(len(payload)):
            with pytest.raises(ValueError):
                decode_bmp_rgb(payload[:cut])

    # RLE4 alternating-color encoded run: count 5, value 0x2 0x7
    # decodes 2,7,2,7,2 (the hi/lo alternation 8-bit RLE lacks)
    hdr = encode_bmp(np.zeros((2, 8), np.uint8),
                     np.zeros((8, 3), np.uint8), rle=True, bpp=4)
    offset = 14 + 40 + 16 * 4
    crafted = hdr[:offset] + bytes([5, 0x27, 0, 0, 0, 1])
    _, _, _, img = decode_bmp(crafted)
    assert list(img[1][:5]) == [2, 7, 2, 7, 2]
