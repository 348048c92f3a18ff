"""Baseline JPEG / GIF / BMP codecs (operators.jpeg, operators.gif,
multimodal.decode_bmp) — the r7 close of the lossy-format pixel
boundary.

Cross-check strategy (no codec library exists in this image, so the
oracles are INDEPENDENT implementations, not shared code paths):
- the fast matrix IDCT is pinned to a naive O(N^4) direct-formula
  sum written here in the test;
- flat-color JPEGs are DC-only, so the decoded value has a closed
  integer form replayed here without touching the codec;
- GIF and BMP are lossless: random images must round-trip
  bit-for-bit, including the LZW width-growth and dictionary-reset
  boundaries, interlaced row order, both BMP row orders and both
  depths;
- corruption must raise, never return garbage.
"""

import struct

import numpy as np
import pytest

from portfolio1_etl_spark.operators.gif import decode_gif, encode_gif
from portfolio1_etl_spark.operators.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    decode_jpeg,
    dct2,
    encode_jpeg,
    idct2,
    scaled_quant,
)
from portfolio1_etl_spark.operators.multimodal import (
    decode_bmp,
    decode_media,
    encode_bmp,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def _smooth(rng: np.random.RandomState, h: int, w: int, color: bool) -> np.ndarray:
    """Random low-frequency content (JPEG's design domain — noise
    images have no round-trip guarantee at any quality)."""
    shape = (h, w, 3) if color else (h, w)
    img = rng.randint(0, 256, shape).astype(np.float64)
    for _ in range(4):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1) + np.roll(img, 2, 1)) / 4
    return img.clip(0, 255).astype(np.uint8)


# --- IDCT vs an independent direct-formula implementation -------------------


def test_idct_matches_naive_direct_formula():
    def naive_idct(coef):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = np.sqrt(0.125) if u == 0 else 0.5
                        cv = np.sqrt(0.125) if v == 0 else 0.5
                        s += (
                            cu * cv * coef[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[x, y] = s
        return out

    rng = np.random.RandomState(7)
    for _ in range(5):
        coef = rng.randint(-500, 500, (8, 8)).astype(np.float64)
        assert np.allclose(idct2(coef), naive_idct(coef), atol=1e-9)
    # and dct2 inverts idct2 exactly (orthonormal pair)
    block = rng.randint(0, 256, (8, 8)).astype(np.float64)
    assert np.allclose(idct2(dct2(block)), block, atol=1e-9)


def test_zigzag_is_the_standard_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:16].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert ZIGZAG[-4:].tolist() == [47, 55, 62, 63]


# --- analytic flat-color oracle ---------------------------------------------


@pytest.mark.parametrize("quality", [25, 50, 75, 95])
def test_flat_gray_decodes_to_closed_integer_form(quality):
    """A flat block has one nonzero coefficient (DC = 8·(v−128)), so
    the whole codec collapses to quantize/dequantize of one integer —
    replayed here WITHOUT the codec. This is the exactness anchor the
    PSNR tests can't give."""
    q00 = int(scaled_quant(QUANT_LUMA, quality)[0, 0])
    for v in (0, 1, 63, 128, 129, 200, 255):
        if (2 * abs(8 * (v - 128))) % (2 * q00) == q00:
            continue  # exact quantization half-tie: the rounded value
            # is implementation-defined in every codec (float noise
            # decides the side) — a measure-zero case, not a contract
        img = np.full((24, 16), v, dtype=np.uint8)
        dec, w, h = decode_jpeg(encode_jpeg(img, quality=quality))
        dc = round(8 * (v - 128) / q00) * q00
        expect = min(255, max(0, round(dc / 8.0) + 128))
        assert (w, h) == (16, 24)
        assert (dec == expect).all(), (quality, v, expect, np.unique(dec))


# --- round trips ------------------------------------------------------------


@pytest.mark.parametrize("shape", [(8, 8), (17, 23), (40, 64), (9, 8)])
def test_gray_roundtrip_psnr(shape):
    rng = np.random.RandomState(sum(shape))
    img = _smooth(rng, *shape, color=False)
    for quality, floor in ((50, 32.0), (85, 36.0), (95, 40.0)):
        dec, w, h = decode_jpeg(encode_jpeg(img, quality=quality))
        assert dec.shape == img.shape
        assert _psnr(dec, img) > floor


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("shape", [(16, 16), (13, 17), (31, 9)])
def test_color_roundtrip_psnr(shape, subsampling):
    """Odd dimensions force MCU padding AND odd-chroma padding in the
    4:2:0 path; both must crop back exactly."""
    rng = np.random.RandomState(sum(shape) + len(subsampling))
    img = _smooth(rng, *shape, color=True)
    dec, w, h = decode_jpeg(encode_jpeg(img, quality=90, subsampling=subsampling))
    assert dec.shape == img.shape and (w, h) == (shape[1], shape[0])
    assert _psnr(dec, img) > (33.0 if subsampling == "444" else 27.0)


def test_restart_markers_roundtrip_and_reset_predictors():
    """DRI path: a 6-MCU-wide image with restart_interval=2 emits RST
    markers mid-scan; the decode must resync and reset DC predictors
    (a decoder that misses the reset shifts every block after RST0)."""
    rng = np.random.RandomState(99)
    img = _smooth(rng, 24, 96, color=True)
    enc = encode_jpeg(img, quality=90, subsampling="420", restart_interval=2)
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc
    dec, w, h = decode_jpeg(enc)
    assert _psnr(dec, img) > 27.0


def test_reencode_is_near_fixpoint():
    """decode∘encode applied twice must agree with once applied
    within ±1 level per pixel (quantization is idempotent on already
    -quantized content up to rounding)."""
    rng = np.random.RandomState(5)
    img = _smooth(rng, 24, 24, color=False)
    once, _, _ = decode_jpeg(encode_jpeg(img, quality=85))
    twice, _, _ = decode_jpeg(encode_jpeg(once, quality=85))
    assert int(np.abs(once.astype(int) - twice.astype(int)).max()) <= 1


# --- malformed input --------------------------------------------------------


def test_jpeg_malformed_raises_never_garbage():
    rng = np.random.RandomState(3)
    img = _smooth(rng, 16, 16, color=True)
    enc = encode_jpeg(img, quality=80)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(enc[: len(enc) // 2])  # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\x00\x00")  # marker desync
    with pytest.raises(ValueError):
        decode_jpeg(b"nope")
    # flip SOF0 -> SOF2: a baseline scan body mislabeled progressive
    # has an illegal band (Ss=0, Se=63) — must raise, never decode a
    # DC-only ghost of the image
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive scan band"):
        decode_jpeg(prog)


# --- GIF --------------------------------------------------------------------


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_lossless_roundtrip(interlace):
    rng = np.random.RandomState(21 + interlace)
    pal = np.unique(rng.randint(0, 256, (40, 3), dtype=np.uint8), axis=0)
    for shape in [(1, 1), (7, 3), (16, 16), (33, 12)]:
        px = pal[rng.randint(0, len(pal), shape)]
        dec, w, h = decode_gif(encode_gif(px, interlace=interlace))
        assert (w, h) == (shape[1], shape[0])
        assert (dec == px).all()


def test_gif_lzw_width_growth_and_dictionary_reset():
    """A 256-color noise image pushes the code width to 12 bits and
    forces at least one mid-stream CLEAR; the round trip must still be
    bit-exact (this is where most LZW implementations break)."""
    rng = np.random.RandomState(8)
    pal = np.unique(rng.randint(0, 256, (400, 3), dtype=np.uint8), axis=0)[:256]
    assert len(pal) == 256
    px = pal[rng.randint(0, 256, (120, 200))]
    enc = encode_gif(px)
    dec, w, h = decode_gif(enc)
    assert (dec == px).all()


def test_gif_local_color_table_decodes():
    """Rewrite an encoder stream to carry its palette as a LOCAL color
    table (GCT flag off, LCT flag on) — the branch wild GIFs use that
    our encoder never writes."""
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]], np.uint8)
    rng = np.random.RandomState(4)
    px = pal[rng.randint(0, 4, (6, 11))]
    enc = bytearray(encode_gif(px))
    bits = (enc[10] & 0x07) + 1
    n = 2 << (enc[10] & 0x07)
    gct = bytes(enc[13 : 13 + 3 * n])
    body = bytes(enc[13 + 3 * n :])
    assert body[0] == 0x2C
    rebuilt = (
        bytes(enc[:10])
        + bytes([0x00, enc[11], enc[12]])  # no GCT
        + body[:9]
        + bytes([0x80 | (bits - 1)])  # LCT flag + same size
        + gct
        + body[10:]
    )
    dec, w, h = decode_gif(bytes(rebuilt))
    assert (dec == px).all()


def test_gif_malformed_raises():
    px = np.zeros((4, 4, 3), np.uint8)
    enc = encode_gif(px)
    with pytest.raises(ValueError):
        decode_gif(enc[:15])
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 4)  # truncated
    rng = np.random.RandomState(1)
    many = rng.randint(0, 256, (30, 30, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(many)


# --- BMP --------------------------------------------------------------------


@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("bpp", [24, 32])
def test_bmp_roundtrip_orders_and_depths(top_down, bpp):
    rng = np.random.RandomState(bpp + top_down)
    # odd width exercises the 4-byte row padding at 24 bpp
    for shape in [(5, 7), (8, 8), (3, 1)]:
        px = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
        dec, w, h = decode_bmp(encode_bmp(px, top_down=top_down, bpp=bpp))
        assert (w, h) == (shape[1], shape[0])
        assert (dec == px).all()


def test_bmp_malformed_raises():
    px = np.zeros((4, 4, 3), np.uint8)
    enc = encode_bmp(px)
    with pytest.raises(ValueError):
        decode_bmp(enc[:-8])  # truncated pixel data
    rle = bytearray(enc)
    rle[30] = 1  # compression = BI_RLE8
    with pytest.raises(NotImplementedError, match="compressed"):
        decode_bmp(bytes(rle))


# --- decode_media dispatch + Spark paths ------------------------------------


def test_decode_media_dispatches_all_native_image_formats():
    rng = np.random.RandomState(17)
    pal = np.unique(rng.randint(0, 256, (12, 3), dtype=np.uint8), axis=0)
    px = pal[rng.randint(0, len(pal), (10, 14))]
    for enc, exact in (
        (encode_gif(px), True),
        (encode_bmp(px), True),
        (encode_jpeg(px, quality=95), False),
    ):
        modality, vals, dims = decode_media(enc)
        assert modality == "image" and dims == "14x10"
        assert vals.shape == (10 * 14 * 3,)
        if exact:
            assert (vals.reshape(10, 14, 3) == px).all()
        else:
            assert _psnr(vals.reshape(10, 14, 3), px) > 20.0


def test_resize_media_shrinks_jpeg_gif_bmp_for_real(spark, tmp_path):
    """The r7 resize path: every native format decodes, downsamples,
    and re-encodes IN ITS OWN FORMAT — magic bytes prove no stand-in
    byte-decimation ran, and re-decode proves the output is a real
    image at the target size."""
    from portfolio1_etl_spark.operators.multimodal import read_media_dir, resize_media

    rng = np.random.RandomState(2)
    pal = np.unique(rng.randint(0, 256, (20, 3), dtype=np.uint8), axis=0)
    big = pal[rng.randint(0, len(pal), (48, 96))]
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.jpg").write_bytes(encode_jpeg(big, quality=90))
    (d / "b.gif").write_bytes(encode_gif(big))
    (d / "c.bmp").write_bytes(encode_bmp(big))
    out = {
        r.path.rsplit("/", 1)[-1]: bytes(r.content)
        for r in resize_media(read_media_dir(spark, str(d)), target_px=24).collect()
    }
    assert out["a.jpg"][:2] == b"\xff\xd8"
    assert out["b.gif"][:6] == b"GIF89a"
    assert out["c.bmp"][:2] == b"BM"
    for name in ("a.jpg", "b.gif", "c.bmp"):
        _, vals, dims = decode_media(out[name])
        assert dims == "24x12", (name, dims)


# --- animated GIF (multi-frame compositing) ---------------------------------


def test_gif_animation_full_size_frames_roundtrip():
    """Disposal 1 full-size frames: every composited output frame
    equals its input frame exactly (the lossless-animation anchor);
    the NETSCAPE loop block must be walked over, not tripped on."""
    from portfolio1_etl_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_animated,
    )

    rng = np.random.RandomState(5)
    pal = np.unique(rng.randint(0, 256, (10, 3), dtype=np.uint8), axis=0)
    frames = [pal[rng.randint(0, len(pal), (7, 11))] for _ in range(4)]
    enc = encode_gif_animated(frames)
    assert b"NETSCAPE2.0" in enc
    dec, w, h = decode_gif_frames(enc)
    assert dec.shape == (4, 7, 11, 3) and (w, h) == (11, 7)
    for f in range(4):
        assert (dec[f] == frames[f]).all()


def test_gif_animation_patch_compositing_and_transparency():
    """Sub-rectangle patches must composite at their offsets (the
    onion), and GCE-transparent pixels must KEEP the canvas under
    them."""
    from portfolio1_etl_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_animated,
    )

    rng = np.random.RandomState(6)
    pal = np.unique(rng.randint(0, 256, (10, 3), dtype=np.uint8), axis=0)
    base = pal[np.zeros((10, 10), int)]
    patch1 = pal[np.ones((4, 4), int)]
    patch2 = pal[np.full((2, 2), 2)]
    enc = encode_gif_animated(
        [base, patch1, patch2], offsets=[(0, 0), (2, 3), (4, 5)]
    )
    dec, _, _ = decode_gif_frames(enc)
    exp1 = base.copy()
    exp1[3:7, 2:6] = patch1
    exp2 = exp1.copy()
    exp2[5:7, 4:6] = patch2
    assert (dec[0] == base).all() and (dec[1] == exp1).all() and (dec[2] == exp2).all()

    # transparency: mark pal[0]'s global slot transparent; a frame-2
    # checkerboard of (transparent, pal[2]) must keep frame-1 pixels
    # in the transparent cells
    f0 = pal[np.full((6, 6), 1)]
    f1 = pal[np.array([[0, 2], [2, 0]]).repeat(3, 0).repeat(3, 1)]
    allpx = np.concatenate([f0.reshape(-1, 3), f1.reshape(-1, 3)])
    gpal = np.unique(allpx, axis=0)
    t_idx = int(np.where((gpal == pal[0]).all(axis=1))[0][0])
    dec, _, _ = decode_gif_frames(
        encode_gif_animated([f0, f1], transparent_index=t_idx)
    )
    exp = f1.copy()
    mask = (f1 == pal[0]).all(axis=2)
    exp[mask] = f0[mask]
    assert (dec[1] == exp).all()


def test_gif_animation_disposal_methods():
    """Disposal 3 restores the pre-frame canvas; disposal 2 restores
    the frame's region to the background color."""
    from portfolio1_etl_spark.operators.gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animated,
    )

    rng = np.random.RandomState(7)
    pal = np.unique(rng.randint(0, 256, (10, 3), dtype=np.uint8), axis=0)
    fA = pal[np.full((5, 5), 3)]
    fB = pal[np.full((3, 3), 4)]
    fC = pal[np.full((5, 5), 5)]
    dec, _, _ = decode_gif_frames(
        encode_gif_animated(
            [fA, fB, fC], offsets=[(0, 0), (1, 1), (0, 0)], disposals=[1, 3, 1]
        )
    )
    e1 = fA.copy()
    e1[1:4, 1:4] = fB
    assert (dec[1] == e1).all() and (dec[2] == fC).all()

    fC2 = pal[np.full((3, 3), 5)]
    enc = encode_gif_animated(
        [fA, fB, fC2], offsets=[(0, 0), (1, 1), (2, 2)], disposals=[1, 2, 1]
    )
    dec, _, _ = decode_gif_frames(enc)
    gpal = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in (fA, fB, fC2)]), axis=0
    )
    e2 = fA.copy()
    e2[1:4, 1:4] = gpal[0]  # bg color = palette slot 0
    e2[2:5, 2:5] = fC2[0, 0]
    assert (dec[2] == e2).all()
    # decode_gif on an animation = first composited frame
    first, _, _ = decode_gif(enc)
    assert (first == fA).all()


def test_gif_animation_rejects_bad_geometry():
    from portfolio1_etl_spark.operators.gif import encode_gif_animated

    f = np.zeros((5, 5, 3), np.uint8)
    with pytest.raises(ValueError, match="exceeds"):
        encode_gif_animated([f, f], offsets=[(0, 0), (2, 2)])
    with pytest.raises(ValueError, match="at least one"):
        encode_gif_animated([])


def test_sample_frames_extracts_real_gif_frames(spark, tmp_path):
    """The video-frame path: an animated GIF fans out to real
    composited frames (first and last always included), each a
    decodable single-frame GIF — not byte chunks."""
    from portfolio1_etl_spark.operators.gif import (
        decode_gif,
        encode_gif_animated,
    )
    from portfolio1_etl_spark.operators.multimodal import (
        read_media_dir,
        sample_frames,
    )

    rng = np.random.RandomState(9)
    pal = np.unique(rng.randint(0, 256, (8, 3), dtype=np.uint8), axis=0)
    frames = [pal[rng.randint(0, len(pal), (6, 9))] for _ in range(7)]
    d = tmp_path / "anim"
    d.mkdir()
    (d / "clip.gif").write_bytes(encode_gif_animated(frames))
    out = sorted(
        sample_frames(read_media_dir(spark, str(d)), n_frames=3).collect(),
        key=lambda r: r.frame_no,
    )
    assert len(out) == 3
    picks = [0, 3, 6]  # evenly spaced over 7 frames
    for row, p in zip(out, picks):
        px, w, h = decode_gif(bytes(row.frame))
        assert (w, h) == (9, 6)
        assert (px == frames[p]).all()


# --- progressive (SOF2) -----------------------------------------------------


@pytest.mark.parametrize(
    "shape,color,sub,quality",
    [
        ((8, 8), False, "444", 75),
        ((17, 23), False, "444", 85),
        ((16, 16), True, "444", 90),
        ((13, 17), True, "420", 75),
        ((31, 9), True, "420", 90),
        ((24, 40), True, "444", 50),
    ],
)
def test_progressive_decode_equals_baseline_exactly(shape, color, sub, quality):
    """THE progressive gate: both encoders share quantization, so the
    progressive scan pipeline (DC first/refine, split spectral bands,
    AC refinement with EOB runs and correction bits) must reconstruct
    the IDENTICAL coefficient array — pixel equality with zero
    tolerance, every shape, both subsamplings."""
    from portfolio1_etl_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(sum(shape) + quality)
    img = _smooth(rng, *shape, color=color)
    base, _, _ = decode_jpeg(
        encode_jpeg(img, quality=quality, subsampling=sub)
        if color
        else encode_jpeg(img, quality=quality)
    )
    prog, _, _ = decode_jpeg(
        encode_jpeg_progressive(img, quality=quality, subsampling=sub)
    )
    assert np.array_equal(base, prog)


def test_progressive_eob_runs_span_blocks():
    """A mostly-flat image with sparse features forces multi-block EOB
    runs (EOBn symbols with r ≥ 1 and extra length bits) in both the
    first and refinement AC scans — still bit-exact vs baseline."""
    from portfolio1_etl_spark.operators.jpeg import encode_jpeg_progressive

    img = np.full((48, 64), 120, dtype=np.uint8)
    img[10, 10] = 240
    img[40, 50] = 0
    base, _, _ = decode_jpeg(encode_jpeg(img, quality=85))
    prog, _, _ = decode_jpeg(encode_jpeg_progressive(img, quality=85))
    assert np.array_equal(base, prog)


def test_progressive_through_decode_media_and_resize(spark, tmp_path):
    """Progressive JPEGs flow through the SAME Spark-side plumbing:
    decode_media dispatches on the JPEG magic regardless of process,
    and resize_media really decodes + re-encodes them."""
    from portfolio1_etl_spark.operators.jpeg import encode_jpeg_progressive
    from portfolio1_etl_spark.operators.multimodal import (
        read_media_dir,
        resize_media,
    )

    rng = np.random.RandomState(4)
    img = _smooth(rng, 32, 64, color=True)
    enc = encode_jpeg_progressive(img, quality=90)
    modality, vals, dims = decode_media(enc)
    assert modality == "image" and dims == "64x32"
    d = tmp_path / "prog"
    d.mkdir()
    (d / "p.jpg").write_bytes(enc)
    out = resize_media(read_media_dir(spark, str(d)), target_px=16).collect()
    _, _, dims2 = decode_media(bytes(out[0].content))
    assert dims2 == "16x8"


def test_progressive_malformed_raises():
    from portfolio1_etl_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(2)
    img = _smooth(rng, 16, 16, color=False)
    enc = encode_jpeg_progressive(img, quality=80)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(enc[: len(enc) // 2])
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(enc[: len(enc) - 10])  # EOI cut off mid-refinement


def test_transcode_media_is_pixel_lossless_and_passes_audio(spark, tmp_path):
    """Format normalization: JPEG/GIF/BMP all re-encode as PNG whose
    decode equals the SOURCE decode exactly (grayscale JPEG stays
    1-channel through the container change); WAV and corrupt bytes
    pass through untouched."""
    from portfolio1_etl_spark.operators.audio import encode_wav_mulaw_raw
    from portfolio1_etl_spark.operators.gif import encode_gif_animated
    from portfolio1_etl_spark.operators.jpeg import encode_jpeg_progressive
    from portfolio1_etl_spark.operators.multimodal import (
        decode_png,
        read_media_dir,
        transcode_media,
    )

    rng = np.random.RandomState(12)
    pal = np.unique(rng.randint(0, 256, (9, 3), dtype=np.uint8), axis=0)
    rgb = pal[rng.randint(0, len(pal), (10, 13))]
    gray = _smooth(rng, 9, 14, color=False)
    d = tmp_path / "mix"
    d.mkdir()
    (d / "a.jpg").write_bytes(encode_jpeg(gray, quality=80))
    (d / "b.jpg").write_bytes(encode_jpeg_progressive(rgb.copy(), quality=90))
    (d / "c.gif").write_bytes(encode_gif_animated([rgb]))
    (d / "d.bmp").write_bytes(encode_bmp(rgb, bpp=32))
    wav = encode_wav_mulaw_raw(np.arange(64, dtype=np.uint8))
    (d / "e.wav").write_bytes(wav)
    (d / "f.jpg").write_bytes(b"\xff\xd8corrupt")
    out = {
        r.path.rsplit("/", 1)[-1]: bytes(r.content)
        for r in transcode_media(read_media_dir(spark, str(d)), "png").collect()
    }
    # every image became a PNG whose pixels equal the source decode
    assert out["a.jpg"][:8] == b"\x89PNG\r\n\x1a\n"
    px_a, _, _ = decode_png(out["a.jpg"])
    src_a, _, _ = decode_jpeg(encode_jpeg(gray, quality=80))
    assert px_a.shape[2] == 1 and (px_a[:, :, 0] == src_a).all()
    px_b, _, _ = decode_png(out["b.jpg"])
    src_b, _, _ = decode_jpeg(encode_jpeg_progressive(rgb.copy(), quality=90))
    assert (px_b == src_b).all()
    assert (decode_png(out["c.gif"])[0] == rgb).all()
    assert (decode_png(out["d.bmp"])[0] == rgb).all()
    # audio and corrupt pass through byte-identical
    assert out["e.wav"] == wav
    assert out["f.jpg"] == b"\xff\xd8corrupt"


def test_gif_truncated_extension_raises_valueerror():
    """A cut inside a GCE/extension sub-block must raise the
    documented ValueError, never IndexError (review r7-s2 finding)."""
    from portfolio1_etl_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_animated,
    )

    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    enc = encode_gif_animated([pal[np.zeros((3, 3), int)]] * 2)
    i = enc.index(b"\x21\xf9")  # first GCE
    for cut in (i + 1, i + 3, i + 5):
        with pytest.raises(ValueError):
            decode_gif_frames(enc[:cut])


def test_transcode_survives_unencodable_and_keeps_mime(spark, tmp_path):
    """Review r7-s2 findings: the encode step must not kill the task,
    gray+alpha transcodes to BMP via luma replication, and mime comes
    from the transcode FLAG — pass-throughs keep their input mime even
    when a deterministic re-encode would be byte-identical."""
    from portfolio1_etl_spark.operators.multimodal import (
        decode_bmp as _dec_bmp,
        encode_png,
        encode_wav,
        read_media_dir,
        transcode_media,
    )

    rng = np.random.RandomState(8)
    ga = rng.randint(0, 256, (5, 6, 2), dtype=np.uint8)  # gray+alpha
    d = tmp_path / "ga"
    d.mkdir()
    (d / "g.png").write_bytes(encode_png(ga))
    (d / "w.wav").write_bytes(encode_wav(np.zeros(16, np.int16)))
    rows = {
        r.path.rsplit("/", 1)[-1]: r
        for r in transcode_media(read_media_dir(spark, str(d)), "bmp").collect()
    }
    out = bytes(rows["g.png"].content)
    assert out[:2] == b"BM"
    px, _, _ = _dec_bmp(out)
    assert (px == np.repeat(ga[:, :, :1], 3, axis=2)).all()
    assert rows["g.png"].meta.mime == "image/bmp"
    # untouched WAV keeps its ingestion mime, not octet-stream
    assert rows["w.wav"].meta.mime == "audio/wav"


def _lzw_spec_decode_through_eoi(data: bytes, min_code_size: int) -> bytes:
    """A giflib-style reference decoder that does NOT know the pixel
    count: it reads codes until it meets EOI (the spec's stop signal).
    Unlike the package's _lzw_decode — which stops at the expected
    pixel count and so never reads the EOI code — this decoder
    verifies the encoder emits EOI at the width a spec decoder is
    actually reading at (the ADVICE r7 interop deviation: a table add
    landing exactly on a power of two bumps the read width BEFORE
    EOI)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = acc = nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("ran out of bits before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    out = bytearray()
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table) and (code < clear or code > eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("invalid GIF LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def test_gif_lzw_interop_through_eoi():
    """Every encoded stream must decode cleanly on a spec decoder that
    reads THROUGH EOI. Random sweeps across alphabet sizes and stream
    lengths hit the boundary where the final table add lands on a
    power of two (the case that desynced ~9/3000 streams before the
    encoder mirrored the decoder's pending width bump at EOI)."""
    from portfolio1_etl_spark.operators.gif import _lzw_encode

    rng = np.random.RandomState(99)
    checked = 0
    for mcs, alpha in [(2, 4), (3, 7), (4, 16), (8, 256)]:
        for _ in range(250):
            n = int(rng.randint(1, 160))
            idx = rng.randint(0, alpha, n).astype(np.uint8)
            enc = _lzw_encode(idx, mcs)
            dec = _lzw_spec_decode_through_eoi(enc, mcs)
            assert dec == idx.tobytes(), (mcs, n)
            checked += 1
    assert checked == 1000
