"""Compressed-audio codecs (operators/audio: G.711 mu-law, IMA/DVI
ADPCM) and the cross-format perceptual-hash property the image codec
family now supports.

Exactness strategy mirrors tests/test_jpeg.py: mu-law decode is pinned
to hand-computed code points and segment-step error bounds; ADPCM's
decoder must equal the encoder's own reconstruction BIT-FOR-BIT (the
encoder advances state with the same transition the decoder applies,
so any divergence is a real bug, not quantization); containers carry
the fact-chunk sample count so pad nibbles never become phantom
samples."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from portfolio1_etl_spark.operators.audio import (
    INDEX_TABLE,
    STEP_TABLE,
    adpcm_decode_nibbles,
    adpcm_encode,
    decode_wav_adpcm_data,
    encode_wav_adpcm,
    encode_wav_mulaw,
    encode_wav_mulaw_raw,
    mulaw_decode,
    mulaw_encode,
)
from portfolio1_etl_spark.operators.multimodal import decode_media, decode_wav


# --- mu-law -----------------------------------------------------------------


def test_mulaw_known_code_points():
    """Spec anchors: silence encodes to 0xFF and decodes to 0; the
    most negative segment-7 code 0x00 decodes to -8031·4 = -32124;
    sign symmetry holds for every magnitude."""
    assert mulaw_encode(np.array([0], np.int16))[0] == 0xFF
    assert mulaw_decode(np.array([0xFF], np.uint8))[0] == 0
    assert mulaw_decode(np.array([0x00], np.uint8))[0] == -32124
    assert mulaw_decode(np.array([0x80], np.uint8))[0] == 32124
    codes = np.arange(256, dtype=np.uint8)
    dec = mulaw_decode(codes).astype(np.int64)
    # codes 0x00-0x7F are negative-or-zero, 0x80-0xFF positive-or-zero
    assert (dec[:128] <= 0).all() and (dec[128:] >= 0).all()
    assert (dec[:128] == -dec[128:]).all()


def test_mulaw_roundtrip_error_bounded_and_idempotent():
    rng = np.random.RandomState(0)
    pcm = rng.randint(-32768, 32768, 20000).astype(np.int16)
    codes = mulaw_encode(pcm)
    dec = mulaw_decode(codes)
    # error ≤ half the decision step of the widest segment (2^10 / 2)
    err = np.abs(dec.astype(np.int64) - np.clip(pcm, -32635, 32635))
    assert int(err.max()) <= 512
    # decode points are fixed points of the codec — up to the spec's
    # one aliased pair: 0x7F is "negative zero", which decodes to 0
    # and re-encodes as positive zero 0xFF
    re = mulaw_encode(dec)
    disagree = re != codes
    assert (codes[disagree] == 0x7F).all() and (re[disagree] == 0xFF).all()


def test_mulaw_wav_container_and_fact_count(spark=None):
    pcm = (np.arange(-300, 300, 7)).astype(np.int16)
    samples, rate = decode_wav(encode_wav_mulaw(pcm, 16000))
    assert rate == 16000
    assert (samples == mulaw_decode(mulaw_encode(pcm))).all()
    # raw-code container: every code value decodes through the wrapper
    codes = np.arange(256, dtype=np.uint8)
    samples2, _ = decode_wav(encode_wav_mulaw_raw(codes))
    assert (samples2 == mulaw_decode(codes)).all()


# --- IMA ADPCM --------------------------------------------------------------


def test_adpcm_tables_are_spec_shaped():
    assert len(STEP_TABLE) == 89 and len(INDEX_TABLE) == 16
    assert STEP_TABLE[0] == 7 and STEP_TABLE[-1] == 32767
    assert (np.diff(STEP_TABLE) > 0).all()  # strictly increasing
    # growth ratio ~1.1 everywhere (the spec's geometric ladder)
    ratios = STEP_TABLE[1:] / STEP_TABLE[:-1]
    assert ratios.min() > 1.05 and ratios.max() < 1.18
    assert (INDEX_TABLE[:4] == -1).all() and list(INDEX_TABLE[4:8]) == [2, 4, 6, 8]
    assert (INDEX_TABLE[:8] == INDEX_TABLE[8:]).all()  # sign-symmetric


def test_adpcm_decoder_equals_encoder_reconstruction_exactly():
    """The load-bearing property: both sides run the same published
    state transition, so decode(encode(x)) == the encoder's internal
    prediction sequence with ZERO tolerance."""
    rng = np.random.RandomState(7)
    for _ in range(5):
        pcm = (
            np.cumsum(rng.randint(-500, 501, 999))
            .clip(-32768, 32767)
            .astype(np.int16)
        )
        nib, pred0 = adpcm_encode(pcm, index0=int(rng.randint(0, 89)))
        recon = adpcm_decode_nibbles(nib, pred0, 0)  # wrong seed index...
        # ...must NOT match (proves the state actually matters)
        wav = encode_wav_adpcm(nib, pred0, 44, 8000)
        dec, rate = decode_wav(wav)
        expect = adpcm_decode_nibbles(nib, pred0, 44)
        assert (dec == expect).all() and len(dec) == len(pcm)


def test_adpcm_tracks_smooth_audio():
    """ADPCM is lossy but must track a slowly-varying signal within a
    few step sizes — a transition-table typo explodes this error."""
    t = np.arange(4000)
    pcm = (8000 * np.sin(t / 60.0)).astype(np.int16)
    nib, pred0 = adpcm_encode(pcm)
    recon = adpcm_decode_nibbles(nib, pred0, 0)
    err = np.abs(recon.astype(np.int64) - pcm.astype(np.int64))
    assert float(err.mean()) < 100.0


def test_adpcm_fact_count_drops_pad_nibble():
    """An odd nibble count forces a pad nibble in the packed block;
    the fact chunk must cut it so the decode has exactly 1+n samples."""
    nib = (np.arange(9) % 16).astype(np.uint8)
    wav = encode_wav_adpcm(nib, 123, 10)
    dec, _ = decode_wav(wav)
    assert len(dec) == 10
    assert (dec == adpcm_decode_nibbles(nib, 123, 10)).all()


def test_adpcm_clamps_at_rails():
    """Predictor must clamp at int16 rails, not wrap: all-positive
    nibbles from a high seed walk to 32767 and stay."""
    nib = np.full(200, 7, dtype=np.uint8)  # +max magnitude every step
    dec = adpcm_decode_nibbles(nib, 30000, 88)
    assert dec.max() == 32767 and dec[-1] == 32767
    nibn = np.full(200, 15, dtype=np.uint8)
    decn = adpcm_decode_nibbles(nibn, -30000, 88)
    assert decn.min() == -32768 and decn[-1] == -32768


def test_adpcm_malformed_raises():
    with pytest.raises(ValueError, match="block_align"):
        decode_wav_adpcm_data(bytes(8), 4, None)
    with pytest.raises(ValueError, match="index"):
        decode_wav_adpcm_data(b"\x00\x00\x59\x00\x00\x00", 6, None)
    with pytest.raises(ValueError):
        decode_wav_adpcm_data(b"\x00\x00", 6, None)  # truncated header


def test_unsupported_wav_format_stays_loud():
    import struct

    fmt = struct.pack("<HHIIHHH", 2, 1, 8000, 8000, 1, 4, 0)  # MS ADPCM
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + bytes(4)
    )
    with pytest.raises(NotImplementedError, match="unsupported WAV"):
        decode_wav(wav)
    with pytest.raises(NotImplementedError):
        decode_media(wav)


# --- cross-format perceptual hashing ----------------------------------------


def test_dhash_survives_format_transcoding():
    """The point of a PERCEPTUAL hash: the same picture saved as PNG
    (lossless), BMP (lossless), GIF (palette-lossless), and JPEG
    (lossy, quality 90) must hash near-identically — ≤6/64 bits apart
    for the JPEG, exactly equal for the lossless trio — while a
    genuinely different picture sits far away."""
    from portfolio1_etl_spark.operators.gif import encode_gif
    from portfolio1_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from portfolio1_etl_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        dhash_bits,
        encode_bmp,
        encode_png,
    )
    from portfolio1_etl_spark.operators.gif import decode_gif

    # a smooth 9×8 thumbnail with strong horizontal structure
    xx, yy = np.meshgrid(np.arange(9), np.arange(8))
    base = ((xx * 23 + yy * 11) % 200 + 20).astype(np.uint8)
    img = np.stack([base, base, base], axis=-1)

    h_png = dhash_bits(decode_png(encode_png(img))[0])
    h_bmp = dhash_bits(decode_bmp(encode_bmp(img))[0])
    h_gif = dhash_bits(decode_gif(encode_gif(img))[0])
    h_jpg = dhash_bits(decode_jpeg(encode_jpeg(img, quality=90))[0])

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert h_png == h_bmp == h_gif
    assert ham(h_png, h_jpg) <= 6
    # the mirrored picture reverses every brighter-than comparison —
    # a perceptual hash must place it far away
    h_other = dhash_bits(img[:, ::-1])
    assert ham(h_png, h_other) > 16


def test_adpcm_factless_wav_honors_samples_per_block():
    """A spec-valid writer may omit the fact chunk; the fmt extra's
    samples_per_block must then cut the final pad nibble — no phantom
    trailing sample (review r7-s2 finding)."""
    import struct

    nib = (np.arange(9) % 16).astype(np.uint8)  # odd → pad nibble
    wav = bytearray(encode_wav_adpcm(nib, 123, 10))
    # strip the fact chunk (12 bytes) and fix the RIFF size
    i = bytes(wav).index(b"fact")
    del wav[i : i + 12]
    riff_size = struct.unpack("<I", wav[4:8])[0] - 12
    wav[4:8] = struct.pack("<I", riff_size)
    dec, _ = decode_wav(bytes(wav))
    assert len(dec) == 10  # 1 seed + 9 nibbles, pad nibble dropped
    assert (dec == adpcm_decode_nibbles(nib, 123, 10)).all()


# --- MPEG audio framing probe (r8) ------------------------------------------


class TestMp3Probe:
    def test_cbr_all_layers(self):
        from portfolio1_etl_spark.operators.audio import (
            encode_mp3_stub,
            probe_mp3_metadata,
        )

        # layer III MPEG1: 1152 samples/frame
        assert probe_mp3_metadata(encode_mp3_stub(128, 44100, 10)) == (
            128, 44100, 10, 10 * 1152 * 1000 // 44100, 3,
        )
        # layer III MPEG2: 576 samples/frame, low-rate table
        assert probe_mp3_metadata(encode_mp3_stub(64, 16000, 4)) == (
            64, 16000, 4, 4 * 576 * 1000 // 16000, 3,
        )
        # layer II: 1152 samples/frame in every version group
        assert probe_mp3_metadata(encode_mp3_stub(192, 48000, 5, layer=2)) == (
            192, 48000, 5, 5 * 1152 * 1000 // 48000, 2,
        )
        # layer I: 384 samples/frame, 4-byte-slot frame length
        assert probe_mp3_metadata(encode_mp3_stub(448, 32000, 3, layer=1)) == (
            448, 32000, 3, 3 * 384 * 1000 // 32000, 1,
        )

    def test_id3_wrappers_change_bytes_not_values(self):
        from portfolio1_etl_spark.operators.audio import (
            encode_mp3_stub,
            probe_mp3_metadata,
        )

        bare = encode_mp3_stub(96, 44100, 7)
        wrapped = encode_mp3_stub(96, 44100, 7, id3v2_bytes=300, id3v1=True)
        assert len(wrapped) == len(bare) + 310 + 128
        assert probe_mp3_metadata(wrapped) == probe_mp3_metadata(bare)

    def test_vbr_mean_bitrate_and_summed_duration(self):
        from portfolio1_etl_spark.operators.audio import (
            encode_mp3_stub,
            probe_mp3_metadata,
        )

        vbr = encode_mp3_stub(64, 44100, 3) + encode_mp3_stub(320, 44100, 1)
        kbps, rate, nf, dur, layer = probe_mp3_metadata(vbr)
        assert (kbps, rate, nf, layer) == ((64 * 3 + 320) // 4, 44100, 4, 3)
        assert dur == 4 * 1152 * 1000 // 44100

    def test_malformed_raise(self):
        import pytest

        from portfolio1_etl_spark.operators.audio import (
            encode_mp3_stub,
            probe_mp3_metadata,
        )

        good = encode_mp3_stub(128, 44100, 2)
        for bad in [
            b"",
            b"\xff\xe0 junk",          # sync bits wrong
            good[:-1],                  # truncated final frame
            good + b"trailing",         # garbage after last frame
            b"ID3\x04\x00\x00\x00\x00\x00\x84",  # syncsafe byte >0x7f... valid prefix? crafted below
        ]:
            with pytest.raises(ValueError):
                probe_mp3_metadata(bad)
        # reserved bitrate index 15 in an otherwise-valid header
        import struct as _s

        hdr = _s.unpack(">I", good[:4])[0]
        bad_hdr = (hdr & ~(0xF << 12)) | (0xF << 12)
        with pytest.raises(ValueError):
            probe_mp3_metadata(_s.pack(">I", bad_hdr) + good[4:])

    def test_mixed_layer_stream_rejected(self):
        import pytest

        from portfolio1_etl_spark.operators.audio import (
            encode_mp3_stub,
            probe_mp3_metadata,
        )

        mixed = encode_mp3_stub(128, 44100, 1) + encode_mp3_stub(
            128, 44100, 1, layer=2
        )
        with pytest.raises(ValueError, match="mixed"):
            probe_mp3_metadata(mixed)

    def test_id3v24_footer_flag(self):
        """Review regression (r8): an ID3v2.4 tag with the footer bit
        set carries 10 extra bytes the syncsafe size excludes — the
        probe must skip them instead of rejecting the stream."""
        import struct as _s

        from portfolio1_etl_spark.operators.audio import (
            encode_mp3_stub,
            probe_mp3_metadata,
        )

        frames = encode_mp3_stub(128, 44100, 3)
        body = b"\x00" * 20
        ss = bytes([0, 0, 0, len(body)])
        tagged = (
            b"ID3\x04\x00\x10" + ss + body        # footer flag set
            + b"3DI\x04\x00\x10" + ss             # 10-byte footer
            + frames
        )
        assert probe_mp3_metadata(tagged) == probe_mp3_metadata(frames)


# --- VBR header tier (r9) ---------------------------------------------------


def test_mp3_vbr_stub_roundtrip_xing_vbri_none():
    from portfolio1_etl_spark.operators.audio import (
        encode_mp3_vbr_stub,
        probe_mp3_metadata,
        probe_mp3_vbr_info,
    )

    ks = [128, 64, 96, 320, 40]
    s = encode_mp3_vbr_stub(ks, 44100, vbr_header="xing")
    method, df_, db_ = probe_mp3_vbr_info(s)
    assert (method, df_, db_) == ("xing", 5, len(s))
    # the frame walk sees declared_frames + 1 (the header frame)
    _kbps, rate, walked, dur, layer = probe_mp3_metadata(s)
    assert (rate, walked, layer) == (44100, 6, 3)
    assert dur == 6 * 1152 * 1000 // 44100

    v = encode_mp3_vbr_stub([64, 32, 160], 32000, vbr_header="vbri")
    assert probe_mp3_vbr_info(v) == ("vbri", 3, len(v))

    bare = encode_mp3_vbr_stub([56, 80], 48000, vbr_header=None)
    assert probe_mp3_vbr_info(bare) == ("none", None, None)
    assert probe_mp3_metadata(bare)[2] == 2  # walk still works

    info = encode_mp3_vbr_stub([128], 44100, vbr_header="info")
    assert probe_mp3_vbr_info(info)[0] == "info"


def test_mp3_vbr_probe_skips_id3_and_audits_tamper():
    import struct as _struct

    import pytest

    from portfolio1_etl_spark.operators.audio import (
        encode_mp3_vbr_stub,
        probe_mp3_vbr_info,
    )

    s = encode_mp3_vbr_stub([96, 48], 44100, vbr_header="xing", id3v2_bytes=29)
    method, df_, db_ = probe_mp3_vbr_info(s)
    assert method == "xing" and df_ == 2
    assert db_ == len(s) - 39  # declared bytes EXCLUDE the ID3 wrapper

    # a tampered declaration is visible as declared != walked truth
    tampered = bytearray(s)
    off = s.index(b"Xing") + 8
    tampered[off : off + 4] = _struct.pack(">I", 999)
    assert probe_mp3_vbr_info(bytes(tampered))[1] == 999  # parsed as-is

    with pytest.raises(ValueError):
        probe_mp3_vbr_info(b"\xff\xfbjunk")


class TestAdts:
    def test_roundtrip_all_profiles_rates_blocks(self):
        from portfolio1_etl_spark.operators.audio import (
            _ADTS_RATES,
            encode_adts_stub,
            probe_adts_metadata,
        )

        for profile in ("main", "lc", "ssr", "ltp"):
            for rate in _ADTS_RATES:
                for blocks in (1, 2, 4):
                    b = encode_adts_stub(
                        profile, rate, 2, [11, 0, 300], blocks_per_frame=blocks
                    )
                    p, r, ch, nf, tb, dur = probe_adts_metadata(b)
                    assert (p, r, ch, nf, tb) == (profile, rate, 2, 3, 3 * blocks)
                    assert dur == 3 * blocks * 1024 * 1000 // rate

    def test_crc_header_length(self):
        from portfolio1_etl_spark.operators.audio import (
            encode_adts_stub,
            probe_adts_metadata,
        )

        plain = encode_adts_stub("lc", 44100, 1, [50])
        with_crc = encode_adts_stub("lc", 44100, 1, [50], crc=True)
        assert len(with_crc) == len(plain) + 2
        assert probe_adts_metadata(with_crc)[:4] == probe_adts_metadata(plain)[:4]

    def test_mpeg_and_adts_are_mutually_exclusive(self):
        from portfolio1_etl_spark.operators.audio import (
            encode_adts_stub,
            encode_mp3_stub,
            probe_adts_metadata,
            probe_mp3_metadata,
        )

        mp3 = encode_mp3_stub(128, 44100, 3)
        aac = encode_adts_stub("lc", 48000, 2, [10, 20])
        with pytest.raises(ValueError, match="layer"):
            probe_adts_metadata(mp3)
        with pytest.raises(ValueError, match="layer"):
            probe_mp3_metadata(aac)

    def test_malformed_is_loud(self):
        from portfolio1_etl_spark.operators.audio import (
            encode_adts_stub,
            probe_adts_metadata,
        )

        good = encode_adts_stub("lc", 44100, 2, [64, 64])
        for cut in (1, 3, 64):
            with pytest.raises(ValueError, match="truncated"):
                probe_adts_metadata(good[:-cut])
        with pytest.raises(ValueError, match="sync"):
            probe_adts_metadata(b"\x00" * 16)
        with pytest.raises(ValueError, match="no ADTS frames"):
            probe_adts_metadata(b"")
        # mixed stream parameters are one stream's corruption signal
        two = bytearray(
            encode_adts_stub("lc", 44100, 2, [8])
            + encode_adts_stub("main", 44100, 2, [8])
        )
        with pytest.raises(ValueError, match="mixed"):
            probe_adts_metadata(bytes(two))


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from(["main", "lc", "ssr", "ltp"]),
    st.sampled_from([96000, 48000, 44100, 22050, 8000]),
    st.integers(1, 7),
    st.lists(st.integers(0, 2000), min_size=1, max_size=12),
    st.integers(1, 4),
)
def test_adts_any_shape_roundtrips(profile, rate, channels, sizes, blocks):
    from portfolio1_etl_spark.operators.audio import (
        encode_adts_stub,
        probe_adts_metadata,
    )

    b = encode_adts_stub(profile, rate, channels, sizes, blocks_per_frame=blocks)
    p, r, ch, nf, tb, dur = probe_adts_metadata(b)
    assert (p, r, ch, nf, tb) == (profile, rate, channels, len(sizes), len(sizes) * blocks)
    assert dur == len(sizes) * blocks * 1024 * 1000 // rate


def test_flac_roundtrip_and_loud_boundaries():
    """encode_flac_stub -> probe_flac_streaminfo roundtrip across the
    packed-field extremes, plus every loud-boundary branch: bad magic,
    truncated header, truncated body, missing STREAMINFO, zero rate,
    and the invalid block type 127."""
    import pytest

    from portfolio1_etl_spark.operators.audio import (
        encode_flac_stub,
        probe_flac_streaminfo,
    )

    for rate, ch, bits, total in [
        (8000, 1, 16, 0),            # zero samples: duration 0
        (44100, 2, 16, 441000),
        (96000, 8, 32, (1 << 36) - 1),  # field maxima
        ((1 << 20) - 1, 3, 4, 7),       # 20-bit rate max, 4-bit depth min
    ]:
        b = encode_flac_stub(rate, ch, bits, total, comment="x", padding=3)
        r, c, bi, t, dur, names = probe_flac_streaminfo(b)
        assert (r, c, bi, t) == (rate, ch, bits, total)
        assert dur == total * 1000 // rate
        assert names == ["streaminfo", "vorbis_comment", "padding"]

    good = encode_flac_stub(44100, 2, 16, 1000)
    with pytest.raises(ValueError, match="magic"):
        probe_flac_streaminfo(b"OggS" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        probe_flac_streaminfo(good[:6])
    with pytest.raises(ValueError, match="truncated"):
        probe_flac_streaminfo(good[:-5])
    # a padding-only chain never yields STREAMINFO
    with pytest.raises(ValueError, match="STREAMINFO"):
        probe_flac_streaminfo(b"fLaC" + bytes([0x81]) + (2).to_bytes(3, "big") + b"\x00\x00")
    # zero sample rate is spec-invalid
    zero = bytearray(encode_flac_stub(1, 1, 16, 0))
    packed = int.from_bytes(zero[18:26], "big") & ((1 << 44) - 1)
    zero[18:26] = packed.to_bytes(8, "big")
    with pytest.raises(ValueError, match="rate 0"):
        probe_flac_streaminfo(bytes(zero))
    with pytest.raises(ValueError, match="127"):
        probe_flac_streaminfo(b"fLaC" + bytes([0xFF]) + (0).to_bytes(3, "big"))
    # encoder refuses out-of-range fields loudly
    for bad in [(0, 1, 16, 0), (44100, 9, 16, 0), (44100, 1, 33, 0),
                (44100, 1, 16, 1 << 36), (1 << 20, 1, 16, 0)]:
        with pytest.raises(ValueError):
            encode_flac_stub(*bad)
