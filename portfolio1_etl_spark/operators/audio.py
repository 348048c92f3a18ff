"""[ext] Dependency-free compressed-audio codecs: G.711 mu-law and
IMA/DVI ADPCM (numpy only).

The audio analogue of :mod:`operators.jpeg` — real multimodal corpora
carry compressed audio, and until r7 only RIFF/PCM16 decoded
natively. Both codecs here are PUBLIC specs with fully deterministic
integer arithmetic, which is what makes them oracle-checkable without
any audio library:

- **G.711 mu-law** (WAV format tag 7): stateless per-byte companding.
  The decode is a closed-form expression over the code byte
  (``((mant·8 + 132) << seg) − 132`` with sign), so a SQL oracle
  replays every sample with bit arithmetic — no recursion, no tables.
- **IMA ADPCM** (WAV format tag 0x11): 4-bit differential coding with
  an 89-entry step table and per-nibble state updates. The decoder is
  an exactly-specified integer state machine; a SQL oracle replays it
  with a recursive CTE walking (predictor, step_index) per sample.
  The encoder mirrors the decoder's state update bit-for-bit, so
  ``decode(encode(x))`` equals the encoder's own reconstruction
  EXACTLY — that equality (not a PSNR bound) is the round-trip test.

Container plumbing (``encode_wav_mulaw`` / ``encode_wav_adpcm``)
writes spec-compliant WAVE files (18-byte fmt chunk with cbSize,
fact chunk with the true sample count, single-block mono ADPCM with
the 4-byte block header), and ``multimodal.decode_wav`` dispatches on
the format tag — the SAME ``decode_media`` narrow map serves PCM,
mu-law, and ADPCM objects inside Arrow-batched ``mapInPandas``.

MP3/AAC PAYLOAD decode stays the documented NotImplementedError
boundary (it needs real psychoacoustic codecs); mu-law + ADPCM cover
the telephony and game/voice-corpus formats that actually appear in
WAV containers. MPEG audio FRAMING, though, is plain public structure
— ``probe_mp3_metadata`` below walks frame headers (ID3-aware) for
the header-only bitrate/duration census tier (r8), the audio
analogue of ``multimodal.probe_mp4_metadata``.

Reference analogue: none (the reference has no media path; [ext]
surface per BASELINE.json:6).
"""

from __future__ import annotations

import struct

import numpy as np

_BIAS = 0x84  # 132
_CLIP = 32635

#: IMA/DVI ADPCM step-size table (89 entries, public spec)
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int64,
)

#: per-nibble step-index adjustment (low 3 bits select the row)
INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64
)


# --- G.711 mu-law -----------------------------------------------------------


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM → mu-law code bytes (vectorized Sun/G.711 form:
    clamp, bias the magnitude, segment = position of the top set bit,
    4-bit mantissa, one's-complement the packed byte)."""
    x = samples.astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _CLIP) + _BIAS
    # segment via the canonical boundary table — integer-exact, no
    # float log (mag ≤ 0x7FFF so seg ≤ 7 by construction)
    seg = np.zeros_like(mag)
    for end in (0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF):
        seg += (mag > end).astype(np.int64)
    mant = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """mu-law code bytes → int16 PCM. Pure closed-form per byte — the
    expression a SQL oracle replays verbatim."""
    u = (~codes.astype(np.int64)) & 0xFF
    seg = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _BIAS) << seg) - _BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def encode_wav_mulaw(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono PCM → mu-law WAVE file: compand, then delegate the
    container assembly to :func:`encode_wav_mulaw_raw` (one copy of
    the RIFF/fmt/fact/data math to keep in sync, not two)."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav_mulaw expects int16 samples")
    return encode_wav_mulaw_raw(mulaw_encode(samples), sample_rate)


def encode_wav_mulaw_raw(codes: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Wrap ALREADY-ENCODED mu-law code bytes in a WAVE container
    (what a corpus synthesizer with a closed-form oracle needs: the
    codes, not the PCM, are the deterministic contract)."""
    if codes.dtype != np.uint8:
        raise ValueError("expects uint8 mu-law codes")
    data = codes.tobytes()
    fmt = struct.pack("<HHIIHHH", 7, 1, sample_rate, sample_rate, 1, 8, 0)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 12 + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<II", 4, len(codes))
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


# --- IMA / DVI ADPCM --------------------------------------------------------


def _adpcm_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One decoder state transition (T.81-style exact integer form;
    also used BY the encoder so reconstruction matches bit-for-bit)."""
    step = int(STEP_TABLE[idx])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(INDEX_TABLE[nibble])))
    return pred, idx


def adpcm_decode_nibbles(
    nibbles: np.ndarray, pred0: int, index0: int
) -> np.ndarray:
    """Decode a nibble stream given the block-header seed state.
    Returns int16 samples: the seed predictor IS sample 0 (the WAV
    block convention), followed by one sample per nibble."""
    out = np.empty(1 + len(nibbles), dtype=np.int16)
    out[0] = pred0
    pred, idx = int(pred0), int(index0)
    for k, n in enumerate(nibbles.tolist()):
        pred, idx = _adpcm_step(pred, idx, int(n))
        out[1 + k] = pred
    return out


def adpcm_encode(samples: np.ndarray, index0: int = 0) -> tuple[np.ndarray, int]:
    """int16 PCM → (nibbles, pred0). Standard IMA quantizer: pick the
    nibble whose reconstruction step best approximates the residual,
    then advance state with the EXACT decoder transition — so the
    decoder's output equals the encoder's reconstruction sample-for-
    sample (asserted in tests, not just bounded)."""
    if samples.dtype != np.int16:
        raise ValueError("adpcm_encode expects int16 samples")
    if len(samples) == 0:
        raise ValueError("empty sample stream")
    pred0 = int(samples[0])
    pred, idx = pred0, int(index0)
    nibbles = np.empty(len(samples) - 1, dtype=np.uint8)
    for k in range(1, len(samples)):
        delta = int(samples[k]) - pred
        nib = 0
        if delta < 0:
            nib = 8
            delta = -delta
        step = int(STEP_TABLE[idx])
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        pred, idx = _adpcm_step(pred, idx, nib)
        nibbles[k - 1] = nib
    return nibbles, pred0


def encode_wav_adpcm(
    nibbles: np.ndarray, pred0: int, index0: int, sample_rate: int = 8000
) -> bytes:
    """Wrap one mono IMA-ADPCM block in a WAVE container: format tag
    0x11, fmt extra carries samples_per_block, 4-byte block header
    (pred0 i16, index0 u8, reserved), nibbles packed LOW FIRST, odd
    tails padded. Single-block by design — corpus objects are clips;
    multi-block streams concatenate clips."""
    if nibbles.dtype != np.uint8:
        raise ValueError("expects uint8 nibbles")
    if not -32768 <= pred0 <= 32767 or not 0 <= index0 <= 88:
        raise ValueError("seed state out of range")
    n_samples = 1 + len(nibbles)
    packed = bytearray()
    padded = np.append(nibbles, 0) if len(nibbles) % 2 else nibbles
    for lo, hi in padded.reshape(-1, 2):
        packed.append(int(lo) | (int(hi) << 4))
    block = struct.pack("<hBB", pred0, index0, 0) + bytes(packed)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, (sample_rate * len(block)) // max(n_samples, 1),
        len(block), 4, 2, n_samples,
    )
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 12 + 8 + len(block)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<II", 4, n_samples)
    out += b"data" + struct.pack("<I", len(block)) + block
    if len(block) % 2:
        out += b"\x00"  # RIFF word alignment
    return out


def decode_wav_adpcm_data(
    data: bytes,
    block_align: int,
    total_samples: int | None,
    samples_per_block: int | None = None,
) -> np.ndarray:
    """Decode the data chunk of a mono IMA-ADPCM WAVE: per block, read
    the 4-byte header, unpack nibbles low-first, run the state
    machine. The final block's PAD nibble must not become a phantom
    sample: the fact-chunk count (``total_samples``) cuts globally,
    and the fmt-extra ``samples_per_block`` caps each block — the
    authoritative count for spec-valid writers that omit fact."""
    if block_align < 5:
        raise ValueError("IMA ADPCM block_align must be >= 5")
    out: list[np.ndarray] = []
    produced = 0
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block header")
        pred0, index0, _ = struct.unpack("<hBB", block[:4])
        if index0 > 88:
            raise ValueError("ADPCM step index out of range")
        body = np.frombuffer(block[4:], dtype=np.uint8)
        nibbles = np.empty(2 * len(body), dtype=np.uint8)
        nibbles[0::2] = body & 0x0F
        nibbles[1::2] = body >> 4
        if samples_per_block is not None and samples_per_block >= 1:
            nibbles = nibbles[: samples_per_block - 1]
        if total_samples is not None:
            remaining = total_samples - produced
            if remaining <= 0:
                break
            nibbles = nibbles[: max(remaining - 1, 0)]
        samples = adpcm_decode_nibbles(nibbles, pred0, index0)
        out.append(samples)
        produced += len(samples)
    if not out:
        raise ValueError("empty ADPCM stream")
    return np.concatenate(out)


# --- MPEG audio (MP3) frame headers -----------------------------------------
#
# Header-only tier for MPEG audio (the probe_mp4_metadata analogue):
# a 100 TB audio census needs bitrate/sample-rate/duration, which live
# entirely in the 4-byte frame headers (public ISO 11172-3 / 13818-3
# framing) — PAYLOAD decode (psychoacoustic synthesis) remains the
# documented NotImplementedError boundary above.

#: bitrate (kbps) by [version-group][layer][index 1..14]; group 0 =
#: MPEG1, group 1 = MPEG2/2.5 (lower-rate tables). Index 0 ("free")
#: and 15 (reserved) are rejected.
_MPEG_BITRATES = {
    (0, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

#: sample rate (Hz) by version-id bits (0=MPEG2.5, 2=MPEG2, 3=MPEG1)
_MPEG_SAMPLE_RATES = {
    0: (11025, 12000, 8000),
    2: (22050, 24000, 16000),
    3: (44100, 48000, 32000),
}

#: samples per frame by (version-group, layer)
_MPEG_SPF = {
    (0, 1): 384, (0, 2): 1152, (0, 3): 1152,
    (1, 1): 384, (1, 2): 1152, (1, 3): 576,
}


def _mp3_frame(header: int) -> tuple[int, int, int, int, int]:
    """(layer, bitrate_kbps, sample_rate, samples_per_frame,
    frame_bytes) for one 32-bit MPEG audio frame header. Raises
    ValueError on anything that is not a valid frame."""
    if header >> 21 != 0x7FF:
        raise ValueError("MPEG frame sync missing")
    version_id = (header >> 19) & 3
    if version_id == 1:
        raise ValueError("reserved MPEG version")
    layer = 4 - ((header >> 17) & 3)  # bits 01→III, 10→II, 11→I
    if layer == 4:
        raise ValueError("reserved MPEG layer")
    group = 0 if version_id == 3 else 1
    bidx = (header >> 12) & 0xF
    if bidx in (0, 15):
        raise ValueError("free/reserved MPEG bitrate")
    sidx = (header >> 10) & 3
    if sidx == 3:
        raise ValueError("reserved MPEG sample-rate index")
    padding = (header >> 9) & 1
    bitrate = _MPEG_BITRATES[(group, layer)][bidx - 1]
    rate = _MPEG_SAMPLE_RATES[version_id][sidx]
    if layer == 1:
        nbytes = (12000 * bitrate // rate + padding) * 4
    else:
        # Layer II always 144; Layer III halves for MPEG2/2.5
        coef = 144000 if (layer == 2 or group == 0) else 72000
        nbytes = coef * bitrate // rate + padding
    return layer, bitrate, rate, _MPEG_SPF[(group, layer)], nbytes


def probe_mp3_metadata(content: bytes) -> tuple[int, int, int, int, int]:
    """(bitrate_kbps, sample_rate, n_frames, duration_ms, layer) from
    an MPEG audio stream's frame headers alone — ID3v2 prefix and
    ID3v1 trailer skipped, every frame's length walked (so VBR
    streams census correctly: duration sums per-frame samples;
    bitrate_kbps reports the frame-count-weighted integer mean).
    Raises ValueError on malformed framing, trailing garbage, or an
    empty stream. Payload decode stays the module's documented
    boundary — this reads public framing structure only."""
    pos, end = 0, len(content)
    if content[:3] == b"ID3" and end >= 10:
        size = 0
        for byte in content[6:10]:  # syncsafe 28-bit
            if byte & 0x80:
                raise ValueError("invalid ID3v2 syncsafe size")
            size = (size << 7) | byte
        pos = 10 + size
        if content[5] & 0x10:  # ID3v2.4 footer flag: 10 more bytes
            pos += 10           # ("3DI" footer, excluded from size)
    if end - pos >= 128 and content[end - 128 : end - 125] == b"TAG":
        end -= 128
    n_frames = 0
    bitrate_sum = 0
    layer0 = None
    total_samples: dict[int, int] = {}  # rate -> sample count
    while pos < end:
        if pos + 4 > end:
            raise ValueError("truncated MPEG frame header")
        header = struct.unpack(">I", content[pos : pos + 4])[0]
        layer, bitrate, rate, spf, nbytes = _mp3_frame(header)
        if layer0 is None:
            layer0 = layer
        elif layer != layer0:
            raise ValueError("mixed MPEG layers in one stream")
        if pos + nbytes > end:
            raise ValueError("truncated MPEG frame payload")
        n_frames += 1
        bitrate_sum += bitrate
        total_samples[rate] = total_samples.get(rate, 0) + spf
        pos += nbytes
    if n_frames == 0:
        raise ValueError("no MPEG frames")
    duration_ms = sum(s * 1000 // r for r, s in total_samples.items())
    rates = sorted(total_samples)
    return (
        bitrate_sum // n_frames,
        rates[-1] if len(rates) == 1 else -1,  # -1 flags mixed-rate VBR
        n_frames,
        duration_ms,
        layer0,
    )


def encode_mp3_stub(
    bitrate_kbps: int,
    sample_rate: int,
    n_frames: int,
    layer: int = 3,
    id3v2_bytes: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Structurally-valid CBR MPEG audio stream: correct frame headers
    and frame-length zero payloads (+ optional ID3v2 prefix / ID3v1
    trailer), for framing-census tests and synthesis — the
    encode_mp4_stub analogue. The payload is NOT audio (that is the
    documented codec boundary); the FRAMING is spec-exact."""
    version_id = None
    for vid, rates in _MPEG_SAMPLE_RATES.items():
        if sample_rate in rates:
            version_id, sidx = vid, rates.index(sample_rate)
    if version_id is None:
        raise ValueError(f"unsupported MPEG sample rate {sample_rate}")
    group = 0 if version_id == 3 else 1
    try:
        bidx = _MPEG_BITRATES[(group, layer)].index(bitrate_kbps) + 1
    except ValueError:
        raise ValueError(
            f"bitrate {bitrate_kbps} invalid for MPEG group {group} layer {layer}"
        ) from None
    header = (
        (0x7FF << 21)
        | (version_id << 19)
        | ((4 - layer) << 17)
        | (1 << 16)  # no CRC
        | (bidx << 12)
        | (sidx << 10)
        | (3 << 6)  # mono
    )
    _, _, _, _, nbytes = _mp3_frame(header)
    frame = struct.pack(">I", header) + b"\x00" * (nbytes - 4)
    out = bytearray()
    if id3v2_bytes:
        size = id3v2_bytes
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + b"\x00" * id3v2_bytes
    out += frame * n_frames
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return bytes(out)


# --- VBR header tier (r9): Xing/Info and VBRI --------------------------------
#
# CBR math (bitrate × duration) lies for VBR streams, so encoders
# write a seek/duration header into the FIRST frame's payload:
# - Xing/"Info" (LAME et al.): after the side-info region (Layer III
#   mono: 17 bytes MPEG1, 9 bytes MPEG2/2.5), tag + flags + optional
#   frame/byte counts, TOC, quality.
# - VBRI (Fraunhofer): at a FIXED 32-byte offset past the 4-byte
#   frame header, tag + version/delay/quality + byte/frame counts.
# Convention pinned here (and in the stub): the declared frame count
# EXCLUDES the header frame itself, the declared byte count covers
# the whole MPEG stream INCLUDING it (ID3 wrappers excluded) — the
# LAME convention. Payload decode remains the module's boundary;
# these are framing/seek structures, not audio.

#: Layer III side-info bytes by (MPEG1?, mono?) — where Xing lives.
_SIDE_INFO = {(True, True): 17, (True, False): 32,
              (False, True): 9, (False, False): 17}


def _mp3_stream_span(content: bytes) -> tuple[int, int]:
    """(start, end) of the MPEG frame stream: ID3v2 prefix (incl. the
    v2.4 footer when flagged) and ID3v1 trailer excluded."""
    pos, end = 0, len(content)
    if content[:3] == b"ID3" and end >= 10:
        size = 0
        for byte in content[6:10]:
            if byte & 0x80:
                raise ValueError("invalid ID3v2 syncsafe size")
            size = (size << 7) | byte
        pos = 10 + size
        if content[5] & 0x10:
            pos += 10
    if end - pos >= 128 and content[end - 128 : end - 125] == b"TAG":
        end -= 128
    return pos, end


def probe_mp3_vbr_info(
    content: bytes,
) -> tuple[str, int | None, int | None]:
    """(method, declared_frames, declared_bytes) from the stream's
    first frame: method ∈ {'xing', 'info', 'vbri', 'none'}. 'info' is
    the Xing structure under the CBR tag LAME writes; counts are None
    when the header omits that field (Xing flags) — and for 'none'.
    Raises ValueError on malformed framing (no valid first frame)."""
    pos, end = _mp3_stream_span(content)
    if pos + 4 > end:
        raise ValueError("truncated MPEG frame header")
    header = struct.unpack(">I", content[pos : pos + 4])[0]
    _layer, _bitrate, _rate, _spf, nbytes = _mp3_frame(header)
    if pos + nbytes > end:
        raise ValueError("truncated MPEG frame payload")
    frame = content[pos : pos + nbytes]
    version_id = (header >> 19) & 3
    mono = ((header >> 6) & 3) == 3
    xing_off = 4 + _SIDE_INFO[(version_id == 3, mono)]
    if frame[xing_off : xing_off + 4] in (b"Xing", b"Info"):
        method = "xing" if frame[xing_off : xing_off + 4] == b"Xing" else "info"
        flags = struct.unpack(">I", frame[xing_off + 4 : xing_off + 8])[0]
        p = xing_off + 8
        frames_ = bytes_ = None
        if flags & 1:  # FRAMES
            frames_ = struct.unpack(">I", frame[p : p + 4])[0]
            p += 4
        if flags & 2:  # BYTES
            bytes_ = struct.unpack(">I", frame[p : p + 4])[0]
        return method, frames_, bytes_
    if frame[36:40] == b"VBRI":
        bytes_ = struct.unpack(">I", frame[46:50])[0]
        frames_ = struct.unpack(">I", frame[50:54])[0]
        return "vbri", frames_, bytes_
    return "none", None, None


def encode_mp3_vbr_stub(
    bitrates_kbps: list[int],
    sample_rate: int,
    layer: int = 3,
    vbr_header: str | None = "xing",
    id3v2_bytes: int = 0,
) -> bytes:
    """Structurally-valid VBR MPEG audio: one frame per entry of
    ``bitrates_kbps`` (each a legal index for the version/layer), plus
    — for ``vbr_header`` in {'xing', 'info', 'vbri'} — a leading
    header frame at the FIRST bitrate carrying the declared
    frame/byte counts (frames excluding the header frame, bytes for
    the full stream including it). ``None`` writes no header frame —
    the bare-VBR shape whose duration only a full frame walk gets
    right. Framing is spec-exact; payloads are zeros (the documented
    codec boundary)."""
    version_id = None
    for vid, rates in _MPEG_SAMPLE_RATES.items():
        if sample_rate in rates:
            version_id, sidx = vid, rates.index(sample_rate)
    if version_id is None:
        raise ValueError(f"unsupported MPEG sample rate {sample_rate}")
    group = 0 if version_id == 3 else 1

    def _frame(kbps: int) -> bytes:
        try:
            bidx = _MPEG_BITRATES[(group, layer)].index(kbps) + 1
        except ValueError:
            raise ValueError(
                f"bitrate {kbps} invalid for MPEG group {group} "
                f"layer {layer}"
            ) from None
        header = (
            (0x7FF << 21)
            | (version_id << 19)
            | ((4 - layer) << 17)
            | (1 << 16)
            | (bidx << 12)
            | (sidx << 10)
            | (3 << 6)  # mono
        )
        _, _, _, _, nbytes = _mp3_frame(header)
        return struct.pack(">I", header) + b"\x00" * (nbytes - 4)

    frames = [_frame(k) for k in bitrates_kbps]
    stream = bytearray()
    if vbr_header is not None:
        if vbr_header not in ("xing", "info", "vbri"):
            raise ValueError(f"unknown VBR header kind {vbr_header!r}")
        head = bytearray(_frame(bitrates_kbps[0]))
        total = len(head) + sum(len(f) for f in frames)
        if vbr_header in ("xing", "info"):
            off = 4 + _SIDE_INFO[(version_id == 3, True)]
            tag = b"Xing" if vbr_header == "xing" else b"Info"
            blob = tag + struct.pack(">III", 0x3, len(frames), total)
            if off + len(blob) > len(head):
                raise ValueError("first frame too small for a Xing header")
            head[off : off + len(blob)] = blob
        else:
            blob = (
                b"VBRI"
                + struct.pack(">HHH", 1, 0, 0)
                + struct.pack(">II", total, len(frames))
            )
            if 36 + len(blob) > len(head):
                raise ValueError("first frame too small for a VBRI header")
            head[36 : 36 + len(blob)] = blob
        stream += head
    for f in frames:
        stream += f
    out = bytearray()
    if id3v2_bytes:
        size = id3v2_bytes
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + b"\x00" * id3v2_bytes
    out += stream
    return bytes(out)


# --- ADTS (AAC transport) tier (r10) ----------------------------------------
#
# ADTS is the self-framing AAC container (ISO/IEC 13818-7 §6.2, public
# spec): fixed 7-byte headers (9 with CRC) carrying profile, sampling
# index, channel config, and an explicit 13-bit frame length — so a
# census walks frames exactly like the MPEG audio tier. Each frame
# holds (number_of_raw_data_blocks + 1) × 1024 samples. AAC payload
# decode stays the module's documented boundary; the FRAMING here is
# spec-exact.

#: ADTS sampling_frequency_index table (indices 0–12; 13–14 reserved).
_ADTS_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350,
)

#: ADTS 2-bit profile field (Audio Object Type − 1).
_ADTS_PROFILES = ("main", "lc", "ssr", "ltp")


def probe_adts_metadata(
    content: bytes,
) -> tuple[str, int, int, int, int, int]:
    """(profile, sample_rate, channels, n_frames, total_blocks,
    duration_ms) from an ADTS stream's fixed headers alone — every
    frame's declared length walked to the end of the buffer, so
    truncation and trailing garbage raise instead of censusing a
    prefix. Mixed profile/rate/channels across frames raise too (a
    legal ADTS stream keeps them constant). Distinguishable from MPEG
    audio by construction: both sync on 0xFFF, but ADTS requires
    layer bits 00, which is the RESERVED (invalid) MPEG layer."""
    pos, end = 0, len(content)
    n_frames = total_blocks = 0
    sig = None
    while pos < end:
        if pos + 7 > end:
            raise ValueError("truncated ADTS header")
        b = content[pos : pos + 9]
        if b[0] != 0xFF or (b[1] & 0xF0) != 0xF0:
            raise ValueError("ADTS syncword missing")
        if (b[1] >> 1) & 3 != 0:
            raise ValueError("ADTS layer bits must be 00")
        protection_absent = b[1] & 1
        profile_idx = b[2] >> 6
        sidx = (b[2] >> 2) & 0xF
        if sidx >= len(_ADTS_RATES):
            raise ValueError(f"reserved ADTS sampling index {sidx}")
        channels = ((b[2] & 1) << 2) | (b[3] >> 6)
        if channels == 0:
            raise ValueError("ADTS channel config 0 (PCE) unsupported")
        frame_len = ((b[3] & 0x3) << 11) | (b[4] << 3) | (b[5] >> 5)
        blocks = (b[6] & 0x3) + 1
        header_len = 7 if protection_absent else 9
        if frame_len < header_len:
            raise ValueError(f"ADTS frame length {frame_len} < header")
        if pos + frame_len > end:
            raise ValueError("truncated ADTS frame payload")
        this = (profile_idx, sidx, channels)
        if sig is None:
            sig = this
        elif this != sig:
            raise ValueError("mixed profile/rate/channels in ADTS stream")
        n_frames += 1
        total_blocks += blocks
        pos += frame_len
    if n_frames == 0:
        raise ValueError("no ADTS frames")
    rate = _ADTS_RATES[sig[1]]
    return (
        _ADTS_PROFILES[sig[0]],
        rate,
        sig[2],
        n_frames,
        total_blocks,
        total_blocks * 1024 * 1000 // rate,
    )


def encode_adts_stub(
    profile: str,
    sample_rate: int,
    channels: int,
    payload_sizes: list[int],
    blocks_per_frame: int = 1,
    crc: bool = False,
) -> bytes:
    """Structurally-valid ADTS stream: one frame per entry of
    ``payload_sizes`` (zero payloads of that many bytes — the
    documented codec boundary), spec-exact fixed headers, optional
    CRC slot (zeroed). The ``encode_mp3_stub`` analogue for AAC."""
    try:
        profile_idx = _ADTS_PROFILES.index(profile)
    except ValueError:
        raise ValueError(f"unknown ADTS profile {profile!r}") from None
    try:
        sidx = _ADTS_RATES.index(sample_rate)
    except ValueError:
        raise ValueError(f"unsupported ADTS sample rate {sample_rate}") from None
    if not 1 <= channels <= 7:
        raise ValueError("ADTS channel config must be 1..7")
    if not 1 <= blocks_per_frame <= 4:
        raise ValueError("ADTS raw data blocks per frame must be 1..4")
    header_len = 9 if crc else 7
    out = bytearray()
    for psize in payload_sizes:
        frame_len = header_len + psize
        if frame_len >= 1 << 13:
            raise ValueError(f"ADTS frame of {frame_len} bytes exceeds 13 bits")
        h = bytearray(header_len)
        h[0] = 0xFF
        h[1] = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc else 1)
        h[2] = (
            (profile_idx << 6) | (sidx << 2) | ((channels >> 2) & 1)
        )
        h[3] = ((channels & 3) << 6) | ((frame_len >> 11) & 0x3)
        h[4] = (frame_len >> 3) & 0xFF
        h[5] = ((frame_len & 0x7) << 5) | 0x1F  # buffer fullness hi (VBR)
        h[6] = (0x3F << 2) | (blocks_per_frame - 1)  # fullness lo + blocks
        out += h + b"\x00" * psize
    return bytes(out)


# ---------------------------------------------------------------------------
# FLAC container: STREAMINFO header census (r11)
# ---------------------------------------------------------------------------

#: FLAC metadata block types the prober names (spec §METADATA_BLOCK_HEADER)
_FLAC_BLOCK_TYPES = {
    0: "streaminfo",
    1: "padding",
    2: "application",
    3: "seektable",
    4: "vorbis_comment",
    5: "cuesheet",
    6: "picture",
}


def encode_flac_stub(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    comment: str | None = None,
    padding: int = 0,
) -> bytes:
    """A real FLAC container head: 'fLaC' magic + STREAMINFO (spec-exact
    34-byte body with the 20/3/5/36-bit packed field) and optional
    VORBIS_COMMENT / PADDING blocks. Audio frames are NOT emitted —
    like the MP3/ADTS stubs, payload stays the loud boundary; the
    census tier only ever reads metadata blocks."""
    if not 1 <= channels <= 8:
        raise ValueError("FLAC channels must be 1..8")
    if not 4 <= bits_per_sample <= 32:
        raise ValueError("FLAC bits-per-sample must be 4..32")
    if sample_rate >= 1 << 20 or sample_rate <= 0:
        raise ValueError("FLAC sample rate must fit 20 bits and be > 0")
    if total_samples >= 1 << 36:
        raise ValueError("FLAC total-samples must fit 36 bits")
    body = bytearray()
    body += (4096).to_bytes(2, "big")  # min block size
    body += (4096).to_bytes(2, "big")  # max block size
    body += (0).to_bytes(3, "big")  # min frame size (unknown)
    body += (0).to_bytes(3, "big")  # max frame size (unknown)
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    body += packed.to_bytes(8, "big")
    body += bytes(16)  # unset MD5 signature
    blocks = [(0, bytes(body))]
    if comment is not None:
        vendor = b"pyspark-engine"
        cbody = (
            len(vendor).to_bytes(4, "little")
            + vendor
            + (1).to_bytes(4, "little")
            + len(comment.encode()).to_bytes(4, "little")
            + comment.encode()
        )
        blocks.append((4, cbody))
    if padding:
        blocks.append((1, bytes(padding)))
    out = bytearray(b"fLaC")
    for i, (btype, bbody) in enumerate(blocks):
        last = 0x80 if i == len(blocks) - 1 else 0
        out += bytes([last | btype]) + len(bbody).to_bytes(3, "big")
        out += bbody
    return bytes(out)


def probe_flac_streaminfo(
    content: bytes,
) -> tuple[int, int, int, int, int, list[str]]:
    """Walk a FLAC container's metadata blocks and decode STREAMINFO:
    returns (sample_rate, channels, bits_per_sample, total_samples,
    duration_ms, block_type_names). Raises ValueError on anything that
    is not a well-formed FLAC head — bad magic, truncated block,
    missing or short STREAMINFO, zero sample rate — the loud-boundary
    contract of every probe in this module."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (bad magic)")
    pos = 4
    names: list[str] = []
    info: bytes | None = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated FLAC metadata block header")
        hdr = content[pos]
        btype = hdr & 0x7F
        if btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        size = int.from_bytes(content[pos + 1 : pos + 4], "big")
        if pos + 4 + size > len(content):
            raise ValueError("truncated FLAC metadata block body")
        names.append(_FLAC_BLOCK_TYPES.get(btype, f"reserved{btype}"))
        if btype == 0:
            info = content[pos + 4 : pos + 4 + size]
        pos += 4 + size
        if hdr & 0x80:
            break
    if info is None or len(info) < 34:
        raise ValueError("FLAC STREAMINFO missing or short")
    packed = int.from_bytes(info[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("FLAC sample rate 0 is invalid")
    return rate, channels, bits, total, total * 1000 // rate, names
