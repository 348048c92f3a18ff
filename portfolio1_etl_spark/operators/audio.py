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

MP3/AAC stay the documented NotImplementedError boundary (they need
real psychoacoustic codecs); mu-law + ADPCM cover the telephony and
game/voice-corpus formats that actually appear in WAV containers.

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
