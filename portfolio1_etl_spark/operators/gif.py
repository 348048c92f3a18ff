"""[ext] Dependency-free GIF codec (LZW, numpy only).

Companion to :mod:`operators.jpeg` — closes the GIF half of the lossy
-format pixel boundary (GIF is actually LOSSLESS for ≤256-color
content, which makes it the exactly-fuzzable member of the family:
random palette images must round-trip bit-for-bit, no PSNR bound).

- ``decode_gif_frames``: GIF87a/89a with REAL animation semantics —
  global and local color tables, interlace, full variable-width LZW
  with clear-code dictionary resets, and frame COMPOSITING: sub-
  rectangle images at offsets, GCE transparency (pixels keep the
  underlying canvas), disposal methods 0-3 (leave / restore-
  background / restore-previous). Every returned frame is the
  logical-screen canvas a viewer would show.
- ``decode_gif``: the first composited frame (the single-image fast
  path shares the same parser).
- ``encode_gif`` / ``encode_gif_animated``: GIF89a writers — exact
  palette built from the image(s) (raises if >256 distinct colors;
  quantization is a MODELING choice the caller owns, not something a
  codec should do silently), standard LZW with dictionary growth to
  4096 and reset; the animated writer emits per-frame GCEs, patch
  offsets, disposal methods, and a NETSCAPE loop block.

Used by ``multimodal.decode_media`` inside ``mapInPandas`` batches —
narrow map over the binaryFile scan, no shuffle. Reference analogue:
none (the reference has no media path; [ext] per BASELINE.json:6).
"""

from __future__ import annotations

import struct

import numpy as np


# --- LZW (GIF variant: LSB-first packing, clear/EOI codes) ------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Standard GIF LZW: emit CLEAR, build the string table up to
    4095 then reset; codes packed LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for idx in indices.tolist():
        sym = bytes([idx])
        cand = prefix + sym
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1:
            # the code JUST emitted was the last at this width
            if width < 12:
                width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = sym
    if prefix:
        emit(table[prefix], width)
    # Mirror the decoder's pending width bump before EOI: reading the
    # final data code makes the decoder's table add land on len(table)
    # == next_code, and when that is exactly 1<<width a spec decoder
    # (giflib; this module's own _lzw_decode increment rule) reads the
    # NEXT code — EOI — at width+1. Emitting EOI at the stale width
    # desyncs any decoder that reads through EOI instead of stopping at
    # the expected pixel count (interop-tested in test_gif_lzw_interop).
    if width < 12 and next_code == (1 << width):
        width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode`; stops after ``expected`` pixels
    or EOI. Raises ValueError on invalid codes / truncation."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    out = np.empty(expected, dtype=np.uint8)
    n = 0
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while n < expected:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or code > eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("invalid GIF LZW code")
        take = min(len(entry), expected - n)
        out[n : n + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n < expected:
        raise ValueError("GIF LZW stream ended early")
    return out


# --- container --------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Single-frame GIF89a from (h, w, 3) uint8 RGB with ≤256 distinct
    colors (raises ValueError beyond — palette quantization is the
    caller's modeling decision). ``interlace=True`` writes the 4-pass
    interlaced row order (exists mostly so the decoder's deinterlace
    path has a round-trip test partner)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("pixels must be uint8 (h,w,3)")
    h, w = px.shape[:2]
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError("image dimensions out of GIF range")
    flat = px.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("more than 256 distinct colors — quantize first")
    # palette size field is a power of two ≥ 2 entries
    bits = max(1, int(len(palette) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT present, bg 0, no aspect
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    mcs = max(2, bits)
    out += bytes([mcs])
    rows = indices.reshape(h, w)
    if interlace:
        order = [
            r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
        ]
        rows = rows[order]
    lzw = _lzw_encode(rows.reshape(-1).astype(np.uint8), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif_frames(b: bytes) -> tuple[np.ndarray, int, int]:
    """Decode ALL frames of a GIF87a/89a stream with real compositing.
    Returns (frames (F, sh, sw, 3) uint8 RGB, sw, sh) on the LOGICAL
    SCREEN grid — each output frame is the canvas as a viewer would
    show it after that image:

    - sub-rectangle images composite onto the canvas at their
      (x0, y0) offset;
    - a Graphic Control Extension's transparency index makes those
      pixels KEEP the underlying canvas;
    - disposal 2 restores the image's region to the background color
      after the frame is shown; disposal 3 restores the pre-frame
      canvas; 0/1 leave the canvas in place.

    Animation is thus decode semantics here, not just container
    walking — the q145 oracle replays the onion of composited regions
    analytically. Raises ValueError on malformed/truncated input."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack("<HH", b[6:10])
    flags = b[10]
    bg_index = b[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg_index < len(gct):
        bg_color = gct[bg_index]
    else:
        bg_color = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_color, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    # pending GCE state (applies to the NEXT image only)
    disposal, transparent = 0, None
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            if pos + 2 > len(b):
                raise ValueError("truncated GIF extension")
            label = b[pos + 1]
            pos += 2
            sub_start = pos
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            if pos >= len(b):
                # a cut inside an extension's sub-blocks must raise the
                # DOCUMENTED ValueError, not fall through to an
                # IndexError on the field reads below
                raise ValueError("truncated GIF extension data")
            if label == 0xF9 and b[sub_start] >= 4:  # GCE
                if sub_start + 5 > len(b):
                    raise ValueError("truncated GIF graphic control")
                packed = b[sub_start + 1]
                disposal = (packed >> 2) & 0x07
                transparent = b[sub_start + 4] if packed & 0x01 else None
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                raise ValueError("truncated image descriptor")
            x0, y0, iw, ih = struct.unpack("<HHHH", b[pos + 1 : pos + 9])
            iflags = b[pos + 9]
            pos += 10
            if x0 + iw > sw or y0 + ih > sh:
                raise ValueError("GIF image exceeds logical screen")
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                lct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
                if len(lct) < 3 * n:
                    raise ValueError("truncated local color table")
                palette = lct.reshape(n, 3)
                pos += 3 * n
            elif gct is not None:
                palette = gct
            else:
                raise ValueError("GIF image with no color table")
            if pos >= len(b):
                raise ValueError("truncated GIF before LZW data")
            mcs = b[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError("invalid LZW minimum code size")
            data = bytearray()
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                chunk = b[pos + 1 : pos + 1 + ln]
                if len(chunk) < ln:
                    raise ValueError("truncated GIF data sub-block")
                data += chunk
                pos += 1 + ln
            if pos >= len(b):
                raise ValueError("missing GIF block terminator")
            pos += 1  # the 0x00 terminator itself
            idx = _lzw_decode(bytes(data), mcs, iw * ih)
            if int(idx.max(initial=0)) >= len(palette):
                raise ValueError("GIF index outside palette")
            rows = idx.reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                out_rows = np.empty_like(rows)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for r in range(start, ih, step):
                        out_rows[r] = rows[src]
                        src += 1
                rows = out_rows
            before = canvas.copy() if disposal == 3 else None
            region = canvas[y0 : y0 + ih, x0 : x0 + iw]
            if transparent is None:
                region[:] = palette[rows]
            else:
                opaque = rows != transparent
                region[opaque] = palette[rows][opaque]
            frames.append(canvas.copy())
            if disposal == 2:
                canvas[y0 : y0 + ih, x0 : x0 + iw] = bg_color
            elif disposal == 3 and before is not None:
                canvas = before
            disposal, transparent = 0, None  # GCE scope is one image
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    else:
        # ran past the end without the 0x3B trailer: a cut between
        # frames would otherwise pass for a complete (shorter)
        # animation — truncation must stay LOUD even at block
        # boundaries
        raise ValueError("truncated GIF (missing trailer)")
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), sw, sh


def decode_gif(b: bytes) -> tuple[np.ndarray, int, int]:
    """Decode the FIRST frame of a GIF (composited onto the logical
    screen — identical to the pre-animation behavior for the common
    full-size single-image case). Returns ((sh, sw, 3) uint8 RGB, sw,
    sh). Transparent pixels of frame 0 resolve to the background
    color (the canvas under them), which is the right call for
    pixel-statistics pipelines. Raises ValueError on malformed
    input."""
    frames, sw, sh = decode_gif_frames(b)
    return frames[0], sw, sh


def encode_gif_animated(
    frames,
    offsets=None,
    transparent_index: int | None = None,
    disposals=None,
    delay_cs: int = 10,
    interlace: bool = False,
) -> bytes:
    """Multi-frame GIF89a writer. ``frames`` is a list of uint8
    (h, w, 3) images; frame 0 sets the logical screen and must be
    full-size, later frames may be smaller patches placed at
    ``offsets[i] = (x0, y0)``. One GLOBAL palette is built from the
    union of all frame colors (≤256 total — quantization stays the
    caller's modeling decision). ``transparent_index`` marks that
    palette slot transparent in every frame's GCE (the decoder must
    keep the underlying canvas there); ``disposals[i]`` sets each
    frame's disposal method (0/1 leave, 2 restore-background,
    3 restore-previous). A NETSCAPE2.0 loop block makes viewers loop
    forever — and gives the decoder's application-extension skip path
    a real stream to walk."""
    if not frames:
        raise ValueError("need at least one frame")
    first = np.asarray(frames[0])
    if first.dtype != np.uint8 or first.ndim != 3 or first.shape[2] != 3:
        raise ValueError("frames must be uint8 (h,w,3)")
    sh, sw = first.shape[:2]
    offsets = offsets or [(0, 0)] * len(frames)
    disposals = disposals or [1] * len(frames)
    if len(offsets) != len(frames) or len(disposals) != len(frames):
        raise ValueError("offsets/disposals must match frames")
    allpx = np.concatenate([np.asarray(f).reshape(-1, 3) for f in frames])
    palette = np.unique(allpx, axis=0)
    if len(palette) > 256:
        raise ValueError("more than 256 distinct colors — quantize first")
    bits = max(1, int(len(palette) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    if transparent_index is not None and not 0 <= transparent_index < size:
        raise ValueError("transparent_index outside palette")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += pal.tobytes()
    # NETSCAPE looping application extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, bits)
    # map every frame's colors to global palette indices via a dict
    lut = {tuple(c): i for i, c in enumerate(palette.tolist())}
    for f, (fr, (x0, y0), disp) in enumerate(zip(frames, offsets, disposals)):
        fr = np.asarray(fr)
        fh, fw = fr.shape[:2]
        if x0 + fw > sw or y0 + fh > sh:
            raise ValueError(f"frame {f} exceeds the logical screen")
        packed = (disp & 0x07) << 2
        tindex = 0
        if transparent_index is not None:
            packed |= 0x01
            tindex = transparent_index
        out += b"\x21\xf9\x04" + bytes([packed]) + struct.pack("<H", delay_cs)
        out += bytes([tindex, 0])
        out += b"\x2c" + struct.pack("<HHHH", x0, y0, fw, fh)
        out += bytes([0x40 if interlace else 0x00])
        out += bytes([mcs])
        idx = np.array(
            [lut[tuple(c)] for c in fr.reshape(-1, 3).tolist()], dtype=np.uint8
        ).reshape(fh, fw)
        if interlace:
            order = [
                r for start, step in _INTERLACE_PASSES for r in range(start, fh, step)
            ]
            idx = idx[order]
        lzw = _lzw_encode(idx.reshape(-1), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
