"""[ext] Dependency-free TIFF codec + EXIF orientation (numpy only).

Two consumers share one IFD (Image File Directory) walker:

- **Uncompressed TIFF decode/encode** (``decode_tiff`` /
  ``encode_tiff``): baseline TIFF 6.0 — both byte orders ('II' and
  'MM'), 8-bit grayscale and RGB, strip-organized pixel data
  (StripOffsets/StripByteCounts, multiple strips), contiguous planar
  config. Compressed variants (LZW/PackBits/JPEG-in-TIFF) raise a
  loud NotImplementedError.
- **EXIF orientation** (``exif_orientation`` / ``orient_pixels``):
  the JPEG APP1 "Exif\\0\\0" payload IS a TIFF stream — the same IFD
  walker reads tag 0x0112 from it. ``orient_pixels`` applies the 8
  standard transforms (identity, mirrors, 180, transpose,
  ±90 rotations) so a pipeline can normalize camera uprightness —
  the decode itself never rotates (same contract as every mainstream
  decoder: orientation is pipeline policy, not codec behavior).

Exactness: TIFF is lossless → random images round-trip bit-exact in
all four (endian × channels) combinations; the 8 orientation
transforms satisfy algebraic identities (each is an involution or
has an explicit inverse) that the tests and fuzz family assert, and
q147 puts orientation-normalized censuses on the value-hashed
scoreboard (mean is rotation-invariant, dims swap exactly for
orientations 5-8).

Reference analogue: none (no media path in the reference; [ext]
surface per BASELINE.json:6).
"""

from __future__ import annotations

import struct

import numpy as np

#: TIFF tag ids used here
_TAG_WIDTH = 0x0100
_TAG_HEIGHT = 0x0101
_TAG_BITS = 0x0102
_TAG_COMPRESSION = 0x0103
_TAG_PHOTOMETRIC = 0x0106
_TAG_STRIP_OFFSETS = 0x0111
_TAG_ORIENTATION = 0x0112
_TAG_SAMPLES = 0x0115
_TAG_ROWS_PER_STRIP = 0x0116
_TAG_STRIP_COUNTS = 0x0117
_TAG_PLANAR = 0x011C

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _read_ifd(b: bytes, base: int = 0) -> dict[int, list[int]]:
    """Parse the first IFD of a TIFF stream starting at ``base``
    (byte-order header + IFD offset + entries). Returns tag →
    list-of-integer-values (SHORT/LONG/BYTE types; RATIONALs are
    returned as numerator/denominator pairs flattened)."""
    if len(b) < base + 8:
        raise ValueError("truncated TIFF header")
    order = b[base : base + 2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF stream (bad byte-order mark)")
    magic = struct.unpack(e + "H", b[base + 2 : base + 4])[0]
    if magic != 42:
        raise ValueError("not a TIFF stream (magic != 42)")
    ifd_off = struct.unpack(e + "I", b[base + 4 : base + 8])[0]
    pos = base + ifd_off
    if pos + 2 > len(b):
        raise ValueError("truncated TIFF IFD")
    count = struct.unpack(e + "H", b[pos : pos + 2])[0]
    pos += 2
    tags: dict[int, list[int]] = {}
    for _ in range(count):
        if pos + 12 > len(b):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, n = struct.unpack(e + "HHI", b[pos : pos + 8])
        size = _TYPE_SIZES.get(typ)
        if size is None:
            pos += 12
            continue  # unknown type: skip, per spec
        total = size * n
        if total <= 4:
            raw = b[pos + 8 : pos + 8 + total]
        else:
            off = struct.unpack(e + "I", b[pos + 8 : pos + 12])[0]
            raw = b[base + off : base + off + total]
            if len(raw) < total:
                raise ValueError("truncated TIFF tag data")
        if typ == 3:
            vals = list(struct.unpack(e + "H" * n, raw))
        elif typ in (4, 9):
            vals = list(struct.unpack(e + ("I" if typ == 4 else "i") * n, raw))
        elif typ in (1, 7):
            vals = list(raw)
        elif typ in (5, 10):
            fmt = "I" if typ == 5 else "i"
            vals = list(struct.unpack(e + fmt * (2 * n), raw))
        else:  # ASCII
            vals = list(raw)
        tags[tag] = vals
        pos += 12
    tags[-1] = [0 if e == "<" else 1]  # stash byte order for callers
    return tags


def decode_tiff(b: bytes) -> tuple[np.ndarray, int, int]:
    """Decode an uncompressed baseline TIFF (first IFD). Returns
    ((h, w) uint8 gray or (h, w, 3) uint8 RGB, w, h). Handles both
    byte orders and multi-strip layouts; compression, planar-separate
    storage, and non-8-bit depths raise loudly."""
    tags = _read_ifd(b)
    if _TAG_WIDTH not in tags or _TAG_HEIGHT not in tags:
        raise ValueError("TIFF missing dimensions")
    w, h = tags[_TAG_WIDTH][0], tags[_TAG_HEIGHT][0]
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    if comp != 1:
        raise NotImplementedError(f"compressed TIFF (method {comp}) not supported")
    spp = tags.get(_TAG_SAMPLES, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    if any(x != 8 for x in bits) or spp not in (1, 3):
        raise NotImplementedError("only 8-bit gray/RGB TIFF supported")
    if tags.get(_TAG_PLANAR, [1])[0] != 1:
        raise NotImplementedError("planar-separate TIFF not supported")
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout")
    data = bytearray()
    for off, cnt in zip(offsets, counts):
        chunk = b[off : off + cnt]
        if len(chunk) < cnt:
            raise ValueError("truncated TIFF strip")
        data += chunk
    need = w * h * spp
    if len(data) < need:
        raise ValueError("TIFF strips shorter than image")
    px = np.frombuffer(bytes(data[:need]), dtype=np.uint8)
    if spp == 1:
        return px.reshape(h, w), w, h
    return px.reshape(h, w, 3), w, h


def encode_tiff(
    pixels: np.ndarray, big_endian: bool = False, rows_per_strip: int = 0
) -> bytes:
    """Encode (h, w) gray or (h, w, 3) RGB uint8 as an uncompressed
    baseline TIFF. ``big_endian=True`` writes 'MM' order;
    ``rows_per_strip`` > 0 splits pixel data into multiple strips
    (exercises the decoder's strip reassembly)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8 or px.ndim not in (2, 3):
        raise ValueError("pixels must be uint8 (h,w) or (h,w,3)")
    if px.ndim == 3 and px.shape[2] != 3:
        raise ValueError("color input must have exactly 3 channels")
    h, w = px.shape[:2]
    spp = 1 if px.ndim == 2 else 3
    e = ">" if big_endian else "<"
    rps = rows_per_strip if rows_per_strip > 0 else h
    strips = [
        px[r : r + rps].tobytes() for r in range(0, h, rps)
    ]
    # layout: header (8) | pixel strips | bits-extra (color) | IFD
    strip_offsets = []
    off = 8
    for s in strips:
        strip_offsets.append(off)
        off += len(s)
    bits_off = off
    if spp == 3:
        off += 6  # 3 SHORTs for BitsPerSample
    ifd_off = off
    entries = []

    def entry(tag, typ, n, value_or_off):
        entries.append(struct.pack(e + "HHI", tag, typ, n) + value_or_off)

    def short_val(v):
        return struct.pack(e + "H", v) + b"\x00\x00"

    def long_val(v):
        return struct.pack(e + "I", v)

    n_strips = len(strips)
    # strip offset/count arrays: inline when single strip, else after
    # the IFD — which always holds exactly 9 entries (BitsPerSample is
    # present for gray AND color; only its storage differs)
    after_ifd = ifd_off + 2 + 12 * 9 + 4
    extra = b""
    if n_strips == 1:
        so_val, sc_val = long_val(strip_offsets[0]), long_val(len(strips[0]))
        so_n = sc_n = 1
    else:
        so_val = long_val(after_ifd)
        sc_val = long_val(after_ifd + 4 * n_strips)
        so_n = sc_n = n_strips
        extra = b"".join(struct.pack(e + "I", o) for o in strip_offsets)
        extra += b"".join(struct.pack(e + "I", len(s)) for s in strips)
    entry(_TAG_WIDTH, 4, 1, long_val(w))
    entry(_TAG_HEIGHT, 4, 1, long_val(h))
    if spp == 3:
        entry(_TAG_BITS, 3, 3, long_val(bits_off))
    else:
        entry(_TAG_BITS, 3, 1, short_val(8))
    entry(_TAG_COMPRESSION, 3, 1, short_val(1))
    entry(_TAG_PHOTOMETRIC, 3, 1, short_val(2 if spp == 3 else 1))
    entry(_TAG_STRIP_OFFSETS, 4, so_n, so_val)
    entry(_TAG_SAMPLES, 3, 1, short_val(spp))
    entry(_TAG_ROWS_PER_STRIP, 4, 1, long_val(rps))
    entry(_TAG_STRIP_COUNTS, 4, sc_n, sc_val)

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(e + "H", 42)
    out += struct.pack(e + "I", ifd_off)
    for s in strips:
        out += s
    if spp == 3:
        out += struct.pack(e + "HHH", 8, 8, 8)
    out += struct.pack(e + "H", len(entries))
    for en in sorted(entries, key=lambda x: struct.unpack(e + "H", x[:2])[0]):
        out += en
    out += struct.pack(e + "I", 0)  # no next IFD
    out += extra
    return bytes(out)


# --- EXIF orientation -------------------------------------------------------


def exif_orientation(content: bytes) -> int:
    """Orientation (1-8) from a JPEG's APP1 Exif segment, or 1 when
    absent/unreadable — reading ONLY the header bytes (no pixel
    decode; safe to call on any corpus object). The Exif payload is a
    TIFF stream, parsed with the same IFD walker as decode_tiff."""
    if content[:2] != b"\xff\xd8":
        return 1
    pos = 2
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            return 1
        marker = content[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0x01, *range(0xD0, 0xD8)) or marker in (0xD9, 0xDA):
            return 1  # entropy data / end reached without APP1
        seg_len = struct.unpack(">H", content[pos + 2 : pos + 4])[0]
        if marker == 0xE1 and content[pos + 4 : pos + 10] == b"Exif\x00\x00":
            try:
                tags = _read_ifd(content, base=pos + 10)
            except ValueError:
                return 1
            o = tags.get(_TAG_ORIENTATION, [1])[0]
            return o if 1 <= o <= 8 else 1
        pos += 2 + seg_len
    return 1


def orient_pixels(px: np.ndarray, orientation: int) -> np.ndarray:
    """Apply the EXIF orientation transform that makes the image
    upright (the inverse of how the camera stored it). The 8 cases of
    the EXIF spec: 1 identity, 2 mirror-H, 3 rotate 180, 4 mirror-V,
    5 transpose, 6 rotate 90 CW, 7 transverse, 8 rotate 90 CCW."""
    if orientation == 1:
        return px
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1, :]
    if orientation == 5:
        return np.swapaxes(px, 0, 1)
    if orientation == 6:
        return np.swapaxes(px, 0, 1)[:, ::-1]
    if orientation == 7:
        return np.swapaxes(px, 0, 1)[::-1, ::-1]
    if orientation == 8:
        return np.swapaxes(px, 0, 1)[::-1, :]
    raise ValueError(f"invalid EXIF orientation {orientation}")


def exif_app1_segment(orientation: int, big_endian: bool = False) -> bytes:
    """A minimal APP1 Exif segment carrying just the orientation tag —
    what the encoder splices after SOI so round-trip tests (and
    synthesized corpora) carry real EXIF metadata."""
    if not 1 <= orientation <= 8:
        raise ValueError("orientation must be 1-8")
    e = ">" if big_endian else "<"
    tiff = (b"MM" if big_endian else b"II") + struct.pack(e + "H", 42)
    tiff += struct.pack(e + "I", 8)  # IFD right after header
    tiff += struct.pack(e + "H", 1)  # one entry
    tiff += struct.pack(e + "HHI", _TAG_ORIENTATION, 3, 1)
    tiff += struct.pack(e + "H", orientation) + b"\x00\x00"
    tiff += struct.pack(e + "I", 0)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload


def with_exif_orientation(jpeg: bytes, orientation: int, big_endian: bool = False) -> bytes:
    """Splice an Exif APP1 segment into an existing JPEG (right after
    SOI) — how the synthesized q147 corpus gets oriented objects."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + exif_app1_segment(orientation, big_endian) + jpeg[2:]


# --- EXIF privacy scrub (r8) -------------------------------------------------

_TAG_GPS_IFD = 0x8825  # GPSInfo IFD pointer in IFD0


def exif_app1_with_gps(
    orientation: int,
    lat_deg: int,
    lon_deg: int,
    big_endian: bool = False,
) -> bytes:
    """An APP1 Exif segment carrying orientation PLUS a GPSInfo
    sub-IFD (latitude/longitude as the spec's degree/minute/second
    RATIONAL triples) — the synthesis helper for privacy-scrub tests
    and the q164 corpus: real location data in real EXIF structure."""
    if not 1 <= orientation <= 8:
        raise ValueError("orientation must be 1-8")
    e = ">" if big_endian else "<"
    # layout: header(8) | IFD0(2 + 2*12 + 4) | GPS IFD | rational data
    ifd0_off = 8
    ifd0_len = 2 + 2 * 12 + 4
    gps_off = ifd0_off + ifd0_len
    gps_entries = 2  # GPSLatitude, GPSLongitude
    gps_len = 2 + gps_entries * 12 + 4
    data_off = gps_off + gps_len

    tiff = (b"MM" if big_endian else b"II") + struct.pack(e + "H", 42)
    tiff += struct.pack(e + "I", ifd0_off)
    tiff += struct.pack(e + "H", 2)
    tiff += struct.pack(e + "HHI", _TAG_ORIENTATION, 3, 1)
    tiff += struct.pack(e + "H", orientation) + b"\x00\x00"
    tiff += struct.pack(e + "HHII", _TAG_GPS_IFD, 4, 1, gps_off)
    tiff += struct.pack(e + "I", 0)  # next IFD
    # GPS IFD: tags 2 (GPSLatitude) and 4 (GPSLongitude), 3 RATIONALs
    tiff += struct.pack(e + "H", gps_entries)
    tiff += struct.pack(e + "HHII", 2, 5, 3, data_off)
    tiff += struct.pack(e + "HHII", 4, 5, 3, data_off + 24)
    tiff += struct.pack(e + "I", 0)
    for deg in (lat_deg, lon_deg):
        tiff += struct.pack(e + "II", deg, 1)       # degrees
        tiff += struct.pack(e + "II", deg * 2, 60)  # minutes
        tiff += struct.pack(e + "II", deg * 7, 100) # seconds
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload


def _ifd_chain_has_tag(b: bytes, base: int, wanted: int) -> bool:
    """Does ANY IFD reachable from the TIFF header at ``base`` carry
    ``wanted``? Walks the IFD0→IFD1 next-pointer chain AND the Exif /
    Interoperability sub-IFD pointers (0x8769 / 0xA005) — the places
    real cameras duplicate metadata — with a visited set against
    cyclic offsets. Structural errors just end the walk (the caller
    is an auditor, not a validator)."""
    try:
        order = b[base : base + 2]
        e = "<" if order == b"II" else ">"
        if order not in (b"II", b"MM"):
            return False
        todo = [struct.unpack(e + "I", b[base + 4 : base + 8])[0]]
        seen: set[int] = set()
        while todo:
            off = todo.pop()
            if off == 0 or off in seen:
                continue
            seen.add(off)
            pos = base + off
            if pos + 2 > len(b):
                continue
            count = struct.unpack(e + "H", b[pos : pos + 2])[0]
            pos += 2
            for _ in range(count):
                if pos + 12 > len(b):
                    break
                tag, typ, cnt, val = struct.unpack(
                    e + "HHII", b[pos : pos + 12]
                )
                if tag == wanted:
                    return True
                if tag in (0x8769, 0xA005):  # sub-IFD pointers
                    todo.append(val)
                pos += 12
            if pos + 4 <= len(b):
                todo.append(struct.unpack(e + "I", b[pos : pos + 4])[0])
    except (struct.error, IndexError):
        return False
    return False


#: standalone JPEG markers with NO length field
_JPEG_NO_LENGTH = frozenset({0x01, *range(0xD0, 0xD8)})


def scrub_exif(jpeg: bytes) -> tuple[bytes, bool, int | None]:
    """Privacy scrub for JPEG EXIF: returns (clean_jpeg, had_gps,
    orientation_kept). Every APP1 Exif segment is REBUILT from a
    WHITELIST — only the orientation tag survives, re-emitted via
    ``exif_app1_segment`` in the original byte order — rather than
    deleting known-bad tags in place: blacklists leak (maker notes,
    vendor tags, and unknown types can all smuggle location), and
    in-place IFD surgery must fix every offset anyway. ``had_gps``
    audits the INPUT by walking the whole IFD chain (IFD0, the
    thumbnail IFD, and Exif/Interop sub-IFDs — cameras duplicate
    metadata there), so a census counts what the corpus really
    carried. The segment walk consumes 0xFF fill bytes and
    length-less TEM/RSTn markers (spec-legal before any marker) —
    a scrub that desyncs on padding would FAIL OPEN, copying GPS
    through unscrubbed. Non-EXIF APP1 (XMP) and all other segments
    pass through untouched; a stream without SOI raises ValueError."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    out = bytearray(b"\xff\xd8")
    pos = 2
    had_gps = False
    orientation: int | None = None
    n = len(jpeg)
    while pos + 2 <= n:
        if jpeg[pos] != 0xFF:
            break  # entropy data / desync: copy the rest verbatim
        mpos = pos
        while mpos + 1 < n and jpeg[mpos + 1] == 0xFF:
            mpos += 1  # spec-legal fill bytes before the marker
        if mpos + 1 >= n:
            break
        marker = jpeg[mpos + 1]
        if marker == 0x00:  # stuffed byte: entropy data, copy rest
            break
        if marker in _JPEG_NO_LENGTH:  # TEM / RSTn: no length field
            out += jpeg[pos : mpos + 2]
            pos = mpos + 2
            continue
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: copy rest
            break
        if mpos + 4 > n:
            break
        seg_len = struct.unpack(">H", jpeg[mpos + 2 : mpos + 4])[0]
        seg_end = mpos + 2 + seg_len
        if marker == 0xE1 and jpeg[mpos + 4 : mpos + 10] == b"Exif\x00\x00":
            tags = _read_ifd(jpeg[mpos:seg_end], base=10)
            if _ifd_chain_has_tag(jpeg[mpos:seg_end], 10, _TAG_GPS_IFD):
                had_gps = True
            vals = tags.get(_TAG_ORIENTATION)
            if vals and 1 <= vals[0] <= 8:
                orientation = vals[0]
                out += exif_app1_segment(
                    orientation, big_endian=bool(tags[-1][0])
                )
            # no whitelisted tags → the segment is dropped entirely
            # (fill bytes before it are padding and drop with it)
        else:
            out += jpeg[pos:seg_end]
        pos = seg_end
    out += jpeg[pos:]
    return bytes(out), had_gps, orientation
