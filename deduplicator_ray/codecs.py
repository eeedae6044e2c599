"""Stdlib-only image codecs: raw / ppm (P6) / bmp (24-bit) / png (8-bit RGB).

The reference decodes with PIL/cv2 (/root/reference/dupedb.py:85-98); neither
is available here, so the engine carries encoded payloads in the ``bytes``
column and decodes with these pure numpy+zlib codecs.  The decode stage's
error taxonomy (corrupt → dead-letter row) reproduces the reference's
badfiles semantics (/root/reference/dupedb.py:223-244).

Formats not implementable without external libs (jpg, webm, mp4, audio) are
explicitly stubbed in ``decode_image`` — the Ray-side plumbing (schema,
batching, actor signatures) is real and tested; only the codec kernel raises
``UnsupportedFormatError``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class CodecError(ValueError):
    """Payload is corrupt / unparsable (→ dead-letter row, badfiles semantics)."""


class UnsupportedFormatError(CodecError):
    """Format needs an external codec not present in this environment (jpg,
    video, audio).  Marks the deliberate stub boundary for multimodal payloads."""


# jpg/jpeg decode via the pure-numpy baseline JFIF codec (jpeg.py) — the
# dominant web format's stub→native flip; webm/mp4/flac remain the stub
# boundary (real demux/codec stacks)
IMAGE_FMTS = frozenset({"raw", "ppm", "bmp", "png", "jpg", "jpeg"})
STUB_FMTS = frozenset({"webm", "mp4", "flac"})
# Audio container formats with a NATIVE in-sandbox decoder: wav rides the
# stdlib ``wave`` module (16-bit PCM), acon is the deterministic fixture
# container.  In the IMAGE pipeline both still route to the md5 keyspace
# — getProcHash md5s every non-image regardless of decoder availability
# (/root/reference/dupedb.py:100-101); the audio DEDUP pipeline decodes
# them for real via ``decode_audio``.
AUDIO_FMTS = frozenset({"wav", "acon"})
# Multi-frame container formats with a NATIVE in-sandbox decoder: vcon is
# the video stand-in, gif the REAL animated-image web format (LZW decode
# below).  These are the formats the reference's strict-mode switch is
# ABOUT: strict + animated → md5 byte identity, non-strict → dHash of the
# first decoded frame (/root/reference/dupedb.py:82-98); a single-frame
# member hashes perceptually in both modes (framesInImage > 1 gate).
CONTAINER_FMTS = frozenset({"vcon", "gif"})

# Explicit per-format capability registry — the LOUD stub boundary.  A
# real deployment swaps 'stub' entries to 'native' by registering a
# codec; until then the decode stage consults
# PipelineConfig.unsupported_codec_policy to decide whether a stubbed
# perceptual format joins the md5 keyspace (reference's non-image branch,
# /root/reference/dupedb.py:100-101) or dead-letters with
# error=unsupported_codec (badfiles taxonomy, dupedb.py:223-244) — never
# a silent md5-match the operator didn't opt into.
CODEC_CAPABILITIES: dict[str, str] = {
    **{f: "native" for f in sorted(IMAGE_FMTS)},
    **{f: "stub" for f in sorted(STUB_FMTS)},
    **{f: "native" for f in sorted(CONTAINER_FMTS)},
    **{f: "native" for f in sorted(AUDIO_FMTS)},
}


def codec_capability(fmt: str) -> str:
    """'native' (real decoder), 'stub' (md5-or-dead-letter per policy) or
    'unknown' (always a CodecError dead-letter)."""
    return CODEC_CAPABILITIES.get(fmt, "unknown")


# ---------------------------------------------------------------------------
# raw: row-major RGB8, dimensions carried out-of-band in the (w, h) columns


def encode_raw(img: np.ndarray) -> bytes:
    return np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    if len(data) != w * h * 3:
        raise CodecError(f"raw payload is {len(data)} bytes, expected {w*h*3}")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# ppm: P6 binary


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise CodecError("not a P6 ppm")
    # header: magic, width, height, maxval — whitespace separated, # comments
    pos, fields = 2, []
    try:
        while len(fields) < 3:
            while data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                while data[pos : pos + 1] not in (b"\n", b""):
                    pos += 1
                continue
            start = pos
            # data[pos:pos+1] is b'' past EOF — NOT whitespace — so the
            # scan must terminate explicitly or a truncated header hangs
            # the decoding actor forever instead of dead-lettering
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            if pos == start:
                raise CodecError("truncated ppm header")
            fields.append(int(data[start:pos]))
        pos += 1  # single whitespace after maxval
    except (IndexError, ValueError) as e:
        raise CodecError(f"bad ppm header: {e}") from e
    w, h, maxval = fields
    if maxval != 255:
        raise CodecError(f"unsupported ppm maxval {maxval}")
    if w <= 0 or h <= 0:
        # negative dims reshape to a ValueError that ESCAPES the
        # CodecError dead-letter handlers; zero dims decode to empty
        # images whose dHash 0 welds them into one false cluster
        raise CodecError(f"bad ppm dims {w}x{h}")
    body = data[pos : pos + w * h * 3]
    if len(body) != w * h * 3:
        raise CodecError("truncated ppm body")
    return np.frombuffer(body, np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# bmp: BITMAPINFOHEADER, 24bpp BGR, bottom-up, 4-byte row padding


def encode_bmp(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = np.ascontiguousarray(img[::-1, :, ::-1], np.uint8)  # bottom-up, BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    try:
        magic, _size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", data, 0)
        hdr_size, w, h, planes, bpp = struct.unpack_from("<IiiHH", data, 14)
        compression = struct.unpack_from("<I", data, 30)[0]
    except struct.error as e:
        raise CodecError(f"bad bmp header: {e}") from e
    if magic != b"BM" or planes != 1:
        raise CodecError("not a BMP")
    if bpp != 24 or compression != 0:
        raise CodecError(f"unsupported bmp: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise CodecError(f"bad bmp dims {w}x{h}")
    row_size = (w * 3 + 3) & ~3
    body = data[offset : offset + row_size * h]
    if len(body) != row_size * h:
        raise CodecError("truncated bmp body")
    rows = np.frombuffer(body, np.uint8).reshape(h, row_size)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if bottom_up else img


# ---------------------------------------------------------------------------
# png: FULL decode breadth — color types 0/2/3/4/6, bit depths 1/2/4/8/16,
# Adam7 interlace, filters 0-4 (the reference hashes whatever PIL opens,
# /root/reference/dupedb.py:85-86; the prior decoder refused everything
# but 8-bit truecolor and dead-lettered ~half of real-web PNGs).  Alpha
# is DROPPED (not composited) and 16-bit takes the high byte — PIL's own
# L/RGB conversion rules, so the dHash matches what the reference
# computes.  The encoder's default path still emits 8-bit RGB filter 0;
# ``encode_png_ex`` produces the variant layouts for tests/fixtures.


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# header-level decompression-bomb cap, same 160 MP bound the metadata-level
# guard uses (decode_hash.MAX_IMAGE_PIXELS, /root/reference/dupedb.py:33)
MAX_DECODE_PIXELS = 160_000_000

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}
# (x0, y0, dx, dy) of the seven Adam7 passes
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(img: np.ndarray, level: int = 1) -> bytes:
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.ascontiguousarray(img, np.uint8)
    scan = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 1:] = raw.reshape(h, w * 3)
    idat = zlib.compress(scan.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _pack_samples(samples: np.ndarray, depth: int) -> bytes:
    """(h, w, c) integer samples → filter-0 scanline bytes at ``depth``."""
    h, w, c = samples.shape
    if depth == 8:
        rows = samples.astype(np.uint8).reshape(h, w * c)
    elif depth == 16:
        rows = (samples.astype(">u2").view(np.uint8)
                .reshape(h, w * c * 2))
    else:
        bits = ((samples.astype(np.uint16)[..., None]
                 >> np.arange(depth - 1, -1, -1)) & 1).astype(np.uint8)
        flat = bits.reshape(h, w * c * depth)
        rows = np.packbits(flat, axis=1)
    out = np.zeros((h, 1 + rows.shape[1]), np.uint8)
    out[:, 1:] = rows
    return out.tobytes()


def encode_png_ex(img: np.ndarray, color: int = 2, depth: int = 8,
                  interlace: int = 0, level: int = 6) -> bytes:
    """Variant-layout PNG encoder for tests/fixtures: ``img`` is always
    (h, w, 3) uint8; the pixel content is converted INTO the requested
    layout (palette built from unique colors, gray from the first
    channel of an already-gray image, alpha filled opaque, 16-bit as
    v*257) so that decoding back under the PIL rules reproduces the
    original 8-bit RGB exactly."""
    h, w = img.shape[:2]
    if color not in _PNG_CHANNELS or depth not in _PNG_DEPTHS[color]:
        raise CodecError(f"encode_png_ex: bad color={color} depth={depth}")
    plte = b""
    if color == 0:
        g = img[:, :, 0].astype(np.uint16)
        if depth == 16:
            samples = (g * 257)[..., None]
        elif depth == 8:
            samples = g[..., None]
        else:
            step = 255 // ((1 << depth) - 1)
            if (g % step).any():
                raise CodecError(
                    f"encode_png_ex: gray values not exact at depth {depth}")
            samples = (g // step)[..., None]
    elif color == 2:
        samples = (img.astype(np.uint16) * 257) if depth == 16 \
            else img.astype(np.uint16)
    elif color == 3:
        flat = img.reshape(-1, 3)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > (1 << depth):
            raise CodecError(
                f"encode_png_ex: {len(pal)} colors exceed depth {depth}")
        plte = pal.astype(np.uint8).tobytes()
        samples = inv.reshape(h, w, 1)
    elif color == 4:
        g = img[:, :, 0].astype(np.uint16)
        a = np.full_like(g, 255)
        samples = np.stack([g, a], axis=2)
        if depth == 16:
            samples = samples * 257
    else:  # 6
        a = np.full((h, w, 1), 255, np.uint16)
        samples = np.concatenate([img.astype(np.uint16), a], axis=2)
        if depth == 16:
            samples = samples * 257
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_pack_samples(sub, depth))
        raw = b"".join(parts)
    else:
        raw = _pack_samples(samples, depth)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = _PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw, level)) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _defilter(scan: np.ndarray, row_bytes: int, bpp: int) -> np.ndarray:
    """(h, 1+row_bytes) filtered scanlines → (h, row_bytes) raw bytes.
    Filters 0-4; the left-dependent filters (sub/average/paeth) run as
    plain-int scalar loops (each byte depends on the reconstructed byte
    ``bpp`` to its left — see the original decoder's measurement)."""
    h = scan.shape[0]
    filters = scan[:, 0]
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    for y in range(h):
        f = filters[y]
        cur = scan[y, 1:].copy()
        prev = out[y - 1] if y > 0 else np.zeros(row_bytes, np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:  # sub
            row = cur.tolist()
            for x in range(bpp, row_bytes):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
            out[y] = row
        elif f == 2:  # up
            out[y] = cur + prev
        elif f == 3:  # average
            row = cur.tolist()
            pr = prev.tolist()
            for x in range(row_bytes):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + pr[x]) >> 1)) & 0xFF
            out[y] = row
        elif f == 4:  # paeth
            row = cur.tolist()
            pr = prev.tolist()
            for x in range(row_bytes):
                a = row[x - bpp] if x >= bpp else 0
                b = pr[x]
                c = pr[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                    b if pb_ <= pc_ else c)
                row[x] = (row[x] + pred) & 0xFF
            out[y] = row
        else:
            raise CodecError(f"bad png filter {f}")
    return out


def _unpack_rows(raw: np.ndarray, pw: int, channels: int,
                 depth: int) -> np.ndarray:
    """(h, row_bytes) raw bytes → (h, pw, channels) uint16 samples (16-bit
    kept full-width here; the high-byte conversion happens at the end)."""
    ph = raw.shape[0]
    if depth == 8:
        return raw[:, : pw * channels].reshape(
            ph, pw, channels).astype(np.uint16)
    if depth == 16:
        b = np.ascontiguousarray(raw[:, : pw * channels * 2])
        return b.view(">u2").astype(np.uint16).reshape(ph, pw, channels)
    bits = np.unpackbits(raw, axis=1)[:, : pw * channels * depth]
    vals = bits.reshape(ph, pw * channels, depth).astype(np.uint16)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (vals * weights).sum(axis=2).reshape(ph, pw, channels)


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise CodecError("not a png")
    pos = 8
    w = h = None
    depth = color = interlace = 0
    plte = None
    idat = bytearray()
    try:
        while pos < len(data):
            (length,) = struct.unpack_from(">I", data, pos)
            tag = data[pos + 4 : pos + 8]
            payload = data[pos + 8 : pos + 8 + length]
            if len(payload) != length:
                raise CodecError("truncated chunk")
            if tag == b"IHDR":
                w, h, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", payload)
                if (color not in _PNG_CHANNELS
                        or depth not in _PNG_DEPTHS[color]
                        or comp != 0 or filt != 0 or interlace not in (0, 1)):
                    raise CodecError(
                        f"unsupported png: depth={depth} color={color} "
                        f"comp={comp} filt={filt} interlace={interlace}")
                # bomb guard on the PAYLOAD's own header, before inflating:
                # the caller-side metadata guard (decode_hash) can be
                # spoofed by a row whose w/h columns understate the IHDR
                # dims — the reference's PIL MAX_IMAGE_PIXELS reads the
                # header for the same reason (/root/reference/dupedb.py:33)
                if w * h > MAX_DECODE_PIXELS:
                    raise CodecError(
                        f"decompression bomb: png header {w}x{h}")
            elif tag == b"PLTE":
                if length % 3 or length == 0 or length > 768:
                    raise CodecError(f"bad png PLTE length {length}")
                plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
            elif tag == b"IDAT":
                idat.extend(payload)
            elif tag == b"IEND":
                break
            pos += 12 + length
        if w is None:
            raise CodecError("png missing IHDR")
        if w == 0 or h == 0:
            raise CodecError(f"bad png dims {w}x{h}")
        channels = _PNG_CHANNELS[color]
        bpp = max(1, channels * depth // 8)

        def rb(width: int) -> int:
            return (width * channels * depth + 7) // 8

        if interlace:
            passes = [(x0, y0, dx, dy,
                       (w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
                      for x0, y0, dx, dy in _ADAM7]
            total = sum(ph * (1 + rb(pw)) for *_, pw, ph in passes
                        if pw and ph)
        else:
            total = h * (1 + rb(w))
        # bound the INFLATION, not just the declared dims: a payload whose
        # IHDR says 2x2 but whose IDAT inflates to gigabytes would pass
        # the header guard and balloon worker memory before the size
        # check — cap the decompressor at the scanline budget and reject
        # any surplus compressed input
        d = zlib.decompressobj()
        decomp = d.decompress(bytes(idat), total + 1)
        if len(decomp) > total or d.unconsumed_tail:
            raise CodecError("png IDAT inflates past the scanline budget")
        if len(decomp) != total:
            raise CodecError("bad png scanline payload size")
        buf = np.frombuffer(decomp, np.uint8)
        if interlace:
            samples = np.zeros((h, w, channels), np.uint16)
            off = 0
            for x0, y0, dx, dy, pw, ph in passes:
                if not pw or not ph:
                    continue
                prb = rb(pw)
                scan = buf[off : off + ph * (1 + prb)].reshape(ph, 1 + prb)
                off += ph * (1 + prb)
                raw = _defilter(scan, prb, bpp)
                samples[y0::dy, x0::dx] = _unpack_rows(
                    raw, pw, channels, depth)
        else:
            scan = buf.reshape(h, 1 + rb(w))
            samples = _unpack_rows(_defilter(scan, rb(w), bpp),
                                   w, channels, depth)
    except (struct.error, zlib.error) as e:
        raise CodecError(f"bad png: {e}") from e
    if depth == 16:
        samples = samples >> 8          # PIL: high byte
    if color == 3:
        if plte is None:
            raise CodecError("png color 3 missing PLTE")
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise CodecError("png palette index out of range")
        return plte[idx]
    if color == 0 or color == 4:
        g = samples[:, :, 0]
        if color == 0 and depth < 8:    # scale 1/2/4-bit gray to 8-bit
            g = g * (255 // ((1 << depth) - 1))
        return np.repeat(g.astype(np.uint8)[:, :, None], 3, axis=2)
    return samples[:, :, :3].astype(np.uint8)  # color 2 or 6 (alpha dropped)


# ---------------------------------------------------------------------------
# dispatch


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(img)
    if fmt == "ppm":
        return encode_ppm(img)
    if fmt == "bmp":
        return encode_bmp(img)
    if fmt == "png":
        return encode_png(img)
    if fmt in ("jpg", "jpeg"):
        from deduplicator_ray import jpeg as _jpeg

        return _jpeg.encode_jpeg(img)
    raise UnsupportedFormatError(f"no encoder for fmt={fmt!r}")


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode one payload to an (h, w, 3) uint8 array.

    Raises CodecError for corrupt payloads (dead-letter) and
    UnsupportedFormatError for stubbed formats (jpg/video/audio — the
    multimodal plumbing is real, the codec kernel is the documented stub).
    A None payload (failed download on a web corpus) is a CodecError so
    every consumer's existing dead-letter path routes it.
    """
    if data is None:
        raise CodecError("null payload")
    if fmt == "raw":
        img = decode_raw(data, w, h)
    elif fmt == "ppm":
        img = decode_ppm(data)
    elif fmt == "bmp":
        img = decode_bmp(data)
    elif fmt == "png":
        img = decode_png(data)
    elif fmt in ("jpg", "jpeg"):
        from deduplicator_ray import jpeg as _jpeg

        img = _jpeg.decode_jpeg(data)
    elif fmt in CONTAINER_FMTS:
        # multi-frame container: the single-image view is frame 0 (what
        # the reference's non-strict getProcHash hashes and what its GUI
        # displays — /root/reference/dupedb.py:92-98, cv2 first frame)
        img, _n = decode_container_first(data, fmt)
    elif fmt in AUDIO_FMTS:
        # audio is NOT an image: getProcHash md5s every non-image file
        # (/root/reference/dupedb.py:100-101) — the audio dedup pipeline
        # decodes these for real (decode_audio); in the image pipeline
        # they join the md5 keyspace via the same policy branch as stubs
        raise UnsupportedFormatError(
            f"fmt={fmt!r} is an audio container, not an image — md5 "
            "keyspace per the reference's non-image branch")
    elif fmt in STUB_FMTS:
        raise UnsupportedFormatError(
            f"fmt={fmt!r} requires an external codec (PIL/ffmpeg) not present "
            "in this environment; stubbed per FIXTURES.md"
        )
    else:
        raise CodecError(f"unknown fmt {fmt!r}")
    # w == h == 0 means "no declared dims" (file-glob ingest rows,
    # io.read_image_files — the payload is the only source of truth there);
    # any declared table metadata is still cross-checked against the decode
    if (w or h) and (img.shape[0] != h or img.shape[1] != w):
        raise CodecError(f"decoded dims {img.shape[1]}x{img.shape[0]} != declared {w}x{h}")
    return img


# ---------------------------------------------------------------------------
# vcon: a length-prefixed PNG-frame container standing in for mp4/webm.
# Real video demuxing needs ffmpeg (absent here, see STUB_FMTS); the video
# DEDUP pipeline still needs genuine per-frame compute, so fixtures emit
# this trivially parseable container and the frame-extraction stage does
# REAL work on it (parse → png decode → dHash).  The reference's video
# handling is md5-only (/root/reference/dupedb.py:92-101); frame-level
# near-dup is part of this engine's training-data extension surface.

VCON_MAGIC = b"VCON1"


def encode_vcon(frames: list[bytes]) -> bytes:
    """Pack encoded frame payloads into one container blob."""
    parts = [VCON_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        parts.append(struct.pack("<I", len(f)))
        parts.append(f)
    return b"".join(parts)


def _decode_frame_payload(data: bytes) -> np.ndarray:
    """Decode one container frame payload by magic-byte sniffing (frames
    are self-describing; headerless ``raw`` cannot ride in a container)."""
    if data.startswith(_PNG_SIG):
        return decode_png(data)
    if data.startswith(b"P6"):
        return decode_ppm(data)
    if data.startswith(b"BM"):
        return decode_bmp(data)
    raise CodecError("unrecognized container frame payload")


def decode_vcon_first(data: bytes) -> tuple[np.ndarray, int]:
    """(first decoded frame, total frame count) of a vcon container — the
    non-strict fingerprint input (frame-0 dHash, /root/reference/
    dupedb.py:92-98) plus the ``framesInImage`` quality signal
    (dupedb.py:82, dedupc.py:62-68) in one parse."""
    frames = decode_vcon(data)
    if not frames:
        raise CodecError("vcon has no frames")
    return _decode_frame_payload(frames[0]), len(frames)


def decode_container_first(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """One entry point for every CONTAINER_FMTS member: (frame-0 RGB,
    frame count) — the pair the strict switch and the frames quality
    signal both consume (shared by decode_hash and the Ray-free oracle
    so the two can never drift on container routing)."""
    if fmt == "vcon":
        return decode_vcon_first(data)
    if fmt == "gif":
        return decode_gif_first(data)
    raise CodecError(f"not a container fmt {fmt!r}")


def decode_vcon(data: bytes) -> list[bytes]:
    """Unpack a vcon container into its frame payloads.

    Raises CodecError for null/corrupt containers so the video stages'
    dead-letter path matches the image decode taxonomy.
    """
    if data is None:
        raise CodecError("null payload")
    if not data.startswith(VCON_MAGIC) or len(data) < len(VCON_MAGIC) + 4:
        raise CodecError("bad vcon magic")
    off = len(VCON_MAGIC)
    (n,) = struct.unpack_from("<I", data, off)
    off += 4
    frames: list[bytes] = []
    for _ in range(n):
        if off + 4 > len(data):
            raise CodecError("truncated vcon frame header")
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        if off + ln > len(data):
            raise CodecError("truncated vcon frame payload")
        frames.append(data[off:off + ln])
        off += ln
    return frames


# ---------------------------------------------------------------------------
# mp4: REAL ISO BMFF container box-parse (ftyp/moov walk) for frame
# counts, duration and track dims — no H.264 pixel decode (that stays
# the documented stub boundary), but the quality tuple's frames signal
# and the metadata surface are real for actual mp4 files
# (/root/reference/dupedb.py:92-98 reads the same metadata via cv2).


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) of the boxes in a range."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4: pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise CodecError("truncated mp4 largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos  # box extends to end of enclosing scope
        if size < hdr or pos + size > end:
            raise CodecError("bad mp4 box size")
        yield btype, pos + hdr, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, *path: bytes):
    """First box at a nested path, as (payload_start, payload_end)."""
    lo, hi = start, end
    for name in path:
        for btype, b0, b1 in _mp4_boxes(data, lo, hi):
            if btype == name:
                lo, hi = b0, b1
                break
        else:
            raise CodecError(f"mp4 missing {name.decode(errors='replace')} box")
    return lo, hi


def parse_mp4_meta(data: bytes) -> tuple[int, int, int, int]:
    """(frames, duration_ms, width, height) of the first VIDEO track of
    an ISO BMFF (mp4/mov) stream — ftyp sanity, then the moov walk
    moov→trak→mdia(hdlr=='vide')→(mdhd timescale/duration,
    stbl→stsz sample_count, tkhd dims).  Raises CodecError for anything
    that is not a well-formed mp4 (the caller falls back to the plain
    stub path, so random-byte fixtures keep today's behavior)."""
    if len(data) < 16:
        raise CodecError("not an mp4: too short")
    try:
        tops = list(_mp4_boxes(data, 0, len(data)))
    except struct.error as e:
        raise CodecError(f"bad mp4: {e}") from e
    if not tops or tops[0][0] != b"ftyp":
        raise CodecError("not an mp4: no ftyp")
    moov = next(((b0, b1) for t, b0, b1 in tops if t == b"moov"), None)
    if moov is None:
        raise CodecError("mp4 missing moov")
    try:
        for btype, t0, t1 in _mp4_boxes(data, *moov):
            if btype != b"trak":
                continue
            m0, m1 = _mp4_find(data, t0, t1, b"mdia")
            h0, h1 = _mp4_find(data, m0, m1, b"hdlr")
            if data[h0 + 8: h0 + 12] != b"vide":
                continue
            d0, d1 = _mp4_find(data, m0, m1, b"mdhd")
            ver = data[d0]
            if ver == 1:
                timescale = struct.unpack_from(">I", data, d0 + 20)[0]
                duration = struct.unpack_from(">Q", data, d0 + 24)[0]
            else:
                timescale = struct.unpack_from(">I", data, d0 + 12)[0]
                duration = struct.unpack_from(">I", data, d0 + 16)[0]
            z0, z1 = _mp4_find(data, m0, m1, b"minf", b"stbl", b"stsz")
            sample_size = struct.unpack_from(">I", data, z0 + 4)[0]
            frames = struct.unpack_from(">I", data, z0 + 8)[0]
            if frames == 0 and sample_size:
                frames = 1
            w = h = 0
            try:
                k0, k1 = _mp4_find(data, t0, t1, b"tkhd")
                kver = data[k0]
                off = k0 + (88 if kver == 1 else 76)
                w = struct.unpack_from(">I", data, off)[0] >> 16
                h = struct.unpack_from(">I", data, off + 4)[0] >> 16
            except CodecError:
                pass
            if frames <= 0 or frames > 10_000_000:
                raise CodecError(f"implausible mp4 frame count {frames}")
            dur_ms = int(duration * 1000 // timescale) if timescale else 0
            return frames, dur_ms, w, h
    except (struct.error, IndexError) as e:
        raise CodecError(f"bad mp4 moov: {e}") from e
    raise CodecError("mp4 has no video track")


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def encode_mp4_stub(frames: int, duration_ms: int, w: int, h: int,
                    seed: int = 0) -> bytes:
    """Minimal well-formed ISO BMFF stream: real ftyp/moov metadata (the
    part ``parse_mp4_meta`` reads) over a deterministic filler mdat —
    fixture-side only, no codec payload."""
    timescale = 1000
    duration = duration_ms
    mdhd = (b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration) + b"\x55\xc4\x00\x00")
    hdlr = b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"stub\x00"
    stsz = _mp4_box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, frames)
                    + b"".join(struct.pack(">I", 64) for _ in range(frames)))
    stbl = _mp4_box(b"stbl", stsz)
    minf = _mp4_box(b"minf", stbl)
    mdia = _mp4_box(b"mdia", _mp4_box(b"mdhd", mdhd)
                    + _mp4_box(b"hdlr", hdlr) + minf)
    tkhd = (b"\x00\x00\x00\x07" + struct.pack(">III", 0, 0, 1)
            + b"\x00" * 4 + struct.pack(">I", duration) + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", w << 16, h << 16))
    trak = _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd) + mdia)
    mvhd = (b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd) + trak)
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, 64 * max(frames, 1), dtype=np.uint8).tobytes()
    return (_mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
            + moov + _mp4_box(b"mdat", body))


# webm: REAL Matroska/EBML metadata parse — the mp4 box walk's sibling
# for the reference's other video extension (dupedb.py:53-65).  Frame
# count = video-track SimpleBlock/Block count across Clusters (lacing
# honored), duration from Info, dims from the video TrackEntry.  No VP8/
# VP9 pixel decode (stub boundary unchanged).


def _ebml_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, new_pos) of an EBML variable-length integer.  Element IDs
    keep the length-marker bit (``keep_marker``); sizes strip it.  An
    all-ones size payload means 'unknown size' and returns -1."""
    if pos >= len(data):
        raise CodecError("truncated ebml vint")
    first = data[pos]
    if first == 0:
        raise CodecError("bad ebml vint")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise CodecError("truncated ebml vint")
    if keep_marker:
        v = int.from_bytes(data[pos:pos + length], "big")
    else:
        v = first & ((1 << (8 - length)) - 1)
        for i in range(1, length):
            v = (v << 8) | data[pos + i]
        if v == (1 << (7 * length)) - 1:
            v = -1  # unknown size
    return v, pos + length


def _ebml_walk(data: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end) within a range."""
    while pos < end:
        eid, pos = _ebml_vint(data, pos, True)
        size, pos = _ebml_vint(data, pos, False)
        if size == -1:
            yield eid, pos, end  # unknown size: extends to range end
            return
        if pos + size > end:
            raise CodecError("ebml element overruns its parent")
        yield eid, pos, pos + size
        pos += size


def _ebml_vint_raw(data: bytes, pos: int) -> tuple[int, int]:
    """Marker-stripped vint WITHOUT the unknown-size -1 mapping — block
    TRACK NUMBERS are values, not sizes, and the all-ones encodings
    (127, 16383, ...) are legal numbers (review-found: track 127's
    0xFF vint read as -1 and zeroed the frame count)."""
    if pos >= len(data):
        raise CodecError("truncated ebml vint")
    first = data[pos]
    if first == 0:
        raise CodecError("bad ebml vint")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise CodecError("truncated ebml vint")
    v = first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, pos + length


def _webm_block_frames(data: bytes, p0: int, p1: int, vtrack: int) -> int:
    """Frame count carried by one (Simple)Block payload (lacing-aware)."""
    tn, p = _ebml_vint_raw(data, p0)
    if tn != vtrack:
        return 0
    if p + 3 > p1:
        raise CodecError("truncated webm block")
    lacing = (data[p + 2] >> 1) & 3
    if lacing == 0:
        return 1
    if p + 4 > p1:
        raise CodecError("truncated webm lace header")
    return data[p + 3] + 1


def _count_webm_frames(data: bytes, pos: int, end: int, vtrack: int) -> int:
    """Video-track frames across a clusters region.  Cluster boundaries
    are transparent — sized AND unknown-size Clusters both just continue
    the scan over their children, so streamed/MediaRecorder output
    (unknown-size clusters back to back) counts every block
    (review-found: the first implementation stopped at the first
    unknown-size cluster and silently undercounted)."""
    frames = 0
    while pos < end:
        eid, p2 = _ebml_vint(data, pos, True)
        size, p3 = _ebml_vint(data, p2, False)
        if eid == 0x1F43B675:  # Cluster
            if size == -1:
                # unknown size: children inline until the next cluster
                pos = p3
                continue
            if p3 + size > end:
                raise CodecError("ebml element overruns its parent")
            # sized cluster: recurse so its children are bounds-checked
            # against the CLUSTER end — a block overrunning its cluster
            # dead-letters instead of desyncing into a plausible wrong
            # frame count (review-found)
            frames += _count_webm_frames(data, p3, p3 + size, vtrack)
            pos = p3 + size
            continue
        if size == -1:
            raise CodecError("unknown-size non-cluster ebml element")
        if p3 + size > end:
            raise CodecError("ebml element overruns its parent")
        if eid == 0xA3:  # SimpleBlock
            frames += _webm_block_frames(data, p3, p3 + size, vtrack)
        elif eid == 0xA0:  # BlockGroup
            for i2, g0, g1 in _ebml_walk(data, p3, p3 + size):
                if i2 == 0xA1:
                    frames += _webm_block_frames(data, g0, g1, vtrack)
                    break
        pos = p3 + size
    return frames


_EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def parse_webm_meta(data: bytes) -> tuple[int, int, int, int]:
    """(frames, duration_ms, width, height) of the first video track of
    a Matroska/webm stream.  Raises CodecError for anything not
    well-formed EBML (callers fall back to the stub path)."""
    if not data.startswith(_EBML_MAGIC):
        raise CodecError("not webm: no EBML header")
    seg = None
    for eid, b0, b1 in _ebml_walk(data, 0, len(data)):
        if eid == 0x18538067:  # Segment
            seg = (b0, b1)
            break
    if seg is None:
        raise CodecError("webm missing Segment")
    tscale = 1_000_000  # ns per timestamp unit (Matroska default)
    duration_units = 0.0
    vtrack = None
    w = h = 0
    cluster0 = None
    for eid, b0, b1 in _ebml_walk(data, *seg):
        if eid == 0x1549A966:  # Info
            for i2, c0, c1 in _ebml_walk(data, b0, b1):
                if i2 == 0x2AD7B1:
                    # bound the element: Matroska TimestampScale is ns
                    # per unit (default 10^6); an absurd/oversized value
                    # overflows the duration product into OverflowError
                    # past the CodecError-only fallbacks (review-found)
                    if c1 - c0 > 8:
                        raise CodecError("bad webm TimestampScale width")
                    tscale = int.from_bytes(data[c0:c1], "big")
                    if not (0 < tscale <= 10_000_000_000):
                        raise CodecError(
                            f"implausible webm TimestampScale {tscale}")
                elif i2 == 0x4489:  # Duration (float)
                    n = c1 - c0
                    if n == 4:
                        duration_units = struct.unpack(">f", data[c0:c1])[0]
                    elif n == 8:
                        duration_units = struct.unpack(">d", data[c0:c1])[0]
                    else:
                        raise CodecError("bad webm Duration width")
        elif eid == 0x1654AE6B:  # Tracks
            for i2, t0, t1 in _ebml_walk(data, b0, b1):
                if i2 != 0xAE:  # TrackEntry
                    continue
                tnum = ttype = 0
                tw = th = 0
                for i3, e0, e1 in _ebml_walk(data, t0, t1):
                    if i3 == 0xD7:
                        tnum = int.from_bytes(data[e0:e1], "big")
                    elif i3 == 0x83:
                        ttype = int.from_bytes(data[e0:e1], "big")
                    elif i3 == 0xE0:  # Video
                        for i4, v0, v1 in _ebml_walk(data, e0, e1):
                            if i4 == 0xB0:
                                tw = int.from_bytes(data[v0:v1], "big")
                            elif i4 == 0xBA:
                                th = int.from_bytes(data[v0:v1], "big")
                if ttype == 1 and vtrack is None:
                    vtrack, w, h = tnum, tw, th
        elif eid == 0x1F43B675 and cluster0 is None:  # first Cluster
            # the clusters region runs from here to the segment end; the
            # counter below treats further Cluster starts (sized or
            # unknown-size) as transparent boundaries
            cluster0 = b0
    if vtrack is None:
        raise CodecError("webm has no video track")
    frames = (_count_webm_frames(data, cluster0, seg[1], vtrack)
              if cluster0 is not None else 0)
    if frames <= 0 or frames > 10_000_000:
        raise CodecError(f"implausible webm frame count {frames}")
    import math as _math
    if not _math.isfinite(duration_units) or duration_units < 0 \
            or duration_units > 1e15:
        # NaN/Inf/absurd Duration floats would escape as ValueError/
        # OverflowError past the CodecError-only fallbacks (review-found)
        raise CodecError("bad webm Duration value")
    dur_ms = int(duration_units * tscale / 1_000_000)
    return frames, dur_ms, w, h


def _ebml_el(eid: int, payload: bytes) -> bytes:
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(payload)
    # 4-byte size with marker bit (handles payloads to 2^28-2)
    size = (0x10000000 | n).to_bytes(4, "big")
    return idb + size + payload


def _ebml_uint(eid: int, v: int) -> bytes:
    return _ebml_el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_webm_stub(frames: int, duration_ms: int, w: int, h: int,
                     seed: int = 0) -> bytes:
    """Minimal well-formed Matroska stream: real EBML/Info/Tracks
    metadata and one Cluster of SimpleBlocks with deterministic filler
    payloads — fixture-side only, no codec payload."""
    ebml = _ebml_el(0x1A45DFA3,
                    _ebml_uint(0x4286, 1) + _ebml_uint(0x42F7, 1)
                    + _ebml_el(0x4282, b"webm") + _ebml_uint(0x4287, 4))
    info = _ebml_el(0x1549A966,
                    _ebml_uint(0x2AD7B1, 1_000_000)
                    + _ebml_el(0x4489,
                               struct.pack(">d", float(duration_ms))))
    video = _ebml_el(0xE0, _ebml_uint(0xB0, w) + _ebml_uint(0xBA, h))
    track = _ebml_el(0xAE, _ebml_uint(0xD7, 1) + _ebml_uint(0x83, 1)
                     + _ebml_el(0x536E, b"v") + video)
    tracks = _ebml_el(0x1654AE6B, track)
    rng = np.random.default_rng(seed)
    blocks = b""
    for i in range(frames):
        payload = rng.integers(0, 256, 24, dtype=np.uint8).tobytes()
        blk = b"\x81" + struct.pack(">h", i) + b"\x00" + payload
        blocks += _ebml_el(0xA3, blk)
    cluster = _ebml_el(0x1F43B675, _ebml_uint(0xE7, 0) + blocks)
    return ebml + _ebml_el(0x18538067, info + tracks + cluster)


# acon: a trivially parseable PCM container standing in for wav/flac/mp3.
# Real audio decoding needs libsndfile/ffmpeg (absent here, see STUB_FMTS);
# the audio DEDUP pipeline still needs genuine per-window compute, so
# fixtures emit this container and the signature stage does REAL work on it
# (parse → PCM → band-energy fingerprint).  Two LOSSLESS codecs give the
# "re-encode" duplicate class its PNG-compression-level analog: codec 0 is
# raw little-endian int16, codec 1 stores wraparound int16 first-differences
# — different bytes, identical decoded samples.  The reference's audio
# handling is md5-only (non-image files, /root/reference/dupedb.py:92-101);
# waveform-level near-dup is part of this engine's training-data extension
# surface.

ACON_MAGIC = b"ACON1"
ACON_CODEC_RAW = 0
ACON_CODEC_DELTA = 1


def encode_acon(samples: np.ndarray, rate: int,
                codec: int = ACON_CODEC_RAW) -> bytes:
    """Pack a mono int16 PCM waveform into one container blob."""
    pcm = np.ascontiguousarray(samples, dtype="<i2")
    if codec == ACON_CODEC_DELTA:
        # wraparound first-difference: lossless, byte-distinct from raw
        pcm = np.diff(pcm.astype(np.int32), prepend=np.int32(0))
        pcm = (pcm & 0xFFFF).astype(np.uint16).astype("<u2")
    elif codec != ACON_CODEC_RAW:
        raise CodecError(f"unknown acon codec {codec}")
    return b"".join([ACON_MAGIC, struct.pack("<BII", codec, rate,
                                             len(samples)),
                     pcm.tobytes()])


def decode_acon(data: bytes) -> tuple[int, np.ndarray]:
    """Unpack an acon container into (sample_rate, int16 waveform).

    Raises CodecError for null/corrupt containers so the audio stages'
    dead-letter path matches the image/video decode taxonomy.
    """
    if data is None:
        raise CodecError("null payload")
    hdr = len(ACON_MAGIC) + 9
    if not data.startswith(ACON_MAGIC) or len(data) < hdr:
        raise CodecError("bad acon magic")
    codec, rate, n = struct.unpack_from("<BII", data, len(ACON_MAGIC))
    if not 0 < rate < (1 << 31):
        # a structurally valid container with an absurd declared rate must
        # dead-letter, not overflow the int32 sample_rate column downstream
        raise CodecError(f"bad acon rate {rate}")
    if len(data) != hdr + 2 * n:
        raise CodecError("truncated acon payload")
    raw = np.frombuffer(data, dtype="<u2", offset=hdr)
    if codec == ACON_CODEC_RAW:
        return rate, raw.view("<i2").astype(np.int16)
    if codec == ACON_CODEC_DELTA:
        return rate, (np.cumsum(raw.astype(np.uint32)) & 0xFFFF) \
            .astype(np.uint16).view(np.int16).astype(np.int16)
    raise CodecError(f"unknown acon codec {codec}")


# ---------------------------------------------------------------------------
# wav: RIFF/WAVE 16-bit PCM via the stdlib ``wave`` module — the first
# REAL-WORLD codec to flip stub→native (CODEC_CAPABILITIES).  The audio
# dedup pipeline's Haitsma-Kalker fingerprints run on the decoded PCM, so
# a wav re-encode of an acon recording (byte-distinct, sample-identical)
# lands in the same fp-set cluster.


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Mono int16 PCM → RIFF/WAVE bytes (stdlib ``wave`` writer)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE → (sample_rate, int16 mono waveform).

    16-bit PCM only (the overwhelmingly common web case); multi-channel
    input downmixes deterministically by integer-mean (sum // nch).
    Raises CodecError for anything else so the dead-letter taxonomy
    matches the other decode stages."""
    import io
    import wave

    if data is None:
        raise CodecError("null payload")
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            n = w.getnframes()
            if width != 2:
                raise CodecError(f"unsupported wav sample width {width}")
            if nch < 1:
                raise CodecError("wav has no channels")
            raw = w.readframes(n)
    except (wave.Error, EOFError, RuntimeError, ValueError,
            struct.error) as e:
        # CPython's wave/chunk modules raise bare RuntimeError (and
        # occasionally ValueError/struct.error) on malformed RIFF chunk
        # layouts — fuzz-confirmed; everything converts to the
        # dead-letter taxonomy
        raise CodecError(f"bad wav: {type(e).__name__}: {e}") from e
    if len(raw) % 2:
        # truncated mid-sample: np.frombuffer would ValueError out of the
        # dead-letter taxonomy (fuzz-found)
        raise CodecError("truncated wav frames (odd byte count)")
    pcm = np.frombuffer(raw, dtype="<i2")
    if len(pcm) != n * nch:
        raise CodecError("truncated wav frames")
    if nch > 1:
        pcm = (pcm.reshape(-1, nch).astype(np.int32).sum(axis=1)
               // nch).astype(np.int16)
    return rate, pcm.astype(np.int16)


def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    """Magic-byte audio dispatch: ACON1 container or RIFF/WAVE → (rate,
    int16 mono PCM).  One entry point so the signature stage and the
    Ray-free oracle sidecar can never drift on format routing."""
    if data is None:
        raise CodecError("null payload")
    if data.startswith(ACON_MAGIC):
        return decode_acon(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
    raise CodecError("unrecognized audio container")


# ---------------------------------------------------------------------------
# gif: GIF87a/89a with LZW decode (stdlib-feasible: the LZW dictionary
# walk is plain Python over small frames; palette mapping is numpy).  The
# decoder restores TRUE animated-image semantics end-to-end: frame count
# feeds the animation-wins quality rule, and the strict switch routes
# multi-frame gifs to md5 (strict) or frame-0 dHash (non-strict) exactly
# like the reference's framesInImage gate (/root/reference/dupedb.py:82-86).
# The encoder (fixture side) emits GIF89a with a global palette and real
# LZW codes (dictionary kept below 12 bits with periodic clears).


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """GIF-flavor LZW: variable-width codes, LSB-first bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # dictionary as a list of bytes entries
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                # missing explicit END code: tolerate (common in the wild)
                return bytes(out[:n_expected])
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise CodecError("bad gif lzw: first code not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise CodecError("bad gif lzw: code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        if len(out) >= n_expected:
            return bytes(out[:n_expected])
    return bytes(out[:n_expected])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real LZW with a fresh-dictionary clear whenever the table fills
    (keeps codes ≤ 12 bits, the GIF maximum)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        if next_code < (1 << 12):
            table[wc] = next_code
            if next_code == (1 << code_size):
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: list[np.ndarray], delay_cs: int = 10) -> bytes:
    """RGB frames → GIF89a with ONE global palette built from the union
    of colors (≤ 256 distinct across all frames, or CodecError — fixture
    images are drawn indexed by construction)."""
    if not frames:
        raise CodecError("no frames")
    h, w = frames[0].shape[:2]
    stack = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stack, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise CodecError(f"gif palette overflow: {len(palette)} colors")
    pal = np.zeros((256, 3), np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # gct, 256 entries
    out += pal.tobytes()
    if len(frames) > 1:
        # NETSCAPE looping application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    idx_all = inverse.astype(np.uint8)
    off = 0
    for f in frames:
        fh, fw = f.shape[:2]
        if (fh, fw) != (h, w):
            raise CodecError("gif frames must share dimensions")
        n = fh * fw
        indices = idx_all[off:off + n].tobytes()
        off += n
        if len(frames) > 1:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, fw, fh, 0)
        mcs = 8
        out.append(mcs)
        lzw = _lzw_encode(indices, mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def _gif_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    n = len(data)
    while True:
        if pos >= n:
            raise CodecError("truncated gif sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        if pos + ln > n:
            raise CodecError("truncated gif sub-block payload")
        parts.append(data[pos:pos + ln])
        pos += ln


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_first(data: bytes) -> tuple[np.ndarray, int]:
    """(first frame as full-logical-screen RGB, total frame count).

    Frame 0 composes onto a background canvas of the logical screen
    (background = palette's bg index; transparency indices paste as their
    palette color — deterministic, and both the engine and the Ray-free
    oracle share this kernel so they can never drift).  Later frames are
    only COUNTED (their LZW data is skipped sub-block-wise) — exactly
    what framesInImage needs (/root/reference/dupedb.py:82)."""
    if data is None:
        raise CodecError("null payload")
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise CodecError("not a gif")
    try:
        w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    except struct.error as e:
        raise CodecError(f"bad gif header: {e}") from e
    if w <= 0 or h <= 0:
        raise CodecError(f"bad gif dims {w}x{h}")
    if w * h > MAX_DECODE_PIXELS:
        raise CodecError(f"decompression bomb: gif header {w}x{h}")
    pos = 13
    gct = None
    if flags & 0x80:
        sz = 2 << (flags & 7)
        gct = np.frombuffer(data[pos:pos + 3 * sz], np.uint8)
        if len(gct) != 3 * sz:
            raise CodecError("truncated gif global color table")
        gct = gct.reshape(sz, 3)
        pos += 3 * sz
    n_frames = 0
    first: np.ndarray | None = None
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            if pos + 2 > n:
                raise CodecError("truncated gif extension")
            _blob, pos = _gif_subblocks(data, pos + 2)
            continue
        if b != 0x2C:
            raise CodecError(f"bad gif block 0x{b:02x}")
        try:
            il, it, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        except struct.error as e:
            raise CodecError(f"bad gif image descriptor: {e}") from e
        pos += 10
        lct = None
        if iflags & 0x80:
            sz = 2 << (iflags & 7)
            lct = np.frombuffer(data[pos:pos + 3 * sz], np.uint8)
            if len(lct) != 3 * sz:
                raise CodecError("truncated gif local color table")
            lct = lct.reshape(sz, 3)
            pos += 3 * sz
        if pos >= n:
            raise CodecError("truncated gif image data")
        mcs = data[pos]
        # GIF's real maximum is 8 (256-entry palettes): 9-11 would make
        # _lzw_decode build literal table entries ≥ 256 and raise a raw
        # ValueError past the dead-letter taxonomy (review-found)
        if not 2 <= mcs <= 8:
            raise CodecError(f"bad gif lzw min code size {mcs}")
        lzw, pos = _gif_subblocks(data, pos + 1)
        n_frames += 1
        if first is not None:
            continue  # later frames: counted only
        if iw <= 0 or ih <= 0 or il + iw > w or it + ih > h:
            raise CodecError("gif frame outside logical screen")
        pal = lct if lct is not None else gct
        if pal is None:
            raise CodecError("gif frame has no color table")
        idx = np.frombuffer(
            _lzw_decode(lzw, mcs, iw * ih), np.uint8)
        if len(idx) < iw * ih:
            raise CodecError("gif frame pixel data short")
        if idx.max(initial=0) >= len(pal):
            raise CodecError("gif index beyond palette")
        frame = pal[idx].reshape(ih, iw, 3)
        if iflags & 0x40:  # interlaced: reorder stored rows to display rows
            frame = frame[_deinterlace_order(ih)]
        canvas = np.empty((h, w, 3), np.uint8)
        bgc = (gct[bg] if gct is not None and bg < len(gct)
               else np.zeros(3, np.uint8))
        canvas[:, :] = bgc
        canvas[it:it + ih, il:il + iw] = frame
        first = canvas
    if first is None:
        raise CodecError("gif has no image frames")
    return first, n_frames


def _deinterlace_order(ih: int) -> np.ndarray:
    """Row permutation mapping stored (pass-ordered) rows to display rows:
    result[y] = stored row index holding display row y."""
    order = np.empty(ih, np.int64)
    r = 0
    for start, step in _GIF_INTERLACE:
        for y in range(start, ih, step):
            order[y] = r
            r += 1
    return order
