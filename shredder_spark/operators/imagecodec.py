"""Pure-Python (numpy + stdlib zlib) image codecs for the multimodal
tier (B76).

This container has no media libraries, so the "real codec" slot of
``operators/multimodal.py`` was previously fillable only where Pillow
exists. PNG and BMP, however, need nothing beyond ``zlib`` (inflate)
and ``struct`` — both published, stable formats (PNG: RFC 2083 /
ISO 15948; BMP: the Windows BITMAPINFOHEADER layout) — so this module
implements them directly and the default decoder is REAL in every
environment. Pillow remains the tier for richer formats (JPEG, WebP,
TIFF): ``decode_image`` sniffs magic bytes and falls back to it when
importable.

Decode support (covers everything our encoder and common tooling
emit):

- PNG: bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); all five scanline filters (None / Sub /
  Up / Average / Paeth); non-interlaced. Adam7 raises a clear error.
- BMP: uncompressed BITMAPINFOHEADER (or larger V4/V5 headers),
  24-bit BGR and 32-bit BGRA, bottom-up and top-down rows, 4-byte
  row padding; 8-bit palette rows.

Scale posture: these run inside the same ``mapInPandas`` stages as
the injected production codecs — payload bytes never shuffle, one
Python call per image per Arrow batch. Un-filtering is numpy per
scanline (Sub via modular cumsum; Average/Paeth are inherently
sequential per pixel and stay scalar loops — PNG's own data
dependency, not a plumbing choice). For JPEG-heavy 100 TB corpora,
inject a native decoder; the contract (``{"width", "height",
"mean_luma"}``) is identical.

Luma uses Pillow's exact fixed-point ITU-R 601-2 coefficients
(``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16``), so the pure tier
and the Pillow tier agree bit-for-bit on the same pixels (pinned
env-gated in tests).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PIL ImagingConvert.c L24(rgb) coefficients (ITU-R 601-2 fixed point)
_L_R, _L_G, _L_B = 19595, 38470, 7471


def luma_u8(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) uint8 RGB → uint8 luma, Pillow-exact rounding."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((r * _L_R + g * _L_G + b * _L_B + 0x8000) >> 16).astype(np.uint8)


# ------------------------------------------------------------------ PNG


def _png_chunks(data: bytes):
    pos = len(PNG_MAGIC)
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        yield ctype, body
        pos += 12 + length                       # len + type + body + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """PNG scanline reconstruction → (height, stride) uint8."""
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ft = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1)
        pos += 1 + stride
        if ft == 0:                              # None
            rec = line.astype(np.int32)
        elif ft == 1:                            # Sub: modular cumsum
            rec = np.empty(stride, dtype=np.uint8)
            for r in range(bpp):
                np.cumsum(line[r::bpp], dtype=np.uint8, out=rec[r::bpp])
            rec = rec.astype(np.int32)
        elif ft == 2:                            # Up
            rec = (line.astype(np.int32) + prev) & 0xFF
        elif ft == 3:                            # Average
            rec = line.astype(np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:                            # Paeth
            rec = line.astype(np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ft} on row {y}")
        prev = rec
        out[y] = rec.astype(np.uint8)
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (width, height, (h, w, 3) uint8 RGB). Alpha is dropped (the
    feature contract is geometry + luma); palette is resolved."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("PNG: bad signature")
    width = height = None
    color_type = None
    palette = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if bit_depth != 8:
                raise ValueError(
                    f"PNG: bit depth {bit_depth} unsupported (8 only)")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"PNG: color type {color_type} unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("PNG: nonzero compression/filter method")
            if interlace != 0:
                raise ValueError("PNG: Adam7 interlacing unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise ValueError("PNG: missing IHDR")
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG: IDAT size mismatch")
    px = _unfilter(raw, height, stride, channels).reshape(
        height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        rgb = palette[px[:, :, 0]]
    elif channels == 1:                          # gray
        rgb = np.repeat(px, 3, axis=2)
    elif channels == 2:                          # gray + alpha
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    elif channels == 4:                          # RGBA
        rgb = px[:, :, :3]
    else:
        rgb = px
    return width, height, np.ascontiguousarray(rgb)


def encode_png(rgb: np.ndarray, *, filter_type: int = 0) -> bytes:
    """(h, w, 3) or (h, w) uint8 → PNG bytes. ``filter_type`` applies
    one scanline filter uniformly (0-4) — the decoder-exercise knob
    the golden tests use; 0 is the plain fast path."""
    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
        color_type, channels = 0, 1
    elif arr.shape[2] == 3:
        color_type, channels = 2, 3
    elif arr.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError("encode_png: need (h,w), (h,w,3) or (h,w,4)")
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * channels).astype(np.int32)
    bpp = channels
    lines = bytearray()
    prev = np.zeros(w * channels, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.zeros_like(cur)
            left[bpp:] = cur[:-bpp]
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.zeros_like(cur)
            left[bpp:] = cur[:-bpp]
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            left = np.zeros_like(cur)
            left[bpp:] = cur[:-bpp]
            ul = np.zeros_like(prev)
            ul[bpp:] = prev[:-bpp]
            p = left + prev - ul
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - ul))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = (cur - pred) & 0xFF
        else:
            raise ValueError("filter_type must be 0-4")
        lines.append(filter_type)
        lines += enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b""))


# ------------------------------------------------------------------ BMP


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (width, height, (h, w, 3) uint8 RGB), rows top-down."""
    if data[:2] != b"BM":
        raise ValueError("BMP: bad signature")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"BMP: header size {hdr_size} unsupported "
                         "(BITMAPINFOHEADER or later only)")
    width, height_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS(=raw for 32)
        raise ValueError(f"BMP: compression {compression} unsupported")
    if compression == 3:
        # BI_BITFIELDS: the pixel layout is whatever the channel masks
        # say. This decoder's fast path assumes the default BGR(A)
        # layout — honor that only when the masks actually match it,
        # and fail loudly otherwise instead of silently swapping
        # channels (round-6 ADVICE: a nonstandard-mask BMP would have
        # decoded with R and B exchanged, corrupting mean_luma with no
        # error). Masks sit right after the 40-byte info header (or
        # inside it for BITMAPV2+ headers, same offset either way).
        r_mask, g_mask, b_mask = struct.unpack_from("<III", data, 14 + 40)
        if (r_mask, g_mask, b_mask) != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise ValueError(
                "BMP: BI_BITFIELDS with non-default channel masks "
                f"(R={r_mask:#010x} G={g_mask:#010x} B={b_mask:#010x}) "
                "unsupported — default BGRA masks only")
    top_down = height_raw < 0
    height = abs(height_raw)
    if bpp == 8:
        (colors_used,) = struct.unpack_from("<I", data, 46)
        n_colors = colors_used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data, dtype=np.uint8, count=n_colors * 4,
                            offset=pal_off).reshape(-1, 4)
        palette = pal[:, 2::-1]                  # BGRX → RGB
        row_bytes = (width + 3) & ~3
        rows = np.frombuffer(data, dtype=np.uint8,
                             count=row_bytes * height,
                             offset=pixel_off).reshape(height, row_bytes)
        idx = rows[:, :width]
        rgb = palette[idx]
    elif bpp in (24, 32):
        ch = bpp // 8
        row_bytes = (width * ch + 3) & ~3
        rows = np.frombuffer(data, dtype=np.uint8,
                             count=row_bytes * height,
                             offset=pixel_off).reshape(height, row_bytes)
        px = rows[:, :width * ch].reshape(height, width, ch)
        rgb = px[:, :, 2::-1]                    # BGR(A) → RGB
    else:
        raise ValueError(f"BMP: {bpp}-bit unsupported (8/24/32 only)")
    if not top_down:
        rgb = rgb[::-1]
    return width, height, np.ascontiguousarray(rgb)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP."""
    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, :w * 3] = arr[::-1, :, 2::-1].reshape(h, w * 3)  # RGB→BGR, flip
    pixels = body.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                      2835, 2835, 0, 0)
    off = 14 + len(dib)
    filehdr = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    return filehdr + dib + pixels


# ------------------------------------------------------------ dispatch


def decode_image(content: bytes) -> tuple[int, int, np.ndarray]:
    """Sniff magic bytes → (width, height, RGB array). PNG and BMP
    decode here with no dependencies; anything else falls back to
    Pillow when importable, with a clear error otherwise."""
    if content.startswith(PNG_MAGIC):
        return decode_png(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    try:
        import io

        from PIL import Image
    except ImportError:
        sig = content[:4].hex()
        raise NotImplementedError(
            f"image format with signature 0x{sig} needs Pillow (only "
            "PNG/BMP decode dependency-free); install Pillow or inject "
            "a decoder via decoder=") from None
    with Image.open(io.BytesIO(content)) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
        return im.width, im.height, rgb


def image_decoder(content: bytes) -> dict:
    """REAL default decoder for ``extract_image_features``: same
    contract as the Pillow tier ({width, height, mean_luma}), PNG/BMP
    decoded dependency-free, luma bit-identical to Pillow's L mode."""
    width, height, rgb = decode_image(bytes(content))
    return {
        "width": width,
        "height": height,
        "mean_luma": float(np.mean(luma_u8(rgb))),
    }


def image_resizer(content: bytes, width: int, height: int) -> bytes:
    """REAL default resizer: nearest-neighbor sample (numpy fancy
    indexing — Pillow's NEAREST semantics: src index floor(dst * scale))
    re-encoded as PNG. Inject a codec-backed resizer for JPEG output
    or smoother kernels; the contract (bytes → bytes) is identical."""
    w0, h0, rgb = decode_image(bytes(content))
    ys = (np.arange(height) * h0 // height).clip(0, h0 - 1)
    xs = (np.arange(width) * w0 // width).clip(0, w0 - 1)
    return encode_png(rgb[np.ix_(ys, xs)])
