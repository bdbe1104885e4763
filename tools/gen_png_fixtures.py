#!/usr/bin/env python3
"""Generate FOREIGN PNG conformance fixtures with libpng (full API via
ctypes): Adam7-interlaced truecolor/gray/palette and sub-byte palette
forms, each with its exact expected RGB raster — bit-exact verification
that MultimodalOps.decodePng reads the public spec correctly (the
brotli/zstd fixture discipline applied to the legacy PNG forms).

Outputs: src/test/resources/png/fixture_<name>.{png,raw}
  .raw = width(2 BE) height(2 BE) then RGB row-major top-down.
"""
import ctypes, os
from ctypes import (c_void_p, c_char_p, c_int, c_uint, c_size_t, c_ubyte,
                    POINTER, CFUNCTYPE, byref)

L = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libpng16.so.16")
L.png_get_libpng_ver.restype = c_char_p
L.png_create_write_struct.restype = c_void_p
L.png_create_write_struct.argtypes = [c_char_p, c_void_p, c_void_p, c_void_p]
L.png_create_info_struct.restype = c_void_p
L.png_create_info_struct.argtypes = [c_void_p]
L.png_set_write_fn.argtypes = [c_void_p, c_void_p, c_void_p, c_void_p]
L.png_set_IHDR.argtypes = [c_void_p, c_void_p, c_uint, c_uint, c_int,
                           c_int, c_int, c_int, c_int]
L.png_set_PLTE.argtypes = [c_void_p, c_void_p, c_void_p, c_int]
L.png_set_rows.argtypes = [c_void_p, c_void_p, POINTER(c_void_p)]
L.png_set_tRNS.argtypes = [c_void_p, c_void_p, c_void_p, c_int, c_void_p]
L.png_write_png.argtypes = [c_void_p, c_void_p, c_int, c_void_p]
L.png_destroy_write_struct.argtypes = [POINTER(c_void_p), POINTER(c_void_p)]

WRITE_CB = CFUNCTYPE(None, c_void_p, POINTER(c_ubyte), c_size_t)
FLUSH_CB = CFUNCTYPE(None, c_void_p)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRES = os.path.join(ROOT, "src/test/resources/png")
os.makedirs(TRES, exist_ok=True)

PNG_COLOR_GRAY, PNG_COLOR_RGB, PNG_COLOR_PALETTE = 0, 2, 3
PNG_INTERLACE_NONE, PNG_INTERLACE_ADAM7 = 0, 1


class Color16(ctypes.Structure):
    _fields_ = [("index", c_ubyte), ("red", ctypes.c_uint16),
                ("green", ctypes.c_uint16), ("blue", ctypes.c_uint16),
                ("gray", ctypes.c_uint16)]


def write_png(w, h, color, depth, interlace, rows_bytes, palette=None,
              trns_alpha=None, trns_color=None):
    """rows_bytes: list of h packed scanline byte strings."""
    out = bytearray()

    def wcb(_p, data, n):
        out.extend(bytes(data[:n]))

    wcb_c = WRITE_CB(wcb)
    fcb_c = FLUSH_CB(lambda _p: None)
    png = L.png_create_write_struct(L.png_get_libpng_ver(None), None, None, None)
    info = L.png_create_info_struct(png)
    L.png_set_write_fn(png, None, wcb_c, fcb_c)
    L.png_set_IHDR(png, info, w, h, depth, color, interlace, 0, 0)
    if palette is not None:
        pal = (c_ubyte * len(palette))(*palette)
        L.png_set_PLTE(png, info, pal, len(palette) // 3)
    if trns_alpha is not None:
        ta = (c_ubyte * len(trns_alpha))(*trns_alpha)
        L.png_set_tRNS(png, info, ctypes.cast(ta, c_void_p),
                       len(trns_alpha), None)
    if trns_color is not None:
        L.png_set_tRNS(png, info, None, 0,
                       ctypes.cast(byref(trns_color), c_void_p))
    row_ptrs = (c_void_p * h)()
    row_bufs = []
    for i, rb in enumerate(rows_bytes):
        buf = (c_ubyte * len(rb))(*rb)
        row_bufs.append(buf)
        row_ptrs[i] = ctypes.cast(buf, c_void_p)
    L.png_set_rows(png, info, row_ptrs)
    L.png_write_png(png, info, 0, None)
    pp, ip = c_void_p(png), c_void_p(info)
    L.png_destroy_write_struct(byref(pp), byref(ip))
    return bytes(out)


def save(name, w, h, png_bytes, rgb):
    with open(os.path.join(TRES, f"fixture_{name}.png"), "wb") as f:
        f.write(png_bytes)
    with open(os.path.join(TRES, f"fixture_{name}.raw"), "wb") as f:
        f.write(bytes([w >> 8, w & 255, h >> 8, h & 255]) + bytes(rgb))
    print(f"{name}: {w}x{h} png={len(png_bytes)}B")


def gen_rgb(name, w, h, interlace):
    rgb = []
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            r, g, b = (3 * x + 7 * y) % 256, (5 * x + y + 11) % 256, (x * y + 2) % 256
            row += bytes((r, g, b))
            rgb += [r, g, b]
        rows.append(bytes(row))
    save(name, w, h, write_png(w, h, PNG_COLOR_RGB, 8, interlace, rows), rgb)


def gen_gray(name, w, h, interlace):
    rgb = []
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            g = (11 * x + 13 * y + 5) % 256
            row.append(g)
            rgb += [g, g, g]
        rows.append(bytes(row))
    save(name, w, h, write_png(w, h, PNG_COLOR_GRAY, 8, interlace, rows), rgb)


def gen_palette(name, w, h, depth, interlace):
    ncolors = 1 << depth
    palette = []
    for j in range(ncolors):
        palette += [(37 * j + 5) % 256, (11 * j + 90) % 256, (53 * j) % 256]
    rgb = []
    rows = []
    for y in range(h):
        row = bytearray((w * depth + 7) // 8)
        for x in range(w):
            idx = (x + 2 * y) % ncolors
            bit = x * depth
            row[bit >> 3] |= (idx << (8 - depth - (bit & 7))) & 0xFF
            rgb += palette[idx * 3:idx * 3 + 3]
        rows.append(bytes(row))
    save(name, w, h,
         write_png(w, h, PNG_COLOR_PALETTE, depth, interlace, rows, palette),
         rgb)


def gen_gray_lowbit(name, w, h, depth, interlace):
    """Sub-8-bit grayscale: levels scale onto 0..255 by 255/(2^d-1)."""
    maxv = (1 << depth) - 1
    scale = 255 // maxv
    rgb = []
    rows = []
    for y in range(h):
        row = bytearray((w * depth + 7) // 8)
        for x in range(w):
            lvl = (x + 2 * y) % (maxv + 1)
            bit = x * depth
            row[bit >> 3] |= (lvl << (8 - depth - (bit & 7))) & 0xFF
            g = lvl * scale
            rgb += [g, g, g]
        rows.append(bytes(row))
    save(name, w, h,
         write_png(w, h, PNG_COLOR_GRAY, depth, interlace, rows), rgb)


def gen_16bit(name, w, h, color, interlace):
    """16-bit samples (big-endian); expected output is the HIGH byte
    (the libpng strip-16 reduction)."""
    rgb = []
    rows = []
    nchan = 3 if color == PNG_COLOR_RGB else 1
    for y in range(h):
        row = bytearray()
        for x in range(w):
            if nchan == 3:
                vals = [(7 * x + 13 * y + 5) * 257 % 65536,
                        (11 * x + 3 * y + 99) * 251 % 65536,
                        (x * y + 31) * 241 % 65536]
            else:
                vals = [(29 * x + 57 * y + 11) * 509 % 65536]
            for v in vals:
                row += bytes(((v >> 8) & 255, v & 255))
            hi = [(v >> 8) & 255 for v in vals]
            rgb += hi * (3 // len(hi))
        rows.append(bytes(row))
    save(name, w, h, write_png(w, h, color, 16, interlace, rows), rgb)


def gen_alpha(name, w, h, interlace, gray):
    """RGBA (color 6) / gray+alpha (color 4): expected RGB drops alpha."""
    PNG_COLOR_GA, PNG_COLOR_RGBA = 4, 6
    rgb = []
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            a = (3 * x + y + 7) % 256
            if gray:
                g = (11 * x + 5 * y + 23) % 256
                row += bytes((g, a))
                rgb += [g, g, g]
            else:
                r, gg, b = (x * 5 + y) % 256, (x + y * 9 + 4) % 256, (x * x + y) % 256
                row += bytes((r, gg, b, a))
                rgb += [r, gg, b]
        rows.append(bytes(row))
    save(name, w, h, write_png(
        w, h, PNG_COLOR_GA if gray else PNG_COLOR_RGBA, 8, interlace, rows), rgb)


def save_a(name, w, h, png_bytes, rgb, alpha):
    """tRNS fixtures: .raw = dims + RGB rows + the ALPHA plane."""
    with open(os.path.join(TRES, f"fixture_{name}.png"), "wb") as f:
        f.write(png_bytes)
    with open(os.path.join(TRES, f"fixture_{name}.raw"), "wb") as f:
        f.write(bytes([w >> 8, w & 255, h >> 8, h & 255]) +
                bytes(rgb) + bytes(alpha))
    print(f"{name}: {w}x{h} png={len(png_bytes)}B (+alpha)")


def gen_palette_trns(name, w, h, depth, interlace, ntrans):
    ncolors = 1 << depth
    palette = []
    for j in range(ncolors):
        palette += [(37 * j + 5) % 256, (11 * j + 90) % 256, (53 * j) % 256]
    trans = [(29 * j) % 256 for j in range(ntrans)]
    rgb, alpha, rows = [], [], []
    for y in range(h):
        row = bytearray((w * depth + 7) // 8)
        for x in range(w):
            idx = (x + 2 * y) % ncolors
            bit = x * depth
            row[bit >> 3] |= (idx << (8 - depth - (bit & 7))) & 0xFF
            rgb += palette[idx * 3:idx * 3 + 3]
            alpha.append(trans[idx] if idx < ntrans else 255)
        rows.append(bytes(row))
    save_a(name, w, h,
           write_png(w, h, PNG_COLOR_PALETTE, depth, interlace, rows,
                     palette, trns_alpha=trans), rgb, alpha)


def gen_gray_trns(name, w, h, key):
    rgb, alpha, rows = [], [], []
    for y in range(h):
        row = bytearray(w)
        for x in range(w):
            g = (x * 3 + y * 5) % 256
            row[x] = g
            rgb += [g, g, g]
            alpha.append(0 if g == key else 255)
        rows.append(bytes(row))
    c16 = Color16(gray=key)
    save_a(name, w, h,
           write_png(w, h, PNG_COLOR_GRAY, 8, PNG_INTERLACE_NONE, rows,
                     trns_color=c16), rgb, alpha)


def gen_rgb_trns(name, w, h, kr, kg, kb):
    rgb, alpha, rows = [], [], []
    for y in range(h):
        row = bytearray(w * 3)
        for x in range(w):
            r, g, b = (x * 7) % 256, (y * 11) % 256, (x + y) % 256
            row[x * 3:x * 3 + 3] = bytes([r, g, b])
            rgb += [r, g, b]
            alpha.append(0 if (r, g, b) == (kr, kg, kb) else 255)
        rows.append(bytes(row))
    c16 = Color16(red=kr, green=kg, blue=kb)
    save_a(name, w, h,
           write_png(w, h, PNG_COLOR_RGB, 8, PNG_INTERLACE_NONE, rows,
                     trns_color=c16), rgb, alpha)


if __name__ == "__main__":
    # odd dims so Adam7 passes have ragged widths; 3x3 leaves passes empty
    gen_rgb("rgb_adam7_13x7", 13, 7, PNG_INTERLACE_ADAM7)
    gen_rgb("rgb_adam7_3x3", 3, 3, PNG_INTERLACE_ADAM7)
    gen_rgb("rgb_adam7_32x24", 32, 24, PNG_INTERLACE_ADAM7)
    gen_gray("gray_adam7_17x9", 17, 9, PNG_INTERLACE_ADAM7)
    gen_palette("pal8_19x11", 19, 11, 8, PNG_INTERLACE_NONE)
    gen_palette("pal4_19x11", 19, 11, 4, PNG_INTERLACE_NONE)
    gen_palette("pal2_19x11", 19, 11, 2, PNG_INTERLACE_NONE)
    gen_palette("pal1_19x11", 19, 11, 1, PNG_INTERLACE_NONE)
    gen_palette("pal8_adam7_13x7", 13, 7, 8, PNG_INTERLACE_ADAM7)
    gen_palette("pal4_adam7_13x7", 13, 7, 4, PNG_INTERLACE_ADAM7)
    gen_palette("pal1_adam7_9x5", 9, 5, 1, PNG_INTERLACE_ADAM7)
    # round-18 extension: sub-8-bit gray + 16-bit forms
    gen_gray_lowbit("gray1_21x9", 21, 9, 1, PNG_INTERLACE_NONE)
    gen_gray_lowbit("gray2_21x9", 21, 9, 2, PNG_INTERLACE_NONE)
    gen_gray_lowbit("gray4_21x9", 21, 9, 4, PNG_INTERLACE_NONE)
    gen_gray_lowbit("gray4_adam7_13x7", 13, 7, 4, PNG_INTERLACE_ADAM7)
    gen_16bit("gray16_19x11", 19, 11, PNG_COLOR_GRAY, PNG_INTERLACE_NONE)
    gen_16bit("rgb16_19x11", 19, 11, PNG_COLOR_RGB, PNG_INTERLACE_NONE)
    gen_16bit("rgb16_adam7_13x7", 13, 7, PNG_COLOR_RGB, PNG_INTERLACE_ADAM7)
    # alpha forms (the modern-web norm): color kept, alpha dropped
    gen_alpha("rgba8_19x11", 19, 11, PNG_INTERLACE_NONE, gray=False)
    gen_alpha("rgba8_adam7_13x7", 13, 7, PNG_INTERLACE_ADAM7, gray=False)
    gen_alpha("graya8_17x9", 17, 9, PNG_INTERLACE_NONE, gray=True)
    # round-19 extension: tRNS transparency (palette table, gray key,
    # RGB key) — .raw carries the expected ALPHA plane after the RGB
    gen_palette_trns("pal4_trns_19x11", 19, 11, 4, PNG_INTERLACE_NONE, 8)
    gen_palette_trns("pal8_trns_adam7_13x7", 13, 7, 8,
                     PNG_INTERLACE_ADAM7, 100)
    gen_gray_trns("gray8_trns_17x9", 17, 9, key=33)
    gen_rgb_trns("rgb8_trns_13x7", 13, 7, kr=14, kg=22, kb=3)
