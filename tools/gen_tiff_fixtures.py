#!/usr/bin/env python3
"""Generate FOREIGN TIFF compression fixtures with libtiff via ctypes:
LZW (with strips long enough to cross the 9->10->11-bit early-change
width bumps) and PackBits gray-8 strips, each with the exact expected
raster — bit-exact verification that TiffOps' strip decompressors read
the public spec the way the reference implementation writes it.

Outputs: src/test/resources/tiff/fixture_<name>.{tif,raw}
  .raw = width(2 BE) height(2 BE) then gray bytes row-major.
"""
import ctypes, os

T = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libtiff.so.6")
T.TIFFOpen.restype = ctypes.c_void_p
T.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
T.TIFFWriteEncodedStrip.restype = ctypes.c_long
T.TIFFWriteEncodedStrip.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                    ctypes.c_void_p, ctypes.c_long]
T.TIFFClose.argtypes = [ctypes.c_void_p]

TAG_WIDTH, TAG_LENGTH, TAG_BPS, TAG_COMP = 256, 257, 258, 259
TAG_PHOTO, TAG_SPP, TAG_ROWSPERSTRIP, TAG_PLANAR = 262, 277, 278, 284
COMP_LZW, COMP_PACKBITS = 5, 32773

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRES = os.path.join(ROOT, "src/test/resources/tiff")
os.makedirs(TRES, exist_ok=True)


def set_u32(tif, tag, v):
    T.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.c_uint32(v))


def gen(name, w, h, comp, pix, rps=None):
    data = bytes(pix(x, y) for y in range(h) for x in range(w))
    path = os.path.join(TRES, f"fixture_{name}.tif")
    tif = T.TIFFOpen(path.encode(), b"w")
    assert tif, name
    set_u32(tif, TAG_WIDTH, w)
    set_u32(tif, TAG_LENGTH, h)
    set_u32(tif, TAG_BPS, 8)
    set_u32(tif, TAG_SPP, 1)
    set_u32(tif, TAG_COMP, comp)
    set_u32(tif, TAG_PHOTO, 1)  # min-is-black
    set_u32(tif, TAG_PLANAR, 1)
    set_u32(tif, TAG_ROWSPERSTRIP, rps or h)
    if rps:  # multi-strip: one encoded strip per band
        nstrips = (h + rps - 1) // rps
        for si in range(nstrips):
            band = data[si * rps * w:min((si + 1) * rps, h) * w]
            n = T.TIFFWriteEncodedStrip(tif, si, band, len(band))
            assert n == len(band), (name, si, n)
    else:
        n = T.TIFFWriteEncodedStrip(tif, 0, data, len(data))
        assert n == len(data), (name, n)
    T.TIFFClose(tif)
    with open(os.path.join(TRES, f"fixture_{name}.raw"), "wb") as f:
        f.write(bytes([w >> 8, w & 255, h >> 8, h & 255]) + data)
    print(f"{name}: {w}x{h} comp={comp} tif={os.path.getsize(path)}B")


def gen_pred(name, w, h, pix):
    """LZW + predictor 2 (horizontal differencing) — the real-world
    writer default pairing."""
    data = bytes(pix(x, y) for y in range(h) for x in range(w))
    path = os.path.join(TRES, f"fixture_{name}.tif")
    tif = T.TIFFOpen(path.encode(), b"w")
    assert tif, name
    set_u32(tif, TAG_WIDTH, w)
    set_u32(tif, TAG_LENGTH, h)
    set_u32(tif, TAG_BPS, 8)
    set_u32(tif, TAG_SPP, 1)
    set_u32(tif, TAG_COMP, COMP_LZW)
    set_u32(tif, TAG_PHOTO, 1)
    set_u32(tif, TAG_PLANAR, 1)
    set_u32(tif, TAG_ROWSPERSTRIP, h)
    set_u32(tif, 317, 2)  # TIFFTAG_PREDICTOR = horizontal differencing
    n = T.TIFFWriteEncodedStrip(tif, 0, data, len(data))
    assert n == len(data), (name, n)
    T.TIFFClose(tif)
    with open(os.path.join(TRES, f"fixture_{name}.raw"), "wb") as f:
        f.write(bytes([w >> 8, w & 255, h >> 8, h & 255]) + data)
    print(f"{name}: {w}x{h} lzw+pred2 tif={os.path.getsize(path)}B")


def gen_rgb(name, w, h, comp, pix3, pred=None, rps=None):
    """RGB (SamplesPerPixel 3, chunky) strips; predictor 2 differences
    per COMPONENT when set."""
    data = bytes(v for y in range(h) for x in range(w) for v in pix3(x, y))
    path = os.path.join(TRES, f"fixture_{name}.tif")
    tif = T.TIFFOpen(path.encode(), b"w")
    assert tif, name
    set_u32(tif, TAG_WIDTH, w)
    set_u32(tif, TAG_LENGTH, h)
    set_u32(tif, TAG_BPS, 8)
    set_u32(tif, TAG_SPP, 3)
    set_u32(tif, TAG_COMP, comp)
    set_u32(tif, TAG_PHOTO, 2)  # RGB
    set_u32(tif, TAG_PLANAR, 1)  # chunky
    set_u32(tif, TAG_ROWSPERSTRIP, rps or h)
    if pred:
        set_u32(tif, 317, pred)
    if rps:
        nstrips = (h + rps - 1) // rps
        for si in range(nstrips):
            band = data[si * rps * w * 3:min((si + 1) * rps, h) * w * 3]
            n = T.TIFFWriteEncodedStrip(tif, si, band, len(band))
            assert n == len(band), (name, si, n)
    else:
        n = T.TIFFWriteEncodedStrip(tif, 0, data, len(data))
        assert n == len(data), (name, n)
    T.TIFFClose(tif)
    with open(os.path.join(TRES, f"fixture_{name}.raw"), "wb") as f:
        f.write(bytes([w >> 8, w & 255, h >> 8, h & 255]) + data)
    print(f"{name}: {w}x{h} rgb comp={comp} pred={pred} "
          f"tif={os.path.getsize(path)}B")


def gen_tiled(name, w, h, comp, spp, pix, pred=None, tw=16, tl=16):
    """TILED layout (TileWidth/TileLength, TIFFWriteEncodedTile):
    edge tiles padded by libtiff; .raw holds the UNPADDED raster."""
    path = os.path.join(TRES, f"fixture_{name}.tif")
    tif = T.TIFFOpen(path.encode(), b"w")
    assert tif, name
    set_u32(tif, TAG_WIDTH, w)
    set_u32(tif, TAG_LENGTH, h)
    set_u32(tif, TAG_BPS, 8)
    set_u32(tif, TAG_SPP, spp)
    set_u32(tif, TAG_COMP, comp)
    set_u32(tif, TAG_PHOTO, 2 if spp == 3 else 1)
    set_u32(tif, TAG_PLANAR, 1)
    set_u32(tif, 322, tw)  # TIFFTAG_TILEWIDTH
    set_u32(tif, 323, tl)  # TIFFTAG_TILELENGTH
    if pred:
        set_u32(tif, 317, pred)
    T.TIFFWriteEncodedTile.restype = ctypes.c_long
    T.TIFFWriteEncodedTile.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                       ctypes.c_void_p, ctypes.c_long]
    across = (w + tw - 1) // tw
    down = (h + tl - 1) // tl
    for ty in range(down):
        for tx in range(across):
            tile = bytearray(tw * tl * spp)
            for y in range(tl):
                for x in range(tw):
                    gx, gy = tx * tw + x, ty * tl + y
                    if gx < w and gy < h:
                        px = pix(gx, gy)
                        for c in range(spp):
                            tile[(y * tw + x) * spp + c] = px[c]
            ti = ty * across + tx
            n = T.TIFFWriteEncodedTile(tif, ti, bytes(tile), len(tile))
            assert n == len(tile), (name, ti, n)
    T.TIFFClose(tif)
    data = bytes(v for y in range(h) for x in range(w) for v in pix(x, y))
    with open(os.path.join(TRES, f"fixture_{name}.raw"), "wb") as f:
        f.write(bytes([w >> 8, w & 255, h >> 8, h & 255]) + data)
    print(f"{name}: {w}x{h} tiled{tw}x{tl} spp={spp} comp={comp} "
          f"pred={pred} tif={os.path.getsize(path)}B")


if __name__ == "__main__":
    # pseudo-random content grows the LZW table ~1 entry/1.5 bytes:
    # 96x96 = 9216 bytes crosses the 511 and 1023 width bumps; 160x160
    # crosses 2047 as well
    gen("lzw_rand_96", 96, 96, COMP_LZW,
        lambda x, y: (x * 31 + y * 17 + ((x * y) >> 2)) % 251)
    gen("lzw_rand_160", 160, 160, COMP_LZW,
        lambda x, y: (x * 131 + y * 197 + ((x * x + y) >> 1)) % 256)
    gen("lzw_runs_64", 64, 48, COMP_LZW,
        lambda x, y: (x // 9 + y // 7) % 5)  # repetitive: deep table strings
    gen("packbits_runs_64", 64, 48, COMP_PACKBITS,
        lambda x, y: (x // 9 + y // 7) % 5)
    gen("packbits_rand_32", 32, 24, COMP_PACKBITS,
        lambda x, y: (x * 37 + y * 11) % 256)
    gen("packbits_mixed_51", 51, 13, COMP_PACKBITS,  # odd width, mixed runs
        lambda x, y: 7 if (x // 5) % 2 == 0 else (x + y) % 256)
    gen("lzw_multistrip_40x29", 40, 29, COMP_LZW,
        lambda x, y: (x * 7 + y * 13) % 256, rps=5)  # 6 strips, ragged last
    gen("packbits_multistrip_33x10", 33, 10, COMP_PACKBITS,
        lambda x, y: (x // 4 + y) % 9, rps=3)  # 4 strips
    gen_pred("lzw_pred2_77x33", 77, 33,
             lambda x, y: (x * 3 + y * 5 + (x * y) // 7) % 256)
    gen_pred("lzw_pred2_grad", 120, 80, lambda x, y: (x + 2 * y) % 256)
    # round-19: multi-sample predictor 2 and tiled layouts
    gen_rgb("rgb_lzw_pred2_37x21", 37, 21, COMP_LZW,
            lambda x, y: ((x * 5 + y) % 256, (x + y * 7) % 256,
                          (x * 3 + y * 11) % 251), pred=2)
    gen_rgb("rgb_lzw_pred2_strips_40x18", 40, 18, COMP_LZW,
            lambda x, y: ((x + 2 * y) % 256, (x * 9 + y) % 247,
                          (x ^ y) % 256), pred=2, rps=5)
    gen_rgb("rgb_packbits_29x13", 29, 13, COMP_PACKBITS,
            lambda x, y: ((x // 3) % 256, (y // 2) % 256, 200))
    gen_tiled("tiled_gray_lzw_40x29", 40, 29, COMP_LZW, 1,
              lambda x, y: ((x * 7 + y * 13) % 256,))
    gen_tiled("tiled_gray_lzw_pred2_33x17", 33, 17, COMP_LZW, 1,
              lambda x, y: ((x + 3 * y) % 256,), pred=2)
    gen_tiled("tiled_rgb_lzw_pred2_37x21", 37, 21, COMP_LZW, 3,
              lambda x, y: ((x * 5 + y) % 256, (x + y * 7) % 256,
                            (x * 3 + y * 11) % 251), pred=2)
    gen_tiled("tiled_rgb_packbits_48x32", 48, 32, COMP_PACKBITS, 3,
              lambda x, y: ((x // 4) % 256, (y // 4) % 256, (x + y) % 9))
