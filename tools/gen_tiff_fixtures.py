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
