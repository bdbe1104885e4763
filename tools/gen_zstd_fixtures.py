#!/usr/bin/env python3
"""Generate FOREIGN zstd conformance fixtures: libzstd-encoded streams
with their exact inputs, across compression levels (and therefore
block/literals/sequence mode mixes) plus a checksummed variant.

RFC 8878's constants (predefined FSE distributions, code tables) are
published in the RFC itself and implemented from it in Zstd.scala; the
fixtures are the bit-exact verification that the implementation reads
the spec correctly.

Outputs: src/test/resources/zstd/fixture_<name>.{raw,zst}
"""
import ctypes, os

Z = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libzstd.so.1")
Z.ZSTD_compress.restype = ctypes.c_size_t
Z.ZSTD_compressBound.restype = ctypes.c_size_t
Z.ZSTD_isError.restype = ctypes.c_uint
Z.ZSTD_decompress.restype = ctypes.c_size_t
Z.ZSTD_createCCtx.restype = ctypes.c_void_p
Z.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
Z.ZSTD_compress2.restype = ctypes.c_size_t

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRES = os.path.join(ROOT, "src/test/resources/zstd")
os.makedirs(TRES, exist_ok=True)

ZSTD_c_compressionLevel = 100
ZSTD_c_checksumFlag = 201
ZSTD_c_contentSizeFlag = 200


def compress(data, level, checksum=False, content_size=True):
    bound = Z.ZSTD_compressBound(len(data))
    out = (ctypes.c_uint8 * bound)()
    cctx = Z.ZSTD_createCCtx()
    Z.ZSTD_CCtx_setParameter(ctypes.c_void_p(cctx), ZSTD_c_compressionLevel, level)
    Z.ZSTD_CCtx_setParameter(ctypes.c_void_p(cctx), ZSTD_c_checksumFlag,
                             1 if checksum else 0)
    Z.ZSTD_CCtx_setParameter(ctypes.c_void_p(cctx), ZSTD_c_contentSizeFlag,
                             1 if content_size else 0)
    n = Z.ZSTD_compress2(ctypes.c_void_p(cctx), out, bound,
                         (ctypes.c_uint8 * len(data))(*data), len(data))
    assert not Z.ZSTD_isError(n), n
    Z.ZSTD_freeCCtx(ctypes.c_void_p(cctx))
    return bytes(bytearray(out[i] for i in range(n)))


def roundtrip_ok(enc, data):
    out = (ctypes.c_uint8 * (len(data) + 16))()
    n = Z.ZSTD_decompress(out, len(data) + 16,
                          (ctypes.c_uint8 * len(enc))(*enc), len(enc))
    return not Z.ZSTD_isError(n) and \
        bytes(bytearray(out[i] for i in range(n))) == data


def main():
    import random
    rnd = random.Random(8878)
    text = (b"The quick brown fox jumps over the lazy dog. "
            b"Zstandard is the other modern HTTP content coding; "
            b"its frames carry Huffman literals and FSE-coded "
            b"sequences with three repeated offsets. ") * 50
    html = (b"<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
            b"<title>Example</title></head><body><p>Hello, zstd "
            b"world!</p><div class=\"content\"><span>value</span>"
            b"</div></body></html>") * 70
    rand = bytes(bytearray(rnd.randrange(256) for _ in range(50000)))
    runs = bytes(bytearray([i // 999 % 256 for i in range(60000)]))
    utf8 = ("Ελληνικά κείμενο και русский текст с многобайтовыми "
            "символами. ").encode("utf-8") * 150
    words = (b"There would have been something about the first people "
             b"which they could not know, because the world was large "
             b"and every question received different answers between "
             b"education, business, development, experience and "
             b"research following the description available.")
    big = (text + rand[:20000] + html + runs[:30000]) * 6  # multi-block
    tiny = b"z"
    empty = b""
    cases = []
    for name, data in [("text", text), ("html", html), ("rand", rand),
                       ("runs", runs), ("utf8", utf8), ("words", words),
                       ("big", big), ("tiny", tiny), ("empty", empty)]:
        for lv in (1, 3, 9, 19):
            enc = compress(data, lv)
            assert roundtrip_ok(enc, data)
            nm = "%s_l%d" % (name, lv)
            open(os.path.join(TRES, "fixture_%s.raw" % nm), "wb").write(data)
            open(os.path.join(TRES, "fixture_%s.zst" % nm), "wb").write(enc)
            cases.append((nm, len(data), len(enc)))
    # checksummed + no-content-size variants on one body
    for nm, enc in [("text_l3_ck", compress(text, 3, checksum=True)),
                    ("text_l3_nosize", compress(text, 3, content_size=False))]:
        assert roundtrip_ok(enc, text)
        open(os.path.join(TRES, "fixture_%s.raw" % nm), "wb").write(text)
        open(os.path.join(TRES, "fixture_%s.zst" % nm), "wb").write(enc)
        cases.append((nm, len(text), len(enc)))
    for nm, r, z in cases:
        print("fixture %-15s raw=%-7d zst=%d" % (nm, r, z))


if __name__ == "__main__":
    main()
    print("done")
