#!/usr/bin/env python3
"""Extract the RFC 7932 constant tables + static dictionary from the
system brotli libraries, and generate FOREIGN conformance fixtures
(libbrotlienc-encoded streams with their exact inputs).

Everything extracted here is the public RFC 7932 specification data:
the static dictionary (Appendix A), the word transforms (Appendix B),
and the context lookup table (Appendix C). The system library is used
as an offline, bit-exact source for those published constants — the
gen_vp8_fixtures.py precedent.

Outputs:
  src/main/resources/graft/brotli/dictionary.bin   (122784 bytes)
  src/main/resources/graft/brotli/size_bits.txt    (32 ints)
  src/main/resources/graft/brotli/transforms.txt   (121 lines: prefix \\x-escaped, type, suffix)
  src/main/resources/graft/brotli/context_lut.bin  (2048 bytes)
  src/test/resources/brotli/fixture_<name>.{raw,br}
"""
import ctypes, os, sys

C = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlicommon.so")
E = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlienc.so")
D = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlidec.so")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = os.path.join(ROOT, "src/main/resources/graft/brotli")
TRES = os.path.join(ROOT, "src/test/resources/brotli")
os.makedirs(RES, exist_ok=True)
os.makedirs(TRES, exist_ok=True)


class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


class BrotliTransforms(ctypes.Structure):
    _fields_ = [
        ("prefix_suffix_size", ctypes.c_uint16),
        ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
        ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
        ("num_transforms", ctypes.c_uint32),
        ("transforms", ctypes.POINTER(ctypes.c_uint8)),
        ("params", ctypes.POINTER(ctypes.c_uint8)),
        ("cutOffTransforms", ctypes.c_int16 * 10),
    ]


def extract_tables():
    C.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
    d = C.BrotliGetDictionary().contents
    data = bytes(bytearray(d.data[i] for i in range(d.data_size)))
    assert len(data) == 122784, len(data)
    with open(os.path.join(RES, "dictionary.bin"), "wb") as f:
        f.write(data)
    bits = list(d.size_bits_by_length)
    offs = list(d.offsets_by_length)
    with open(os.path.join(RES, "size_bits.txt"), "w") as f:
        f.write(" ".join(map(str, bits)) + "\n")
        f.write(" ".join(map(str, offs)) + "\n")
    print("dictionary:", len(data), "bytes; size_bits:", bits)

    C.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)
    t = C.BrotliGetTransforms().contents
    n = t.num_transforms
    assert n == 121, n

    def pstring(idx):
        # prefix_suffix_map[idx] -> offset into prefix_suffix; string is
        # length-prefixed? In brotli the flat data is "\x06 added"-style:
        # each entry starts with a length byte.
        off = t.prefix_suffix_map[idx]
        ln = t.prefix_suffix[off]
        return bytes(bytearray(t.prefix_suffix[off + 1 + i] for i in range(ln)))

    lines = []
    for i in range(n):
        p_id = t.transforms[3 * i]
        typ = t.transforms[3 * i + 1]
        s_id = t.transforms[3 * i + 2]
        pre = pstring(p_id)
        suf = pstring(s_id)
        lines.append("%s\t%d\t%s" % (pre.hex(), typ, suf.hex()))
    with open(os.path.join(RES, "transforms.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("transforms:", n)

    # sanity: verify our reading of the transform table against the
    # library's own word transformer for a spread of (word, transform)
    C.BrotliTransformDictionaryWord.restype = ctypes.c_int
    ok = 0
    for length in (4, 6, 10, 24):
        nb = bits[length]
        if nb == 0:
            continue
        for widx in (0, 1, (1 << nb) - 1):
            woff = offs[length] + length * widx
            word = data[woff:woff + length]
            for tr in range(n):
                dst = (ctypes.c_uint8 * 64)()
                m = C.BrotliTransformDictionaryWord(
                    dst, (ctypes.c_uint8 * length)(*word), length,
                    C.BrotliGetTransforms(), tr)
                got = bytes(bytearray(dst[i] for i in range(m)))
                pre_h, typ, suf_h = lines[tr].split("\t")
                pre, suf = bytes.fromhex(pre_h), bytes.fromhex(suf_h)
                exp = pre + apply_transform(word, int(typ)) + suf
                assert got == exp, (length, widx, tr, got, exp)
                ok += 1
    print("transform cross-check:", ok, "cases byte-exact")

    # context lookup table: 2048 bytes, mode<<9 blocks of (lut0,lut1)
    lut_addr = ctypes.cast(getattr(C, "_kBrotliContextLookupTable"),
                           ctypes.POINTER(ctypes.c_uint8))
    lut = bytes(bytearray(lut_addr[i] for i in range(2048)))
    with open(os.path.join(RES, "context_lut.bin"), "wb") as f:
        f.write(lut)
    print("context_lut: 2048 bytes")


def apply_transform(word, typ):
    # mirror of the RFC Appendix B semantics, used only to cross-check
    w = bytearray(word)
    if 12 <= typ <= 20:  # OmitFirst1..9
        w = w[typ - 11:]
    elif 1 <= typ <= 9:  # OmitLast1..9
        w = w[:max(0, len(w) - typ)]
    if typ == 10 or typ == 11:  # UppercaseFirst / UppercaseAll
        i = 0
        while i < len(w):
            if w[i] < 192:
                if 97 <= w[i] <= 122:
                    w[i] ^= 32
                i += 1
            elif w[i] < 224:
                if i + 1 < len(w):
                    w[i + 1] ^= 32
                i += 2
            else:
                if i + 2 < len(w):
                    w[i + 2] ^= 5
                i += 3
            if typ == 10:
                break
    return bytes(w)


def brotli_compress(data, quality, lgwin):
    E.BrotliEncoderCompress.restype = ctypes.c_int
    out_len = ctypes.c_size_t(len(data) * 2 + 1024)
    out = (ctypes.c_uint8 * out_len.value)()
    r = E.BrotliEncoderCompress(quality, lgwin, 0, len(data),
                                (ctypes.c_uint8 * len(data))(*data),
                                ctypes.byref(out_len), out)
    assert r == 1
    return bytes(bytearray(out[i] for i in range(out_len.value)))


def brotli_decompress(data, cap):
    D.BrotliDecoderDecompress.restype = ctypes.c_int
    out_len = ctypes.c_size_t(cap)
    out = (ctypes.c_uint8 * cap)()
    r = D.BrotliDecoderDecompress(len(data),
                                  (ctypes.c_uint8 * len(data))(*data),
                                  ctypes.byref(out_len), out)
    assert r == 1, r
    return bytes(bytearray(out[i] for i in range(out_len.value)))


def fixtures():
    import random
    rnd = random.Random(7932)
    text = (b"The quick brown fox jumps over the lazy dog. "
            b"Compression of the public internet requires robust, "
            b"well specified content codings; this is the brotli "
            b"format from RFC 7932 with its static dictionary of "
            b"words like the, of, and, that, have, this, from, "
            b"they, would, there, their, what, about, which. ") * 40
    html = (b"<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
            b"<title>Example Document</title></head><body>"
            b"<p>Hello, world! This page demonstrates the brotli "
            b"content coding used by HTTP servers.</p>"
            b"<div class=\"content\"><span>value</span></div>"
            b"</body></html>") * 60
    rand = bytes(bytearray(rnd.randrange(256) for _ in range(50000)))
    runs = bytes(bytearray([i // 999 % 256 for i in range(60000)]))
    utf8 = ("Ελληνικά κείμενο με πολυ-byte χαρακτήρες και "
            "русский текст для контекстных режимов. ").encode("utf-8") * 120
    tiny = b"a"
    empty = b""
    # NON-repeating, dictionary-word-dense prose: the window holds no
    # earlier copy, so high-quality encoders must reach for the static
    # dictionary (and its transforms — capitalized/suffixed words)
    words = (b"There would have been something about the first people "
             b"which they could not know. Because the world was large, "
             b"their government made another public statement through "
             b"the national information service, and every question "
             b"received different answers between education, business, "
             b"development, experience, technology, community, research, "
             b"performance and international management. Following the "
             b"description available, students working together should "
             b"provide important security during the current program.")
    cases = []
    for name, data in [("text", text), ("html", html), ("rand", rand),
                       ("runs", runs), ("utf8", utf8), ("tiny", tiny),
                       ("empty", empty), ("words", words)]:
        for q in (0, 1, 5, 9, 11):
            for w in (18, 22):
                if (q, w) not in [(0, 18), (1, 22), (5, 18), (9, 22), (11, 22), (11, 18)]:
                    continue
                enc = brotli_compress(data, q, w)
                # libbrotlidec round-trips it: the fixture is honest
                assert brotli_decompress(enc, len(data) + 16) == data
                nm = "%s_q%d_w%d" % (name, q, w)
                with open(os.path.join(TRES, "fixture_%s.raw" % nm), "wb") as f:
                    f.write(data)
                with open(os.path.join(TRES, "fixture_%s.br" % nm), "wb") as f:
                    f.write(enc)
                cases.append((nm, len(data), len(enc)))
    for nm, r, b in cases:
        print("fixture %-14s raw=%-7d br=%d" % (nm, r, b))


if __name__ == "__main__":
    extract_tables()
    fixtures()
    print("done")
