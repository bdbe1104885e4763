#!/usr/bin/env python3
"""VP8 conformance fixture + spec-table generator (run OFFLINE, results
checked in; the Scala library never depends on this).

1. Extracts the RFC 6386 constant tables (default coefficient
   probabilities §13.5, coefficient-update probabilities §13.4, dc/ac
   quantizer lookups §14.1, keyframe B-mode probabilities §11.4) from
   the SYSTEM libwebp's .rodata — the reference codec ships the spec's
   literal values; encoder- and decoder-side copies inside the library
   are verified identical before use. Output: Scala array literals to
   paste into graft/operators/Vp8.scala.

2. Encodes deterministic test images with the REAL libwebp encoder
   (WebPEncodeRGB via ctypes) and records libwebp's own decoded YUV
   planes (WebPDecodeYUV) as the expected output. These are FOREIGN
   VP8 key-frame streams — decoding them byte-exactly proves table and
   algorithm conformance, not self-consistency.

Fixture layout (src/test/resources/vp8/):
  fixN.webp           the libwebp-encoded file
  fixN.yuv            packed planes: Y (w*h) ++ U ++ V (((w+1)/2)*((h+1)/2))
  manifest.txt        name,width,height per line
"""
import ctypes, struct, sys, os

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "vp8")

data = open(LIB, "rb").read()


def find8(seq):
    pat = bytes(seq)
    hits, i = [], data.find(pat)
    while i >= 0:
        hits.append(i)
        i = data.find(pat, i + 1)
    return hits


def extract_tables():
    # anchor: the §13.5 default coef probs begin with 33 bytes of 128
    # (block type 0 / band 0 is never coded) followed by the band-1 row
    frag = find8([253, 136, 254, 255, 228, 219, 128])
    assert len(frag) == 2, frag
    cp_off = frag[0] - 33
    cp = data[cp_off:cp_off + 1056]
    cp2 = data[frag[1] - 33:frag[1] - 33 + 1056]
    assert cp == cp2 and all(v == 128 for v in cp[:33])
    # keyframe bmode probs: [0][0] row per RFC 6386 §11.4. libwebp's
    # B-mode enum swaps RD/VR/LD relative to the RFC's (libwebp
    # RD=4,VR=5,LD=6 vs RFC LD=4,RD=5,VR=6), so its [above][left] axes
    # are in libwebp numbering — permute both axes into RFC order so
    # the emitted table IS the spec's §11.4 layout.
    bm_hits = find8([231, 120, 48, 89, 115, 113, 120, 152, 112])
    assert len(bm_hits) == 2
    bm_lw = data[bm_hits[0]:bm_hits[0] + 900]
    assert bm_lw == data[bm_hits[1]:bm_hits[1] + 900]
    rfc2lw = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]
    bm = bytearray(900)
    for a in range(10):
        for l in range(10):
            src = (rfc2lw[a] * 10 + rfc2lw[l]) * 9
            dst = (a * 10 + l) * 9
            bm[dst:dst + 9] = bm_lw[src:src + 9]
    # dc quantizer lookup (uint8), §14.1 — anchored by its unique tail
    dc_hits = find8([138, 140, 143, 145, 148, 151, 154, 157])
    assert len(dc_hits) == 2
    dc = data[dc_hits[0] - 120:dc_hits[0] + 8]
    assert dc == data[dc_hits[1] - 120:dc_hits[1] + 8] and list(dc[:4]) == [4, 5, 6, 7]
    # ac quantizer lookup (uint16 LE), §14.1
    ac_pat = b"".join(struct.pack("<H", v) for v in range(4, 20))
    ac_hits = []
    i = data.find(ac_pat)
    while i >= 0:
        ac_hits.append(i)
        i = data.find(ac_pat, i + 1)
    assert len(ac_hits) == 2, ac_hits
    ac = [struct.unpack_from("<H", data, ac_hits[0] + 2 * k)[0] for k in range(128)]
    ac2 = [struct.unpack_from("<H", data, ac_hits[1] + 2 * k)[0] for k in range(128)]
    assert ac == ac2 and ac[-1] == 284
    # coef update probs: the dense-255 1056-byte block after the bands table
    up_hits = []
    i = 0
    while i < len(data) - 1056:
        if data[i] == 255 and data[i:i + 33] == b"\xff" * 33:
            win = data[i:i + 1056]
            if sum(1 for b in win if b == 255) > 700 and min(win) > 100:
                up_hits.append(i)
                i += 1056
                continue
        i += 1
    assert len(up_hits) == 2, up_hits
    up = data[up_hits[0]:up_hits[0] + 1056]
    assert up == data[up_hits[1]:up_hits[1] + 1056]
    return list(cp), list(up), list(bm), list(dc), list(ac)


def scala_flat(name, vals, per=16):
    rows = [", ".join(str(v) for v in vals[i:i + per]) for i in range(0, len(vals), per)]
    body = ",\n    ".join(rows)
    return f"  private[operators] val {name}: Array[Int] = Array(\n    {body})\n"


def emit_tables():
    cp, up, bm, dc, ac = extract_tables()
    print(scala_flat("CoefProbsFlat", cp))
    print(scala_flat("CoefUpdateProbsFlat", up))
    print(scala_flat("KfBModeProbFlat", bm))
    print(scala_flat("DcQLookup", dc))
    print(scala_flat("AcQLookup", ac))


def gen_fixtures():
    lib = ctypes.CDLL(LIB)
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.WebPFree.argtypes = [ctypes.c_void_p]

    def lcg(seed):
        s = seed
        while True:
            s = (s * 1103515245 + 12345) & 0x7fffffff
            yield (s >> 16) & 0xff

    def img_flat(w, h, v):
        return bytes([v] * (w * h * 3))

    def img_gradient(w, h):
        px = bytearray()
        for y in range(h):
            for x in range(w):
                px += bytes([(x * 255) // max(1, w - 1),
                             (y * 255) // max(1, h - 1), 128])
        return bytes(px)

    def img_noise(w, h, seed):
        g = lcg(seed)
        return bytes(next(g) for _ in range(w * h * 3))

    def img_blocks(w, h):
        px = bytearray()
        for y in range(h):
            for x in range(w):
                c = [(200, 30, 30), (30, 200, 30), (30, 30, 200), (220, 220, 40)][
                    ((x // 8) + (y // 8)) % 4]
                px += bytes(c)
        return bytes(px)

    def img_edges(w, h):
        # sharp vertical/horizontal steps + smooth region: exercises the
        # loop-filter masks both ways (filter vs preserve-real-edge)
        px = bytearray()
        for y in range(h):
            for x in range(w):
                v = 60 if x < w // 2 else 190
                if y % 16 < 2:
                    v = 128
                px += bytes([v, v, v])
        return bytes(px)

    cases = [
        ("fix1_flat32_q90", 32, 32, img_flat(32, 32, 130), 90.0),
        ("fix2_grad48x32_q75", 48, 32, img_gradient(48, 32), 75.0),
        ("fix3_noise64x48_q50", 64, 48, img_noise(64, 48, 7), 50.0),
        ("fix4_blocks80x64_q60", 80, 64, img_blocks(80, 64), 60.0),
        ("fix5_tiny8x8_q80", 8, 8, img_gradient(8, 8), 80.0),
        ("fix6_odd17x13_q80", 17, 13, img_gradient(17, 13), 80.0),
        ("fix7_edges64x64_q40", 64, 64, img_edges(64, 64), 40.0),
        ("fix8_grad160x96_q85", 160, 96, img_gradient(160, 96), 85.0),
    ]
    os.makedirs(OUT, exist_ok=True)
    manifest = []
    for name, w, h, rgb, q in cases:
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(out))
        assert n > 0, name
        webp = bytes(out[i] for i in range(n))
        lib.WebPFree(out)
        # decode back with libwebp itself -> ground-truth YUV planes
        dw, dh = ctypes.c_int(), ctypes.c_int()
        pu, pv = ctypes.POINTER(ctypes.c_uint8)(), ctypes.POINTER(ctypes.c_uint8)()
        st, uvst = ctypes.c_int(), ctypes.c_int()
        py = lib.WebPDecodeYUV(webp, n, ctypes.byref(dw), ctypes.byref(dh),
                               ctypes.byref(pu), ctypes.byref(pv),
                               ctypes.byref(st), ctypes.byref(uvst))
        assert py and dw.value == w and dh.value == h, name
        uw, uh = (w + 1) // 2, (h + 1) // 2
        ybuf = bytearray()
        for r in range(h):
            ybuf += bytes(py[r * st.value + c] for c in range(w))
        ubuf = bytearray()
        vbuf = bytearray()
        for r in range(uh):
            ubuf += bytes(pu[r * uvst.value + c] for c in range(uw))
            vbuf += bytes(pv[r * uvst.value + c] for c in range(uw))
        lib.WebPFree(py)
        open(os.path.join(OUT, name + ".webp"), "wb").write(webp)
        open(os.path.join(OUT, name + ".yuv"), "wb").write(bytes(ybuf + ubuf + vbuf))
        manifest.append(f"{name},{w},{h}")
        print(f"{name}: {n} bytes webp")
    open(os.path.join(OUT, "manifest.txt"), "w").write("\n".join(manifest) + "\n")


def gen_advanced():
    """Advanced-API fixtures for the features WebPEncodeRGB can't reach:
    fix9  — 4 token partitions (config.partitions=2; honored only at
            method=0 — the token-buffer methods always emit one),
    fix10 — filter sharpness 4 (the interior-limit shift/cap branch),
    fix11 — the SIMPLE loop filter (config.filter_type=0).
    The ctypes WebPPicture layout is sufficient for encode but not for
    WebPPictureFree, so this helper never frees (one-shot process).
    """
    lib = ctypes.CDLL(LIB)
    ABI = 0x020f

    class WebPConfig(ctypes.Structure):
        _fields_ = [
            ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
            ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
            ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
            ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
            ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
            ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
            ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
            ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
            ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
            ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
            ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
            ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
            ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
            ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
            ("qmax", ctypes.c_int)]

    WriterFunc = ctypes.CFUNCTYPE(
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.c_void_p)

    class WebPPicture(ctypes.Structure):
        _fields_ = [
            ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
            ("width", ctypes.c_int), ("height", ctypes.c_int),
            ("y", ctypes.c_void_p), ("u", ctypes.c_void_p), ("v", ctypes.c_void_p),
            ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
            ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
            ("pad1", ctypes.c_uint32 * 2),
            ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
            ("pad2", ctypes.c_uint32 * 3),
            ("writer", WriterFunc), ("custom_ptr", ctypes.c_void_p),
            ("extra_info_type", ctypes.c_int), ("extra_info", ctypes.c_void_p),
            ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
            ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
            ("pad3", ctypes.c_uint32 * 3),
            ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
            ("pad6", ctypes.c_uint32 * 8)]

    def lcg(seed):
        s = seed
        while True:
            s = (s * 1103515245 + 12345) & 0x7fffffff
            yield (s >> 16) & 0xff

    def one(name, w, h, seed, tune):
        cfg = WebPConfig()
        assert lib.WebPConfigInitInternal(
            ctypes.byref(cfg), 0, ctypes.c_float(60.0), ABI)
        tune(cfg)
        pic = WebPPicture()
        assert lib.WebPPictureInitInternal(ctypes.byref(pic), ABI)
        pic.width, pic.height = w, h
        pic.use_argb = 0
        g = lcg(seed)
        rgb = bytes(((x * 3) // 2 + (y * 2)) % 256
                    if (x // 16 + y // 16) % 2 == 0 else next(g)
                    for y in range(h) for x in range(w) for _ in range(3))
        assert lib.WebPPictureImportRGB(ctypes.byref(pic), rgb, w * 3)
        out = bytearray()
        cb = WriterFunc(lambda d, s, _: (out.extend(ctypes.string_at(d, s)), 1)[1])
        pic.writer = cb
        assert lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
        webp = bytes(out)
        dw, dh = ctypes.c_int(), ctypes.c_int()
        pu, pv = ctypes.POINTER(ctypes.c_uint8)(), ctypes.POINTER(ctypes.c_uint8)()
        st, uvst = ctypes.c_int(), ctypes.c_int()
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        py = lib.WebPDecodeYUV(webp, ctypes.c_size_t(len(webp)),
                               ctypes.byref(dw), ctypes.byref(dh),
                               ctypes.byref(pu), ctypes.byref(pv),
                               ctypes.byref(st), ctypes.byref(uvst))
        assert py and dw.value == w and dh.value == h
        uw, uh = (w + 1) // 2, (h + 1) // 2
        ybuf = bytearray()
        for r in range(h):
            ybuf += bytes(py[r * st.value + c] for c in range(w))
        for r in range(uh):
            ybuf += bytes(pu[r * uvst.value + c] for c in range(uw))
        for r in range(uh):
            ybuf += bytes(pv[r * uvst.value + c] for c in range(uw))
        open(os.path.join(OUT, name + ".webp"), "wb").write(webp)
        open(os.path.join(OUT, name + ".yuv"), "wb").write(bytes(ybuf))
        man = open(os.path.join(OUT, "manifest.txt")).read().rstrip("\n")
        if name.split("_")[0] not in man:
            open(os.path.join(OUT, "manifest.txt"), "w").write(
                man + f"\n{name},{w},{h}\n")
        print(f"{name}: {len(webp)} bytes webp")

    def t9(cfg):
        cfg.partitions = 2
        cfg.method = 0
        cfg.filter_strength = 35

    def t10(cfg):
        cfg.filter_strength = 40
        cfg.filter_sharpness = 4
        cfg.autofilter = 0

    def t11(cfg):
        cfg.filter_type = 0  # SIMPLE loop filter
        cfg.filter_strength = 30

    one("fix9_multipart96x80_q60", 96, 80, 42, t9)
    one("fix10_sharp64x48_q60", 64, 48, 77, t10)
    one("fix11_simple64x48_q60", 64, 48, 99, t11)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "tables":
        emit_tables()
    elif len(sys.argv) > 1 and sys.argv[1] == "advanced":
        gen_advanced()
    else:
        gen_fixtures()
