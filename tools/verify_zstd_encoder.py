"""Foreign verification of the GENERAL zstd encoder (Zstd.encode):
libzstd must decode every frame our compressor writes, byte-exact.

Usage: python3 tools/verify_zstd_encoder.py <dir>
  <dir> holds pairs <name>.bin (expected payload) / <name>.zst (our
  frame); `dict.bin`, when present, is a structured dictionary blob
  applied to `dictcase.zst` via ZSTD_decompress_usingDict.

Driven per-test-run by ZstdEncodeSpec (which dumps a fresh matrix and
asserts this script prints ALL OK) — the encoder-side mirror of the
libpng/libtiff foreign-fixture discipline.
Last standalone run (2026-08-16): ALL OK (8 cases).
"""
import ctypes
import os
import sys

Z = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libzstd.so.1")
Z.ZSTD_createDCtx.restype = ctypes.c_void_p
Z.ZSTD_decompress.restype = ctypes.c_size_t
Z.ZSTD_decompress_usingDict.restype = ctypes.c_size_t
Z.ZSTD_isError.restype = ctypes.c_uint
Z.ZSTD_getErrorName.restype = ctypes.c_char_p

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_zstd_enc"
names = sorted(n[:-4] for n in os.listdir(d) if n.endswith(".zst"))
dict_b = None
dict_path = os.path.join(d, "dict.bin")
if os.path.exists(dict_path):
    with open(dict_path, "rb") as f:
        dict_b = f.read()

bad = 0
for name in names:
    with open(os.path.join(d, name + ".bin"), "rb") as f:
        expect = f.read()
    with open(os.path.join(d, name + ".zst"), "rb") as f:
        frame = f.read()
    out = ctypes.create_string_buffer(len(expect) + 64)
    if name == "dictcase":
        ctx = Z.ZSTD_createDCtx()
        r = Z.ZSTD_decompress_usingDict(
            ctypes.c_void_p(ctx), out, ctypes.c_size_t(len(out)),
            frame, ctypes.c_size_t(len(frame)),
            dict_b, ctypes.c_size_t(len(dict_b)))
    else:
        r = Z.ZSTD_decompress(out, ctypes.c_size_t(len(out)),
                              frame, ctypes.c_size_t(len(frame)))
    if Z.ZSTD_isError(ctypes.c_size_t(r)):
        print(name, "ERROR:",
              Z.ZSTD_getErrorName(ctypes.c_size_t(r)).decode())
        bad += 1
    elif out.raw[:r] != expect:
        print(name, "MISMATCH", r, "vs", len(expect))
        bad += 1
    else:
        print(name, "ok", len(frame), "->", r)

if bad:
    print(f"{bad} FAILURES")
    sys.exit(1)
print(f"ALL OK ({len(names)} cases)")
