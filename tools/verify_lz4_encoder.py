"""Foreign verification of the LZ4 frame ENCODER (Lz4.encode): liblz4
must decompress every frame our writer produces, byte-exact.

Usage: python3 tools/verify_lz4_encoder.py <dir>
  <dir> holds pairs <name>.bin (expected payload) / <name>.lz4 (our
  frame). Driven per-test-run by Lz4Spec (asserts ALL OK).
"""
import ctypes
import os
import sys

L = ctypes.CDLL("liblz4.so.1")
L.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
L.LZ4F_decompress.restype = ctypes.c_size_t
L.LZ4F_isError.restype = ctypes.c_uint
L.LZ4F_getErrorName.restype = ctypes.c_char_p
VERSION = 100

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_lz4_enc"
names = sorted(n[:-4] for n in os.listdir(d) if n.endswith(".lz4"))
bad = 0
for name in names:
    with open(os.path.join(d, name + ".bin"), "rb") as f:
        expect = f.read()
    with open(os.path.join(d, name + ".lz4"), "rb") as f:
        frame = f.read()
    ctx = ctypes.c_void_p()
    rc = L.LZ4F_createDecompressionContext(ctypes.byref(ctx), VERSION)
    assert not L.LZ4F_isError(ctypes.c_size_t(rc))
    out = ctypes.create_string_buffer(len(expect) + 64)
    src_pos = 0
    got = b""
    err = None
    while src_pos < len(frame) or (src_pos == 0 and not frame):
        dst_len = ctypes.c_size_t(len(out))
        src_len = ctypes.c_size_t(len(frame) - src_pos)
        r = L.LZ4F_decompress(ctx, out, ctypes.byref(dst_len),
                              frame[src_pos:], ctypes.byref(src_len), None)
        if L.LZ4F_isError(ctypes.c_size_t(r)):
            err = L.LZ4F_getErrorName(ctypes.c_size_t(r)).decode()
            break
        got += out.raw[:dst_len.value]
        src_pos += src_len.value
        if src_len.value == 0 and dst_len.value == 0:
            break
    L.LZ4F_freeDecompressionContext(ctx)
    if err:
        print(name, "ERROR:", err)
        bad += 1
    elif got != expect:
        print(name, "MISMATCH", len(got), "vs", len(expect))
        bad += 1
    else:
        print(name, "ok", len(frame), "->", len(got))

if bad:
    print(f"{bad} FAILURES")
    sys.exit(1)
print(f"ALL OK ({len(names)} cases)")
