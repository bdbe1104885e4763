"""Foreign verification of the stored-chunk xz WRITER (Xz.encodeStored):
liblzma must decode every stream our writer produces, byte-exact.

Usage: python3 tools/verify_xz_encoder.py <dir>
  <dir> holds pairs <name>.bin (expected payload) / <name>.xz (our
  stream). Driven per-test-run by XzSpec (asserts ALL OK).
"""
import ctypes
import os
import sys

L = ctypes.CDLL("liblzma.so.5")
L.lzma_stream_buffer_decode.restype = ctypes.c_int

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_xz_enc"
names = sorted(n[:-3] for n in os.listdir(d) if n.endswith(".xz"))
bad = 0
for name in names:
    with open(os.path.join(d, name + ".bin"), "rb") as f:
        expect = f.read()
    with open(os.path.join(d, name + ".xz"), "rb") as f:
        stream = f.read()
    memlimit = ctypes.c_uint64(1 << 30)
    in_pos = ctypes.c_size_t(0)
    out = ctypes.create_string_buffer(len(expect) + 64)
    out_pos = ctypes.c_size_t(0)
    rc = L.lzma_stream_buffer_decode(
        ctypes.byref(memlimit), ctypes.c_uint32(0), None,
        stream, ctypes.byref(in_pos), ctypes.c_size_t(len(stream)),
        out, ctypes.byref(out_pos), ctypes.c_size_t(len(out)))
    if rc != 0:
        print(name, "ERROR rc =", rc)
        bad += 1
    elif out.raw[:out_pos.value] != expect:
        print(name, "MISMATCH", out_pos.value, "vs", len(expect))
        bad += 1
    else:
        print(name, "ok", len(stream), "->", out_pos.value)

if bad:
    print(f"{bad} FAILURES")
    sys.exit(1)
print(f"ALL OK ({len(names)} cases)")
