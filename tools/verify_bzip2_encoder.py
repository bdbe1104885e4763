"""Foreign verification of the bzip2 ENCODER (Bzip2.encode): libbz2
must decompress every stream our writer produces, byte-exact.

Usage: python3 tools/verify_bzip2_encoder.py <dir>
  <dir> holds pairs <name>.bin (expected payload) / <name>.bz2 (our
  stream). Driven per-test-run by Bzip2Spec (which dumps a fresh
  matrix and asserts ALL OK) — the encoder-side mirror of the
  gen_bzip2_fixtures.py decode-side discipline.
"""
import ctypes
import os
import sys

B = ctypes.CDLL("libbz2.so.1.0")
B.BZ2_bzBuffToBuffDecompress.restype = ctypes.c_int

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_bzip2_enc"
names = sorted(n[:-4] for n in os.listdir(d) if n.endswith(".bz2"))
bad = 0
for name in names:
    with open(os.path.join(d, name + ".bin"), "rb") as f:
        expect = f.read()
    with open(os.path.join(d, name + ".bz2"), "rb") as f:
        stream = f.read()
    out = ctypes.create_string_buffer(len(expect) + 64)
    out_len = ctypes.c_uint(len(out))
    rc = B.BZ2_bzBuffToBuffDecompress(out, ctypes.byref(out_len),
                                      stream, ctypes.c_uint(len(stream)),
                                      ctypes.c_int(0), ctypes.c_int(0))
    if rc != 0:
        print(name, "ERROR rc =", rc)
        bad += 1
    elif out.raw[:out_len.value] != expect:
        print(name, "MISMATCH", out_len.value, "vs", len(expect))
        bad += 1
    else:
        print(name, "ok", len(stream), "->", out_len.value)

if bad:
    print(f"{bad} FAILURES")
    sys.exit(1)
print(f"ALL OK ({len(names)} cases)")
