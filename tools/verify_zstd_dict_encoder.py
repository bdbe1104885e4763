import ctypes
Z = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libzstd.so.1")
Z.ZSTD_createDCtx.restype = ctypes.c_void_p
Z.ZSTD_decompress_usingDict.restype = ctypes.c_size_t
Z.ZSTD_isError.restype = ctypes.c_uint
Z.ZSTD_getErrorName.restype = ctypes.c_char_p

dict_b = open("/tmp/zv/dict.bin","rb").read()
expect = open("/tmp/zv/expect.bin","rb").read()
for name in ("frame.zst","frame_id0.zst"):
    frame = open("/tmp/zv/"+name,"rb").read()
    out = ctypes.create_string_buffer(len(expect)+64)
    d = Z.ZSTD_createDCtx()
    r = Z.ZSTD_decompress_usingDict(ctypes.c_void_p(d), out, ctypes.c_size_t(len(out)),
        frame, ctypes.c_size_t(len(frame)), dict_b, ctypes.c_size_t(len(dict_b)))
    if Z.ZSTD_isError(ctypes.c_size_t(r)):
        print(name, "ERROR:", Z.ZSTD_getErrorName(ctypes.c_size_t(r)).decode())
    else:
        got = out.raw[:r]
        print(name, "ok" if got == expect else "MISMATCH", r)
# also: libzstd parses the structured dict header (id extraction)
Z.ZSTD_getDictID_fromDict.restype = ctypes.c_uint
print("dict id:", hex(Z.ZSTD_getDictID_fromDict(dict_b, ctypes.c_size_t(len(dict_b)))))

# Artifacts under /tmp/zv are dumped from a Scala console session:
#   Zstd.encodeStructuredDict(0x47524654L, prefix)       -> dict.bin
#   Zstd.encodeWithDictPrefix(tail, prefix, 0x47524654L) -> frame.zst
#   Zstd.encodeWithDictPrefix(tail, prefix, 0L)          -> frame_id0.zst
#   prefix ++ tail                                       -> expect.bin
# Last run (2026-08-16): frame.zst ok, frame_id0.zst ok, dict id 0x47524654.
