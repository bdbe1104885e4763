"""Foreign comparison point for the COVER-style dictionary trainer
(graft.operators.ZstdDict): train a genuine ZDICT dictionary with
libzstd's `ZDICT_trainFromBuffer` on the SAME samples, then compress
every sample twice with the SAME foreign compressor
(`ZSTD_compress_usingDict`, level 3) — once under the ZDICT blob, once
under our structured dict blob — and print both compressed totals.
Using one compressor for both isolates DICTIONARY quality from encoder
quality.

Usage: python3 tools/compare_zdict.py <dir>
  <dir>/sample_NNN.bin   training/eval samples
  <dir>/ours_dict.bin    our trained dict CONTENT (raw, no magic) —
                         libzstd auto-detects the missing magic and
                         loads it as a raw content dictionary, so the
                         comparison isolates CONTENT quality (the
                         ZDICT blob additionally carries entropy
                         tables, a handicap in ZDICT's favor that the
                         spec's margin absorbs)

Prints one line `ZDICT <total> OURS <total> RAW <total>` and exits 0;
exits 1 with the libzstd error name if training or compression fails.
Driven per-test-run by ZstdDictTrainSpec.
"""
import ctypes
import os
import sys

Z = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libzstd.so.1")
Z.ZSTD_createCCtx.restype = ctypes.c_void_p
Z.ZSTD_compress_usingDict.restype = ctypes.c_size_t
Z.ZSTD_compressBound.restype = ctypes.c_size_t
Z.ZSTD_isError.restype = ctypes.c_uint
Z.ZSTD_getErrorName.restype = ctypes.c_char_p
Z.ZDICT_trainFromBuffer.restype = ctypes.c_size_t
Z.ZDICT_isError.restype = ctypes.c_uint
Z.ZDICT_getErrorName.restype = ctypes.c_char_p
Z.ZSTD_CCtx_loadDictionary_advanced.restype = ctypes.c_size_t
Z.ZSTD_compress2.restype = ctypes.c_size_t

d = sys.argv[1]
names = sorted(n for n in os.listdir(d) if n.startswith("sample_"))
samples = []
for n in names:
    with open(os.path.join(d, n), "rb") as f:
        samples.append(f.read())
with open(os.path.join(d, "ours_dict.bin"), "rb") as f:
    ours = f.read()

concat = b"".join(samples)
sizes = (ctypes.c_size_t * len(samples))(*[len(s) for s in samples])
cap = max(len(ours), 8 * 1024)
zdict_buf = ctypes.create_string_buffer(cap)
r = Z.ZDICT_trainFromBuffer(zdict_buf, ctypes.c_size_t(cap),
                            concat, sizes, ctypes.c_uint(len(samples)))
if Z.ZDICT_isError(ctypes.c_size_t(r)):
    print("ZDICT_trainFromBuffer:",
          Z.ZDICT_getErrorName(ctypes.c_size_t(r)).decode())
    sys.exit(1)
zdict = zdict_buf.raw[:r]


def total_with(dict_blob, raw_content):
    """Sum of per-sample compressed sizes under `dict_blob`.

    raw_content=True loads via ZSTD_CCtx_loadDictionary_advanced with
    ZSTD_dct_rawContent, so ONLY the dictionary bytes matter —
    content-for-content comparison. raw_content=False uses
    ZSTD_compress_usingDict (auto mode: a magic-bearing blob brings
    its trained entropy tables along).
    """
    total = 0
    for s in samples:
        bound = Z.ZSTD_compressBound(ctypes.c_size_t(len(s)))
        out = ctypes.create_string_buffer(bound)
        if raw_content:
            ctx = Z.ZSTD_createCCtx()
            # args: dlm_byCopy=0, dct_rawContent=1
            Z.ZSTD_CCtx_loadDictionary_advanced(
                ctypes.c_void_p(ctx), dict_blob,
                ctypes.c_size_t(len(dict_blob)),
                ctypes.c_int(0), ctypes.c_int(1))
            n = Z.ZSTD_compress2(ctypes.c_void_p(ctx), out,
                                 ctypes.c_size_t(bound),
                                 s, ctypes.c_size_t(len(s)))
        else:
            ctx = Z.ZSTD_createCCtx()
            n = Z.ZSTD_compress_usingDict(
                ctypes.c_void_p(ctx), out, ctypes.c_size_t(bound),
                s, ctypes.c_size_t(len(s)),
                dict_blob, ctypes.c_size_t(len(dict_blob)),
                ctypes.c_int(3))
        if Z.ZSTD_isError(ctypes.c_size_t(n)):
            print("compress:", Z.ZSTD_getErrorName(ctypes.c_size_t(n)).decode())
            sys.exit(1)
        total += n
    return total


print("ZDICT", total_with(zdict, False), "OURS", total_with(ours, False),
      "ZDICTRAW", total_with(zdict, True), "OURSRAW", total_with(ours, True),
      "RAW", sum(len(s) for s in samples))
