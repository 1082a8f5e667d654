"""Optional native (C, via ctypes) kernel for the FSST greedy encoder.

The numpy chunk-&-stitch encoder plateaued ~16-19 MB/s (NOTES.md #1); the
greedy walk is inherently sequential per byte, which is exactly what a tiny
C loop does at memory speed.  This module compiles a ~60-line C kernel with
the system compiler ON FIRST USE (cached as a .so under ``.scratch/native``,
atomic rename so concurrent Python workers race safely) and exposes it via
ctypes.  Anywhere compilation or loading fails — no compiler, exotic arch,
read-only filesystem — callers fall back to the numpy encoder; the payload
format is identical either way, so decode never cares which encoder ran.

The C walk implements the same match priority as the numpy encoder
(longest prefix-LUT candidate, then second candidate, then 1-byte symbol,
then escape) without the 512-byte chunk seams the vectorized walk needs —
so its streams are never worse, and there is no cross-seam token loss.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_C_SRC = r"""
#include <stdint.h>
#include <string.h>

long fsst_compress(const uint8_t* d, long n,
                   const int16_t* lut1, const int16_t* lut_a, const int16_t* lut_b,
                   const uint8_t* symlen, const uint64_t* symkey,
                   uint8_t* out)
{
    static const uint64_t mask[9] = {
        0ULL, 0xFFULL, 0xFFFFULL, 0xFFFFFFULL, 0xFFFFFFFFULL,
        0xFFFFFFFFFFULL, 0xFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFULL,
        0xFFFFFFFFFFFFFFFFULL};
    long i = 0, o = 0;
    while (i < n) {
        long rem = n - i;
        uint64_t w = 0;
        memcpy(&w, d + i, rem < 8 ? rem : 8); /* little-endian load */
        int tok = -1;
        long ln = 1;
        if (rem >= 2) {
            uint16_t p16 = (uint16_t)(w & 0xFFFF);
            int ca = lut_a[p16];
            if (ca >= 0) {
                long cl = symlen[ca];
                if (cl <= rem && (w & mask[cl]) == symkey[ca]) { tok = ca; ln = cl; }
            }
            if (tok < 0) {
                int cb = lut_b[p16];
                if (cb >= 0) {
                    long cl = symlen[cb];
                    if (cl <= rem && (w & mask[cl]) == symkey[cb]) { tok = cb; ln = cl; }
                }
            }
        }
        if (tok < 0) {
            int c1 = lut1[d[i]];
            if (c1 >= 0) { tok = c1; ln = 1; }
        }
        if (tok >= 0) {
            out[o++] = (uint8_t)tok;
        } else {
            out[o++] = 255;
            out[o++] = d[i];
            ln = 1;
        }
        i += ln;
    }
    return o;
}

/* out must have cap + 8 bytes of room (unconditional 8-byte stores).
   Returns -1 when the stream would expand past cap or ends in a lone
   escape byte — a corrupt block must become a clean Python error, not a
   heap overflow. */
long fsst_decompress(const uint8_t* s, long m,
                     const uint8_t* symlen, const uint8_t* symbytes,
                     uint8_t* out, long cap)
{
    long o = 0, i = 0;
    while (i < m) {
        uint8_t c = s[i];
        if (o > cap) return -1;
        if (c == 255) {
            if (i + 1 >= m) return -1; /* truncated escape */
            out[o++] = s[i + 1];
            i += 2;
        } else {
            memcpy(out + o, symbytes + ((long)c << 3), 8);
            o += symlen[c];
            i += 1;
        }
    }
    return o;
}
"""

def _so_dir() -> str:
    """Cache dir for the compiled kernel: beside the repo when the package
    is a real directory, else (zip import via --py-files) a PER-USER temp
    dir (uid-suffixed, mode 0700) — a world-shared fixed /tmp path would
    let another local user pre-plant a malicious .so that we'd dlopen."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if os.path.isdir(pkg_root):
        return os.path.join(pkg_root, ".scratch", "native")
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(), f"rugo_spark_native_u{uid}")


_SO_DIR = _so_dir()
_SO_PATH = os.path.join(_SO_DIR, "fsst_kernel_v3.so")


def _owned_by_us(path: str) -> bool:
    """Never dlopen a cached kernel some other uid wrote."""
    if not hasattr(os, "getuid"):
        return True
    try:
        return os.stat(path).st_uid == os.getuid()
    except OSError:
        return False

_lib = None
_tried = False


def _build() -> str | None:
    """Compile the kernel once; atomic rename makes concurrent builds safe."""
    if os.path.exists(_SO_PATH):
        return _SO_PATH if _owned_by_us(_SO_PATH) else None
    try:
        os.makedirs(_SO_DIR, mode=0o700, exist_ok=True)
        with tempfile.TemporaryDirectory(dir=_SO_DIR) as td:
            src = os.path.join(td, "fsst_kernel.c")
            so = os.path.join(td, "fsst_kernel.so")
            with open(src, "w") as f:
                f.write(_C_SRC)
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True, timeout=60,
            )
            os.replace(so, _SO_PATH)
        return _SO_PATH
    except Exception:
        return None


def get_kernel():
    """ctypes handle to fsst_compress, or None when unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib.fsst_compress
    if _tried:
        return None
    _tried = True
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.fsst_compress.restype = ctypes.c_long
        lib.fsst_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.fsst_decompress.restype = ctypes.c_long
        lib.fsst_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ]
        _lib = lib
        return lib.fsst_compress
    except OSError:
        return None


def decompress_native(stream: bytes, orig_len: int, out_expansions: list[bytes]) -> bytes | None:
    """Run the C decoder; None when the kernel is unavailable."""
    import numpy as np

    if get_kernel() is None:
        return None
    if len(stream) == 0:
        return b""
    sl = np.zeros(256, dtype=np.uint8)
    sb = np.zeros((256, 8), dtype=np.uint8)
    for i, e in enumerate(out_expansions):
        sl[i] = len(e)
        sb[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    out = np.empty(orig_len + 8, dtype=np.uint8)  # 8-byte store slack
    o = _lib.fsst_decompress(
        bytes(stream), len(stream), sl.ctypes.data, sb.ctypes.data,
        out.ctypes.data, orig_len,
    )
    if o != orig_len:
        return None  # corrupt/overlong stream: let the numpy path raise precisely
    return out[:orig_len].tobytes()


def compress_native(data: bytes, lut1, lut_a, lut_b, symkey, symlen) -> bytes | None:
    """Run the C greedy encoder; None when the kernel is unavailable."""
    import numpy as np

    fn = get_kernel()
    if fn is None or len(data) == 0:
        return b"" if (fn is not None and len(data) == 0) else None
    n = len(data)
    out = np.empty(2 * n, dtype=np.uint8)  # worst case: all escapes
    sl = np.zeros(256, dtype=np.uint8)
    sk = np.zeros(256, dtype=np.uint64)
    m = min(len(symlen), 256)
    sl[:m] = symlen[:m]
    sk[:m] = symkey[:m]
    # bind contiguous copies to locals for the duration of the C call — a
    # bare `ascontiguousarray(x).ctypes.data` may free the temporary before
    # fn() runs when a copy was actually made (use-after-free)
    l1 = np.ascontiguousarray(lut1, dtype=np.int16)
    la = np.ascontiguousarray(lut_a, dtype=np.int16)
    lb = np.ascontiguousarray(lut_b, dtype=np.int16)
    o = fn(
        data, n,
        l1.ctypes.data, la.ctypes.data, lb.ctypes.data,
        sl.ctypes.data, sk.ctypes.data, out.ctypes.data,
    )
    return out[:o].tobytes()
