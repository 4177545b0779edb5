"""brotli / zstd decompression via ctypes over the system shared libraries.

The container has no `brotli`/`pyzstd` python wheels, but it DOES ship the
C libraries (libbrotlidec.so, libzstd.so). These bindings call the public
C APIs directly (RFC 7932 brotli decoder; zstd streaming API,
facebook/zstd zstd.h) so the H6 extraction kernel reaches full
Content-Encoding parity with the reference (models.py:153-170 /
utils.py:552-584) without any new dependency.

Both decoders are streaming loops with explicit progress guards, so
truncated or corrupt input raises DecodingError instead of hanging —
malformed archives are first-class input, never an engine crash.
"""

from __future__ import annotations

import ctypes
import ctypes.util


class CodecUnavailable(Exception):
    """The shared library is not present on this host."""


def _load(*names: str):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    found = ctypes.util.find_library(names[0].split(".")[0].replace("lib", ""))
    if found:
        try:
            return ctypes.CDLL(found)
        except OSError:
            pass
    return None


_zstd = _load("libzstd.so.1", "libzstd.so")
_brdec = _load("libbrotlidec.so.1", "libbrotlidec.so")
_brenc = _load("libbrotlienc.so.1", "libbrotlienc.so")  # tests/fixtures only

_CHUNK = 1 << 17


# ---------------------------------------------------------------------------
# zstd
# ---------------------------------------------------------------------------


class _ZBuf(ctypes.Structure):
    _fields_ = [
        ("ptr", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


if _zstd is not None:
    _zstd.ZSTD_createDCtx.restype = ctypes.c_void_p
    _zstd.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
    _zstd.ZSTD_decompressStream.restype = ctypes.c_size_t
    _zstd.ZSTD_decompressStream.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(_ZBuf), ctypes.POINTER(_ZBuf),
    ]
    _zstd.ZSTD_isError.restype = ctypes.c_uint
    _zstd.ZSTD_isError.argtypes = [ctypes.c_size_t]
    _zstd.ZSTD_getErrorName.restype = ctypes.c_char_p
    _zstd.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
    _zstd.ZSTD_compressBound.restype = ctypes.c_size_t
    _zstd.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    _zstd.ZSTD_compress.restype = ctypes.c_size_t
    _zstd.ZSTD_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
    ]


def zstd_available() -> bool:
    return _zstd is not None


def zstd_decompress(data: bytes) -> bytes:
    """Streaming zstd decode of one or more concatenated frames."""
    if _zstd is None:
        raise CodecUnavailable("libzstd shared library not found")
    dctx = _zstd.ZSTD_createDCtx()
    if not dctx:
        raise MemoryError("ZSTD_createDCtx failed")
    try:
        src = ctypes.create_string_buffer(data, len(data))
        chunk = ctypes.create_string_buffer(_CHUNK)
        inb = _ZBuf(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
        out = bytearray()
        last_frame_done = True
        while inb.pos < inb.size:
            outb = _ZBuf(ctypes.cast(chunk, ctypes.c_void_p), _CHUNK, 0)
            before = (inb.pos, len(out))
            ret = _zstd.ZSTD_decompressStream(
                dctx, ctypes.byref(outb), ctypes.byref(inb)
            )
            if _zstd.ZSTD_isError(ret):
                name = _zstd.ZSTD_getErrorName(ret).decode("ascii", "replace")
                raise ValueError(f"zstd decode error: {name}")
            out += chunk.raw[: outb.pos]
            last_frame_done = ret == 0
            if (inb.pos, len(out)) == before:
                raise ValueError("zstd decode made no progress (corrupt input)")
        if not last_frame_done:
            raise ValueError("truncated zstd frame")
        return bytes(out)
    finally:
        _zstd.ZSTD_freeDCtx(dctx)


def zstd_compress(data: bytes, level: int = 3) -> bytes:
    """One-shot zstd encode (fixtures/tests only)."""
    if _zstd is None:
        raise CodecUnavailable("libzstd shared library not found")
    bound = _zstd.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    src = ctypes.create_string_buffer(data, len(data))
    ret = _zstd.ZSTD_compress(dst, bound, src, len(data), level)
    if _zstd.ZSTD_isError(ret):
        raise ValueError("zstd compress error")
    return dst.raw[:ret]


# ---------------------------------------------------------------------------
# brotli
# ---------------------------------------------------------------------------

_BROTLI_RESULT_ERROR = 0
_BROTLI_RESULT_SUCCESS = 1
_BROTLI_RESULT_NEEDS_MORE_INPUT = 2
_BROTLI_RESULT_NEEDS_MORE_OUTPUT = 3

if _brdec is not None:
    _brdec.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    _brdec.BrotliDecoderCreateInstance.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _brdec.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
    _brdec.BrotliDecoderDecompressStream.restype = ctypes.c_int
    _brdec.BrotliDecoderDecompressStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_size_t),
    ]

if _brenc is not None:
    _brenc.BrotliEncoderCompress.restype = ctypes.c_int
    _brenc.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_size_t, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_void_p,
    ]
    _brenc.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
    _brenc.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]


def brotli_available() -> bool:
    return _brdec is not None


def brotli_decompress(data: bytes) -> bytes:
    """Streaming brotli decode (RFC 7932) of one complete stream."""
    if _brdec is None:
        raise CodecUnavailable("libbrotlidec shared library not found")
    st = _brdec.BrotliDecoderCreateInstance(None, None, None)
    if not st:
        raise MemoryError("BrotliDecoderCreateInstance failed")
    try:
        src = ctypes.create_string_buffer(data, len(data))
        chunk = ctypes.create_string_buffer(_CHUNK)
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.cast(src, ctypes.POINTER(ctypes.c_ubyte))
        out = bytearray()
        while True:
            avail_out = ctypes.c_size_t(_CHUNK)
            next_out = ctypes.cast(chunk, ctypes.POINTER(ctypes.c_ubyte))
            res = _brdec.BrotliDecoderDecompressStream(
                st,
                ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out),
                None,
            )
            out += chunk.raw[: _CHUNK - avail_out.value]
            if res == _BROTLI_RESULT_SUCCESS:
                return bytes(out)
            if res == _BROTLI_RESULT_NEEDS_MORE_OUTPUT:
                continue
            if res == _BROTLI_RESULT_NEEDS_MORE_INPUT:
                raise ValueError("truncated brotli stream")
            raise ValueError("brotli decode error (corrupt input)")
    finally:
        _brdec.BrotliDecoderDestroyInstance(st)


def brotli_compress(data: bytes, quality: int = 5) -> bytes:
    """One-shot brotli encode (fixtures/tests only)."""
    if _brenc is None:
        raise CodecUnavailable("libbrotlienc shared library not found")
    bound = max(_brenc.BrotliEncoderMaxCompressedSize(len(data)), 64)
    dst = ctypes.create_string_buffer(bound)
    out_size = ctypes.c_size_t(bound)
    src = ctypes.create_string_buffer(data, len(data))
    ok = _brenc.BrotliEncoderCompress(
        quality, 22, 0, len(data), src, ctypes.byref(out_size), dst
    )
    if not ok:
        raise ValueError("brotli compress error")
    return dst.raw[: out_size.value]
