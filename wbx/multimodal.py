"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are plain ``binary`` columns with a typed
metadata struct alongside — the Spark-side plumbing (schemas, batch shapes,
partition sizing, UDF signatures) is real and tested:

- :func:`sniff_media` — magic-byte container detection (real, pure bytes);
- :func:`media_features` — deterministic fake featurizer standing in for a
  decode→embed kernel, same signature/batching a real one would have;
- :func:`decode_image` — REAL for PNG (system libpng via ctypes, the
  wbx.codecs binding pattern) and WebP (system libwebp — its pure
  return-code API is exactly as ctypes-safe as libpng's simplified read,
  and WebP is the modern web's dominant image container); Pillow is used
  instead when importable. JPEG raises NotImplementedError from the
  clearly-marked seam (libjpeg's classic API needs setjmp error hooks
  ctypes cannot provide — see the _PngImage comment);
- :func:`decode_audio` / :func:`decode_audios` — REAL for WAV (stdlib
  RIFF parse; PCM reduced to rate/duration/RMS/peak features inside the
  Arrow batch, raw audio never leaves the task).

Scale notes: media rows are fat (100 KB–10 MB). The operators below use
``mapInPandas`` with small Arrow batches (set
``spark.sql.execution.arrow.maxRecordsPerBatch`` ≈ 256 for media tables so
a batch stays ≤ a few hundred MB) and never shuffle payload bytes — feature
extraction happens at the scan, only (id, features) moves on.
"""

from __future__ import annotations

import ctypes
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video | unknown
        T.StructField("container", T.StringType(), True),  # png | jpeg | gif | riff | mp4 | ...
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image", "png"),
    (b"\xff\xd8\xff", "image", "jpeg"),
    (b"GIF87a", "image", "gif"),
    (b"GIF89a", "image", "gif"),
    (b"ID3", "audio", "mp3"),
    (b"\x00\x00\x00", "video", "mp4"),  # ftyp boxes start with size prefix
]

# RIFF is a family, not a format: the fourcc at offset 8 names the payload.
# A bare "RIFF" prefix match would call every WebP image and AVI video an
# audio file.
_RIFF_FOURCC = {
    b"WEBP": ("image", "webp"),
    b"WAVE": ("audio", "wav"),
    b"AVI ": ("video", "avi"),
}


def sniff_bytes(data: bytes | None) -> tuple[str, str]:
    if not data:
        return "unknown", "empty"
    if bytes(data[:4]) == b"RIFF":
        return _RIFF_FOURCC.get(bytes(data[8:12]), ("unknown", "riff"))
    for magic, kind, container in _MAGIC:
        if data.startswith(magic):
            return kind, container
    return "unknown", "unknown"


def sniff_media(df: DataFrame, id_col: str = "media_id", bytes_col: str = "payload") -> DataFrame:
    """binary payload → (media_id, kind, container, n_bytes) metadata."""

    def sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(data) if data is not None else None
                kind, container = sniff_bytes(b)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "container": container,
                        "n_bytes": len(b) if b is not None else 0,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "container", "n_bytes"])

    return df.mapInPandas(sniff, schema=MEDIA_META)


class ImageDecodeError(Exception):
    """The payload could not be decoded (corrupt or unsupported image)."""


# --- PNG decode via the system libpng16 simplified API (ctypes, same
# pattern as wbx.codecs' brotli/zstd bindings). png_image is libpng's
# stable struct-based "simplified read" API — no setjmp error handling is
# required of the caller, which is what makes it safely reachable from
# ctypes (libjpeg's classic API is NOT: jpeg_CreateDecompress validates a
# compile-time struct size and the default error manager longjmps).
class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


_PNG_IMAGE_VERSION = 1
_PNG_FORMAT_RGB = 0x02  # PNG_FORMAT_FLAG_COLOR


def _load_libpng():
    import ctypes.util

    for name in ("libpng16.so.16", "libpng16.so", "libpng.so"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        found = ctypes.util.find_library("png16") or ctypes.util.find_library("png")
        if not found:
            return None
        try:
            lib = ctypes.CDLL(found)
        except OSError:
            return None
    try:
        lib.png_image_begin_read_from_memory.restype = ctypes.c_int
        lib.png_image_begin_read_from_memory.argtypes = [
            ctypes.POINTER(_PngImage),
            ctypes.c_char_p,
            ctypes.c_size_t,
        ]
        lib.png_image_finish_read.restype = ctypes.c_int
        lib.png_image_finish_read.argtypes = [
            ctypes.POINTER(_PngImage),
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.png_image_free.argtypes = [ctypes.POINTER(_PngImage)]
    except AttributeError:
        return None  # too old for the simplified API
    return lib


_libpng = _load_libpng()


def _load_libwebp():
    """libwebp's decode API is pure return codes (NULL on corrupt input,
    verified: no longjmp, no exit()), so it is as ctypes-safe as libpng's
    simplified read — unlike libjpeg (see _PngImage)."""
    import ctypes.util

    for name in ("libwebp.so.7", "libwebp.so"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        found = ctypes.util.find_library("webp")
        if not found:
            return None
        try:
            lib = ctypes.CDLL(found)
        except OSError:
            return None
    try:
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGBInto.restype = ctypes.c_void_p
        lib.WebPDecodeRGBInto.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_int,
        ]
    except AttributeError:
        return None
    return lib


_libwebp = _load_libwebp()

try:  # Pillow decodes everything when present; libpng covers PNG otherwise
    from PIL import Image as _PILImage  # type: ignore[import-not-found]
except ImportError:  # pragma: no cover
    _PILImage = None


def decode_image(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode an image payload to (width, height, "RGB", pixel_bytes) —
    pixels row-major RGB8, stride = width*3.

    Decoder probe order: Pillow when importable (any container), else the
    system libpng / libwebp via ctypes (PNG and WebP — see _PngImage for
    why libjpeg's classic C API can't be bound the same way). Raises
    ImageDecodeError on corrupt input and NotImplementedError only when NO
    decoder for the container exists on the host — the pipeline around
    this seam (sniffing, batching, resize geometry, feature shape) is real
    and tested either way."""
    if data is None or len(data) == 0:
        raise ImageDecodeError("empty payload")
    if _PILImage is not None:
        import io as _io

        try:
            with _PILImage.open(_io.BytesIO(bytes(data))) as im:
                rgb = im.convert("RGB")
                return rgb.width, rgb.height, "RGB", rgb.tobytes()
        except Exception as e:
            raise ImageDecodeError(str(e))
    is_png = bytes(data[:8]) == b"\x89PNG\r\n\x1a\n"
    if is_png and _libpng is not None:
        img = _PngImage()
        img.version = _PNG_IMAGE_VERSION
        buf = bytes(data)
        if not _libpng.png_image_begin_read_from_memory(
            ctypes.byref(img), buf, len(buf)
        ):
            raise ImageDecodeError(
                f"libpng: {img.message.decode('utf-8', 'replace')}"
            )
        img.format = _PNG_FORMAT_RGB
        out = ctypes.create_string_buffer(img.width * img.height * 3)
        ok = _libpng.png_image_finish_read(
            ctypes.byref(img), None, out, 0, None
        )
        if not ok:
            _libpng.png_image_free(ctypes.byref(img))
            raise ImageDecodeError(
                f"libpng: {img.message.decode('utf-8', 'replace')}"
            )
        return int(img.width), int(img.height), "RGB", out.raw
    is_webp = (
        len(data) >= 12
        and bytes(data[:4]) == b"RIFF"
        and bytes(data[8:12]) == b"WEBP"
    )
    if is_webp and _libwebp is not None:
        buf = bytes(data)
        w, h = ctypes.c_int(), ctypes.c_int()
        if not _libwebp.WebPGetInfo(buf, len(buf), ctypes.byref(w), ctypes.byref(h)):
            raise ImageDecodeError("libwebp: malformed WebP header")
        n_out = w.value * h.value * 3
        out = ctypes.create_string_buffer(n_out)
        # returns the output pointer on success, NULL on corrupt payload
        if not _libwebp.WebPDecodeRGBInto(buf, len(buf), out, n_out, w.value * 3):
            raise ImageDecodeError("libwebp: corrupt WebP payload")
        return w.value, h.value, "RGB", out.raw
    raise NotImplementedError(
        "no decoder available for this payload on this host: Pillow is not "
        "installed and the system libpng/libwebp bindings "
        f"{'cover only PNG and WebP' if (_libpng or _libwebp) is not None else 'are unavailable'}"
    )


def image_dimensions(data: bytes) -> tuple[int, int, str]:
    """Header-only image geometry: (width, height, container) parsed from
    container metadata WITHOUT decoding pixels — pure Python, no native
    libs, covers JPEG too (its SOF segment is a plain big-endian parse;
    only pixel decode needs libjpeg's setjmp contract).

    This is the at-scale filtering primitive: dimension gates (icon/banner
    removal, aspect-ratio filters) over 100 TB of crawled media should read
    a few hundred header bytes per payload, never run a decoder. Raises
    ImageDecodeError on truncated/non-image payloads.

    Formats: PNG (IHDR), GIF (logical screen descriptor), JPEG (first SOF0-
    SOF15 marker), WebP (VP8 key-frame / VP8L stream header / VP8X canvas).
    """
    import struct

    if data is None or len(data) == 0:
        raise ImageDecodeError("empty payload")
    b = bytes(data)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) < 24 or b[12:16] != b"IHDR":
            raise ImageDecodeError("png: truncated before IHDR")
        w, h = struct.unpack(">II", b[16:24])
        return w, h, "png"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) < 10:
            raise ImageDecodeError("gif: truncated screen descriptor")
        w, h = struct.unpack("<HH", b[6:10])
        return w, h, "gif"
    if b[:3] == b"\xff\xd8\xff":
        # walk marker segments to the first start-of-frame
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if 0xD0 <= marker <= 0xD9 or marker == 0x01:
                # standalone RSTn/SOI/EOI and the parameterless TEM
                # marker (0x01) carry no length word
                i += 2
                continue
            if marker == 0x00:  # byte-stuffed literal 0xFF, not a marker
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(b):
                    break
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return w, h, "jpeg"
            i += 2 + seg_len
        raise ImageDecodeError("jpeg: no SOF marker found")
    if len(b) >= 30 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        fourcc, payload = b[12:16], b[20:]
        if fourcc == b"VP8 " and payload[3:6] == b"\x9d\x01\x2a":
            w = struct.unpack("<H", payload[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", payload[8:10])[0] & 0x3FFF
            return w, h, "webp"
        if fourcc == b"VP8L" and payload[0] == 0x2F:
            bits = struct.unpack("<I", payload[1:5])[0]
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "webp"
        if fourcc == b"VP8X":
            w = int.from_bytes(payload[4:7], "little") + 1
            h = int.from_bytes(payload[7:10], "little") + 1
            return w, h, "webp"
        raise ImageDecodeError("webp: unrecognized stream header")
    raise ImageDecodeError("not a recognized image container")


DIMENSIONS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def media_dimensions(
    df: DataFrame, id_col: str = "media_id", bytes_col: str = "payload"
) -> DataFrame:
    """Header-only dimension extraction as a pipeline stage: payload →
    (container, width, height) via :func:`image_dimensions`; malformed
    payloads degrade to (NULLs, error) rows. Payload bytes are consumed at
    the scan — only the few-column geometry rows move on, the
    never-shuffle-payloads shape shared by every operator in this module."""

    def dims(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "container", "width", "height", "error"]
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                row = dict.fromkeys(cols)
                row["media_id"] = mid
                try:
                    w, h, container = image_dimensions(
                        bytes(data) if data is not None else b""
                    )
                    row.update(container=container, width=w, height=h)
                except ImageDecodeError as e:
                    row["error"] = str(e)
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(dims, schema=DIMENSIONS_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def media_features(
    df: DataFrame, dim: int = 16, id_col: str = "media_id", bytes_col: str = "payload"
) -> DataFrame:
    """Deterministic stand-in featurizer: byte-histogram projection.

    Real pipelines put decode→model-forward here; the batching, schema and
    shuffle shape are identical. Fully deterministic (no model weights):
    features = normalized 16-bin byte histogram."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                ids.append(mid)
                if data is None or len(data) == 0:
                    feats.append([0.0] * dim)
                    continue
                arr = np.frombuffer(bytes(data), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                total = hist.sum()
                feats.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return df.mapInPandas(featurize, schema=FEATURES_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
        T.StructField("pixels", T.BinaryType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def decode_images(
    df: DataFrame, id_col: str = "media_id", bytes_col: str = "payload"
) -> DataFrame:
    """Real image decode as a pipeline stage: payload → (width, height,
    mode, RGB8 pixels) via :func:`decode_image` (Pillow, else system
    libpng). Undecodable payloads become (NULLs, error) rows instead of
    failing the stage — crawled media is routinely corrupt, and malformed
    input is first-class output here, never an engine crash.

    Scale shape: payloads are consumed at the scan inside the Arrow batch;
    only decoded pixel buffers move on, and nothing shuffles."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                row = {
                    "media_id": mid,
                    "width": None,
                    "height": None,
                    "mode": None,
                    "pixels": None,
                    "error": None,
                }
                try:
                    b = bytes(data) if data is not None else b""
                    w, h, mode, px = decode_image(b)
                    row.update(width=w, height=h, mode=mode, pixels=px)
                except (ImageDecodeError, NotImplementedError) as e:
                    row["error"] = str(e)
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "mode", "pixels", "error"],
            )

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    id_col: str = "media_id",
    bytes_col: str = "payload",
) -> DataFrame:
    """Resize/thumbnail kernel seam (the brief's decode→resample stage).

    A real pipeline decodes the container (see :func:`decode_image`) and
    resamples to (width, height); the decoder is absent in this container,
    so the stand-in emits a deterministic grayscale thumbnail by strided
    byte sampling of the payload — the schema, Arrow batching, and output
    size (width*height one-byte pixels) are exactly what a real resampler
    produces, so downstream plumbing is fully exercised. Payload bytes are
    consumed at the scan; only thumbnails (64 B at 8×8) move on — the same
    never-shuffle-payloads shape as media_features."""
    n_px = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, px = [], []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                ids.append(mid)
                if data is None or len(data) == 0:
                    px.append(None)
                    continue
                arr = np.frombuffer(bytes(data), dtype=np.uint8)
                idx = np.linspace(0, len(arr) - 1, n_px).astype(np.int64)
                px.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                    "pixels": px,
                }
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n: int = 30, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_index) rows the
    decode stage would materialize — demonstrates fan-out sizing without a
    decoder. Deterministic synthetic duration from payload length."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.length(F.col("payload")) / 1000).cast("long"), F.lit(1)
                )
                - 1,
                F.lit(every_n),
            )
        ).alias("frame_index"),
    )


# --- real WAV audio decode (pure stdlib RIFF parse; no external deps) ------


class AudioDecodeError(Exception):
    pass


def decode_audio(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a WAV payload → (n_channels, sample_rate, n_frames,
    PCM bytes). Stdlib ``wave`` does the RIFF parsing — WAV is the one
    audio container decodable with zero native dependencies, which makes
    this stage REAL in this container (the compressed-codec step for
    mp3/ogg would sit behind the same seam as decode_image's Pillow
    probe). Raises AudioDecodeError on anything malformed."""
    import io
    import wave

    if data is None or len(data) == 0:
        raise AudioDecodeError("empty payload")
    try:
        with wave.open(io.BytesIO(bytes(data))) as w:
            return (
                w.getnchannels(),
                w.getframerate(),
                w.getnframes(),
                w.readframes(w.getnframes()),
            )
    except AudioDecodeError:
        raise
    except Exception as e:
        raise AudioDecodeError(str(e))


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def decode_audios(
    df: DataFrame, id_col: str = "media_id", bytes_col: str = "payload"
) -> DataFrame:
    """Real audio decode + featurize as a pipeline stage: WAV payload →
    (channels, rate, frames, duration, RMS amplitude, peak) via
    :func:`decode_audio`; PCM samples are reduced to features INSIDE the
    Arrow batch (numpy over int16/int8 frames) so raw audio never leaves
    the task. Undecodable payloads degrade to (NULLs, error) rows — same
    malformed-input-is-output contract as decode_images."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "n_channels", "sample_rate", "n_frames",
            "duration_ms", "rms", "peak", "error",
        ]
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                row = dict.fromkeys(cols)
                row["media_id"] = mid
                try:
                    nch, rate, nfr, pcm = decode_audio(
                        bytes(data) if data is not None else b""
                    )
                    width = len(pcm) // (nch * nfr) if nch * nfr else 0
                    if width == 2:
                        samples = np.frombuffer(pcm, dtype="<i2")
                    elif width == 1:
                        # 8-bit WAV is unsigned, centered at 128
                        samples = np.frombuffer(pcm, dtype="u1").astype(
                            np.int16
                        ) - 128
                    else:
                        raise AudioDecodeError(
                            f"unsupported sample width {width}"
                        )
                    f = samples.astype(np.float64)
                    row.update(
                        n_channels=nch,
                        sample_rate=rate,
                        n_frames=nfr,
                        duration_ms=int(nfr * 1000 // rate) if rate else 0,
                        rms=float(np.sqrt(np.mean(f * f))) if len(f) else 0.0,
                        peak=int(np.max(np.abs(samples))) if len(samples) else 0,
                    )
                except AudioDecodeError as e:
                    row["error"] = str(e)
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(decode, schema=AUDIO_SCHEMA)
