"""Multimodal plumbing tests: magic sniffing, the deterministic stand-in
featurizer (numeric goldens recomputed independently), the frame-sample
fan-out plan, and real PNG decode through the host decoder probe
(Pillow, else system libpng via ctypes)."""

from __future__ import annotations

import numpy as np
import pytest

from wbx import multimodal


PAYLOADS = [
    (0, b"\x89PNG\r\n\x1a\n" + b"pngdata" * 10, "image", "png"),
    (1, b"\xff\xd8\xff\xe0" + b"\x00" * 50, "image", "jpeg"),
    (2, b"GIF89a" + b"\x01\x02" * 8, "image", "gif"),
    (3, b"GIF87a" + b"x", "image", "gif"),
    (4, b"RIFF\x24\x00\x00\x00WAVEfmt ", "audio", "wav"),
    (5, b"ID3\x03" + b"mp3" * 5, "audio", "mp3"),
    (6, b"\x00\x00\x00\x18ftypmp42", "video", "mp4"),
    (7, b"just plain text", "unknown", "unknown"),
    (8, b"", "unknown", "empty"),
    (9, None, "unknown", "empty"),
    # RIFF is a container family — the fourcc at offset 8 discriminates
    (10, b"RIFF\x10\x00\x00\x00WEBPVP8L", "image", "webp"),
    (11, b"RIFF\x10\x00\x00\x00AVI LIST", "video", "avi"),
    (12, b"RIFF\x04\x00\x00\x00JUNK", "unknown", "riff"),
    (13, b"RIFFtrunc", "unknown", "riff"),  # too short for a fourcc
]


def media_df(spark, payloads=PAYLOADS):
    return spark.createDataFrame(
        [(i, bytearray(p) if p is not None else None) for i, p, _, _ in payloads],
        "media_id long, payload binary",
    )


class TestSniff:
    def test_sniff_bytes_goldens(self):
        for _, payload, kind, container in PAYLOADS:
            assert multimodal.sniff_bytes(payload) == (kind, container)

    def test_sniff_media_dataframe(self, spark):
        rows = multimodal.sniff_media(media_df(spark)).orderBy("media_id").collect()
        for r, (mid, payload, kind, container) in zip(rows, PAYLOADS):
            assert r["media_id"] == mid
            assert (r["kind"], r["container"]) == (kind, container)
            assert r["n_bytes"] == (len(payload) if payload else 0)


class TestFeatures:
    def test_histogram_matches_numpy_golden(self, spark):
        rows = (
            multimodal.media_features(media_df(spark), dim=16)
            .orderBy("media_id")
            .collect()
        )
        by_id = {r["media_id"]: r["features"] for r in rows}
        for mid, payload, _, _ in PAYLOADS:
            feats = by_id[mid]
            assert len(feats) == 16
            if not payload:
                assert feats == [0.0] * 16
                continue
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=16, range=(0, 256))
            expected = (hist / hist.sum()).astype(np.float32)
            assert np.allclose(feats, expected)
            assert abs(sum(feats) - 1.0) < 1e-5

    def test_deterministic_across_parallelism(self, spark):
        df = media_df(spark)
        a = sorted(map(tuple, multimodal.media_features(df).collect()))
        b = sorted(map(tuple, multimodal.media_features(df.repartition(4)).collect()))
        assert a == b


class TestFramePlan:
    def test_fanout_counts(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"x" * 100)), (2, bytearray(b"y" * 65_000))],
            "media_id long, payload binary",
        )
        rows = multimodal.frame_sample_plan(df, every_n=30).collect()
        got = {}
        for r in rows:
            got.setdefault(r["media_id"], []).append(r["frame_index"])
        assert sorted(got[1]) == [0]  # <1000 bytes → 1 synthetic frame
        assert sorted(got[2]) == [0, 30, 60]  # 65 frames, every 30th


def _png_bytes(width, height, pixels):
    """Hand-rolled minimal PNG (8-bit RGB, no interlace) — no image
    library needed to build the fixture, so the test exercises the decoder
    independently."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(pixels[y * width * 3 : (y + 1) * width * 3])
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


_HAS_DECODER = multimodal._PILImage is not None or multimodal._libpng is not None


class TestDecodeSeam:
    @pytest.mark.skipif(not _HAS_DECODER, reason="no PNG decoder on host")
    def test_png_decodes_to_rgb_pixels(self):
        px = [255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30]  # 2x2 RGB
        w, h, mode, out = multimodal.decode_image(_png_bytes(2, 2, px))
        assert (w, h, mode) == (2, 2, "RGB")
        assert list(out) == px

    @pytest.mark.skipif(not _HAS_DECODER, reason="no PNG decoder on host")
    def test_corrupt_png_raises_decode_error(self):
        good = _png_bytes(2, 2, [0] * 12)
        bad = good[:20] + b"\xff\xff\xff\xff" + good[24:]
        with pytest.raises(multimodal.ImageDecodeError):
            multimodal.decode_image(bad)

    def test_empty_payload_raises(self):
        with pytest.raises(multimodal.ImageDecodeError):
            multimodal.decode_image(b"")

    @pytest.mark.skipif(not _HAS_DECODER, reason="no PNG decoder on host")
    def test_decode_images_dataframe_stage(self, spark):
        """decode_images decodes valid PNGs and degrades corrupt/unknown
        payloads to error rows without failing the stage."""
        good = _png_bytes(2, 1, [1, 2, 3, 4, 5, 6])
        rows = [
            (1, bytearray(good)),
            (2, bytearray(b"\x89PNG\r\n\x1a\nGARBAGE")),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {r["media_id"]: r for r in multimodal.decode_images(df).collect()}
        assert (got[1]["width"], got[1]["height"], got[1]["mode"]) == (2, 1, "RGB")
        assert list(got[1]["pixels"]) == [1, 2, 3, 4, 5, 6]
        assert got[1]["error"] is None
        assert got[2]["pixels"] is None and got[2]["error"]
        assert got[3]["pixels"] is None and got[3]["error"]

    def test_unsupported_container_is_declared(self):
        """Non-PNG containers (JPEG) either decode via Pillow or raise the
        declared NotImplementedError — never a silent wrong answer."""
        if multimodal._PILImage is not None:
            pytest.skip("Pillow present: JPEG path exercised by Pillow")
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\xff\xd8\xff\xe0junk")


def _webp_bytes(width, height, pixels):
    """Losslessly encode RGB8 pixels with the system libwebp encoder —
    fixture built through a different code path (VP8L encode) than the one
    under test (WebPDecodeRGBInto), so the roundtrip is a real check."""
    import ctypes

    lib = ctypes.CDLL("libwebp.so.7")
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGB(
        bytes(pixels), width, height, width * 3, ctypes.byref(out)
    )
    assert n > 0
    data = ctypes.string_at(out.value, n)
    lib.WebPFree(out)
    return data


class TestWebPDecode:
    """Real WebP decode through the system libwebp ctypes binding."""

    @pytest.mark.skipif(
        multimodal._libwebp is None, reason="no system libwebp on host"
    )
    def test_lossless_roundtrip_exact_pixels(self):
        px = [255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30]  # 2x2 RGB
        data = _webp_bytes(2, 2, px)
        assert multimodal.sniff_bytes(data) == ("image", "webp")
        w, h, mode, out = multimodal.decode_image(data)
        assert (w, h, mode) == (2, 2, "RGB")
        assert list(out) == px

    @pytest.mark.skipif(
        multimodal._libwebp is None, reason="no system libwebp on host"
    )
    def test_corrupt_webp_raises_decode_error(self):
        good = _webp_bytes(4, 3, list(range(36)))
        bad = good[:20] + b"\x00" * (len(good) - 20)
        with pytest.raises(multimodal.ImageDecodeError):
            multimodal.decode_image(bad)
        # truncated mid-header: malformed, never a crash
        with pytest.raises(multimodal.ImageDecodeError):
            multimodal.decode_image(good[:16])

    @pytest.mark.skipif(
        multimodal._libwebp is None, reason="no system libwebp on host"
    )
    def test_decode_images_stage_mixed_containers(self, spark):
        """PNG and WebP decode side by side in one mapInPandas stage;
        corrupt rows degrade to error rows."""
        px = [1, 2, 3, 4, 5, 6]
        rows = [
            (1, bytearray(_png_bytes(2, 1, px))),
            (2, bytearray(_webp_bytes(2, 1, px))),
            (3, bytearray(b"RIFF\x10\x00\x00\x00WEBPgarbage!")),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {r["media_id"]: r for r in multimodal.decode_images(df).collect()}
        for mid in (1, 2):
            assert (got[mid]["width"], got[mid]["height"]) == (2, 1)
            assert list(got[mid]["pixels"]) == px
            assert got[mid]["error"] is None
        assert got[3]["pixels"] is None and got[3]["error"]


class TestResize:
    def test_thumbnail_shape_and_determinism(self, spark):
        df = media_df(spark)
        out = {
            r["media_id"]: r
            for r in multimodal.resize_images(df, width=8, height=8).collect()
        }
        for mid, payload, _, _ in PAYLOADS:
            r = out[mid]
            assert (r["width"], r["height"]) == (8, 8)
            if not payload:
                assert r["pixels"] is None
                continue
            assert len(r["pixels"]) == 64
            arr = np.frombuffer(payload, dtype=np.uint8)
            idx = np.linspace(0, len(arr) - 1, 64).astype(np.int64)
            assert bytes(r["pixels"]) == arr[idx].tobytes()

    def test_parallelism_independent(self, spark):
        df = media_df(spark)
        a = multimodal.resize_images(df.repartition(1), 4, 4).collect()
        b = multimodal.resize_images(df.repartition(8), 4, 4).collect()
        key = lambda r: r["media_id"]
        assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(
            map(tuple, b), key=lambda t: t[0]
        )


class TestAudioDecode:
    def _wav(self, freq=440.0, rate=8000, n=800, channels=1, width=2):
        import io
        import math
        import struct
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(width)
            w.setframerate(rate)
            frames = bytearray()
            for i in range(n):
                v = int(20000 * math.sin(2 * math.pi * freq * i / rate))
                for _ in range(channels):
                    if width == 2:
                        frames += struct.pack("<h", v)
                    else:
                        frames.append((v // 256) + 128 & 0xFF)
            w.writeframes(bytes(frames))
        return buf.getvalue()

    def test_decode_audio_roundtrip(self):
        from wbx.multimodal import decode_audio

        nch, rate, nfr, pcm = decode_audio(self._wav())
        assert (nch, rate, nfr) == (1, 8000, 800)
        assert len(pcm) == 800 * 2

    def test_decode_audios_features(self, spark):
        import numpy as np

        from wbx.multimodal import decode_audios

        media = spark.createDataFrame(
            [
                (0, bytearray(self._wav())),
                (1, bytearray(self._wav(freq=880.0, channels=2))),
                (2, bytearray(b"ID3 not a wav")),
                (3, None),
            ],
            "media_id long, payload binary",
        )
        got = {r["media_id"]: r for r in decode_audios(media).collect()}
        r0 = got[0]
        assert (r0["n_channels"], r0["sample_rate"], r0["n_frames"]) == (1, 8000, 800)
        assert r0["duration_ms"] == 100
        # sine RMS ~ amplitude/sqrt(2)
        assert r0["rms"] == pytest.approx(20000 / np.sqrt(2), rel=0.01)
        assert r0["peak"] <= 20000 and r0["peak"] >= 19000
        assert got[1]["n_channels"] == 2 and got[1]["error"] is None
        assert got[2]["error"] is not None and got[2]["rms"] is None
        assert got[3]["error"] is not None

    def test_8bit_wav(self, spark):
        from wbx.multimodal import decode_audios

        media = spark.createDataFrame(
            [(0, bytearray(self._wav(width=1)))], "media_id long, payload binary"
        )
        r = decode_audios(media).collect()[0]
        assert r["error"] is None and r["n_frames"] == 800 and r["rms"] > 0


def _jpeg_header_bytes(width, height):
    """Minimal JPEG prefix: SOI + APP0 stub + SOF0 — enough for header
    geometry (a full entropy-coded body isn't needed to test the SOF walk)."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof


class TestImageDimensions:
    """Header-only geometry parse — no decoder, covers JPEG too."""

    def test_png_gif_jpeg_goldens(self):
        from wbx.multimodal import image_dimensions

        assert image_dimensions(_png_bytes(5, 3, [0] * 45)) == (5, 3, "png")
        gif = b"GIF89a" + (7).to_bytes(2, "little") + (9).to_bytes(2, "little") + b"\x00" * 3
        assert image_dimensions(gif) == (7, 9, "gif")
        assert image_dimensions(_jpeg_header_bytes(640, 480)) == (640, 480, "jpeg")
        # rare-but-valid marker sequences before SOF: the parameterless
        # TEM marker (0xFF01) and a byte-stuffed 0xFF00 must be skipped
        # as standalone, not parsed as length-bearing segments
        base = _jpeg_header_bytes(12, 34)
        with_tem = base[:2] + b"\xff\x01" + b"\xff\x00" + base[2:]
        assert image_dimensions(with_tem) == (12, 34, "jpeg")
        # JPEG dimensions are the one geometry libjpeg-free parsing CAN
        # deliver; pixels still raise the declared seam
        if multimodal._PILImage is None:
            with pytest.raises(NotImplementedError):
                multimodal.decode_image(_jpeg_header_bytes(2, 2))

    @pytest.mark.skipif(
        multimodal._libwebp is None, reason="no system libwebp on host"
    )
    def test_webp_vp8l_matches_real_decode(self):
        from wbx.multimodal import decode_image, image_dimensions

        data = _webp_bytes(6, 4, list(range(6 * 4 * 3)))
        w, h, container = image_dimensions(data)
        assert (w, h, container) == (6, 4, "webp")
        dw, dh, _, _ = decode_image(data)
        assert (dw, dh) == (w, h)

    def test_webp_vp8x_canvas(self):
        from wbx.multimodal import image_dimensions

        payload = b"\x00" + b"\x00" * 3 + (99).to_bytes(3, "little") + (49).to_bytes(3, "little")
        chunk = b"VP8X" + len(payload).to_bytes(4, "little") + payload
        data = b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
        assert image_dimensions(data) == (100, 50, "webp")

    def test_malformed_inputs_raise(self):
        from wbx.multimodal import ImageDecodeError, image_dimensions

        for bad in (
            b"",
            b"\x89PNG\r\n\x1a\nIH",  # truncated before IHDR
            b"GIF89a\x07",  # truncated descriptor
            b"\xff\xd8\xff\xe0\x00\x04\x00\x00",  # no SOF
            b"RIFF\x10\x00\x00\x00WEBPJUNK" + b"\x00" * 10,
            b"plain text, not an image",
        ):
            with pytest.raises(ImageDecodeError):
                image_dimensions(bad)

    def test_media_dimensions_stage(self, spark):
        from wbx.multimodal import media_dimensions

        rows = [
            (1, bytearray(_png_bytes(2, 1, [1, 2, 3, 4, 5, 6]))),
            (2, bytearray(_jpeg_header_bytes(320, 200))),
            (3, bytearray(b"not an image")),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {r["media_id"]: r for r in media_dimensions(df).collect()}
        assert (got[1]["container"], got[1]["width"], got[1]["height"]) == ("png", 2, 1)
        assert (got[2]["container"], got[2]["width"], got[2]["height"]) == ("jpeg", 320, 200)
        assert got[3]["error"] and got[3]["width"] is None
        assert got[4]["error"] and got[4]["container"] is None
