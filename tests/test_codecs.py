"""Pure-stdlib PNG/WAV codec tests (functions/codecs.py) and the real-decode
multimodal path that uses them (decode_image/decode_audio signature sniffing,
synthesize_media_lossless end-to-end).

Mirrors the reference's decode-boundary coverage strategy: round-trip every
encoder filter type through the decoder (all five PNG unfilter paths), every
supported WAV sample format, and loud rejection for the unsupported corners.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rastr_spark.functions.codecs import (
    PNG_MAGIC,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


def _rng(seed=0):
    return np.random.RandomState(seed)


def _fix_crcs(data: bytes | bytearray) -> bytes:
    """Recompute every chunk CRC — lets tests mutate chunk payloads to target
    rejection paths DEEPER than the CRC gate."""
    out = bytearray(data)
    pos = 8
    while pos + 8 <= len(out):
        (length,) = struct.unpack(">I", bytes(out[pos : pos + 4]))
        ctype = bytes(out[pos + 4 : pos + 8])
        payload = bytes(out[pos + 8 : pos + 8 + length])
        out[pos + 8 + length : pos + 12 + length] = struct.pack(
            ">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF
        )
        pos += 12 + length
    return bytes(out)


class TestPngRoundTrip:
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_roundtrip_all_filters_and_channels(self, filter_type, channels):
        img = _rng(filter_type * 7 + channels).randint(
            0, 256, size=(11, 7, channels), dtype=np.uint8
        )
        out = decode_png(encode_png(img, filter_type=filter_type))
        np.testing.assert_array_equal(out, img)

    @pytest.mark.parametrize("shape", [(1, 1, 3), (1, 17, 3), (17, 1, 3), (64, 64, 3)])
    def test_roundtrip_shapes(self, shape):
        img = _rng(sum(shape)).randint(0, 256, size=shape, dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(img, filter_type=4)), img)

    def test_grayscale_2d_input(self):
        img = _rng(9).randint(0, 256, size=(8, 5), dtype=np.uint8)
        out = decode_png(encode_png(img, filter_type=1))
        np.testing.assert_array_equal(out, img[:, :, None])

    def test_adversarial_gradients(self):
        # smooth gradients are where Average/Paeth predictors actually engage
        y, x = np.mgrid[0:32, 0:32]
        img = np.stack([(y * 8) % 256, (x * 8) % 256, ((x + y) * 4) % 256], axis=2).astype(
            np.uint8
        )
        for f in range(5):
            np.testing.assert_array_equal(decode_png(encode_png(img, filter_type=f)), img)

    def test_palette_png_decodes_via_plte(self):
        # hand-build a color-type-3 PNG: decoder must expand indices through PLTE
        palette = _rng(3).randint(0, 256, size=(16, 3), dtype=np.uint8)
        idx = _rng(4).randint(0, 16, size=(6, 5), dtype=np.uint8)

        def chunk(ctype, payload):
            return (
                struct.pack(">I", len(payload))
                + ctype
                + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", 5, 6, 8, 3, 0, 0, 0)
        raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
        png = (
            PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", palette.tobytes())
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        np.testing.assert_array_equal(decode_png(png), palette[idx])

    def test_multiple_idat_chunks_concatenate(self):
        img = _rng(5).randint(0, 256, size=(9, 9, 3), dtype=np.uint8)
        data = encode_png(img, filter_type=2)
        # split the single IDAT into two chunks
        pos = 8
        parts = [data[:8]]
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            ctype = data[pos + 4 : pos + 8]
            payload = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if ctype == b"IDAT" and length > 10:
                h1, h2 = payload[: length // 2], payload[length // 2 :]
                for h in (h1, h2):
                    parts.append(
                        struct.pack(">I", len(h))
                        + b"IDAT"
                        + h
                        + struct.pack(">I", zlib.crc32(b"IDAT" + h) & 0xFFFFFFFF)
                    )
            else:
                parts.append(data[pos - 12 - length : pos])
        np.testing.assert_array_equal(decode_png(b"".join(parts)), img)

    def test_truncated_chunk_rejected_as_valueerror(self):
        img = _rng(6).randint(0, 256, size=(6, 6, 3), dtype=np.uint8)
        good = encode_png(img, filter_type=1)
        # cut mid-IDAT: chunk header declares more bytes than remain
        with pytest.raises(ValueError, match="truncated PNG|IDAT"):
            decode_png(good[: len(good) - 20])
        # corrupt deflate stream inside an intact chunk structure — CRC
        # recomputed so the zlib-corruption path (not the CRC gate) rejects
        bad = bytearray(good)
        bad[41] ^= 0xFF  # inside IDAT payload
        with pytest.raises(ValueError, match="corrupt PNG IDAT|IDAT size"):
            decode_png(_fix_crcs(bad))

    def test_crc_mismatch_rejected(self):
        # a bit-flip that keeps the deflate stream valid must still be loud:
        # every chunk's CRC32 is verified (ADVICE r5)
        img = _rng(11).randint(0, 256, size=(6, 6, 3), dtype=np.uint8)
        good = encode_png(img, filter_type=0)
        bad = bytearray(good)
        bad[41] ^= 0xFF  # payload changed, stored CRC untouched
        with pytest.raises(ValueError, match="CRC mismatch"):
            decode_png(bytes(bad))

    def test_decompression_bomb_bounded(self):
        # IHDR declares 4x4 gray (expected 84 bytes) but IDAT inflates to 10MB:
        # must reject via the bounded decompressor, not materialize the bomb
        def chunk(ctype, payload):
            return (
                struct.pack(">I", len(payload))
                + ctype
                + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
        bomb = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(
            b"IDAT", zlib.compress(b"\x00" * 10_000_000)
        ) + chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="IDAT size mismatch"):
            decode_png(bomb)

    def test_rejections_are_loud(self):
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        good = encode_png(img)
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"JUNK" + good[4:])
        # flip bit depth to 16 inside IHDR (byte offset: 8 sig + 8 hdr + 8 w/h);
        # CRCs recomputed so the depth check, not the CRC gate, rejects
        bad_depth = bytearray(good)
        bad_depth[24] = 16
        with pytest.raises(NotImplementedError, match="bit depth"):
            decode_png(_fix_crcs(bad_depth))
        bad_interlace = bytearray(good)
        bad_interlace[28] = 1
        with pytest.raises(NotImplementedError, match="interlaced"):
            decode_png(_fix_crcs(bad_interlace))
        with pytest.raises(TypeError):
            encode_png(img.astype(np.int32))
        with pytest.raises(ValueError, match="channel count"):
            encode_png(np.zeros((4, 4, 5), dtype=np.uint8))


if HAVE_HYPOTHESIS:

    class TestPngProperties:
        @given(
            h=st.integers(1, 12),
            w=st.integers(1, 12),
            c=st.sampled_from([1, 2, 3, 4]),
            f=st.integers(0, 4),
            seed=st.integers(0, 2**31 - 1),
        )
        @settings(max_examples=40, deadline=None)
        def test_roundtrip_identity(self, h, w, c, f, seed):
            img = _rng(seed).randint(0, 256, size=(h, w, c), dtype=np.uint8)
            np.testing.assert_array_equal(decode_png(encode_png(img, filter_type=f)), img)


class TestWavRoundTrip:
    def test_pcm16_roundtrip_exact(self):
        x = (_rng(1).rand(1000).astype(np.float64) * 2 - 1) * 0.8
        out, rate = decode_wav(encode_wav(x, 16000))
        assert rate == 16000
        np.testing.assert_array_equal(out, (np.round(x * 32768.0) / 32768.0).astype(np.float32))

    def test_clipping(self):
        out, _ = decode_wav(encode_wav(np.array([2.0, -2.0]), 8000))
        np.testing.assert_allclose(out, [32767.0 / 32768.0, -1.0])

    @staticmethod
    def _wav(fmt_code, bits, n_ch, rate, frames_bytes):
        fmt = struct.pack(
            "<HHIIHH", fmt_code, n_ch, rate, rate * n_ch * bits // 8, n_ch * bits // 8, bits
        )
        return (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(frames_bytes))
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(frames_bytes))
            + frames_bytes
        )

    def test_pcm8_unsigned(self):
        raw = np.array([0, 128, 255], dtype=np.uint8)
        out, _ = decode_wav(self._wav(1, 8, 1, 8000, raw.tobytes()))
        np.testing.assert_allclose(out, [(-128) / 128.0, 0.0, 127 / 128.0])

    def test_pcm32_and_float32(self):
        ints = np.array([-(2**31), 0, 2**30], dtype="<i4")
        out, _ = decode_wav(self._wav(1, 32, 1, 8000, ints.tobytes()))
        np.testing.assert_allclose(out, [-1.0, 0.0, 0.5])
        fls = np.array([-0.25, 0.75], dtype="<f4")
        out2, _ = decode_wav(self._wav(3, 32, 1, 8000, fls.tobytes()))
        np.testing.assert_array_equal(out2, fls)

    def test_stereo_mixes_to_mono(self):
        frames = np.array([1000, 3000, -2000, 2000], dtype="<i2")  # L R L R
        out, _ = decode_wav(self._wav(1, 16, 2, 44100, frames.tobytes()))
        np.testing.assert_allclose(out, [2000 / 32768.0, 0.0], atol=1e-7)

    def test_rejections(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"nope")
        with pytest.raises(NotImplementedError, match="unsupported"):
            decode_wav(self._wav(1, 24, 1, 8000, b"\x00" * 6))
        # truncated data chunk must be loud, not a silently-short decode
        full = self._wav(1, 16, 1, 8000, b"\x00\x01" * 100)
        with pytest.raises(ValueError, match="truncated WAV"):
            decode_wav(full[:-10])
        with pytest.raises(ValueError, match="NaN"):
            encode_wav(np.array([0.5, np.nan]), 8000)
        # odd-length data for 16-bit PCM: loud codec message, not a raw numpy
        # buffer-size ValueError (ADVICE r5)
        with pytest.raises(ValueError, match="truncated WAV.*multiple"):
            decode_wav(self._wav(1, 16, 1, 8000, b"\x00\x01\x02"))
        # bits_per_sample = 0 in the fmt chunk: the unsupported-format
        # dispatch, not a ZeroDivisionError from the sample-size check
        with pytest.raises(NotImplementedError, match="unsupported"):
            decode_wav(self._wav(1, 0, 1, 8000, b"\x00\x00"))
        # several data chunks: spec allows one — rejecting beats silently
        # keeping the last (ADVICE r5)
        base = self._wav(1, 16, 1, 8000, b"\x00\x01" * 4)
        extra = b"data" + struct.pack("<I", 4) + b"\x00\x01\x00\x01"
        doubled = bytearray(base + extra)
        doubled[4:8] = struct.pack("<I", len(doubled) - 8)
        with pytest.raises(ValueError, match="multiple data chunks"):
            decode_wav(bytes(doubled))


class TestSniffingDispatch:
    def test_decode_image_sniffs_png_and_own_dims_win(self):
        from rastr_spark.functions.multimodal import decode_image

        img = _rng(2).randint(0, 256, size=(10, 6, 3), dtype=np.uint8)
        # metadata hints deliberately wrong: the file's own header must win
        out = decode_image(encode_png(img, filter_type=3), 99, 99, 1, fake=False)
        np.testing.assert_array_equal(out, img)

    def test_decode_image_non_png_still_raises(self):
        from rastr_spark.functions.multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0jpeg-ish", 8, 8, 3, fake=False)

    def test_fake_mode_never_raises_on_codec_failures(self):
        # fake=True contract: ANY payload decodes deterministically, including
        # ones sniffed as PNG/RIFF that the real codec rejects
        from rastr_spark.functions.multimodal import decode_audio, decode_image

        corrupt_png = PNG_MAGIC + b"\x00\x01garbage-not-a-chunk"
        out = decode_image(corrupt_png, 8, 8, 3, fake=True)
        assert out.shape == (8, 8, 3)
        np.testing.assert_array_equal(out, decode_image(corrupt_png, 8, 8, 3, fake=True))
        with pytest.raises(ValueError):
            decode_image(corrupt_png, 8, 8, 3, fake=False)

        webp_ish = b"RIFF\x10\x00\x00\x00WEBPgarbage"
        pcm = decode_audio(webp_ish, 64, fake=True)
        assert pcm.shape == (64,)
        with pytest.raises(ValueError):
            decode_audio(webp_ish, 64, fake=False)

    def test_image_features_tiny_real_image(self, spark):
        # a decoded image smaller than the pooling grid must not crash the task
        from rastr_spark.functions.multimodal import MEDIA_SCHEMA, image_features

        tiny = _rng(11).randint(0, 256, size=(2, 3, 3), dtype=np.uint8)
        media = spark.createDataFrame(
            [("t-0", "image", bytearray(encode_png(tiny)),
              {"width": 2, "height": 3, "channels": 3, "sample_rate": None, "n_frames": None})],
            MEDIA_SCHEMA,
        )
        rows = image_features(media, grid=4, fake_decode=False).collect()
        assert len(rows) == 1 and len(rows[0]["feature"]) == 16
        assert all(np.isfinite(v) for v in rows[0]["feature"])

    def test_decode_audio_sniffs_wav_pad_and_truncate(self):
        from rastr_spark.functions.multimodal import decode_audio

        x = (_rng(3).rand(100) * 2 - 1) * 0.5
        wav = encode_wav(x, 16000)
        full = decode_audio(wav, 100, fake=False)
        assert full.shape == (100,) and full.dtype == np.float32
        np.testing.assert_array_equal(decode_audio(wav, 40, fake=False), full[:40])
        padded = decode_audio(wav, 150, fake=False)
        np.testing.assert_array_equal(padded[:100], full)
        assert (padded[100:] == 0).all()

    def test_decode_audio_non_wav_still_raises(self):
        from rastr_spark.functions.multimodal import decode_audio

        with pytest.raises(NotImplementedError):
            decode_audio(b"ID3\x03mp3-ish", 64, fake=False)


class TestLosslessMediaEndToEnd:
    def test_synthesize_media_lossless_real_decode(self, spark):
        from rastr_spark.functions.multimodal import (
            audio_features,
            image_features,
            synthesize_media_lossless,
        )

        media = synthesize_media_lossless(spark, 40)
        imgs = image_features(media, grid=4, fake_decode=False).collect()
        assert len(imgs) == 20
        assert all(len(r["feature"]) == 16 for r in imgs)
        auds = audio_features(media, n_windows=8, window_samples=256, fake_decode=False).collect()
        assert len(auds) == 20
        assert all(len(r["feature"]) == 8 for r in auds)
        # nontrivial content: RMS of uniform[-0.5, 0.5) ≈ 0.29
        vals = np.array([v for r in auds for v in r["feature"]])
        assert 0.2 < vals.mean() < 0.4

    def test_lossless_table_parallelism_invariant(self, spark):
        from rastr_spark.functions.multimodal import synthesize_media_lossless
        import hashlib

        def digest(df):
            rows = sorted(
                (r["media_id"], bytes(r["payload"])) for r in df.collect()
            )
            h = hashlib.sha256()
            for mid, payload in rows:
                h.update(mid.encode())
                h.update(payload)
            return h.hexdigest()

        a = digest(synthesize_media_lossless(spark, 30).repartition(2))
        b = digest(synthesize_media_lossless(spark, 30).repartition(8))
        assert a == b

    def test_decoded_artifacts_roundtrip_content(self, spark):
        from rastr_spark.functions.multimodal import (
            decoded_pixels,
            decoded_samples,
            synthesize_media_lossless,
        )

        media = synthesize_media_lossless(spark, 10)
        px = {r["media_id"]: r["pix"] for r in decoded_pixels(media, fake_decode=False).collect()}
        assert len(px) == 5 and all(len(v) == 16 * 16 * 3 for v in px.values())
        pcm = {
            r["media_id"]: r["samples"]
            for r in decoded_samples(media, 2048, fake_decode=False).collect()
        }
        assert len(pcm) == 5 and all(len(v) == 2048 for v in pcm.values())
        # PCM16 exactness: every decoded sample is a multiple of 2^-15
        for v in pcm.values():
            arr = np.asarray(v, dtype=np.float64) * 32768.0
            np.testing.assert_array_equal(arr, np.round(arr))
