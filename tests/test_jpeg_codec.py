"""Baseline JPEG codec gates — pure numpy, no SparkSession needed.

Round-trip strategy mirrors the PNG gates: encode with all-ones
quantization tables so the only loss is DCT/IDCT float rounding, then
assert tight pixel bounds; the quality path and every container feature
the decoder claims (subsampling, restart markers, 16-bit DQT,
progressive rejection) get their own gates.
"""

from __future__ import annotations

import numpy as np
import pytest

from tapes_spark.operators import jpeg_codec as jc
from tapes_spark.operators import multimodal as mm


def _rng(seed: int = 7) -> np.random.RandomState:
    return np.random.RandomState(seed)


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)


class TestRoundTrip:
    def test_grayscale_near_lossless_odd_dims(self):
        g = _rng().randint(0, 256, size=(21, 13), dtype=np.uint8)
        dec = jc.decode_jpeg(jc.encode_jpeg(g))
        assert dec.shape == (21, 13)
        assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2

    def test_color_444_near_lossless(self):
        c = _rng(11).randint(0, 256, size=(16, 24, 3), dtype=np.uint8)
        dec = jc.decode_jpeg(jc.encode_jpeg(c, subsampling="444"))
        assert dec.shape == (16, 24, 3)
        # color-convert + DCT rounding: a couple of counts per channel
        assert np.abs(dec.astype(int) - c.astype(int)).max() <= 3

    @pytest.mark.parametrize("sub", ["422", "420"])
    def test_subsampled_smooth_image(self, sub):
        img = _smooth(33, 47)  # odd dims force MCU padding + crop
        dec = jc.decode_jpeg(jc.encode_jpeg(img, subsampling=sub))
        assert dec.shape == img.shape
        diff = np.abs(dec.astype(int) - img.astype(int))
        assert diff.mean() < 3.0  # chroma box-down/replicate-up loss only
        # luminance must survive subsampling untouched (Y is full-res)
        luma = jc.decode_jpeg_luma(jc.encode_jpeg(img, subsampling=sub))
        want = (
            0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
            + 0.114 * img[:, :, 2]
        )
        assert np.abs(luma * 255.0 - want).max() <= 2.5

    def test_restart_markers_do_not_change_pixels(self):
        img = _smooth(40, 40)
        plain = jc.decode_jpeg(jc.encode_jpeg(img, subsampling="420"))
        rst = jc.decode_jpeg(
            jc.encode_jpeg(img, subsampling="420", restart_interval=2)
        )
        assert np.array_equal(plain, rst)

    def test_quality_path_standard_tables(self):
        img = _smooth(32, 32)
        enc_hi = jc.encode_jpeg(img, quality=90)
        enc_lo = jc.encode_jpeg(img, quality=10)
        hi = jc.decode_jpeg(enc_hi)
        lo = jc.decode_jpeg(enc_lo)
        err_hi = np.abs(hi.astype(int) - img.astype(int)).mean()
        err_lo = np.abs(lo.astype(int) - img.astype(int)).mean()
        assert err_hi < err_lo  # coarser tables lose more
        assert err_hi < 5.0
        assert len(enc_lo) < len(enc_hi)  # and compress harder

    def test_single_block_image(self):
        g = _rng(5).randint(0, 256, size=(8, 8), dtype=np.uint8)
        dec = jc.decode_jpeg(jc.encode_jpeg(g))
        assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2

    def test_deterministic_bytes(self):
        img = _smooth(17, 19)
        assert jc.encode_jpeg(img, quality=80) == jc.encode_jpeg(
            img, quality=80
        )


class TestContainerEdges:
    def test_sixteen_bit_dqt(self):
        """Pq=1 DQT entries (>255) must dequantize correctly."""
        tables: dict[int, np.ndarray] = {}
        vals = np.arange(300, 364, dtype=">u2")  # all >255
        jc._parse_dqt(bytes([0x10]) + vals.tobytes(), tables)
        nat = tables[0].reshape(64)
        # zigzag position k stores vals[k] at natural index _ZZ_NAT[k]
        assert nat[jc._ZZ_NAT[0]] == 300
        assert nat[jc._ZZ_NAT[63]] == 363

    def test_progressive_rejected(self):
        enc = bytearray(jc.encode_jpeg(_smooth(16, 16)))
        sof = enc.find(b"\xff\xc0")
        enc[sof + 1] = 0xC2  # rewrite marker to progressive
        with pytest.raises(NotImplementedError, match="progressive"):
            jc.decode_jpeg(bytes(enc))

    def test_truncated_stream_raises_value_error(self):
        enc = jc.encode_jpeg(_smooth(16, 16))
        with pytest.raises(ValueError):
            jc.decode_jpeg(enc[: len(enc) // 2])
        with pytest.raises(ValueError):
            jc.decode_jpeg(b"\xff\xd8\xff\xe0" + bytes(64))

    def test_not_a_jpeg_raises(self):
        with pytest.raises(ValueError, match="SOI"):
            jc.decode_jpeg(b"BM" + bytes(64))


class TestMediaDispatch:
    def test_decode_media_pools_jpeg(self):
        img = _smooth(32, 32)
        plane = mm._decode_media(jc.encode_jpeg(img, quality=85), fake=False)
        assert plane.shape == (mm.GRID, mm.GRID)
        assert np.all((plane >= 0.0) & (plane <= 1.0))
        # deterministic, and tracks the true pooled luminance
        again = mm._decode_media(
            jc.encode_jpeg(img, quality=85), fake=False
        )
        assert np.array_equal(plane, again)
        want = mm._pool_to_grid(
            (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
             + 0.114 * img[:, :, 2]) / 255.0
        )
        assert np.abs(plane - want).max() < 0.02

    def test_mp3_still_raises(self):
        with pytest.raises(NotImplementedError):
            mm._decode_media(b"\xff\xfb\x90\x44" + bytes(64), fake=False)
