"""GIF codec gates — exact palette round-trips (GIF is lossless over an
indexed image, so decode(encode(x)) == x bit-for-bit), interlace,
transparency, disposal, LZW width growth, and the frame-sampled
luminance bridge into the media feature path."""

from __future__ import annotations

import numpy as np
import pytest

from tapes_spark.operators import multimodal as mm
from tapes_spark.operators.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    decode_gif_luma,
    encode_gif,
)


def _rng(seed=7):
    return np.random.RandomState(seed)


class TestLzw:
    def test_roundtrip_random(self):
        for seed in range(5):
            idx = _rng(seed).randint(0, 16, size=4096).astype(np.uint8)
            got = _lzw_decode(_lzw_encode(idx, 4), 4, len(idx))
            assert np.array_equal(got, idx)

    def test_roundtrip_crosses_width_growth(self):
        # low-entropy long input drives the code width through several
        # growth steps (and past an encoder reset)
        idx = np.tile(np.arange(4, dtype=np.uint8), 30000)
        got = _lzw_decode(_lzw_encode(idx, 2), 2, len(idx))
        assert np.array_equal(got, idx)

    def test_truncated_stream_raises(self):
        data = _lzw_encode(np.zeros(100, dtype=np.uint8), 2)
        with pytest.raises(ValueError):
            _lzw_decode(data[: len(data) // 2], 2, 100)


class TestRoundTrip:
    def test_rgb_exact(self):
        rgb = _rng().randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif(rgb)), rgb)

    def test_interlaced_exact(self):
        rgb = _rng(3).randint(0, 256, size=(17, 5, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_gif(encode_gif(rgb, interlace=True)), rgb
        )

    def test_animated_frames_composite(self):
        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
            dtype=np.uint8,
        )
        f1 = np.full((6, 6), 1, dtype=np.uint8)
        f2 = np.full((6, 6), 2, dtype=np.uint8)
        f3 = np.full((6, 6), 3, dtype=np.uint8)
        frames = decode_gif_frames(
            encode_gif(indexed=[f1, f2, f3], palette=pal)
        )
        assert len(frames) == 3
        assert np.array_equal(frames[0], pal[f1])
        assert np.array_equal(frames[1], pal[f2])
        assert np.array_equal(frames[2], pal[f3])

    def test_transparency_leaves_previous_frame(self):
        pal = np.array([[10, 20, 30], [200, 0, 0], [0, 0, 0]], dtype=np.uint8)
        base = np.full((4, 4), 1, dtype=np.uint8)
        over = np.full((4, 4), 2, dtype=np.uint8)  # index 2 = transparent
        over[0, 0] = 0  # one real pixel
        frames = decode_gif_frames(
            encode_gif(indexed=[base, over], palette=pal,
                       transparent_index=2)
        )
        assert np.array_equal(frames[0][1, 1], pal[1])
        # frame 2: transparent pixels keep frame 1's red, the one real
        # pixel lands
        assert np.array_equal(frames[1][0, 0], pal[0])
        assert np.array_equal(frames[1][1, 1], pal[1])

    def test_disposal_background_restores(self):
        pal = np.array([[7, 7, 7], [250, 250, 0]], dtype=np.uint8)
        f1 = np.ones((4, 4), dtype=np.uint8)
        f2 = np.zeros((4, 4), dtype=np.uint8)
        f2[2, 2] = 1
        # disposal 2 on frame 1: after frame 1, canvas resets to bg
        # (palette index 0 as written in the screen descriptor)
        payload = encode_gif(
            indexed=[f1, f2], palette=pal, disposals=[2, 0],
            transparent_index=None,
        )
        frames = decode_gif_frames(payload)
        assert np.array_equal(frames[0], pal[f1])
        assert np.array_equal(frames[1], pal[f2])

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            decode_gif(b"NOTGIF" + bytes(20))
        with pytest.raises(ValueError):
            decode_gif(encode_gif(np.zeros((4, 4, 3), np.uint8))[:-10])
        with pytest.raises(ValueError):
            encode_gif(
                _rng().randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
            )  # >256 distinct colors


class TestLumaBridge:
    def test_frame_sample_layout(self):
        pal = np.stack(
            [np.arange(0, 250, 50, dtype=np.uint8)] * 3, axis=1
        )  # 5 grays
        frames = [
            np.full((8, 8), i, dtype=np.uint8) for i in range(5)
        ]
        plane = decode_gif_luma(
            encode_gif(indexed=frames, palette=pal), max_frames=3
        )
        # 3 sampled frames side by side: first, middle, last
        assert plane.shape == (8, 24)
        assert np.allclose(plane[:, :8], 0.0, atol=1e-3)
        assert np.allclose(plane[:, 8:16], 100 / 255, atol=1e-3)
        assert np.allclose(plane[:, 16:], 200 / 255, atol=1e-3)

    def test_decode_media_dispatch(self):
        rgb = _rng(11).randint(0, 256, size=(12, 10, 3), dtype=np.uint8)
        plane = mm._decode_media(encode_gif(rgb), fake=False)
        assert plane.shape == (mm.GRID, mm.GRID)
        want = mm._pool_to_grid(decode_gif_luma(encode_gif(rgb)))
        assert np.allclose(plane, want)

    def test_real_media_strict_e2e_includes_gif(self, spark):
        media = mm.make_real_media(spark, n=12, seed=42)
        kinds = {
            r["mime"] for r in media.select("mime").distinct().collect()
        }
        assert "image/gif" in kinds and "image/jpeg" in kinds
        feats = mm.extract_features(media, fake_decode=False).collect()
        assert len(feats) == 12
        assert all(r["error"] is None for r in feats)


class TestFuzz:
    """Property gates: any indexed frame stack round-trips exactly —
    palette GIF is lossless by construction, so every mismatch is a
    codec bug (LZW width growth, interlace scatter, sub-block splits)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @staticmethod
    def _frames(draw):
        from hypothesis import strategies as st

        h = draw(st.integers(1, 20))
        w = draw(st.integers(1, 20))
        n_colors = draw(st.integers(2, 256))
        n_frames = draw(st.integers(1, 4))
        rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
        frames = [
            rng.randint(0, n_colors, size=(h, w)).astype(np.uint8)
            for _ in range(n_frames)
        ]
        palette = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
        return frames, palette

    @given(st.data())
    @settings(max_examples=40, deadline=None)
    def test_indexed_roundtrip_exact(self, data):
        frames, palette = self._frames(data.draw)
        interlace = data.draw(self.st.booleans())
        payload = encode_gif(
            indexed=frames, palette=palette, interlace=interlace
        )
        got = decode_gif_frames(payload)
        assert len(got) == len(frames)
        # no transparency/disposal: every composited frame equals its
        # own full-canvas palette lookup
        for g, f in zip(got, frames):
            assert np.array_equal(g, palette[f])
