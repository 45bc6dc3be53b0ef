"""Multimodal plumbing (decode kernel is a documented stub)."""

import pytest

from guac_ray.functions.multimodal import (
    FrameSampler,
    ImageDecoder,
    make_fake_media,
)


class TestMultimodal:
    def test_strict_mode_raises_without_real_decoder(self):
        with pytest.raises(NotImplementedError):
            ImageDecoder(strict=True)

    def test_decode_plumbing_deterministic(self):
        media = make_fake_media(8)
        out1 = ImageDecoder()(media).to_pandas()
        out2 = ImageDecoder()(media).to_pandas()
        assert len(out1) == 8
        assert (out1.width == out2.width).all()
        assert all(len(f) == 8 for f in out1.features)

    def test_frame_sampler_explodes_bounded(self):
        media = make_fake_media(4)
        out = FrameSampler(every=100, max_frames=5)(media).to_pandas()
        assert out.groupby("media_id").size().le(5).all()
        assert (out.byte_offset == out.frame_idx * 100).all()

    def test_actor_pool_path(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.multimodal import decode_images

        out = decode_images(rd.from_arrow(make_fake_media(32)),
                            concurrency=(1, 2), batch_size=8).to_pandas()
        assert len(out) == 32
