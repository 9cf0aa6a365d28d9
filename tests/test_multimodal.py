"""Multimodal plumbing (stages/multimodal.py): features, resize,
frame sampling."""

import numpy as np
import ray.data as rd


def test_media_features_plumbing(ray_session):
    import pytest

    from xlink_ray.stages.multimodal import (
        MediaFeatureActor,
        media_features,
        synth_media,
    )

    ds = rd.from_arrow(synth_media(64))
    out = media_features(ds).to_pandas()
    assert len(out) == 64
    assert all(len(f) == MediaFeatureActor.DIM for f in out["feature"])
    # determinism
    out2 = media_features(rd.from_arrow(synth_media(64))).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a["feature"], b["feature"]))
    # the real-decoder slot is explicitly not implemented
    actor = MediaFeatureActor(backend="none")
    with pytest.raises(NotImplementedError):
        actor._decode(b"\x00\x01", "image")


def test_image_resize_plumbing(ray_session):
    import numpy as np
    import ray.data as rd

    from xlink_ray.stages.multimodal import resize_images, synth_media

    src = synth_media(48)
    out = (
        resize_images(rd.from_arrow(src), target_w=16, target_h=12)
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert len(out) == 48
    for _, r in out.iterrows():
        if r["media_type"] == "image":
            assert (r["width"], r["height"]) == (16, 12)
            assert len(r["payload"]) == 16 * 12
        else:  # non-image rows pass through untouched
            assert r["duration_ms"] > 0
    # deterministic: same input → same bytes
    out2 = (
        resize_images(rd.from_arrow(src), target_w=16, target_h=12)
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert all(a == b for a, b in zip(out["payload"], out2["payload"]))


def test_frame_sampling_plumbing(ray_session):
    import ray.data as rd

    from xlink_ray.stages.multimodal import sample_frames, synth_media

    src = synth_media(48)
    out = sample_frames(rd.from_arrow(src), every_ms=500).to_pandas()
    vids = src.to_pandas()
    vids = vids[vids["media_type"] == "video"]
    want = int((vids["duration_ms"] // 500 + 1).sum())
    assert len(out) == want
    assert set(out["media_id"]) == set(vids["media_id"])
    g = out.groupby("media_id")["t_ms"].max()
    for mid, dur in zip(vids["media_id"], vids["duration_ms"]):
        assert g[mid] == (dur // 500) * 500
    assert out["frame"].map(len).eq(64).all()
