"""Multimodal plumbing (stages/multimodal.py): features, resize,
frame sampling."""

import numpy as np
import pytest
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


# ---- raw (codec-free) decode path ----

from xlink_ray.stages.multimodal import (
    synth_media_raw,
    _raw_rgb,
    _bilinear_resize,
)


def test_raw_rgb_roundtrip():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert (_raw_rgb(img.tobytes(), 6, 4) == img).all()
    with pytest.raises(ValueError):
        _raw_rgb(img.tobytes()[:-1], 6, 4)


def test_bilinear_constant_image_stays_constant():
    img = np.full((9, 7, 3), 123, dtype=np.uint8)
    out = _bilinear_resize(img, 32, 16)
    assert out.shape == (16, 32, 3)
    assert np.allclose(out, 123.0)


def test_bilinear_identity_resize():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    out = _bilinear_resize(img, 8, 8)
    assert np.allclose(out, img.astype(np.float32))


def test_raw_feature_vector_real_values(ray_session):
    import ray.data as rd
    from xlink_ray.stages.multimodal import media_features

    tbl = synth_media_raw(12)
    ds = rd.from_arrow(tbl)
    out = {r["media_id"]: r["feature"] for r in media_features(ds, backend="raw").take_all()}
    assert len(out) == 12
    img = _raw_rgb(tbl["payload"][0].as_py(), tbl["width"][0].as_py(), tbl["height"][0].as_py())
    f = np.asarray(out[0])
    assert abs(f[0] - img[..., 0].mean() / 255.0) < 1e-6
    assert abs(f[8:24].sum() - 1.0) < 1e-5  # luma histogram normalized


def test_raw_resize_pipeline(ray_session):
    import ray.data as rd
    from xlink_ray.stages.multimodal import resize_images

    ds = rd.from_arrow(synth_media_raw(6))
    out = resize_images(ds, target_w=8, target_h=8, backend="raw").take_all()
    images = [r for r in out if r["media_type"] == "image"]
    assert images
    for r in images:
        assert r["width"] == 8 and r["height"] == 8
        assert len(r["payload"]) == 8 * 8 * 3
    # audio rows pass through untouched
    for r in out:
        if r["media_type"] == "audio":
            assert r["width"] == 0 and r["duration_ms"] > 0


def test_raw_audio_features_sine(ray_session):
    import ray.data as rd
    from xlink_ray.stages.multimodal import (
        MediaFeatureActor,
        RAW_AUDIO_RATE,
        _audio_features,
    )

    # pure 440 Hz sine: centroid ~ 440/(sr/2), ZCR ~ 2f/sr
    t = np.arange(RAW_AUDIO_RATE) / RAW_AUDIO_RATE
    pcm = (0.8 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    f = _audio_features(pcm, MediaFeatureActor.DIM)
    assert abs(f[2] * (RAW_AUDIO_RATE / 2) - 440) < 10  # spectral centroid
    assert abs(f[1] - 2 * 440 / RAW_AUDIO_RATE) < 0.01  # zero crossings
    assert abs(f[0] - 0.8 / np.sqrt(2)) < 0.01  # RMS of a sine
    assert abs(f[4:16].sum() - 1.0) < 1e-4  # band energies normalized


def test_raw_media_features_cover_audio_rows(ray_session):
    import ray.data as rd
    from xlink_ray.stages.multimodal import media_features, synth_media_raw

    tbl = synth_media_raw(12)
    out = {r["media_id"]: r for r in media_features(rd.from_arrow(tbl), backend="raw").take_all()}
    assert len(out) == 12
    audio_ids = [i for i in range(12) if i % 3 == 2]
    for i in audio_ids:
        assert out[i]["media_type"] == "audio"
        assert np.asarray(out[i]["feature"])[0] > 0.1  # real RMS, not hash noise


def test_image_ahash_properties(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xlink_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        image_ahash,
        phash_dup_pairs,
        synth_media_raw,
    )

    h = image_ahash(rd.from_arrow(synth_media_raw())).to_pandas()
    assert (h["phash"] >= 0).all() and (h["phash"] < (1 << 16)).all()
    # identical payloads must hash identically: duplicate a row
    tbl = synth_media_raw()
    img_rows = [r for r in tbl.to_pylist() if r["media_type"] == "image"][:1]
    dup = dict(img_rows[0])
    dup["media_id"] = 999
    two = pa.Table.from_pylist(img_rows + [dup], schema=MEDIA_SCHEMA)
    h2 = image_ahash(rd.from_arrow(two)).to_pandas().set_index("media_id")
    assert h2.loc[img_rows[0]["media_id"], "phash"] == h2.loc[999, "phash"]

    # banding recall: pairs equal brute-force hamming<=3 over all hashes
    pairs = phash_dup_pairs(
        image_ahash(rd.from_arrow(tbl)).materialize()
    ).to_pandas()
    hh = h.set_index("media_id")["phash"].to_dict()
    brute = set()
    ids = sorted(hh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(hh[a] ^ hh[b]).count("1") <= 3:
                brute.add((a, b))
    got = set(map(tuple, pairs[["id_a", "id_b"]].values.tolist()))
    assert got == brute
