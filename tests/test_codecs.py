import numpy as np
import pytest

from wikibrain_spark import codecs


def _img(seed=7, h=40, w=56):
    rng = np.random.default_rng(seed)
    # smooth-ish image (random noise is the worst case for DCT; real photos
    # are smooth — blend noise with gradients)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([yy * 255 / h, xx * 255 / w, (yy + xx) * 255 / (h + w)], axis=-1)
    noisy = base * 0.7 + rng.uniform(0, 255, (h, w, 3)) * 0.3
    return np.clip(noisy, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("fmt", ["ppm", "bmp", "pngz"])
def test_lossless_roundtrip(fmt):
    img = _img()
    payload = codecs.encode_image(img, fmt, 51.5, -0.12)
    out, meta = codecs.decode_image(payload)
    assert np.array_equal(out, img)
    assert meta["fmt"] == fmt and meta["w"] == 56 and meta["h"] == 40
    assert meta["lat"] == 51.5 and meta["lon"] == -0.12


def test_dctq_psnr_gate():
    img = _img()
    payload = codecs.encode_image(img, "dctq", -33.9, 151.2)
    out, meta = codecs.decode_image(payload)
    assert out.shape == img.shape
    assert codecs.psnr(img, out) >= 40.0  # BASELINE.json per-row invariant


def test_dctq_non_multiple_of_8():
    img = _img(h=33, w=41)
    out, _ = codecs.decode_image(codecs.encode_image(img, "dctq", 0.0, 0.0))
    assert out.shape == img.shape
    assert codecs.psnr(img, out) >= 40.0


def test_geotag_fast_path_matches_header():
    img = _img()
    payload = codecs.encode_image(img, "pngz", 48.8566, 2.3522)
    assert codecs.extract_geotag(payload) == (48.8566, 2.3522)
    lats, lons = codecs.extract_geotags_batch([payload, payload])
    assert lats.tolist() == [48.8566, 48.8566]
    assert lons.tolist() == [2.3522, 2.3522]


def test_phash_stable_and_discriminative():
    a = _img(seed=1)
    b = np.ascontiguousarray(_img(seed=1)[::-1])  # flipped structure
    ha1, ha2, hb = codecs.phash64(a), codecs.phash64(a), codecs.phash64(b)
    assert ha1 == ha2
    assert ha1 != hb
    assert -(1 << 63) <= ha1 < (1 << 63)


def test_mean_pool_resize_shape_and_range():
    img = _img(h=37, w=61)
    small = codecs.mean_pool_resize(img, 8, 8)
    assert small.shape == (8, 8, 3)
    assert small.dtype == np.uint8


def test_video_roundtrip_and_sampling():
    import numpy as np
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8) for _ in range(10)]
    payload = codecs.encode_video(frames, "pngz", fps=24, lat=48.8, lon=2.3)
    hdr = codecs.parse_video_header(payload)
    assert (hdr["n_frames"], hdr["fps"], hdr["fmt"]) == (10, 24, "pngz")
    sampled = codecs.sample_video_frames(payload, every_n=3)
    assert [no for no, _ in sampled] == [0, 3, 6, 9]
    for no, img in sampled:
        arr, meta = codecs.decode_image(img)
        assert np.array_equal(arr, frames[no])  # pngz lossless
        assert meta["lat"] == 48.8


def test_sample_frames_operator_composes_with_image_ops(spark):
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from wikibrain_spark.operators import geotag

    rng = np.random.default_rng(6)
    rows = []
    for v in range(4):
        frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(9)]
        rows.append((f"v{v}", codecs.encode_video(frames, "bmp", lat=10.0 + v, lon=20.0)))
    videos = spark.createDataFrame(pd.DataFrame(rows, columns=["video_id", "bytes"]))
    sampled = geotag.sample_frames(videos, every_n=4)
    got = sampled.collect()
    assert len(got) == 4 * 3  # frames 0,4,8 per video
    # sampled frames ARE image payloads: the geotag path runs on them as-is
    pts = geotag.extract_geotags(
        sampled.select(F.concat("video_id", F.lit("#"), "frame_no").alias("image_id"),
                       F.col("frame").alias("bytes")),
        with_s2=False,
    ).collect()
    assert len(pts) == 12
    assert all(abs(r["lon"] - 20.0) < 1e-9 for r in pts)
