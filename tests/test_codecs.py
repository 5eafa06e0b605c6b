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
