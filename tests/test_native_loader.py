"""Native C++ loader: build, decode correctness vs PIL, pipeline integration."""


import numpy as np
import pytest

from cara_tpu.data import vtab as vtab_lib

native = pytest.importorskip("cara_tpu.data.native")

if not native.native_available():
    pytest.skip("native loader could not build", allow_module_level=True)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    # JPEG (lossy -> compare against PIL decode of the same file) and PNG.
    for i, (name, fmt) in enumerate(
            [("a.jpg", "JPEG"), ("b.png", "PNG"), ("c.jpg", "JPEG")]):
        arr = rng.randint(0, 255, (37 + 13 * i, 53 + 7 * i, 3), np.uint8)
        p = str(d / name)
        Image.fromarray(arr).save(p, format=fmt, quality=95)
        paths.append(p)
    # Grayscale PNG exercises gray->RGB expansion.
    g = rng.randint(0, 255, (40, 44), np.uint8)
    p = str(d / "gray.png")
    Image.fromarray(g, mode="L").save(p)
    paths.append(p)
    return paths


def test_decode_matches_pil(image_dir):
    dec = native.NativeBatchDecoder(image_size=32, num_threads=2)
    batch = dec.decode_batch(image_dir)
    assert batch.shape == (len(image_dir), 32, 32, 3)
    for i, path in enumerate(image_dir):
        pil = vtab_lib.normalize(vtab_lib._load_image_pil(path, 32))
        # PIL resamples in uint8 fixed point; allow a few LSB of slack
        # (normalized units: 1/255/std ~ 0.02).
        diff = np.abs(batch[i] - pil)
        assert diff.max() < 0.1, (path, diff.max())
        assert np.mean(diff) < 0.02, path


def test_decode_failure_raises(tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8not a real jpeg")
    dec = native.NativeBatchDecoder(image_size=16, num_threads=1)
    with pytest.raises(IOError):
        dec.decode_batch([bad])
    with pytest.raises(IOError):
        dec.decode_batch([str(tmp_path / "missing.jpg")])


def test_pipeline_uses_native(image_dir, tmp_path):
    root = tmp_path
    lines = [f"{p} {i % 2}" for i, p in enumerate(image_dir)]
    flist = tmp_path / "list.txt"
    flist.write_text("\n".join(lines) + "\n")
    src = vtab_lib.FileListSource(str(root), str(flist), image_size=24,
                                  backend="native")
    assert src._native is not None
    loader = vtab_lib.BatchLoader(src, 3, train=False)
    batches = list(iter(loader))
    assert batches[0]["image"].shape == (3, 24, 24, 3)
    assert batches[-1]["valid"].sum() == 1  # 4 images: 3 + 1 padded


# --- Random-resized-crop augmentation (FGVC train path) ---------------------


def _splitmix64(seed):
    """Python replica of the C++ SplitMix64 (csrc/dataloader.cc)."""
    mask = (1 << 64) - 1
    state = [int(seed) & mask]

    def next_u64():
        state[0] = (state[0] + 0x9E3779B97F4A7C15) & mask
        z = state[0]
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        return z ^ (z >> 31)

    def next_double():
        return (next_u64() >> 11) * (2.0 ** -53)

    return next_double


def _expected_rrc(seed, w, h):
    """Replicates csrc sample_rrc: the exact crop rect + flip for a seed."""
    nd = _splitmix64(seed)
    area = float(w * h)
    for _ in range(10):
        target = (0.08 + nd() * 0.92) * area
        ar = np.exp(np.log(3 / 4) + nd() * (np.log(4 / 3) - np.log(3 / 4)))
        tw = int(round(np.sqrt(target * ar)))
        th = int(round(np.sqrt(target / ar)))
        if 0 < tw <= w and 0 < th <= h:
            x0 = int(nd() * (w - tw + 1))
            y0 = int(nd() * (h - th + 1))
            cw, ch = tw, th
            break
    else:
        # torchvision ratio-clamped center-crop fallback
        in_ratio = w / h
        if in_ratio < 3 / 4:
            cw, ch = w, int(round(w / (3 / 4)))
        elif in_ratio > 4 / 3:
            cw, ch = int(round(h * (4 / 3))), h
        else:
            cw, ch = w, h
        x0, y0 = (w - cw) // 2, (h - ch) // 2
    flip = nd() < 0.5
    return x0, y0, cw, ch, flip


def test_rrc_matches_pil_crop_resize(image_dir):
    """decode_batch_rrc == PIL crop(predicted rect) -> bicubic -> flip ->
    normalize, for several seeds (verifies both the sampling replica and
    the box-resize parity)."""
    from PIL import Image

    size = 32
    dec = native.NativeBatchDecoder(image_size=size, num_threads=2)
    path = image_dir[1]  # PNG: lossless, exact decode
    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        for seed in (1, 7, 123456789, 2 ** 62 + 5):
            got = dec.decode_batch_rrc(
                [path], np.asarray([seed], np.uint64))[0]
            x0, y0, cw, ch, flip = _expected_rrc(seed, w, h)
            ref = im.crop((x0, y0, x0 + cw, y0 + ch)).resize(
                (size, size), Image.BICUBIC)
            arr = np.asarray(ref, np.float32) / 255.0
            if flip:
                arr = arr[:, ::-1]
            ref_n = vtab_lib.normalize(np.ascontiguousarray(arr))
            diff = np.abs(got - ref_n)
            assert diff.max() < 0.1, (seed, (x0, y0, cw, ch, flip),
                                      diff.max())
            assert np.mean(diff) < 0.02, seed


def test_rrc_seeds_vary_and_are_deterministic(image_dir):
    dec = native.NativeBatchDecoder(image_size=32, num_threads=2)
    paths = [image_dir[1]] * 4
    seeds = np.asarray([5, 5, 9, 10], np.uint64)
    b1 = dec.decode_batch_rrc(paths, seeds)
    b2 = dec.decode_batch_rrc(paths, seeds)
    np.testing.assert_array_equal(b1, b2)          # deterministic per seed
    np.testing.assert_array_equal(b1[0], b1[1])    # same seed -> same crop
    assert np.abs(b1[0] - b1[2]).max() > 1e-3      # different seed -> differs


def test_augmented_source_native_batch(image_dir, tmp_path):
    """AugmentedFileListSource uses the native RRC batch path end-to-end."""
    import os

    from cara_tpu.data.fgvc import AugmentedFileListSource

    flist = tmp_path / "train.txt"
    with open(flist, "w") as f:
        for i, p in enumerate(image_dir):
            f.write(f"{os.path.basename(p)} {i % 2}\n")
    src = AugmentedFileListSource(
        os.path.dirname(image_dir[0]), str(flist), image_size=32,
        num_workers=2, seed=3)
    assert src._native is not None
    batch = src.load_batch([0, 1, 2, 3])
    assert batch.shape == (4, 32, 32, 3)
    one = src.load(0)
    assert one.shape == (32, 32, 3)
    # Augmentation is stochastic across draws of the source RNG.
    two = src.load(0)
    assert np.abs(one - two).max() > 1e-3
