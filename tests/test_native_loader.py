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
