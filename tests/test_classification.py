"""Classification dataset readers: synthetic MNIST idx + CIFAR pickle +
ImageFolder fixtures round-trip through the native format readers."""

import gzip
import json
import os
import pickle
import struct

import numpy as np
import pytest

from novic_tpu.data.classification import (
    ClassificationLoader,
    clean_class_name,
    load_image_dataset,
    load_image_dataset_prompts,
)


def write_idx(path, array):
    array = np.asarray(array, np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000800 | array.ndim))
        for d in array.shape:
            f.write(struct.pack(">I", d))
        f.write(array.tobytes())


@pytest.fixture()
def mnist_root(tmp_path):
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    write_idx(raw / "t10k-images-idx3-ubyte", rng.integers(0, 256, (20, 28, 28)))
    write_idx(raw / "t10k-labels-idx1-ubyte", rng.integers(0, 10, (20,)))
    write_idx(raw / "train-images-idx3-ubyte", rng.integers(0, 256, (30, 28, 28)))
    write_idx(raw / "train-labels-idx1-ubyte", rng.integers(0, 10, (30,)))
    return str(tmp_path)


def test_mnist_splits(mnist_root):
    ds = load_image_dataset("MNIST", mnist_root, split="valid")
    assert len(ds) == 20 and len(ds.classes) == 10
    ds_all = load_image_dataset("mnist", mnist_root, split="all")
    assert len(ds_all) == 50
    img, label = ds[0]
    assert img.size == (28, 28) and 0 <= label < 10


def test_cifar10(tmp_path):
    folder = tmp_path / "CIFAR" / "cifar-10-batches-py"
    folder.mkdir(parents=True)
    rng = np.random.default_rng(1)
    classes = [f"class{i}".encode() for i in range(10)]
    with open(folder / "batches.meta", "wb") as f:
        pickle.dump({b"label_names": classes}, f)
    for name, n in [("test_batch", 12)] + [(f"data_batch_{i}", 8) for i in range(1, 6)]:
        with open(folder / name, "wb") as f:
            pickle.dump({b"data": rng.integers(0, 256, (n, 3072), dtype=np.uint8),
                         b"labels": rng.integers(0, 10, (n,)).tolist()}, f)
    ds = load_image_dataset("CIFAR10", str(tmp_path), split="valid")
    assert len(ds) == 12
    ds_train = load_image_dataset("CIFAR10", str(tmp_path), split="train")
    assert len(ds_train) == 40
    img, label = ds[3]
    assert img.size == (32, 32)


@pytest.fixture()
def imagenette_root(tmp_path):
    import PIL.Image

    base = tmp_path / "Imagenette" / "imagenette2-320"
    for split in ("train", "val"):
        for cls in ("n01440764", "n02102040"):
            d = base / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                PIL.Image.new("RGB", (32, 32), (i * 40, 0, 0)).save(d / f"img{i}.jpg")
    return str(tmp_path)


def test_image_folder_with_variant(imagenette_root, tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "cls_class_names_clip.json", "w") as f:
        json.dump({"imagenette": ["tench", "English springer"]}, f)
    ds = load_image_dataset("Imagenette", imagenette_root, split="valid", variant="clip",
                            data_dir=str(data_dir))
    assert len(ds) == 6
    assert ds.classes == ("tench", "English springer")
    # wnid folders without a variant JSON must error
    with pytest.raises(ValueError, match="class names"):
        load_image_dataset("Imagenette", imagenette_root, split="valid")


def test_paths_and_loader(imagenette_root, tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "cls_class_names_clip.json", "w") as f:
        json.dump({"imagenette": ["tench", "springer"]}, f)
    ds = load_image_dataset("Imagenette", imagenette_root, split="all", variant="clip",
                            paths=True, data_dir=str(data_dir))
    img, label, path = ds[0]
    assert path.endswith(".jpg")

    def transform(images):
        return np.stack([np.asarray(im.resize((16, 16)), np.float32) for im in images])

    loader = ClassificationLoader(ds, batch_size=5, transform=transform, seed=0)
    batches = list(loader)
    assert sum(b[0].shape[0] for b in batches) == 12
    pixel, labels, paths = batches[0]
    assert pixel.shape == (5, 16, 16, 3) and len(paths) == 5


def test_clean_class_name():
    assert clean_class_name("great white shark (Carcharodon)") == "great white shark"
    assert clean_class_name("bell or wind chime") == "chime"
    assert clean_class_name("sax or saxophone") == "sax"
    assert clean_class_name("tank/armored vehicle") == "tank"
    assert clean_class_name("puma or mountain lion") == "puma lion"  # first word + tail of 2nd part (ref :166-170)


def test_prompts_with_alias(tmp_path):
    data_dir = tmp_path
    with open(data_dir / "cls_prompts_clip.json", "w") as f:
        json.dump({"imagenet1k": ["a photo of a {c}.", "art of the {c}."]}, f)
    prompts = load_image_dataset_prompts("Imagewoof", "clip", data_dir=str(data_dir))
    assert prompts == (("a photo of a {noun}.", False), ("art of the {noun}.", False))
