"""Datasets for the training framework (reference: tfimm/train/datasets/tfds.py).

- ``TFDSWrapper``: tensorflow_datasets pipeline (optional dependency, gated).
- ``ArrayDataset``: in-memory numpy dataset — the dependency-free path used by
  tests and small examples; shuffles, batches and resizes per epoch.

For large-scale TPU input pipelines, shard per host and feed device batches;
both wrappers yield host numpy batches that the jitted step moves to device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from tfimm_tpu.train.registry import cfg_serializable

__all__ = ["TFDSConfig", "TFDSWrapper", "ArrayDatasetConfig", "ArrayDataset",
           "ImageFolderConfig", "ImageFolderDataset",
           "SyntheticDatasetConfig", "SyntheticDataset"]


@dataclass
class TFDSConfig:
    dataset_name: str = ""
    split: str = "train"
    input_size: tuple = ()
    batch_size: int = 32
    repeat: bool = False
    shuffle: bool = True
    nb_samples: int = -1
    cache: bool = True


@cfg_serializable
class TFDSWrapper:
    cfg_class = TFDSConfig

    def __init__(self, cfg: TFDSConfig):
        try:
            import tensorflow as tf  # noqa: F401
            import tensorflow_datasets as tfds  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "TFDSWrapper requires tensorflow and tensorflow_datasets; "
                "use ArrayDataset for a dependency-free pipeline."
            ) from e
        self.cfg = cfg

    def __iter__(self):
        import tensorflow as tf
        import tensorflow_datasets as tfds

        cfg = self.cfg
        ds = tfds.load(cfg.dataset_name, split=cfg.split, as_supervised=True)
        if cfg.nb_samples != -1:
            ds = ds.take(cfg.nb_samples)
        if cfg.cache:
            ds = ds.cache()
        if cfg.shuffle:
            ds = ds.shuffle(10 * cfg.batch_size)
        if cfg.repeat:
            ds = ds.repeat()
        if cfg.input_size:
            ds = ds.map(lambda x, y: (tf.image.resize(x, cfg.input_size), y))
        ds = ds.batch(cfg.batch_size, drop_remainder=True)
        ds = ds.prefetch(tf.data.AUTOTUNE)
        for images, labels in ds.as_numpy_iterator():
            yield images, labels


@dataclass
class GrainDatasetConfig:
    batch_size: int = 32
    shuffle: bool = True
    seed: int = 0
    nb_epochs: int = 1
    worker_count: int = 0


@cfg_serializable
class GrainDataset:
    """Per-host sharded input pipeline built on grain (the TPU-native data
    loader). Wraps any random-access source of (image, label) records; shards
    across JAX processes so each host feeds only its local devices."""

    cfg_class = GrainDatasetConfig

    def __init__(self, cfg: GrainDatasetConfig, source=None):
        import grain

        if source is None:
            raise ValueError("GrainDataset requires a random-access source")
        self.cfg = cfg
        self._grain = grain
        self.source = source

    def __iter__(self):
        import jax

        grain = self._grain
        ds = grain.MapDataset.source(self.source)
        if self.cfg.shuffle:
            ds = ds.shuffle(seed=self.cfg.seed)
        # Shard across hosts: each process reads a disjoint slice.
        ds = ds[jax.process_index()::jax.process_count()]
        ds = ds.batch(self.cfg.batch_size, drop_remainder=True)
        it = ds.to_iter_dataset()
        if self.cfg.worker_count:
            it = it.mp_prefetch(grain.MultiprocessingOptions(
                num_workers=self.cfg.worker_count))
        for batch in it:
            images, labels = zip(*batch) if isinstance(batch, list) else (
                batch[0], batch[1])
            yield np.asarray(images), np.asarray(labels)


@dataclass
class ImageFolderConfig:
    path: str = ""
    batch_size: int = 32
    input_size: tuple = (224, 224)
    shuffle: bool = True
    seed: int = 0
    num_threads: int = 8


@cfg_serializable
class ImageFolderDataset:
    """Class-per-subdirectory image folder (the timm/torchvision layout):
    ``path/<class_name>/*.{jpg,jpeg,png}``. Decoding runs on the native C++
    pipeline (tfimm_tpu.native: libjpeg DCT-scaled decode+resize on a
    GIL-free thread pool); falls back to PIL when no C++ toolchain is
    available. Yields (B, H, W, 3) uint8 batches + int labels."""

    cfg_class = ImageFolderConfig
    _EXTS = (".jpg", ".jpeg", ".png")

    def __init__(self, cfg: ImageFolderConfig):
        import os

        self.cfg = cfg
        self.classes = sorted(
            d for d in os.listdir(cfg.path)
            if os.path.isdir(os.path.join(cfg.path, d)))
        if not self.classes:
            raise ValueError(f"No class subdirectories under {cfg.path}")
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples = []
        for c in self.classes:
            cdir = os.path.join(cfg.path, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(self._EXTS):
                    self.samples.append((os.path.join(cdir, fn),
                                         self.class_to_idx[c]))
        if not self.samples:
            raise ValueError(f"No images found under {cfg.path}")
        self._rng = np.random.default_rng(cfg.seed)
        self._decode_batch = None

    def _decoder(self):
        if self._decode_batch is None:
            size = tuple(self.cfg.input_size)
            try:
                from tfimm_tpu.native import ParallelDecoder

                self._decode_batch = ParallelDecoder(
                    size=size, num_threads=self.cfg.num_threads)
            except (RuntimeError, OSError):  # no toolchain: PIL fallback
                from PIL import Image
                import io

                def _pil(blobs):
                    out = []
                    for blob in blobs:
                        img = Image.open(io.BytesIO(blob)).convert("RGB")
                        img = img.resize(size[::-1], Image.BILINEAR)
                        out.append(np.asarray(img, np.uint8))
                    return np.stack(out)

                self._decode_batch = _pil
        return self._decode_batch

    def __len__(self):
        return len(self.samples) // self.cfg.batch_size

    def __iter__(self):
        decode = self._decoder()
        idx = np.arange(len(self.samples))
        if self.cfg.shuffle:
            self._rng.shuffle(idx)
        bs = self.cfg.batch_size
        for i in range(len(self.samples) // bs):
            batch = idx[i * bs:(i + 1) * bs]
            blobs, labels = [], []
            for j in batch:
                path, label = self.samples[j]
                with open(path, "rb") as f:
                    blobs.append(f.read())
                labels.append(label)
            yield decode(blobs), np.asarray(labels)


@dataclass
class ArrayDatasetConfig:
    batch_size: int = 32
    shuffle: bool = True
    seed: int = 0
    input_size: tuple = ()


@cfg_serializable
class ArrayDataset:
    """In-memory (images, labels) dataset yielding numpy batches."""

    cfg_class = ArrayDatasetConfig

    def __init__(self, cfg: ArrayDatasetConfig,
                 data: Optional[Tuple[np.ndarray, np.ndarray]] = None):
        self.cfg = cfg
        if data is None:
            raise ValueError("ArrayDataset requires data=(images, labels)")
        self.images, self.labels = data
        self._rng = np.random.default_rng(cfg.seed)

    def __len__(self):
        return len(self.images) // self.cfg.batch_size

    def __iter__(self):
        idx = np.arange(len(self.images))
        if self.cfg.shuffle:
            self._rng.shuffle(idx)
        bs = self.cfg.batch_size
        for i in range(len(self.images) // bs):
            batch = idx[i * bs:(i + 1) * bs]
            images = self.images[batch]
            if self.cfg.input_size and images.shape[1:3] != tuple(
                    self.cfg.input_size):
                import jax

                images = np.asarray(jax.image.resize(
                    images.astype(np.float32),
                    (len(batch), *self.cfg.input_size, images.shape[-1]),
                    method="bilinear",
                ))
            yield images, self.labels[batch]


@dataclass
class SyntheticDatasetConfig:
    batch_size: int = 8
    nb_samples: int = 64
    input_size: tuple = (32, 32)
    in_channels: int = 3
    nb_classes: int = 10
    seed: int = 0


@cfg_serializable
class SyntheticDataset:
    """Random (image, label) batches generated from the config alone.

    Lets ``run_local.py`` exercise the full training path — including mesh
    sharding (``ExperimentConfig.mesh``) — with zero user-authored Python:
    every field is reachable from the CLI / YAML config. The set is small
    and fixed (seeded), so smoke-training can memorize it."""

    cfg_class = SyntheticDatasetConfig

    def __init__(self, cfg: SyntheticDatasetConfig):
        self.cfg = cfg
        rng = np.random.default_rng(cfg.seed)
        n = cfg.nb_samples
        self.images = rng.uniform(
            0.0, 255.0,
            size=(n, *tuple(cfg.input_size), cfg.in_channels),
        ).astype(np.float32)
        self.labels = rng.integers(0, cfg.nb_classes, size=(n,))

    def __len__(self):
        return self.cfg.nb_samples // self.cfg.batch_size

    def __iter__(self):
        bs = self.cfg.batch_size
        for i in range(len(self)):
            yield (self.images[i * bs:(i + 1) * bs],
                   self.labels[i * bs:(i + 1) * bs])
