"""Host-side input pipeline: split iteration, size-bucketed batching, async
prefetch.

Replaces the reference's torch DataLoader + PatchDatasetSampler machinery
(data/patch_datasets.py:504-559). Key design differences, TPU-first:

- Per-split knobs (patch_count, flip, aligned, repeats) are immutable loader
  state instead of being pushed into a shared dataset object on every
  __iter__ (the reference's notify_patch_dataset pattern,
  patch_datasets.py:531-537, is safe only because workers fork — SURVEY.md §5
  flags it; this design eliminates it).
- The loader yields whole decoded image batches; patch sampling + extraction
  run on device inside the jitted step (vtamiq_tpu.ops), so the host does
  only file I/O, decode, flip, normalize.
- Variable-size datasets (LIVE, KADIS) are handled by size bucketing: batches
  are formed per (H, W) so every device program has static shapes; XLA caches
  one executable per bucket.
- A background thread prefetches batches so image decode overlaps device
  compute (PIL releases the GIL during decode).
"""

from __future__ import annotations

import queue
import threading
from collections import namedtuple
from typing import Dict, Iterator, List, Tuple

import numpy as np

from .datasets import PatchFRIQADataset

ImageBatch = namedtuple(
    "ImageBatch",
    [
        "qs",        # (B,) float32 labels
        "imgs_raw",  # (B, K, H, W, 3) float32 in [0,1]; model normalization
                     # is fused into the device step (train/steps.py)
        "indices",   # (B,) int dataset indices
        "valid",     # int: first `valid` items are real; rest are pad repeats
    ],
)


class PatchDatasetLoader:
    """Iterates one split of a dataset as size-bucketed image batches.

    API parity with the reference PatchDatasetLoader constructor knobs
    (patch_datasets.py:540-555): split_name, batch_size, patch_count,
    allow_img_flip, use_aligned_patches, shuffle, num_repeats_data. The
    patch_* knobs are carried for the device-side extraction step to consume
    (see vtamiq_tpu.train.steps).
    """

    def __init__(self, dataset: PatchFRIQADataset, split_name: str,
                 batch_size: int, patch_count: int,
                 allow_img_flip: bool = False,
                 use_aligned_patches: bool = True,
                 shuffle: bool = False,
                 num_repeats_data: int = 1,
                 img_zero_error_q_prob: float = -1.0,
                 seed: int = 0,
                 prefetch: int = 2,
                 pad_partial_batches: bool = True):
        if not dataset.has_split(split_name):
            raise ValueError(f"Dataset {dataset.name} has no split [{split_name}].")
        self.dataset = dataset
        self.split_name = split_name
        self.batch_size = int(batch_size)
        self.patch_count = int(patch_count)
        self.allow_img_flip = bool(allow_img_flip)
        self.use_aligned_patches = bool(use_aligned_patches)
        self.shuffle = bool(shuffle)
        self.num_repeats_data = max(1, int(num_repeats_data))
        self.img_zero_error_q_prob = img_zero_error_q_prob  # threaded-but-unused
        # in the reference too (SURVEY.md §7); kept for config parity
        self.seed = seed
        self.prefetch = max(0, int(prefetch))
        self.pad_partial_batches = pad_partial_batches
        self._epoch = 0

    # -- iteration ----------------------------------------------------------

    def _epoch_indices(self, rng: np.random.Generator) -> np.ndarray:
        base = np.asarray(self.dataset.split_indices(self.split_name))
        reps = [rng.permutation(base) if self.shuffle else base
                for _ in range(self.num_repeats_data)]
        return np.concatenate(reps)

    def __len__(self):
        n = self.dataset.split_len(self.split_name) * self.num_repeats_data
        if self.pad_partial_batches:
            return (n + self.batch_size - 1) // self.batch_size
        return n // self.batch_size

    def _make_batch(self, items: List[Tuple[int, float, list]]) -> ImageBatch:
        valid = len(items)
        while len(items) < self.batch_size:  # pad by repeating the last item
            items.append(items[-1])
        indices = np.asarray([it[0] for it in items], int)
        qs = np.asarray([it[1] for it in items], np.float32)
        imgs_raw = np.stack([np.stack(it[2]) for it in items]).astype(np.float32)
        return ImageBatch(qs, imgs_raw, indices, valid)

    def _use_native_batch_decode(self) -> bool:
        """Fast path: C++ thread-pool batch decode (vtamiq_tpu/native).
        Falls back to per-sample PIL decode for HDR data or when image
        caching is enabled (the cache lives in the PIL path)."""
        if self.dataset.is_hdr:
            return False
        if getattr(self.dataset, "use_ref_img_cache", False) or \
           getattr(self.dataset, "use_dist_img_cache", False):
            return False
        # subclasses overriding the decode-time hook need the PIL path
        if (type(self.dataset).img_pretransform
                is not PatchFRIQADataset.img_pretransform):
            return False
        try:
            from . import native_io
            return native_io.available()
        except Exception:
            return False

    def _decode_bucket_native(self, bucket) -> ImageBatch:
        """bucket items: (index, q, paths tuple, (h_flip, v_flip), (H, W))."""
        from . import native_io
        valid = len(bucket)
        while len(bucket) < self.batch_size:
            bucket.append(bucket[-1])
        k = len(bucket[0][2])
        h, w = bucket[0][4]
        paths, hflips, vflips = [], [], []
        for (_i, _q, sample_paths, (hf, vf), _size) in bucket:
            for p in sample_paths:
                paths.append(p)
                hflips.append(hf)
                vflips.append(vf)
        imgs = native_io.decode_batch(paths, [(h, w)] * len(paths),
                                      h_flips=hflips, v_flips=vflips)
        imgs_raw = np.stack(imgs).reshape(self.batch_size, k, h, w, 3)
        indices = np.asarray([it[0] for it in bucket], int)
        qs = np.asarray([it[1] for it in bucket], np.float32)
        return ImageBatch(qs, imgs_raw, indices, valid)

    def _produce_native(self, rng) -> Iterator[ImageBatch]:
        from . import native_io
        buckets: Dict[Tuple[int, int], list] = {}
        for index in self._epoch_indices(rng):
            index = int(index)
            paths = self.dataset.sample_paths(index)
            q = float(self.dataset.qs[index])
            h_flip = v_flip = False
            if self.allow_img_flip:
                h_flip = bool(rng.random() < 0.5)
                v_flip = bool(rng.random() < 0.5)
            size = native_io.image_size(paths[0])
            bucket = buckets.setdefault(size, [])
            bucket.append((index, q, paths, (h_flip, v_flip), size))
            if len(bucket) == self.batch_size:
                yield self._decode_bucket_native(bucket)
                buckets[size] = []
        for size, bucket in buckets.items():
            if bucket and self.pad_partial_batches:
                yield self._decode_bucket_native(bucket)

    def _produce(self) -> Iterator[ImageBatch]:
        rng = np.random.default_rng((self.seed, self._epoch))
        self._epoch += 1
        if self._use_native_batch_decode():
            # Probe native decodability on the FIRST batch only: once a batch
            # has been yielded, a later IOError must propagate (restarting the
            # epoch here would duplicate already-yielded samples and break
            # eval-repeat averaging downstream).
            gen = self._produce_native(rng)
            try:
                first = next(gen)
            except StopIteration:
                return
            except IOError:
                # unsupported codec in this dataset -> PIL path below
                rng = np.random.default_rng((self.seed, self._epoch - 1))
            else:
                yield first
                yield from gen
                return
        buckets: Dict[Tuple[int, int], list] = {}
        for index in self._epoch_indices(rng):
            q, imgs_raw, _ = self.dataset.get_sample(
                int(index), rng=rng, allow_img_flip=self.allow_img_flip,
                compute_norm=False)
            size = imgs_raw[0].shape[:2]
            bucket = buckets.setdefault(size, [])
            bucket.append((int(index), q, imgs_raw))
            if len(bucket) == self.batch_size:
                yield self._make_batch(bucket)
                buckets[size] = []
        for size, bucket in buckets.items():
            if bucket and self.pad_partial_batches:
                yield self._make_batch(bucket)

    def __iter__(self) -> Iterator[ImageBatch]:
        if self.prefetch <= 0:
            yield from self._produce()
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error_holder: list = []

        def worker():
            try:
                for batch in self._produce():
                    q.put(batch)
            except BaseException as e:  # surfaced on the consumer side
                error_holder.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if error_holder:
            raise error_holder[0]
