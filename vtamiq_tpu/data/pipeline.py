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
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from .buckets import assign_bucket, compute_canonical_buckets, pad_to_bucket
from .datasets import PatchFRIQADataset
from ..utils import log_warn

_UNRESOLVED = object()  # sentinel: declared-size verification not yet run

ImageBatch = namedtuple(
    "ImageBatch",
    [
        "qs",        # (B,) float32 labels
        "imgs_raw",  # (B, K, H, W, 3) float32 in [0,1]; model normalization
                     # is fused into the device step (train/steps.py)
        "indices",   # (B,) int dataset indices
        "valid",     # int: first `valid` items are real; rest are pad repeats
        "img_hw",    # (B, 2) int32 TRUE image sizes when batches are padded
                     # to canonical buckets (max_size_buckets > 0); else None
        "global_valid",  # multi-process mode: valid count of the GLOBAL batch
                         # this local shard belongs to (pass it to the jitted
                         # step's loss mask); None single-process
    ],
    defaults=(None, None),
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
                 pad_partial_batches: bool = True,
                 max_size_buckets: int = 0,
                 process_index: int = 0,
                 process_count: int = 1):
        """``max_size_buckets`` > 0 enables canonical-bucket padding for
        variable-size datasets (LIVE/KADIS): images are zero-padded up to one
        of <= max_size_buckets (H, W) shapes chosen to minimize pad area
        (data/buckets.py), bounding the number of XLA executables; batches
        then carry per-item TRUE sizes in ``img_hw`` which the device sampler
        uses to confine patches to real pixels. 0 (default) batches by exact
        size — right for fixed-size datasets (TID/KADID/CSIQ/PIPAL).

        ``process_index`` / ``process_count``: multi-host data parallelism
        (parallel/distributed.py) — every process derives the SAME global
        batch schedule (permutation, flips, bucket grouping) from (seed,
        epoch), then decodes only its contiguous slice of each global batch
        of ``batch_size * process_count`` items. This keeps all processes in
        lockstep BY CONSTRUCTION: identical batch counts, identical per-step
        bucket shapes, identical global valid counts — a strided per-process
        slice cannot guarantee any of these once bucketing or partial batches
        are involved (different hosts would assemble different batch
        sequences and deadlock in the global step's collectives)."""
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
        self.max_size_buckets = int(max_size_buckets)
        self._size_buckets = None  # computed lazily from the split's sizes
        self.process_index = int(process_index)
        self.process_count = max(1, int(process_count))
        self._epoch = 0
        self._size_cache: Dict[int, Tuple[int, int]] = {}
        self._fixed_size_cache = _UNRESOLVED

    # -- iteration ----------------------------------------------------------

    def _epoch_indices(self, rng: np.random.Generator) -> np.ndarray:
        """GLOBAL epoch index list — identical on every process."""
        base = np.asarray(self.dataset.split_indices(self.split_name))
        reps = [rng.permutation(base) if self.shuffle else base
                for _ in range(self.num_repeats_data)]
        return np.concatenate(reps)

    def _assembly_batch_size(self) -> int:
        """Batches assemble globally: batch_size items per process."""
        return self.batch_size * self.process_count

    def __len__(self):
        """Batches per epoch (== per process in multi-process mode: every
        process yields the same count by construction).

        Exact in every mode: batches form per size group — per canonical
        bucket when ``max_size_buckets`` > 0, per exact (H, W) otherwise —
        and each group flushes its own partial batch, so the count is the
        sum of per-group ceil/floor divisions (group counts don't depend on
        the epoch permutation). Sizes come from cached header reads."""
        reps = self.num_repeats_data
        bs = self._assembly_batch_size()
        if self._fixed_size() is not None:
            # fixed-size dataset (TID/KADID/CSIQ/PIPAL/PieAPP): one size
            # group — O(1) arithmetic, no per-item header reads at startup
            n = len(self.dataset.split_indices(self.split_name))
            if self.pad_partial_batches:
                return (n * reps + bs - 1) // bs
            return (n * reps) // bs
        canonical = self.size_buckets()  # None when exact-size batching
        counts: Dict[Tuple[int, int], int] = {}
        for i in self.dataset.split_indices(self.split_name):
            size = self._item_size_cached(int(i))
            if canonical is not None:
                size = assign_bucket(size, canonical)
            counts[size] = counts.get(size, 0) + 1
        if self.pad_partial_batches:
            return sum((c * reps + bs - 1) // bs for c in counts.values())
        return sum((c * reps) // bs for c in counts.values())

    # -- canonical size buckets (variable-size datasets) ---------------------

    def _item_size(self, index: int) -> Tuple[int, int]:
        """(h, w) of one split item WITHOUT full decode (header read)."""
        path = self.dataset.sample_paths(index)[0]
        try:
            from . import native_io
            if native_io.available():
                return native_io.image_size(path)
        except Exception:
            pass
        try:
            from PIL import Image
            with Image.open(path) as im:
                w, h = im.size
            return (h, w)
        except Exception:
            return self.dataset.get_img(path, is_ref_img=True).shape[:2]

    def _fixed_size(self) -> Optional[Tuple[int, int]]:
        """The dataset's declared img_dim, VERIFIED against one probed item
        (O(1) I/O) — trusted for every index thereafter, so fixed-size
        datasets skip per-item header reads at startup (TID would otherwise
        open 3000 headers before step 1; KADIS-700k scale ~700k). A
        declaration the first item contradicts (tiny synthetic subclasses
        of real dataset classes) falls back to per-item probing."""
        if self._fixed_size_cache is _UNRESOLVED:
            declared = self.dataset.img_dim
            if declared is not None:
                indices = self.dataset.split_indices(self.split_name)
                if len(indices):
                    actual = self._item_size(int(indices[0]))
                    if tuple(actual) != tuple(declared):
                        log_warn(
                            f"dataset {self.dataset.name}: declared img_dim "
                            f"{tuple(declared)} != first item's actual size "
                            f"{actual}; falling back to per-item size probes")
                        declared = None
            self._fixed_size_cache = (tuple(declared) if declared is not None
                                      else None)
        return self._fixed_size_cache

    def _item_size_cached(self, index: int) -> Tuple[int, int]:
        fixed = self._fixed_size()
        if fixed is not None:
            return fixed
        size = self._size_cache.get(index)
        if size is None:
            size = self._size_cache[index] = self._item_size(index)
        return size

    def size_buckets(self) -> Optional[List[Tuple[int, int]]]:
        """The canonical bucket shapes this loader pads to (None when exact
        bucketing is active). Computed once from the split's image sizes."""
        if self.max_size_buckets <= 0:
            return None
        if self._size_buckets is None:
            sizes = [self._item_size_cached(int(i))
                     for i in self.dataset.split_indices(self.split_name)]
            self._size_buckets = compute_canonical_buckets(
                sizes, self.max_size_buckets)
        return self._size_buckets

    def _make_batch(self, items: List[tuple]) -> ImageBatch:
        """items: (index, q, imgs list, true (h, w))."""
        valid = len(items)
        while len(items) < self.batch_size:  # pad by repeating the last item
            items.append(items[-1])
        indices = np.asarray([it[0] for it in items], int)
        qs = np.asarray([it[1] for it in items], np.float32)
        imgs_raw = np.stack([np.stack(it[2]) for it in items]).astype(np.float32)
        img_hw = None
        if self.max_size_buckets > 0:
            img_hw = np.asarray([it[3] for it in items], np.int32)
        return ImageBatch(qs, imgs_raw, indices, valid, img_hw)

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

    def _decode_bucket_native(self, bucket, bucket_hw) -> ImageBatch:
        """bucket items: (index, q, paths tuple, (h_flip, v_flip), true (H, W));
        bucket_hw: the canonical shape the batch arrays use (== true size for
        exact bucketing)."""
        from . import native_io
        valid = len(bucket)
        while len(bucket) < self.batch_size:
            bucket.append(bucket[-1])
        k = len(bucket[0][2])
        bh, bw = bucket_hw
        paths, hflips, vflips, sizes = [], [], [], []
        for (_i, _q, sample_paths, (hf, vf), true_hw) in bucket:
            for p in sample_paths:
                paths.append(p)
                hflips.append(hf)
                vflips.append(vf)
                sizes.append(true_hw)  # decode at native size, pad after
        imgs = native_io.decode_batch(paths, sizes,
                                      h_flips=hflips, v_flips=vflips)
        if self.max_size_buckets > 0:
            imgs = [pad_to_bucket(im, (bh, bw)) for im in imgs]
        imgs_raw = np.stack(imgs).reshape(self.batch_size, k, bh, bw, 3)
        indices = np.asarray([it[0] for it in bucket], int)
        qs = np.asarray([it[1] for it in bucket], np.float32)
        img_hw = None
        if self.max_size_buckets > 0:
            img_hw = np.asarray([it[4] for it in bucket], np.int32)
        return ImageBatch(qs, imgs_raw, indices, valid, img_hw)

    def _produce_native(self, rng) -> Iterator[ImageBatch]:
        from . import native_io
        canonical = self.size_buckets()
        buckets: Dict[Tuple[int, int], list] = {}
        for index in self._epoch_indices(rng):
            index = int(index)
            paths = self.dataset.sample_paths(index)
            q = float(self.dataset.qs[index])
            h_flip = v_flip = False
            if self.allow_img_flip:
                h_flip = bool(rng.random() < 0.5)
                v_flip = bool(rng.random() < 0.5)
            true_hw = native_io.image_size(paths[0])
            size = (assign_bucket(true_hw, canonical)
                    if canonical is not None else true_hw)
            bucket = buckets.setdefault(size, [])
            bucket.append((index, q, paths, (h_flip, v_flip), true_hw))
            if len(bucket) == self.batch_size:
                yield self._decode_bucket_native(bucket, size)
                buckets[size] = []
        for size, bucket in buckets.items():
            if bucket and self.pad_partial_batches:
                yield self._decode_bucket_native(bucket, size)

    # -- multi-process lockstep schedule -------------------------------------

    def _epoch_schedule(self, rng) -> List[tuple]:
        """Global batch schedule — identical on every process (identical rng
        consumption): list of (bucket_hw, items, global_valid) where each
        ``items`` is (index, q, (h_flip, v_flip), true_hw) of exactly
        ``batch_size * process_count`` entries (final partial global batches
        pad by repeating their last item). Only file headers are read here;
        decode happens per-process on each process's slice."""
        canonical = self.size_buckets()
        g = self._assembly_batch_size()
        schedule: List[tuple] = []
        buckets: Dict[Tuple[int, int], list] = {}
        for index in self._epoch_indices(rng):
            index = int(index)
            h_flip = v_flip = False
            if self.allow_img_flip:
                h_flip = bool(rng.random() < 0.5)
                v_flip = bool(rng.random() < 0.5)
            true_hw = self._item_size_cached(index)
            size = (assign_bucket(true_hw, canonical)
                    if canonical is not None else true_hw)
            bucket = buckets.setdefault(size, [])
            bucket.append((index, float(self.dataset.qs[index]),
                           (h_flip, v_flip), true_hw))
            if len(bucket) == g:
                schedule.append((size, bucket, g))
                buckets[size] = []
        for size, bucket in buckets.items():
            if bucket and self.pad_partial_batches:
                valid = len(bucket)
                schedule.append((size, bucket + [bucket[-1]] * (g - valid),
                                 valid))
        return schedule

    def _decode_items(self, items: List[tuple], bucket_hw: Tuple[int, int],
                      valid: int, global_valid: int) -> ImageBatch:
        """Decode scheduled items (this process's slice) into an ImageBatch."""
        bh, bw = bucket_hw
        pad = self.max_size_buckets > 0
        if self._use_native_batch_decode():
            from . import native_io
            k = len(self.dataset.sample_paths(items[0][0]))
            paths, hflips, vflips, sizes = [], [], [], []
            for (index, _q, (hf, vf), true_hw) in items:
                for path in self.dataset.sample_paths(index):
                    paths.append(path)
                    hflips.append(hf)
                    vflips.append(vf)
                    sizes.append(true_hw)
            imgs = native_io.decode_batch(paths, sizes,
                                          h_flips=hflips, v_flips=vflips)
            if pad:
                imgs = [pad_to_bucket(im, (bh, bw)) for im in imgs]
            imgs_raw = np.stack(imgs).reshape(len(items), k, bh, bw, 3)
        else:
            per_item = []
            for (index, _q, (hf, vf), _true_hw) in items:
                _, raws, _ = self.dataset.get_sample(
                    index, rng=None, allow_img_flip=False, compute_norm=False)
                sample = []
                for im in raws:
                    if hf:
                        im = im[:, ::-1]
                    if vf:
                        im = im[::-1]
                    im = np.ascontiguousarray(im)
                    if pad and im.shape[:2] != (bh, bw):
                        im = pad_to_bucket(im, (bh, bw))
                    sample.append(im)
                per_item.append(np.stack(sample))
            imgs_raw = np.stack(per_item).astype(np.float32)
        qs = np.asarray([it[1] for it in items], np.float32)
        indices = np.asarray([it[0] for it in items], int)
        img_hw = (np.asarray([it[3] for it in items], np.int32)
                  if pad else None)
        return ImageBatch(qs, imgs_raw, indices, valid, img_hw, global_valid)

    def _produce_scheduled(self, rng) -> Iterator[ImageBatch]:
        """Multi-process epoch: every process walks the SAME schedule and
        decodes only its contiguous slice of each global batch, so per-step
        batch shapes and counts agree across hosts by construction. Local
        ``valid`` is the leading-valid count of this slice (global pads are a
        suffix of the global batch); ``global_valid`` feeds the loss mask."""
        b = self.batch_size
        p = self.process_index
        for bucket_hw, items, gvalid in self._epoch_schedule(rng):
            local = items[p * b:(p + 1) * b]
            lvalid = int(np.clip(gvalid - p * b, 0, b))
            yield self._decode_items(local, bucket_hw, lvalid, gvalid)

    def _produce(self) -> Iterator[ImageBatch]:
        rng = np.random.default_rng((self.seed, self._epoch))
        self._epoch += 1
        if self.process_count > 1:
            yield from self._produce_scheduled(rng)
            return
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
        canonical = self.size_buckets()
        buckets: Dict[Tuple[int, int], list] = {}
        for index in self._epoch_indices(rng):
            q, imgs_raw, _ = self.dataset.get_sample(
                int(index), rng=rng, allow_img_flip=self.allow_img_flip,
                compute_norm=False)
            true_hw = tuple(imgs_raw[0].shape[:2])
            if canonical is not None:
                size = assign_bucket(true_hw, canonical)
                if size != true_hw:
                    imgs_raw = [pad_to_bucket(im, size) for im in imgs_raw]
            else:
                size = true_hw
            bucket = buckets.setdefault(size, [])
            bucket.append((int(index), q, imgs_raw, true_hw))
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
