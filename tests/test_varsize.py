"""Variable-size image support: canonical (H, W) buckets + true-size masking.

The declared "hard part" (SURVEY.md §7): LIVE/KADIS-style datasets have many
distinct resolutions, but XLA compiles one executable per shape. The pipeline
pads decoded images up to <= max_size_buckets canonical shapes and ships true
(h, w) per item; the device sampler/extractor confine every patch to the true
region, so pad pixels never reach the model (reference equivalent: arbitrary
numpy sizes, data/patch_sampling.py:450-613).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from vtamiq_tpu.data.buckets import (
    compute_canonical_buckets, assign_bucket, pad_to_bucket,
)
from vtamiq_tpu.data.pipeline import PatchDatasetLoader
from vtamiq_tpu.data.datasets import TID2013Dataset
from vtamiq_tpu.ops.sampling import (
    PatchSampler, sample_positions_uniform, sample_positions_weighted,
    GRID_TYPE_PERTURBED,
)
from vtamiq_tpu.ops.extraction import get_iqa_patches

PAD_SENTINEL = 7.5  # pad value no real pixel can take (raw images are [0,1])


class TestBucketComputation:
    def test_covers_all_sizes(self):
        sizes = [(480, 640), (512, 768), (480, 720), (768, 1024), (360, 480)]
        buckets = compute_canonical_buckets(sizes, max_buckets=3)
        assert 1 <= len(buckets) <= 3
        for h, w in sizes:
            b = assign_bucket((h, w), buckets)
            assert b in buckets
            assert b[0] >= h and b[1] >= w

    def test_single_size_is_exact(self):
        buckets = compute_canonical_buckets([(480, 640)] * 10, max_buckets=4)
        assert buckets == [(480, 640)]

    def test_enough_buckets_means_zero_pad(self):
        sizes = [(100, 200), (150, 150), (200, 100)]
        buckets = compute_canonical_buckets(sizes, max_buckets=3)
        assert sorted(buckets) == sorted(sizes)  # one bucket per size

    def test_fewer_buckets_beat_naive_max(self):
        """DP must do no worse than one bucket of (maxH, maxW)."""
        sizes = [(100, 500), (500, 100), (120, 480), (480, 120)]
        buckets = compute_canonical_buckets(sizes, max_buckets=2)
        naive = sum(500 * 500 - h * w for h, w in sizes)
        cost = sum(assign_bucket(s, buckets)[0] * assign_bucket(s, buckets)[1]
                   - s[0] * s[1] for s in sizes)
        assert cost <= naive

    def test_multiple_rounding(self):
        buckets = compute_canonical_buckets([(97, 130), (99, 127)],
                                            max_buckets=1, multiple=8)
        assert buckets == [(104, 136)]

    def test_pad_to_bucket(self):
        img = np.ones((5, 7, 3), np.float32)
        out = pad_to_bucket(img, (8, 10))
        assert out.shape == (8, 10, 3)
        assert out[:5, :7].sum() == 5 * 7 * 3
        assert out[5:].sum() == 0 and out[:, 7:].sum() == 0
        assert pad_to_bucket(img, (5, 7)) is img


class TestSamplerConfinement:
    def test_uniform_positions_inside_true_region(self):
        H, W, P = 128, 160, 16
        hw = jnp.asarray([80, 100], jnp.int32)
        pos = np.asarray(sample_positions_uniform(
            jax.random.PRNGKey(0), H, W, P, 200, img_hw=hw))
        assert pos[0].max() <= 80 - P and pos[1].max() <= 100 - P
        assert pos[0].min() >= 0 and pos[1].min() >= 0
        # fills the true region, not a corner
        assert pos[0].max() > (80 - P) * 0.8 and pos[1].max() > (100 - P) * 0.8

    def test_uniform_full_size_hw_identical_to_static(self):
        """img_hw == full array size must reproduce the static path draw for
        draw (same key -> same positions): the bucketed path is a strict
        generalization, not a different sampler."""
        H, W, P = 96, 128, 16
        key = jax.random.PRNGKey(3)
        a = np.asarray(sample_positions_uniform(key, H, W, P, 64))
        b = np.asarray(sample_positions_uniform(
            key, H, W, P, 64, img_hw=jnp.asarray([H, W], jnp.int32)))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_weighted_positions_inside_true_region(self):
        H, W, P = 128, 128, 16
        hw = jnp.asarray([96, 72], jnp.int32)
        prob = jnp.ones((H, W), jnp.float32) / (H * W)
        pos = np.asarray(sample_positions_weighted(
            jax.random.PRNGKey(1), prob, H, W, P, 200,
            grid_type=GRID_TYPE_PERTURBED, img_hw=hw))
        assert pos[0].max() <= 96 - P and pos[1].max() <= 72 - P
        assert pos[0].min() >= 0 and pos[1].min() >= 0

    def test_weighted_mass_tracks_true_region_map(self):
        """Probability mass restricted to the true region: a hot spot inside
        it still attracts samples; pad cells get none."""
        H, W, P = 128, 128, 16
        hw = jnp.asarray([96, 96], jnp.int32)
        prob = np.full((H, W), 0.05, np.float32)
        prob[48:96, :48] = 1.0  # hot region inside the true area
        pos = np.concatenate([np.asarray(sample_positions_weighted(
            jax.random.PRNGKey(10 + i), jnp.asarray(prob / prob.sum()),
            H, W, P, 200, grid_type=GRID_TYPE_PERTURBED, img_hw=hw))
            for i in range(6)], axis=1)
        assert pos[0].max() <= 96 - P and pos[1].max() <= 96 - P
        in_hot = (pos[0] >= 40) & (pos[0] < 96) & (pos[1] < 56)
        assert in_hot.mean() > 0.5


def _padded_pair(h, w, H, W, seed=0):
    rng = np.random.default_rng(seed)
    ref = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    dist = np.clip(ref + rng.normal(0, 0.1, ref.shape), 0, 1).astype(np.float32)
    out = np.full((2, H, W, 3), PAD_SENTINEL, np.float32)
    out[0, :h, :w] = ref
    out[1, :h, :w] = dist
    return jnp.asarray(out)


class TestExtractionPadSafety:
    def test_no_pad_pixel_in_patches_single_scale(self):
        imgs = _padded_pair(80, 100, 128, 160)
        patches, pos, _ = get_iqa_patches(
            imgs, imgs, jax.random.PRNGKey(0), 128, 16, PatchSampler(), 1,
            img_hw=jnp.asarray([80, 100], jnp.int32))
        p = np.asarray(patches)
        assert p.max() <= 1.0 + 1e-5, p.max()  # sentinel never sampled
        uv = np.asarray(pos)
        assert uv.min() >= 0.0 and uv.max() < 1.0

    def test_no_pad_pixel_multiscale(self):
        imgs = _padded_pair(160, 200, 256, 256, seed=1)
        patches, pos, scales = get_iqa_patches(
            imgs, imgs, jax.random.PRNGKey(1), 84, 16, PatchSampler(), 3,
            scale_num_samples_ratio=2.0,
            img_hw=jnp.asarray([160, 200], jnp.int32))
        p = np.asarray(patches)
        # avgpool can mix one boundary row of sentinel at coarse scales only
        # if the true dim were odd; 160/200 are even so nothing leaks
        assert p.max() <= 1.0 + 1e-5, p.max()
        assert scales is not None

    def test_no_pad_pixel_weighted_caps(self):
        from vtamiq_tpu.ops.sampling import DIFF_TYPE_MAGNITUDE
        imgs = _padded_pair(96, 96, 128, 128, seed=2)
        sampler = PatchSampler(diff_weight=1.0, uniform_weight=0.1,
                               grid_type=GRID_TYPE_PERTURBED,
                               diff_type=DIFF_TYPE_MAGNITUDE)
        patches, pos, _ = get_iqa_patches(
            imgs, imgs, jax.random.PRNGKey(2), 96, 16, sampler, 1,
            img_hw=jnp.asarray([96, 96], jnp.int32))
        assert np.asarray(patches).max() <= 1.0 + 1e-5

    def test_jittable_with_traced_hw(self):
        """One compiled executable serves every true size within a bucket."""
        fn = jax.jit(lambda imgs, hw, key: get_iqa_patches(
            imgs, imgs, key, 64, 16, PatchSampler(), 1, img_hw=hw))
        imgs_a = _padded_pair(80, 100, 128, 160, seed=3)
        imgs_b = _padded_pair(120, 144, 128, 160, seed=4)
        pa, _, _ = fn(imgs_a, jnp.asarray([80, 100], jnp.int32), jax.random.PRNGKey(0))
        pb, _, _ = fn(imgs_b, jnp.asarray([120, 144], jnp.int32), jax.random.PRNGKey(1))
        assert np.asarray(pa).max() <= 1.0 + 1e-5
        assert np.asarray(pb).max() <= 1.0 + 1e-5


def write_img_size(path, h, w, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)).save(path)


def make_multisize_tid(root, sizes, num_dist=3):
    """LIVE-like synthetic dataset: per-reference image sizes differ."""
    base = os.path.join(root, "tid2013")
    lines = []
    for r, (h, w) in enumerate(sizes):
        ref_name = f"i{r:02d}"
        write_img_size(f"{base}/reference_images/{ref_name}.bmp", h, w, seed=r)
        for d in range(num_dist):
            dist_name = f"{ref_name}_{d + 1:02d}_1.bmp"
            write_img_size(f"{base}/distorted_images/{dist_name}", h, w,
                           seed=100 + r * 10 + d)
            lines.append(f"{1.0 + (r * num_dist + d) % 9} {dist_name}")
    with open(f"{base}/mos_with_names.txt", "w") as f:
        f.write("\n".join(lines))

    class MultiSizeTID(TID2013Dataset):
        num_ref_images = len(sizes)
        num_dist_images = num_dist
        img_dim = None  # sizes vary: must not inherit TID's fixed-size
        # declaration (loaders trust img_dim and skip per-item size probes)

    return MultiSizeTID(datasets_root=root)


SIZES = [(48, 64), (56, 72), (48, 64), (40, 80), (64, 64)]


class TestLoaderBuckets:
    def test_bounded_executable_shapes(self, tmp_path):
        ds = make_multisize_tid(str(tmp_path), SIZES)
        ds.add_split()
        loader = PatchDatasetLoader(ds, "FullDataset", batch_size=4, patch_count=16,
                                    shuffle=True, prefetch=0,
                                    max_size_buckets=2, seed=0)
        shapes = set()
        n_items = 0
        for batch in loader:
            shapes.add(batch.imgs_raw.shape[2:4])
            assert batch.img_hw is not None
            assert batch.img_hw.shape == (4, 2)
            # every true hw fits its bucket
            bh, bw = batch.imgs_raw.shape[2:4]
            assert (batch.img_hw[:, 0] <= bh).all()
            assert (batch.img_hw[:, 1] <= bw).all()
            n_items += batch.valid
        assert len(shapes) <= 2, shapes
        assert n_items == len(SIZES) * 3

    def test_true_sizes_reported(self, tmp_path):
        ds = make_multisize_tid(str(tmp_path), SIZES)
        ds.add_split()
        loader = PatchDatasetLoader(ds, "FullDataset", batch_size=2, patch_count=16,
                                    prefetch=0, max_size_buckets=2, seed=0)
        seen = set()
        for batch in loader:
            for i in range(batch.valid):
                seen.add(tuple(int(x) for x in batch.img_hw[i]))
        assert seen == set(SIZES)

    def test_exact_bucketing_unchanged(self, tmp_path):
        """Default (max_size_buckets=0): batches by exact size, img_hw None."""
        ds = make_multisize_tid(str(tmp_path), SIZES)
        ds.add_split()
        loader = PatchDatasetLoader(ds, "FullDataset", batch_size=2, patch_count=16,
                                    prefetch=0, seed=0)
        for batch in loader:
            assert batch.img_hw is None

    @pytest.mark.parametrize("buckets,bs,pad", [(0, 2, True), (0, 4, False),
                                                (2, 4, True), (0, 2, True)])
    def test_len_matches_yield_count(self, tmp_path, buckets, bs, pad):
        """len(loader) must equal the actual batch count for variable-size
        datasets in EVERY mode — exact-size batching groups by (H, W) and
        flushes per-group partials, which a single ceil-division undercounts
        (ADVICE r2)."""
        ds = make_multisize_tid(str(tmp_path), SIZES)
        ds.add_split()
        loader = PatchDatasetLoader(ds, "FullDataset", batch_size=bs,
                                    patch_count=16, prefetch=0, seed=0,
                                    shuffle=True, num_repeats_data=2,
                                    max_size_buckets=buckets,
                                    pad_partial_batches=pad)
        assert len(loader) == sum(1 for _ in loader)

    def test_len_matches_yield_count_multiprocess_schedule(self, tmp_path):
        """Multi-process mode groups by exact size in the lockstep schedule;
        __len__ must agree with the per-process yield count."""
        ds = make_multisize_tid(str(tmp_path), SIZES)
        ds.add_split()
        loaders = [PatchDatasetLoader(ds, "FullDataset", batch_size=2,
                                      patch_count=16, prefetch=0, seed=0,
                                      process_index=p, process_count=2)
                   for p in range(2)]
        counts = [sum(1 for _ in ld) for ld in loaders]
        assert counts[0] == counts[1] == len(loaders[0]) == len(loaders[1])


class TestEngineVarsize:
    def test_train_val_test_on_multisize_dataset(self, tmp_path):
        """The VERDICT 'done' criterion: a LIVE-like multi-size dataset
        trains/evals end-to-end with a bounded executable set and finite
        correlations."""
        from copy import deepcopy
        from vtamiq_tpu.train import config as C
        from vtamiq_tpu.train import engine

        snaps = {name: deepcopy(getattr(C, name)) for name in (
            "global_config", "vit_config", "vtamiq_config",
            "pretraining_config", "freeze_config", "dataset_config_base",
            "dataset_split_config_base", "dataloader_config_base")}
        registry_snap = dict(C._DATASET_REGISTRY)
        try:
            root = str(tmp_path)
            make_multisize_tid(root, SIZES)

            class MultiTID(TID2013Dataset):
                num_ref_images = len(SIZES)
                num_dist_images = 3
                img_dim = None  # sizes vary (see make_multisize_tid)

                def __init__(self, **kwargs):
                    kwargs.setdefault("datasets_root", root)
                    super().__init__(**kwargs)

            split_cfg = C.setup_split_config(3, (3, 4), (4, 5))
            C._DATASET_REGISTRY[C.DATASET_TID2013] = (MultiTID, split_cfg)
            g = C.global_config
            g["dataset"] = C.DATASET_TID2013
            g["output_dir"] = os.path.join(root, "output")
            g["num_epochs"] = 1
            g["num_repeats_test"] = 2
            g["compute_dtype"] = "float32"
            g["max_size_buckets"] = 2
            g["is_debug"] = True
            g["do_train"] = True
            g["do_val"] = True
            g["do_test"] = False
            g["config_validated"] = False
            C.vit_config.update(num_keep_layers=1, num_extra_tokens=2,
                                hidden_size=32, mlp_dim=64, num_heads=2)
            C.vtamiq_config.update(num_rgs=1, num_rcabs=1, ca_reduction=4)
            C.dataloader_config_base[C.DATALOADER_PARAMS][C.USE_DEFAULT_PARAMS] = True
            for split in (C.SPLIT_NAME_TRAIN, C.SPLIT_NAME_VAL, C.SPLIT_NAME_TEST):
                C.dataloader_config_base[split][C.BATCH_SIZE] = 4
                C.dataloader_config_base[split][C.PATCH_COUNT] = 16

            correlations = engine.train()
            assert correlations is not None
            assert np.isfinite(correlations["SROCC"])
        finally:
            for name, value in snaps.items():
                target = getattr(C, name)
                target.clear()
                target.update(value)
            C._DATASET_REGISTRY.clear()
            C._DATASET_REGISTRY.update(registry_snap)
