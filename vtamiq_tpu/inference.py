"""High-level inference API: score image pairs without touching the trainer.

The "run_custom single ref/dist pair" user path (BASELINE.json config #1),
as a library call. Handles model construction, optional checkpoint / ViT-npz
loading, and caches one compiled pipeline per (H, W, batch) bucket.

Example:
    scorer = VTAMIQScorer.from_checkpoint("best.npz")
    q = scorer.score_pair(ref_rgb, dist_rgb)            # numpy HWC in [0,1]
    qs = scorer.score_batch(refs, dists)                # lists of same-size images
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data.buckets import assign_bucket, pad_to_bucket
from .utils import log_warn
from .models.checkpoint import load_checkpoint, merge_params, MODEL_STATE_DICT
from .models.configs import get_vit_config, VTAMIQConfig
from .models.vit import load_vit_npz
from .models.vtamiq import init_vtamiq_params, vtamiq_forward
from .ops.attention import choose_attention_fn
from .ops.sampling import PatchSampler
from .train.steps import ExtractConfig, make_extract_fn

DEFAULT_NORM_MEAN = 0.5
DEFAULT_NORM_STD = 0.5


def preference_from_scores(q_a: float, q_b: float) -> float:
    """sigmoid(q_a - q_b) — the reference's pairwise preference module
    output (train.py:282-301; models/preference.py is the jax twin). The
    DIRECTION of "preference" follows the training labels' convention:
    pairwise-trained (PieAPP) checkpoints emit it as the trained preference
    probability, while for error-like FR scores (lower q = better) a larger
    value means dist_a is scored as MORE distorted. One shared definition
    for the library compare() and the HTTP /compare endpoint."""
    return float(1.0 / (1.0 + np.exp(-(float(q_a) - float(q_b)))))


class VTAMIQScorer:
    """Stateful convenience wrapper around the jitted scoring pipeline."""

    def __init__(self, cfg: Optional[VTAMIQConfig] = None,
                 params: Optional[Dict] = None,
                 patch_count: int = 500,
                 patch_num_scales: int = 1,
                 num_repeats: int = 1,
                 sampler: Optional[PatchSampler] = None,
                 size_buckets: Optional[Sequence] = None,
                 seed: int = 0,
                 quantize_int8: bool = False,
                 ingest_uint8: bool = False):
        """``size_buckets``: optional canonical (H, W) shapes (e.g. from
        data.buckets.compute_canonical_buckets over the expected traffic).
        When set, images pad up to their covering bucket and the sampler is
        confined to the true region via img_hw — the executable count is
        bounded by len(buckets) x ladder instead of one per novel shape,
        and mixed-size pairs batch together (the trainer's padded-bucket
        machinery, reused for serving).

        ``quantize_int8``: rewrite the ViT encoder's dense weights to int8
        (W8A8 dynamic, ops.quant) before the first score — applied lazily
        so checkpoint weights merged by the classmethods are what gets
        quantized. Halves encoder weight memory vs bf16; throughput is a
        wash on current XLA at these shapes (see ops/quant.py ledger).
        Opt-in, serving only.

        ``ingest_uint8``: ship images to the device as uint8 and convert to
        fp32 [0, 1] on-device (x * 1/255 fused into the pipeline). 4x less
        host->device traffic — on a tunneled/remote device the fp32 input
        transfer IS the serving throughput floor (75 MB per 8-pair 512x768
        batch ~ 4.5 s through this relay). Exact for images that came from
        8-bit sources (every PNG/JPEG); float inputs are rounded to 1/255
        steps. Opt-in, serving only."""
        if cfg is None:
            cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
        self.cfg = cfg
        self.params = params if params is not None else init_vtamiq_params(
            jax.random.PRNGKey(seed), cfg)
        self.patch_count = patch_count
        self.patch_num_scales = patch_num_scales
        self.num_repeats = max(1, num_repeats)
        self.sampler = sampler if sampler is not None else PatchSampler()
        self.size_buckets = ([(int(b[0]), int(b[1])) for b in size_buckets]
                             if size_buckets else None)
        self._key = jax.random.PRNGKey(seed)
        self._pipelines = {}
        self._oversize_warned: set = set()
        self._quantize_int8 = bool(quantize_int8)
        self.ingest_uint8 = bool(ingest_uint8)

    def _ensure_quantized(self):
        """Apply the opt-in int8 rewrite to the encoder once, lazily, at
        first scoring — after any classmethod has merged real weights
        (quantize_params_int8 is a no-op on already-quantized leaves)."""
        if not self._quantize_int8:
            return
        from vtamiq_tpu.ops.quant import quantize_params_int8
        self.params = dict(self.params)
        self.params["vit"] = quantize_params_int8(self.params["vit"])
        self._quantize_int8 = False

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, checkpoint_path: str, cfg: Optional[VTAMIQConfig] = None,
                        **kwargs) -> "VTAMIQScorer":
        """Build a scorer from a framework checkpoint. Refuses to serve
        random weights: the checkpoint must contain a model state dict and
        at least one leaf must actually merge (a config-mismatched or
        wrong-kind file would otherwise silently score garbage)."""
        scorer = cls(cfg=cfg, **kwargs)
        ckpt = load_checkpoint(checkpoint_path)
        if MODEL_STATE_DICT not in ckpt:
            raise ValueError(
                f"{checkpoint_path!r} has no '{MODEL_STATE_DICT}' — not a "
                f"framework checkpoint (found keys: {sorted(ckpt)}); for a "
                f"raw ViT .npz use VTAMIQScorer.from_vit_npz")
        stats: Dict[str, int] = {}
        scorer.params = merge_params(scorer.params, ckpt[MODEL_STATE_DICT],
                                     stats=stats)
        if stats.get("merged", 0) == 0:
            raise ValueError(
                f"{checkpoint_path!r}: no checkpoint leaf matched the model "
                f"(all {stats.get('kept', 0)} leaves shape-mismatched or "
                f"missing — wrong vit config?); refusing to serve "
                f"random-initialized weights")
        return scorer

    @classmethod
    def from_vit_npz(cls, npz_path: str, cfg: Optional[VTAMIQConfig] = None,
                     **kwargs) -> "VTAMIQScorer":
        scorer = cls(cfg=cfg, **kwargs)
        scorer.params["vit"] = load_vit_npz(np.load(npz_path), scorer.cfg.vit,
                                            scorer.params["vit"])
        return scorer

    # -- scoring --------------------------------------------------------------

    def executable_key(self, h: int, w: int):
        """The (H, W) an image of true size (h, w) is scored at: its covering
        canonical bucket when size_buckets is set, else the exact shape.

        An image LARGER than every bucket falls back to its exact shape —
        a fresh executable outside the bounded bucket x ladder set (and a
        fresh XLA compile on first use). Warned once per shape; pass
        restrict_to_warmed=True to the batcher to reject these instead."""
        if self.size_buckets:
            key = assign_bucket((h, w), self.size_buckets)
            if key == (int(h), int(w)) and key not in self.size_buckets \
                    and key not in self._oversize_warned:
                self._oversize_warned.add(key)
                log_warn(f"image size {key} exceeds every size bucket "
                         f"{self.size_buckets}; scoring at its exact shape "
                         f"(unbounded executable set + compile stall risk)")
            return key
        return (int(h), int(w))

    def _pipeline(self, batch: int, h: int, w: int, with_hw: bool = False):
        key = (batch, h, w, with_hw)
        if key in self._pipelines:
            return self._pipelines[key]

        ecfg = ExtractConfig(patch_count=self.patch_count,
                             patch_dim=self.cfg.vit.patch_size,
                             patch_num_scales=self.patch_num_scales,
                             norm_mean=(DEFAULT_NORM_MEAN,) * 3,
                             norm_std=(DEFAULT_NORM_STD,) * 3)
        extract = make_extract_fn(self.sampler, ecfg)
        # measured per-(variant, S, batch) choice: quadratic while the
        # logits fit, flash past the budget (ops/attention.py policy)
        attn = choose_attention_fn(self.patch_count, train=False,
                                   batch_pairs=batch,
                                   num_heads=self.cfg.vit.num_heads,
                                   num_extra_tokens=self.cfg.vit.num_tokens)
        cfg = self.cfg
        # uint8 ingest: the x * 1/255 -> fp32 conversion runs ON DEVICE so
        # the host->device transfer is 4x smaller (XLA fuses the cast into
        # the extraction gather)
        to_f32 = ((lambda r: r.astype(jnp.float32) * (1.0 / 255.0))
                  if self.ingest_uint8 else (lambda r: r))

        if with_hw:
            @jax.jit
            def pipeline(params, raw, hw, rng):
                patches, pos, scales = extract(to_f32(raw), rng, hw)
                return vtamiq_forward(params, cfg, patches, pos, scales,
                                      attention_fn=attn)
        else:
            @jax.jit
            def pipeline(params, raw, rng):
                patches, pos, scales = extract(to_f32(raw), rng)
                return vtamiq_forward(params, cfg, patches, pos, scales,
                                      attention_fn=attn)

        self._pipelines[key] = pipeline
        return pipeline

    def score_batch(self, refs: Sequence[np.ndarray],
                    dists: Sequence[np.ndarray]) -> np.ndarray:
        """Score aligned lists of reference/distorted images (float HWC in
        [0,1]; each ref must match its dist's size, but pairs may differ in
        size — they group per executable key: the exact (H, W), or the
        covering canonical bucket when ``size_buckets`` is set, in which
        case DIFFERENT true sizes share one device batch).
        Predictions average over ``num_repeats`` patch resamples (reference
        eval-repeat semantics)."""
        if len(refs) != len(dists):
            raise ValueError("refs and dists must have the same length.")
        self._ensure_quantized()
        groups = {}
        for i, (r, d) in enumerate(zip(refs, dists)):
            if r.shape != d.shape:
                raise ValueError(f"pair {i}: ref {r.shape} != dist {d.shape}")
            groups.setdefault(self.executable_key(*r.shape[:2]), []).append(i)

        out = np.empty(len(refs), float)
        host_dtype = np.uint8 if self.ingest_uint8 else np.float32

        def to_host(img):
            if self.ingest_uint8:
                if img.dtype == np.uint8:
                    return img
                return np.clip(np.asarray(img, np.float32) * 255.0 + 0.5,
                               0, 255).astype(np.uint8)
            if img.dtype == np.uint8:  # uint8 inputs are valid either way
                return np.asarray(img, np.float32) / 255.0
            return np.asarray(img, np.float32)

        for size, idxs in groups.items():
            use_hw = (self.size_buckets is not None)
            if use_hw:
                raw = np.stack([
                    np.stack([pad_to_bucket(to_host(refs[i]), size),
                              pad_to_bucket(to_host(dists[i]), size)])
                    for i in idxs]).astype(host_dtype)
                hw = np.asarray([refs[i].shape[:2] for i in idxs], np.int32)
            else:
                raw = np.stack([np.stack([to_host(refs[i]), to_host(dists[i])])
                                for i in idxs]).astype(host_dtype)
                hw = None
            b, _, h, w, _ = raw.shape
            pipeline = self._pipeline(b, h, w, with_hw=use_hw)
            args = ((jnp.asarray(raw), jnp.asarray(hw)) if use_hw
                    else (jnp.asarray(raw),))
            reps = []
            for _ in range(self.num_repeats):
                self._key, sub = jax.random.split(self._key)
                reps.append(np.asarray(pipeline(self.params, *args, sub), float))
            out[idxs] = np.mean(reps, axis=0)
        return out

    def score_pair(self, ref: np.ndarray, dist: np.ndarray) -> float:
        """Score one ref/dist pair; returns a scalar quality score. The
        DIRECTION (higher vs lower = better) follows whatever convention
        the checkpoint was trained with — the shipped FR dataset configs
        process Qs to [0, 1] (ops/values.process_qs); see
        preference_from_scores for how this interacts with compare()."""
        return float(self.score_batch([ref], [dist])[0])

    def compare(self, ref: np.ndarray, dist_a: np.ndarray,
                dist_b: np.ndarray) -> float:
        """sigmoid(q_a - q_b) with q_a = score(ref, dist_a) — exactly the
        reference's pairwise preference output (train.py:282-301; our
        train/steps.py _forward_scores). Direction caveat: see
        preference_from_scores."""
        qs = self.score_batch([ref, ref], [dist_a, dist_b])
        return preference_from_scores(qs[0], qs[1])


def score_pair(ref: np.ndarray, dist: np.ndarray,
               checkpoint: Optional[str] = None, **kwargs) -> float:
    """One-shot functional API (builds a scorer per call — prefer
    VTAMIQScorer for repeated use)."""
    scorer = (VTAMIQScorer.from_checkpoint(checkpoint, **kwargs)
              if checkpoint else VTAMIQScorer(**kwargs))
    return scorer.score_pair(ref, dist)
