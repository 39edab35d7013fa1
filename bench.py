"""Benchmark: VTAMIQ dual-tower inference throughput on the default JAX device.

Measures ref/dist image-pairs/sec for the BASELINE.json headline config
(ViT-B/16, 6 kept layers, 8 register tokens, 500x16x16 patches per image,
full on-device pipeline: CAPS sampling -> patch gather -> dual-tower ViT ->
DiffNet -> q), and compares against a PyTorch-CPU baseline of the same
architecture (the reference's deployment target is a single device running
torch; BASELINE.md north star: >=10x torch-CPU pairs/sec per v5e chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/sec", "vs_baseline": N}

The torch-CPU baseline is measured once and cached in .bench_torch_cpu.json
(same-machine hardware constant; delete the file to re-measure).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BATCH = 16
PATCHES = 500
IMG_H, IMG_W = 384, 512  # TID2013-like input
WARMUP = 1
ITERS = 40
CACHE = os.path.join(REPO, ".bench_torch_cpu.json")


def _enable_compile_cache():
    """Persistent XLA compilation cache — first compile of the big fused
    pipeline is slow on this remote-compile setup; subsequent runs hit disk."""
    try:
        import jax
        cache_dir = os.path.join(REPO, ".jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def measure_jax():
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()
    from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
    from vtamiq_tpu.models.vtamiq import init_vtamiq_params, vtamiq_forward
    from vtamiq_tpu.ops.sampling import PatchSampler
    from vtamiq_tpu.train.steps import ExtractConfig, make_extract_fn

    cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    sampler = PatchSampler()  # shipped config: uniform stratified (PERTURBED_SIMPLE)
    extract = make_extract_fn(sampler, ExtractConfig(patch_count=PATCHES, patch_dim=16))

    def pipeline(params, imgs_raw, key):
        patches, pos, scales = extract(imgs_raw, key)
        return vtamiq_forward(params, cfg, patches, pos, scales)

    # run ITERS batches inside ONE jitted fori_loop: a single host dispatch,
    # so the measurement is device throughput, not controller round-trips
    # (this environment tunnels dispatches through a relay with high latency)
    @jax.jit
    def pipeline_n(params, imgs_raw, key):
        def body(i, acc):
            q = pipeline(params, imgs_raw, jax.random.fold_in(key, i))
            return acc + jnp.sum(q)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    # fallback: the same work split into two dispatches per iteration
    # (extract, then forward). The single fused executable intermittently
    # hits a device/compiler fault on this environment's TPU service; the
    # split stages are reliable and measure the same device work.
    extract_j = jax.jit(lambda r, k: extract(r, k))
    forward_j = jax.jit(lambda p, x, uv, s: vtamiq_forward(p, cfg, x, uv, s))

    def split_run(params, raw, key, iters):
        for i in range(iters):
            patches, pos, scales = extract_j(raw, jax.random.fold_in(key, i))
            q = forward_j(params, patches, pos, scales)
        q.block_until_ready()
        return q

    # time-based seed: this environment's TPU service memoizes executions by
    # (program, inputs) across processes — a fixed seed would replay a cached
    # result instantly and report nonsense throughput
    seed = int(time.time()) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    raw = jnp.asarray(rng.uniform(0, 1, (BATCH, 2, IMG_H, IMG_W, 3)), jnp.float32)
    key = jax.random.PRNGKey(seed)

    try:
        for w in range(WARMUP):
            acc = pipeline_n(params, raw, jax.random.fold_in(key, 1000 + w))
        acc.block_until_ready()
        t0 = time.perf_counter()
        acc = pipeline_n(params, raw, key)
        acc.block_until_ready()
        dt = time.perf_counter() - t0
    except Exception as e:
        print(f"fused pipeline failed ({type(e).__name__}); "
              f"falling back to split stages", file=sys.stderr)
        split_run(params, raw, key, 2)  # warmup/compile
        t0 = time.perf_counter()
        split_run(params, raw, key, ITERS)
        dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dt
    device = str(jax.devices()[0])
    return pairs_per_sec, device


def measure_torch_cpu_baseline():
    """Equivalent-architecture dual-tower forward in PyTorch on CPU.

    Self-contained minimal implementation (ViT-B/16 @ 6 layers + channel-
    attention head) matching the reference's compute graph; patches are
    pre-extracted on the host as the reference does in DataLoader workers,
    and extraction cost is excluded (favoring the baseline)."""
    if os.path.isfile(CACHE):
        with open(CACHE) as f:
            return json.load(f)["pairs_per_sec"]
    import torch
    import torch.nn as nn
    torch.set_num_threads(os.cpu_count() or 1)

    H, MLP, HEADS, LAYERS, T = 768, 3072, 12, 6, 9

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = nn.LayerNorm(H, eps=1e-6)
            self.attn = nn.MultiheadAttention(H, HEADS, batch_first=True)
            self.ls1 = nn.Parameter(torch.ones(H))
            self.ln2 = nn.LayerNorm(H, eps=1e-6)
            self.mlp = nn.Sequential(nn.Linear(H, MLP), nn.GELU(), nn.Linear(MLP, H))
            self.ls2 = nn.Parameter(torch.ones(H))

        def forward(self, x):
            h = self.ln1(x)
            x = x + self.ls1 * self.attn(h, h, h, need_weights=False)[0]
            x = x + self.ls2 * self.mlp(self.ln2(x))
            return x

    class Tower(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Linear(768, H)
            self.pos = nn.Embedding(577, H)
            self.tokens = nn.Parameter(torch.zeros(T, H))
            self.blocks = nn.ModuleList([Block() for _ in range(LAYERS)])
            self.ln = nn.LayerNorm(H, eps=1e-6)

        def forward(self, patches, pos_idx):
            x = self.embed(patches) + self.pos(pos_idx)
            x = torch.cat([self.tokens.expand(x.shape[0], T, H), x], dim=1)
            for b in self.blocks:
                x = b(x)
            return self.ln(x)[:, 0]

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            layers = []
            for _ in range(4 * 4):  # 4 RGs x 4 RCABs
                layers.append(nn.Sequential(nn.Linear(H, H), nn.Linear(H, 48),
                                            nn.ReLU(), nn.Linear(48, H)))
            self.rcabs = nn.ModuleList(layers)
            self.out = nn.Sequential(nn.Linear(H, H), nn.Linear(H, 192),
                                     nn.PReLU(), nn.Linear(192, 1))

        def forward(self, d):
            for m in self.rcabs:
                z = m[0](d)
                d = d + z * torch.sigmoid(m[3](m[2](m[1](z))))
            return self.out(d)

    tower, head = Tower().eval(), Head().eval()
    rng = np.random.default_rng(0)
    patches = torch.from_numpy(rng.normal(size=(BATCH, PATCHES, 768)).astype(np.float32))
    pos_idx = torch.from_numpy(rng.integers(1, 577, size=(BATCH, PATCHES)))

    def run_pair():
        with torch.no_grad():
            cls_r = tower(patches, pos_idx)
            cls_d = tower(patches, pos_idx)
            return head(cls_r - cls_d)

    run_pair()  # warmup
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run_pair()
    dt = time.perf_counter() - t0
    pairs_per_sec = BATCH * iters / dt
    with open(CACHE, "w") as f:
        json.dump({"pairs_per_sec": pairs_per_sec, "threads": torch.get_num_threads(),
                   "measured_at": time.time()}, f)
    return pairs_per_sec


def main():
    value, device = measure_jax()
    try:
        baseline = measure_torch_cpu_baseline()
    except Exception as e:
        print(f"torch baseline failed: {e}", file=sys.stderr)
        baseline = None
    vs = (value / baseline) if baseline else -1.0
    print(json.dumps({
        "metric": f"VTAMIQ ref/dist image pairs/sec ({device}; ViT-B/16 6L, "
                  f"{PATCHES} patches, batch {BATCH}, full on-device pipeline)",
        "value": round(value, 3),
        "unit": "pairs/sec",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
