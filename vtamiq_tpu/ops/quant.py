"""Post-training int8 quantization for the serving path.

The reference has no quantized inference (its torch model serves fp32,
vtamiq.py:94-119); this is a new TPU capability. Honest perf ledger for
THIS chip (through the relay):

- round 2: isolated int8 matmul = bf16 (79.7 vs 78.5 TFLOP/s) — XLA does
  not engage the MXU's double-rate int8 path at the encoder's K=N=768.
- round 4 (tools/int8_probe.py, interleaved-arm A/B, 2026-08-19):
  int8 dynamic W8A8 loop read 1.23x bf16, but the pre-quantized static
  arm read 0.86x — inconsistent with a compute-rate win; the dyn gain is
  operand-bandwidth/relay variance, not the 2x peak ratio (394 vs 197
  TOPS) on the datasheet.

- round 4 END-TO-END (tools/int8_e2e_ab.py v3: A/A-controlled, arm-order
  rotated, input transfer settled before timing): int8 fused 500p
  inference 868 pairs/s vs bf16 827-830 best-of-trial on a shared chip —
  a real but modest ~5%, from halved weight HBM traffic, not compute
  rate. (v1 of the A/B read an impossible 5.4x; the A/A control traced
  it to the first-timed arm absorbing the 75 MB host->device input
  transfer. Distrust any relay benchmark without an A/A arm.)

So the benefit is FOOTPRINT first (int8 weights 2x smaller than bf16,
4x vs fp32 — multi-model serving, cold-start transfer) plus ~5%
throughput; the MXU double-rate int8 path stays un-engaged at these
shapes. Opt-in only (VTAMIQScorer quantize_int8); training paths never
see quantized trees.

ACCURACY (tools/int8_accuracy.py, TID2013-trained B16-6L checkpoint, 120
synthetic pairs = 3 refs x 5 distortion families x 8 severities, 500
patches x 2 repeats; regenerated 2026-08-20 via tools/regen_int8_ckpt.py
after the original ckpt was lost to a VM restart — round-4 reading was
0.99987/0.5%): SROCC(int8, bf16) = 0.99994, PLCC_NOFIT = 0.99999,
max |delta| = 0.6% of the bf16 score spread, and per-family severity
orderings agree EXACTLY on the regenerated checkpoint. The feared
ref-minus-dist noise amplification does not materialize at W8A8 — the
quantized path is rank-faithful for serving. Machine-readable artifact:
docs/int8_accuracy_r5.json (round 5); throughput row: BENCH_r05
``infer_500p_int8``.

Recipe (the standard W8A8 dynamic scheme):
- weights: symmetric per-OUTPUT-channel int8, scale = amax(col)/127,
  computed once at load time (`quantize_params_int8`).
- activations: symmetric per-ROW (per-token) int8, scale computed on the
  fly from the row amax — no calibration set needed, and the reduction +
  round are cheap VPU work that XLA fuses into the surrounding ops.
- accumulation: int32 on the MXU, dequantized to fp32, bias added in fp32,
  then cast back to the caller's compute dtype.

LayerNorm, softmax/attention, GELU, and the quality head stay in the
regular bf16/fp32 mixed policy — the encoder dense layers are ~95% of
inference FLOPs at 500 patches.

`models.vit.dense` dispatches here whenever a params leaf was rewritten by
`quantize_params_int8` (presence of "kernel_q8"), so every forward-path
call site (qkv/out projections, MLP, patch embed) picks the int8 kernel up
without signature changes; training paths never see quantized trees.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# leaves whose kernel has any dim below this stay un-quantized: tiny
# matmuls (adapter bottlenecks, the 1-wide head) gain nothing on the MXU
# and per-channel scales would be noisy.
MIN_QUANT_DIM = 64


def quantize_dense_params(p: Dict) -> Dict:
    """{"kernel", "bias"} -> {"kernel_q8", "kernel_scale", "bias"}."""
    k = jnp.asarray(p["kernel"], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=0) / 127.0, 1e-12)  # (out,)
    q = jnp.clip(jnp.round(k / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"kernel_q8": q, "kernel_scale": scale, "bias": p["bias"]}


def dense_q8(p: Dict, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """int8 dense: dynamic per-row activation quant, int32 MXU accumulate.

    x: (..., in). Returns (..., out) in ``dtype`` (default: x.dtype).
    """
    dtype = dtype or x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    xq = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
    y32 = jax.lax.dot_general(
        xq, p["kernel_q8"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y32.astype(jnp.float32) * (amax / 127.0) * p["kernel_scale"]
    return (y + p["bias"].astype(jnp.float32)).astype(dtype)


def _is_dense_leaf(node) -> bool:
    return (isinstance(node, dict) and "kernel" in node and "bias" in node
            and getattr(node["kernel"], "ndim", 0) == 2)


def quantize_params_int8(params: Dict) -> Dict:
    """Rewrite every eligible dense leaf of a params tree to int8.

    Returns a NEW tree (shares unquantized leaves with the input). Apply to
    the whole VTAMIQ tree or any subtree — e.g.
    ``{**params, "vit": quantize_params_int8(params["vit"])}`` quantizes
    the encoder only (the production serving choice; the head's matmuls
    are negligible and fc2's single output column would be scale-noisy).
    """
    def walk(node):
        if _is_dense_leaf(node):
            k = node["kernel"]
            if min(k.shape) >= MIN_QUANT_DIM:
                return quantize_dense_params(node)
            return node
        if isinstance(node, dict):
            return {name: walk(child) for name, child in node.items()}
        return node

    return walk(params)


def count_quantized_leaves(params: Dict) -> int:
    """Number of int8 dense leaves in a tree (test/diagnostic helper)."""
    n = 0

    def walk(node):
        nonlocal n
        if isinstance(node, dict):
            if "kernel_q8" in node:
                n += 1
            for child in node.values():
                walk(child)

    walk(params)
    return n
