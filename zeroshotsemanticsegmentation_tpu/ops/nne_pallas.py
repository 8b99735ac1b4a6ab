"""Fused NNE zero-shot inference — Pallas TPU kernel.

One pass over the score volume does everything the reference's eval loop did
in five ops + host syncs (utils.py:159-205): cosine similarity against the
class-embedding matrix (MXU), the seen-restricted and unseen-restricted
argmaxes with the reference's masked-class-scores-exactly-0.0 semantics, and
the seenmask-gated stitch — emitting final int32 labels without
materializing the (N, K) similarity matrix in HBM.

Layout (the op is HBM-bound; C≈20, K≈21-33 both « 128 lanes):

* pixels ride the **lane** axis: the score is fed pre-transposed as (C, N)
  (the transpose fuses into the producer under jit) and sims =
  dot(embed_scaled (K,C), score_t (C,TILE)) gives (K, TILE) tiles, so the
  masked argmax is a cheap reduction over ≤33 sublanes at full lane
  utilization — the natural (TILE, K) orientation wastes 5/6 of every vector
  register and was measured 5x slower than XLA;
* gate/label streams are reshaped (n_tiles, TILE) so every block is a full
  128-lane row, never a width-1 column;
* per-pixel L2 normalization is algebraically eliminated: argmax_k
  sims_k/(‖s‖·‖e_k‖) == argmax_k sims_k/‖e_k‖ because ‖s‖ > 0 is constant
  across k and masked classes are fixed at exactly 0.0 either way (sign is
  preserved) — so the class norms are folded into the embedding matrix ahead
  of time and the kernel does no divisions at all.

The generic entry points in `ops.nne` remain the semantic definition; this
kernel is cross-checked against them in tests (interpret mode on CPU, real
Mosaic kernels on TPU).

Status (v5e, B=16 512x512, score as a jit input): XLA path 4.3 ms, this
kernel 6.0 ms — the standalone transpose costs ~1.7 ms when it cannot fuse
into a producer, so the XLA path stays the default in the eval steps.
Norm-folding changes rounding by ±1 ulp, flipping ~34 of 4.2M argmax results
between near-tied classes (semantically tie-breaks). Planned next step: fuse
the fixed bilinear ×32 upsample into this kernel (sims commute with the
per-channel linear upsample), so full-resolution score volumes are never
materialized in HBM at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048


def _kernel(score_ref, gate_ref, embed_ref, seen_mask_ref, unseen_mask_ref,
            out_ref):
    # (K, C) x (C, T) -> (K, T): pixels stay on lanes end to end
    sims = jnp.dot(embed_ref[:], score_ref[:].astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    # reference semantics: a masked-out class scores exactly 0.0 and still
    # participates in the argmax (zeroed-row matrices, trainer_fcn.py:56-64)
    seen_vals = jnp.where(seen_mask_ref[:] != 0, sims, 0.0)
    unseen_vals = jnp.where(unseen_mask_ref[:] != 0, sims, 0.0)
    seen_arg = jnp.argmax(seen_vals, axis=0).astype(jnp.int32)      # (T,)
    unseen_arg = jnp.argmax(unseen_vals, axis=0).astype(jnp.int32)  # (T,)
    unseen_pix = gate_ref[0, :] >= 0.0
    out_ref[0, :] = jnp.where(unseen_pix, unseen_arg, seen_arg)


def _interpret_default() -> bool:
    # real Mosaic kernels on TPU; interpreter everywhere else (CPU tests)
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _run(score_t, gate_rows, embed_scaled, seen_mask, unseen_mask,
         tile: int, interpret: bool):
    c, n = score_t.shape
    k = embed_scaled.shape[0]
    n_tiles = n // tile
    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((c, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            # gate/labels are (1, N) rows blocked along lanes: full 128-lane
            # blocks (Mosaic requires sublane dim % 8 or == array dim)
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * k,
            bytes_accessed=n * c * 4 + n * 8 + c * k * 4,
            transcendentals=0),
        interpret=interpret,
    )(score_t, gate_rows, embed_scaled, seen_mask, unseen_mask)
    return out[0]


def _prepare_class_tensors(embeddings: jnp.ndarray, seen_vec, unseen_vec):
    e = embeddings.astype(jnp.float32)
    norm2 = jnp.sum(e * e, axis=1, keepdims=True)
    embed_scaled = e / jnp.sqrt(jnp.where(norm2 == 0, 1.0, norm2))
    seen = jnp.asarray(seen_vec, jnp.float32)[:, None]
    unseen = jnp.asarray(unseen_vec, jnp.float32)[:, None]
    return embed_scaled, seen, unseen


def _flatten_pad(score: jnp.ndarray, gate: jnp.ndarray, tile: int):
    b, h, w, c = score.shape
    n = b * h * w
    n_pad = -(-n // tile) * tile
    # (C, N) orientation: the transpose runs in XLA where it can fuse with the
    # score producer; inside the kernel pixels then ride the lane axis with no
    # relayouts (measured 1.4x faster than transposing in-kernel)
    score_t = jnp.pad(score.reshape(n, c), ((0, n_pad - n), (0, 0))).T
    gate_rows = jnp.pad(gate.reshape(-1), (0, n_pad - n)).reshape(1, n_pad)
    return score_t, gate_rows, n


def infer_labels_szn_pallas(fcn_score: jnp.ndarray,
                            seenmask_score: jnp.ndarray,
                            embeddings: jnp.ndarray,
                            unseen_class_mask,
                            *, tile: int = DEFAULT_TILE,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Fused equivalent of ops.nne.infer_labels_szn (reference utils.py:195-205)."""
    b, h, w, _ = fcn_score.shape
    unseen_vec = jnp.asarray(unseen_class_mask)
    embed_scaled, seen, unseen = _prepare_class_tensors(
        embeddings, ~unseen_vec, unseen_vec)
    # gate >= 0 means unseen pixel: argmax of the 2-channel head == 0
    gate = (seenmask_score[..., 0] - seenmask_score[..., 1]).astype(jnp.float32)
    score_t, gate_rows, n = _flatten_pad(fcn_score, gate, tile)
    out = _run(score_t, gate_rows, embed_scaled, seen, unseen, tile,
               _interpret_default() if interpret is None else interpret)
    return out[:n].reshape(b, h, w)


def infer_labels_pallas(score: jnp.ndarray, embeddings: jnp.ndarray,
                        class_mask=None, *, tile: int = DEFAULT_TILE,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Fused equivalent of ops.nne.infer_labels (full or class-restricted)."""
    b, h, w, _ = score.shape
    k = embeddings.shape[0]
    mask = (jnp.ones((k,), bool) if class_mask is None
            else jnp.asarray(class_mask))
    embed_scaled, seen, unseen = _prepare_class_tensors(embeddings, mask, mask)
    gate = jnp.zeros(score.shape[:3], jnp.float32)  # both branches identical
    score_t, gate_rows, n = _flatten_pad(score, gate, tile)
    out = _run(score_t, gate_rows, embed_scaled, seen, unseen, tile,
               _interpret_default() if interpret is None else interpret)
    return out[:n].reshape(b, h, w)
