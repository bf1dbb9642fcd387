"""AOT serving export: serialize the inference functions to StableHLO.

Production deployment artifact for the TPU-native pipeline: the jitted
forward (and the streaming ``encode``/``fuse`` pair) is traced once at a
fixed shape, lowered, and serialized with ``jax.export`` — the serving
host then runs it with no Python model code, no Flax, and no tracing:

    blob = export_monolithic(model, variables, img_h=480, img_w=640,
                             n_views=4)
    ...
    fn = load_exported(blob)
    pred = fn.call(params_and_stats, ref, srcs, R, t, valid, intM, rays)

Weights are ARGUMENTS of the exported function, not baked constants, so
the artifact stays small (a compiled graph, ~MBs) and one artifact
serves any checkpoint of the same architecture. The compute-dtype cast
(bf16 params / f32 geometry) is traced into the artifact, so callers
pass the f32 master weights as loaded from orbax or the torch converter.

Platform note: lowering captures the backend the export runs on — on a
TPU host the Pallas kernels are embedded (a TPU-only artifact); export
on CPU captures the pure-XLA fallback path. The reference has no
equivalent (TorchScript was never wired up there); this replaces the
"load checkpoints + rebuild the python module tree on every serving
host" flow of test_MaGNet.py:166-169.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

from magnet_tpu.core.dtypes import cast_floating


def _cast(variables, compute_dtype):
    return {"params": cast_floating(variables["params"], compute_dtype),
            "batch_stats": variables["batch_stats"]}


def _struct_like(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        tree)


def _geometry_structs(batch, n_views, dpv_h, dpv_w):
    f32 = jnp.float32
    return (jax.ShapeDtypeStruct((batch, n_views, 3, 3), f32),   # R
            jax.ShapeDtypeStruct((batch, n_views, 3), f32),      # t
            jax.ShapeDtypeStruct((batch, n_views), f32),         # is_valid
            jax.ShapeDtypeStruct((batch, 3, 3), f32),            # intM
            jax.ShapeDtypeStruct((batch, 3, dpv_h * dpv_w), f32))  # rays2d


def export_monolithic(model, variables, img_h: int, img_w: int,
                      n_views: int, batch: int = 1, n_iters: int = None,
                      compute_dtype=jnp.bfloat16) -> bytes:
    """Serialize the full forward (reference test_MaGNet protocol);
    returns the final (B, H, W, 2) (mu, sigma) map."""
    cdt = compute_dtype

    def forward(variables, ref_img, src_imgs, R, t, is_valid, intM,
                rays2d):
        preds = model.apply(_cast(variables, cdt), ref_img.astype(cdt),
                            src_imgs.astype(cdt), R, t, is_valid, intM,
                            rays2d, train=False, n_iters=n_iters)
        return preds[-1]

    f32 = jnp.float32
    exp = jax_export.export(jax.jit(forward))(
        _struct_like(variables),
        jax.ShapeDtypeStruct((batch, img_h, img_w, 3), f32),
        jax.ShapeDtypeStruct((batch, n_views, img_h, img_w, 3), f32),
        *_geometry_structs(batch, n_views, img_h // 4, img_w // 4))
    return exp.serialize()


def export_encode(model, variables, img_h: int, img_w: int,
                  batch: int = 1, compute_dtype=jnp.bfloat16) -> bytes:
    """Serialize the streaming per-frame trunk encode:
    (variables, imgs (N, H, W, 3)) -> (gauss, feat_d, feat_m)."""
    cdt = compute_dtype

    def encode(variables, imgs):
        return model.apply(_cast(variables, cdt), imgs.astype(cdt),
                           train=False, method="encode")

    exp = jax_export.export(jax.jit(encode))(
        _struct_like(variables),
        jax.ShapeDtypeStruct((batch, img_h, img_w, 3), jnp.float32))
    return exp.serialize()


def export_fuse(model, variables, img_h: int, img_w: int, n_views: int,
                batch: int = 1, n_iters: int = None,
                compute_dtype=jnp.bfloat16) -> bytes:
    """Serialize the streaming fusion: encoded ref + neighbor features ->
    final (B, H, W, 2). Feature shapes/dtypes are derived by tracing
    ``encode`` abstractly (no compute)."""
    cdt = compute_dtype
    h, w = img_h // 4, img_w // 4

    enc_struct = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False, method="encode"),
        _struct_like(_cast(variables, cdt)),
        jax.ShapeDtypeStruct((batch, img_h, img_w, 3), cdt))
    gauss_s, feat_d_s, feat_m_s = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), enc_struct)

    def stack_v(s):
        return jax.ShapeDtypeStruct(
            (batch, n_views) + s.shape[1:], s.dtype)

    def fuse(variables, ref_gauss, x_d3, ref_feat, src_gauss, src_feat,
             R, t, is_valid, intM, rays2d):
        preds = model.apply(_cast(variables, cdt), ref_gauss, x_d3,
                            ref_feat, src_gauss, src_feat, R, t,
                            is_valid, intM, rays2d, train=False,
                            n_iters=n_iters, method="fuse")
        return preds[-1]

    exp = jax_export.export(jax.jit(fuse))(
        _struct_like(variables), gauss_s, feat_d_s, feat_m_s,
        stack_v(gauss_s), stack_v(feat_m_s),
        *_geometry_structs(batch, n_views, h, w))
    return exp.serialize()


def load_exported(blob: bytes):
    """Deserialize an exported function; run it via ``.call(*args)``."""
    return jax_export.deserialize(blob)
