"""Dtype policy for TPU execution.

Parameters and normalization statistics live in float32; matmul/conv compute
runs in bfloat16 on the MXU. The reference uses CUDA AMP with a GradScaler
(train_DNet.py:62,96-100); bf16 on TPU keeps fp32's exponent range so no loss
scaling is needed.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

_NAMES = {
    "float32": jnp.float32,
    "f32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve(name) -> jnp.dtype:
    if isinstance(name, str):
        return _NAMES[name]
    return name


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Cost-volume geometry (projective division, consistency thresholds) is
    # precision sensitive; keep it in f32 regardless of the compute dtype.
    geometry_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_args(args) -> "Policy":
        return Policy(
            param_dtype=resolve(getattr(args, "param_dtype", "float32")),
            compute_dtype=resolve(getattr(args, "compute_dtype", "bfloat16")),
        )


DEFAULT = Policy()
# Full f32 everywhere — for golden tests against the fp32 reference semantics.
F32 = Policy(compute_dtype=jnp.float32)


def cast_floating(tree, dtype):
    """Cast floating-point leaves of a pytree (params or inputs) to dtype.

    The bf16 execution strategy: master params stay f32; inside the jitted
    forward/loss both params and image inputs are cast to bf16, so every
    conv contracts bf16 x bf16 with f32 accumulation on the MXU.
    Precision-sensitive code paths (BatchNorm statistics, projective
    geometry, the cost volume, Gaussian activations, losses) internally
    recast to f32, so this cast only affects conv/matmul compute.
    """
    import jax

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)
