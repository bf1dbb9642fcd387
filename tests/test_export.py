"""AOT serving export (magnet_tpu/serve/export.py): serialized StableHLO
artifacts reproduce the live model, for both the monolithic forward and
the streaming encode/fuse pair."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from magnet_tpu import serve
from magnet_tpu.models.magnet import Magnet
from tests.test_streaming import _inputs, H, W, V


@pytest.fixture(scope="module")
def model_and_vars():
    model = Magnet(n_iters=2)
    inputs = _inputs()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
    return model, variables, inputs


def test_monolithic_export_roundtrip(model_and_vars, tmp_path):
    model, variables, inputs = model_and_vars
    blob = serve.export_monolithic(model, variables, img_h=H, img_w=W,
                                   n_views=V, n_iters=2,
                                   compute_dtype=jnp.float32)
    # survives a disk roundtrip (the deployment artifact)
    p = tmp_path / "magnet.stablehlo"
    p.write_bytes(blob)
    fn = serve.load_exported(p.read_bytes())

    got = np.asarray(fn.call(variables, *inputs))
    want = np.asarray(model.apply(variables, *inputs, train=False)[-1])
    # the exported computation may fuse differently than the in-process
    # jit -> ~1e-5 relative float noise on the random-init magnitudes
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_streaming_export_roundtrip(model_and_vars):
    model, variables, inputs = model_and_vars
    enc_blob = serve.export_encode(model, variables, img_h=H, img_w=W,
                                   compute_dtype=jnp.float32)
    fuse_blob = serve.export_fuse(model, variables, img_h=H, img_w=W,
                                  n_views=V, n_iters=2,
                                  compute_dtype=jnp.float32)
    encode = serve.load_exported(enc_blob)
    fuse = serve.load_exported(fuse_blob)

    ref, srcs = inputs[0], inputs[1]
    ref_g, ref_fd, ref_fm = encode.call(variables, ref)
    encs = [encode.call(variables, srcs[:, i]) for i in range(V)]
    src_g = jnp.stack([e[0][0] for e in encs])[None]
    src_fm = jnp.stack([e[2][0] for e in encs])[None]
    got = np.asarray(fuse.call(variables, ref_g, ref_fd, ref_fm,
                               src_g, src_fm, *inputs[2:]))
    want = np.asarray(model.apply(variables, *inputs, train=False)[-1])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
