#!/usr/bin/env python
"""Component-level timing of the MaGNet pipeline on the current device
(same in-jit loop technique as bench.py). Not part of the driver bench —
a development tool for finding the hot spots."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import H, W, V, example_inputs
from magnet_tpu.models.dnet import DNetCoarse
from magnet_tpu.models.fnet import FNet
from magnet_tpu.models.magnet import Magnet


def timed_loop(apply_fn, feed, n=8, reps=3):
    """apply_fn(carry) -> new carry (same shape). Returns sec/iter."""
    def make(n):
        @jax.jit
        def run(feed):
            return jax.lax.fori_loop(0, n, lambda _, c: apply_fn(c), feed)
        return run
    r1, rN = make(1), make(n)
    f = jax.tree.leaves(r1(feed))[0]
    np.asarray(f)
    np.asarray(jax.tree.leaves(rN(feed))[0])

    def t(run):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(run(feed))[0])
        return time.perf_counter() - t0

    t1 = min(t(r1) for _ in range(reps))
    tN = min(t(rN) for _ in range(reps))
    return (tN - t1) / (n - 1)


def main():
    inputs = example_inputs()
    ref, src = inputs[0], inputs[1]
    all_imgs = jnp.concatenate([ref, src.reshape(-1, H, W, 3)], axis=0)

    dnet = DNetCoarse()
    dvars = jax.jit(dnet.init)(jax.random.PRNGKey(0), all_imgs[:1])

    def d_apply(c):
        gauss, feat = dnet.apply(dvars, c)
        return c + 0.0 * feat[..., :1].mean()
    print("dnet x5 frames: %.1f ms" %
          (1e3 * timed_loop(d_apply, all_imgs)))

    fnet = FNet()
    fvars = jax.jit(fnet.init)(jax.random.PRNGKey(0), all_imgs[:1])

    def f_apply(c):
        feat = fnet.apply(fvars, c)
        return c + 0.0 * feat[..., :1].mean()
    print("fnet x5 frames: %.1f ms" %
          (1e3 * timed_loop(f_apply, all_imgs)))

    # cost volume + gnet: fabricate coarse tensors
    from magnet_tpu.ops.costvolume import cost_volume_cw
    h, w = H // 4, W // 4
    rng = np.random.RandomState(0)
    d_volume = jnp.asarray(rng.uniform(1, 4, (1, h, w, 5)), jnp.float32)
    ref_feat = jnp.asarray(rng.randn(1, h, w, 64), jnp.float32)
    src_feat = jnp.asarray(rng.randn(1, V, h, w, 64), jnp.float32)
    src_mu = jnp.asarray(rng.uniform(1, 4, (1, V, h, w)), jnp.float32)
    src_sigma = jnp.asarray(rng.uniform(.1, .8, (1, V, h, w)), jnp.float32)

    def cv_apply(c):
        cv = cost_volume_cw(c, ref_feat, src_feat, src_mu, src_sigma,
                            inputs[2], inputs[3], inputs[4], inputs[5],
                            inputs[6], 5.0)
        return c + 0.0 * cv
    print("cost_volume_cw (1 iter): %.2f ms" %
          (1e3 * timed_loop(cv_apply, d_volume)))

    model = Magnet(n_iters=3)
    mvars = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)

    def m_apply(c):
        out = model.apply(mvars, c, *inputs[1:], train=False)[-1]
        return c + 0.0 * out[..., :1]
    print("full magnet: %.1f ms" % (1e3 * timed_loop(m_apply, ref)))


if __name__ == "__main__":
    main()
