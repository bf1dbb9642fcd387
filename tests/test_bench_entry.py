"""Bitrot guards for the driver-facing surfaces: bench.py inputs and the
__graft_entry__ contract (shape-level, no heavy compiles)."""

import os
import sys

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_bench_example_inputs_shapes():
    from bench import H, W, V, example_inputs
    inputs = example_inputs()
    ref, src, R, t, valid, K, rays = inputs
    assert ref.shape == (1, H, W, 3)
    assert src.shape == (1, V, H, W, 3)
    assert R.shape == (1, V, 3, 3) and t.shape == (1, V, 3)
    assert valid.shape == (1, V)
    assert K.shape == (1, 3, 3)
    assert rays.shape == (1, 3, (H // 4) * (W // 4))


def test_graft_entry_traces():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 480, 640, 2)
