"""Export (StableHLO) round-trip + profiling utilities."""

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.export import export_function, load_exported
from roma_tpu.utils.profiling import Roofline, roofline, timed


def test_export_roundtrip_simple_fn():
    def fn(w, x):
        return jnp.tanh(x @ w)

    w = jnp.ones((8, 4))
    x = jnp.ones((2, 8))
    res = export_function(fn, (w, x))
    assert len(res.serialized) > 0
    out = load_exported(res.serialized)(w, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(w, x)), atol=1e-6)


def test_export_tiny_roma_smoke():
    from roma_tpu.export import export_tiny_roma
    from roma_tpu.models.tiny_roma import TinyRomaMatcher

    m = TinyRomaMatcher.init(jax.random.PRNGKey(0), hw=(64, 64))
    res = export_tiny_roma(m.params, hw=(64, 64))
    fn = load_exported(res.serialized)
    x = jnp.zeros((1, 64, 64, 3))
    out = fn(m.params, x, x)
    assert out[0].shape == (1, 8, 8, 2)


def test_timed_and_roofline():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    t = timed(f, x, iters=2)
    assert t > 0
    r = roofline(f, x, iters=2)
    assert isinstance(r, Roofline) and r.seconds > 0
    assert isinstance(r.report(), str)
