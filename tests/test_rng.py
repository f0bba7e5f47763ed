"""RNG keystone tests: the NumPy oracle and JAX path must be bit-identical."""

import numpy as np
import jax.numpy as jnp

from pyrenderer_tpu import rng
from pyrenderer_tpu.ref import rng_np


def test_threefry_bit_exact():
    import jax

    rs = np.random.RandomState(0)
    k0 = rs.randint(0, 2**32, 64, dtype=np.uint32)
    k1 = rs.randint(0, 2**32, 64, dtype=np.uint32)
    c0 = rs.randint(0, 2**32, 64, dtype=np.uint32)
    c1 = rs.randint(0, 2**32, 64, dtype=np.uint32)
    # NumPy twin is scalar-looped; JAX side vectorized under jit.
    a0 = np.empty(64, np.uint32)
    a1 = np.empty(64, np.uint32)
    for i in range(64):
        a0[i], a1[i] = rng_np.threefry2x32(k0[i], k1[i], c0[i], c1[i])
    vec = jax.jit(jax.vmap(rng.threefry2x32))
    b0, b1 = vec(jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(c0), jnp.asarray(c1))
    assert np.array_equal(a0, np.asarray(b0))
    assert np.array_equal(a1, np.asarray(b1))


def test_threefry_known_nonzero():
    # Zero key and counter must still scramble (sanity against a broken round fn).
    x0, x1 = rng_np.threefry2x32(0, 0, 0, 0)
    assert (int(x0), int(x1)) != (0, 0)


def test_uniform_bit_exact_vectorized():
    pixels = np.arange(1000, dtype=np.uint32)
    a = rng_np.uniform(42, pixels, 3, 2, 5, dtype=np.float32)
    b = np.asarray(rng.uniform(42, jnp.asarray(pixels), 3, 2, 5))
    assert np.array_equal(a, b)


def test_uniform_distribution():
    pixels = np.arange(200_000, dtype=np.uint32)
    u = rng_np.uniform(7, pixels, 0, 0, 4)
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(np.var(u) - 1 / 12) < 1e-3


def test_uniform_streams_decorrelated():
    pixels = np.arange(10_000, dtype=np.uint32)
    u1 = rng_np.uniform(7, pixels, 0, 0, rng.U_BSDF_0)
    u2 = rng_np.uniform(7, pixels, 0, 0, rng.U_BSDF_1)
    u3 = rng_np.uniform(8, pixels, 0, 0, rng.U_BSDF_0)
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.03
    assert abs(np.corrcoef(u1, u3)[0, 1]) < 0.03
    assert not np.array_equal(u1, u2)


def test_threefry_reduced_rounds_parity():
    """The round-count knob (PYRENDERER_TF_ROUNDS / rounds=) must keep the
    JAX path and the NumPy oracle bit-identical at non-default counts too
    (13 = the BigCrush-passing minimum, Salmon et al. SC'11). End-to-end
    the knob measured inside facility noise (perf/RESULTS.md round 5), so
    20 stays the default; this pins the parity contract at 13."""
    import jax

    rs = np.random.RandomState(1)
    k0 = rs.randint(0, 2**32, 32, dtype=np.uint32)
    k1 = rs.randint(0, 2**32, 32, dtype=np.uint32)
    c0 = rs.randint(0, 2**32, 32, dtype=np.uint32)
    c1 = rs.randint(0, 2**32, 32, dtype=np.uint32)
    for rounds in (13, 20):
        a0 = np.empty(32, np.uint32)
        a1 = np.empty(32, np.uint32)
        for i in range(32):
            a0[i], a1[i] = rng_np.threefry2x32(
                k0[i], k1[i], c0[i], c1[i], rounds=rounds)
        vec = jax.jit(jax.vmap(
            lambda a, b, c, d: rng.threefry2x32(a, b, c, d, rounds=rounds)))
        b0, b1 = vec(jnp.asarray(k0), jnp.asarray(k1),
                     jnp.asarray(c0), jnp.asarray(c1))
        assert np.array_equal(a0, np.asarray(b0))
        assert np.array_equal(a1, np.asarray(b1))
    # 13-round output differs from 20-round (the knob actually does something)
    x13 = rng_np.threefry2x32(1, 2, 3, 4, rounds=13)
    x20 = rng_np.threefry2x32(1, 2, 3, 4, rounds=20)
    assert (int(x13[0]), int(x13[1])) != (int(x20[0]), int(x20[1]))
    # known-answer pin of the CANONICAL Random123 subkey schedule at 13
    # rounds (inject only after complete 4-round groups): a review found
    # the first implementation injected after the truncated final group,
    # which would have made the BigCrush citation apply to a different
    # function than the one shipped
    assert (int(x13[0]), int(x13[1])) == (1478547041, 2923887773)
