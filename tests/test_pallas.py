"""Pallas kernel parity tests (interpreter-compatible via CPU backend)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from configurable_spectrograms_tpu.ops.spectrogram import collapse_cube  # noqa: E402


def _pallas_available() -> bool:
    return jax.devices()[0].platform in ("tpu",)


@pytest.mark.parametrize("tv", [512, 300, 0])
def test_collapse_cube_pallas_matches_jnp(rng, tv):
    from configurable_spectrograms_tpu.ops.pallas_kernels import collapse_cube_pallas

    T, A, E = 512, 16, 128
    cube = rng.normal(size=(T, A, E)).astype(np.float32)
    cube[rng.random(cube.shape) < 0.15] = np.nan
    mask = rng.random(A) < 0.5
    # Off-TPU the kernel runs through the Pallas interpreter automatically.
    ref = collapse_cube(jnp.asarray(cube), jnp.asarray(mask), tv)
    got = collapse_cube_pallas(jnp.asarray(cube), jnp.asarray(mask), tv)
    ref_np, got_np = np.asarray(ref), np.asarray(got)
    both_nan = np.isnan(ref_np) & np.isnan(got_np)
    np.testing.assert_array_equal(np.where(both_nan, 0, got_np), np.where(both_nan, 0, ref_np))


def test_collapse_cube_pallas_shape_gate(rng):
    from configurable_spectrograms_tpu.ops.pallas_kernels import collapse_cube_pallas

    with pytest.raises(ValueError):
        collapse_cube_pallas(jnp.zeros((100, 4, 120)), jnp.ones(4, bool), 100)
