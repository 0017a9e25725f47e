"""Golden-value tests for Discretization (modelled on reference tests/test_bsi.py)."""

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.core import Discretization


def test_bucketize_clamps_out_of_range():
    d = Discretization(-1.0, 1.0, 256)
    x = jnp.array([-5.0, -1.01, 1.01, 5.0], dtype=jnp.float64)
    idx = d.bucketize(x)
    npt.assert_array_equal(np.asarray(idx), [0, 0, 255, 255])


def test_bucketize_boundary_alignment():
    d = Discretization(-1.0, 1.0, 5)
    boundaries = np.asarray(d.bin_boundaries(dtype=jnp.float64))
    eps = 1e-9
    # Just right of each inner boundary falls into the next bin
    inner = boundaries[1:-1]
    idx_right = np.asarray(d.bucketize(jnp.asarray(inner + eps)))
    npt.assert_array_equal(idx_right, np.arange(1, 5))
    # Just left of each inner boundary stays in the previous bin
    idx_left = np.asarray(d.bucketize(jnp.asarray(inner - eps)))
    npt.assert_array_equal(idx_left, np.arange(0, 4))


def test_bin_boundaries_placement():
    d = Discretization(-1.0, 1.0, 5)
    # dx = 2/4 = 0.5; boundaries from -1.25 to 1.25
    npt.assert_allclose(
        np.asarray(d.bin_boundaries(dtype=jnp.float64)),
        [-1.25, -0.75, -0.25, 0.25, 0.75, 1.25],
        rtol=1e-12,
    )
    npt.assert_allclose(d.dx, 0.5)
    npt.assert_allclose(d.range, (-1.25, 1.25))


def test_bin_centers():
    d = Discretization(-1.0, 1.0, 5)
    npt.assert_allclose(
        np.asarray(d.bin_centers(dtype=jnp.float64)),
        [-1.0, -0.5, 0.0, 0.5, 1.0],
        rtol=1e-12,
    )


def test_to_8bit_roundtrip():
    # to_8bit_image truncates (reference semantics: tensor.to(uint8)), so test
    # with values safely inside each step: x = (i + 0.25) / 255 * 2 - 1
    d = Discretization.image_8bit()
    i = np.arange(256)
    values = jnp.asarray((i + 0.25) / 255 * 2 - 1, dtype=jnp.float64)
    img = np.asarray(d.to_8bit_image(values))
    npt.assert_array_equal(img, i.astype(np.uint8))


@pytest.mark.parametrize("k", [5, 256])
def test_parity_with_reference(k):
    torch = pytest.importorskip("torch")
    from bsi.bsi import Discretization as RefDiscretization

    ours = Discretization(-1.0, 1.0, k)
    ref = RefDiscretization(-1.0, 1.0, k)

    x = np.random.default_rng(0).uniform(-1.2, 1.2, size=(1000,))
    ours_idx = np.asarray(ours.bucketize(jnp.asarray(x)))
    ref_idx = ref.bucketize(torch.tensor(x)).numpy()
    npt.assert_array_equal(ours_idx, ref_idx)

    npt.assert_allclose(
        np.asarray(ours.bin_boundaries(dtype=jnp.float64)),
        ref.bin_boundaries(torch.device("cpu"), torch.double).numpy(),
        rtol=1e-12,
    )
    npt.assert_allclose(
        np.asarray(ours.to_8bit_image(jnp.asarray(x))),
        ref.to_8bit_image(torch.tensor(x)).numpy(),
    )
