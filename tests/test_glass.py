"""Glass-model coverage: the (C, d, F) partial-dispersion table
(``compute_n``) with the reference's glass-mask / air-row semantics
(`/root/reference/torchlens/ray_tracing.py:273-293`), plus the table's
wiring into ``Lens``.

The oracle here is a line-by-line numpy transcription of the reference's TF
code (TF itself is unavailable): ``mask_replace`` (`ray_tracing.py:20-23`)
scatters flat values into the True positions of the mask in row-major order,
which is exactly numpy boolean assignment.
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu import Lens, Structure, zoo
from torchoptics_tpu.models import glass

ALPHA = -4.5757e-4
BETA = 7.2264e-1


def _oracle_compute_n(nd, v, glass_mask):
    """Numpy transcription of reference `ray_tracing.py:273-293`."""
    nf = nd + (nd - 1.0) * (ALPHA + BETA / v)
    nc = nf - (nd - 1.0) / v
    mask = np.concatenate(
        (np.zeros_like(glass_mask[:, 0:1]), glass_mask), axis=1)
    mask3 = np.repeat(mask[None, ...], 3, axis=0)
    n = np.stack((nc, nd, nf), axis=0)
    n2d = np.ones(mask3.shape, dtype=np.float64)
    n2d[mask3] = n.reshape(-1)  # row-major masked scatter == tf.scatter_nd
    return n2d.transpose(1, 0, 2)


def test_compute_n_flat_form():
    """No-mask form: (..., 3) triples at (C, d, F), F > d > C for normal
    dispersion, d equal to the input n_d."""
    nd = jnp.asarray([1.5168, 1.72])
    v = jnp.asarray([64.17, 29.5])
    out = np.asarray(glass.compute_n(nd, v))
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[:, 1], np.asarray(nd), rtol=0)
    assert np.all(out[:, 2] > out[:, 1])  # n_F > n_d
    assert np.all(out[:, 1] > out[:, 0])  # n_d > n_C
    # Abbe-number closure: V = (n_d - 1) / (n_F - n_C)
    v_back = (out[:, 1] - 1.0) / (out[:, 2] - out[:, 0])
    np.testing.assert_allclose(v_back, np.asarray(v), rtol=1e-5)


def test_compute_n_table_parity_with_oracle():
    """Surface-table form vs the transcribed reference oracle: air row
    prepended, flat glasses scattered wavelength-major, air/pad slots at 1."""
    nd = np.array([1.5168, 1.62, 1.7552], dtype=np.float64)
    v = np.array([64.17, 36.37, 27.53], dtype=np.float64)
    # Heterogeneous batch: 2 glasses in system 0, 1 in system 1 (+ padding).
    glass_mask = np.array([[True, False, True, False],
                           [True, False, False, False]])
    expected = _oracle_compute_n(nd, v, glass_mask)
    got = np.asarray(glass.compute_n(
        jnp.asarray(nd), jnp.asarray(v), glass_mask))
    assert got.shape == (2, 3, 5)
    np.testing.assert_allclose(got, expected, rtol=1e-7)
    # Air column (index 0) is exactly 1 for every system and wavelength.
    np.testing.assert_array_equal(got[:, :, 0], 1.0)


def test_compute_n_table_is_jittable_and_differentiable():
    nd = jnp.asarray([1.5168, 1.62])
    v = jnp.asarray([64.17, 36.37])
    glass_mask = np.array([[True, True, False]])

    f = jax.jit(lambda nd, v: jnp.sum(glass.compute_n(nd, v, glass_mask)))
    g_nd, g_v = jax.grad(f, argnums=(0, 1))(nd, v)
    assert np.all(np.isfinite(np.asarray(g_nd)))
    assert np.all(np.isfinite(np.asarray(g_v)))
    # d(sum)/d(nd) spans three wavelength rows per glass, so > 1 each.
    assert np.all(np.asarray(g_nd) > 1.0)


def test_lens_cdf_index_table():
    """Lens wiring: cooke triplet (GAGAAGA) has 3 glasses; the table matches
    compute_n on the flat glasses and pins air slots to 1."""
    _, lens = zoo.build("cooke")
    table = np.asarray(lens.cdf_index_table())
    B, S = lens.c.shape
    assert table.shape == (B, 3, S + 1)
    expected = _oracle_compute_n(
        np.asarray(lens.flat_nd, dtype=np.float64),
        np.asarray(lens.flat_v, dtype=np.float64),
        lens.structure.mask_G)
    np.testing.assert_allclose(table, expected, rtol=1e-6)
    # d-line row at glass slots equals the lens n_d values.
    mask = np.concatenate(
        (np.zeros((B, 1), bool), lens.structure.mask_G), axis=1)
    np.testing.assert_allclose(
        table[:, 1, :][mask], np.asarray(lens.flat_nd), rtol=1e-6)
