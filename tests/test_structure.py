"""Structure / Specs / Lens pytree behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import Lens, Specs, Structure, find_valid_curvatures, zoo


def test_structure_masks():
    st = Structure((4,), ("GAGAAGA",))
    assert st.mask.shape == (1, 7)
    assert st.mask.all()
    np.testing.assert_array_equal(
        st.mask_G[0], [True, False, True, False, False, True, False])
    assert st.n_surfaces[0] == 7
    assert st.last_g_idx[0] == 5
    assert not st.mask_except_last[0, 6]
    assert st.mask_except_last[0, :6].all()


def test_structure_heterogeneous_padding():
    st = Structure((0, 2), ("AGA", "GAAGA"))
    assert st.pad_to == 5
    assert st.mask[0].tolist() == [True] * 3 + [False] * 2
    assert st.mask_G[1].tolist() == [True, False, False, True, False]


def test_up_to_stop():
    st = Structure((4,), ("GAGAAGA",))
    sub = st.up_to_stop()
    assert sub.pad_to == 4
    assert sub.sequence == ("GAGA",)
    # stop at first surface -> empty
    st0 = Structure((0,), ("AGA",))
    assert st0.up_to_stop().pad_to == 0


def test_structure_hashable_static():
    st1 = Structure((4,), ("GAGAAGA",))
    st2 = Structure((4,), ("GAGAAGA",))
    assert hash(st1) == hash(st2) and st1 == st2
    # usable as a static closure in jit without retrace errors
    @jax.jit
    def f(c):
        return c * st1.mask_jnp
    f(jnp.ones((1, 7)))


def test_lens_flat_promotion_and_accessors():
    specs, lens = zoo.build("cooke")
    assert lens.c.shape == (1, 7)
    assert lens.nd.shape == (1, 7)
    np.testing.assert_allclose(np.asarray(lens.flat_nd),
                               zoo.COOKE["nd"], rtol=1e-6)
    # functional setter round trip
    lens2 = lens.with_flat_c(lens.flat_c * 2)
    np.testing.assert_allclose(np.asarray(lens2.flat_c),
                               2 * np.asarray(lens.flat_c), rtol=1e-6)
    # flat_c_but_last drops exactly one element per system
    assert lens.flat_c_but_last.shape[0] == lens.flat_c.shape[0] - 1


def test_lens_pytree_roundtrip():
    specs, lens = zoo.build("tessar")
    leaves, treedef = jax.tree_util.tree_flatten(lens)
    lens2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(lens2.c), np.asarray(lens.c))
    assert lens2.structure == lens.structure
    # grad flows through tree_map
    g = jax.grad(lambda l: jnp.sum(l.c ** 2))(lens)
    np.testing.assert_allclose(np.asarray(g.c), 2 * np.asarray(lens.c))


def test_lens_scale():
    specs, lens = zoo.build("singlet")
    efl = lens.efl
    scaled = lens.scale(1.0 / efl)
    np.testing.assert_allclose(np.asarray(scaled.efl), 1.0, rtol=5e-4)


def test_up_to_stop_lens_masks_params():
    specs, lens = zoo.build("cooke")  # stop_idx 4
    sub = lens.up_to_stop()
    assert sub.c.shape == (1, 4)
    np.testing.assert_allclose(np.asarray(sub.c[0]),
                               zoo.COOKE["c"][:4], rtol=1e-6)


def test_find_valid_curvatures():
    st = Structure((4,), ("GAGAAGA",))
    valid = find_valid_curvatures(st)
    # surfaces: G A G A A G A -> curvature optimizable where glass on either
    # side, minus the last surface; the air-air stop surface (idx 4) and the
    # final surface (idx 6) are excluded.
    np.testing.assert_array_equal(
        valid[0], [True, True, True, True, False, True, False])


def test_specs_vignetting_defaults():
    specs, _ = zoo.build("doublet")
    assert specs.vig_up is not None
    np.testing.assert_array_equal(np.asarray(specs.vig_up), [0.0])
