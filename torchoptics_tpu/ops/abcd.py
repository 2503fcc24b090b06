"""First-order (paraxial) optics: ABCD transfer-matrix toolbox.

TPU-native port of the reference's paraxial layer
(`ray_tracing_lite.py:301-350, 725-794` and `ray_tracing.py:296-345,
697-799`). Matrix chains here are tiny (≤ ~12 surfaces), so the goal is not
raw FLOPs but staying fused inside the enclosing jit program: everything is
pure jnp on static shapes; the pairwise log-depth reduction is unrolled at
trace time.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.models.structure import Lens, Specs, Structure, mask_scatter


def _matmul2x2(lhs: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Batched exact 2x2 matrix product via elementwise ops.

    Written out scalar-wise on purpose: it runs on the VPU at full f32
    precision (XLA's generic dot may use a reduced-precision path, and a 2x2
    would waste a 128x128 MXU tile anyway).
    """
    a = lhs[..., 0, 0] * rhs[..., 0, 0] + lhs[..., 0, 1] * rhs[..., 1, 0]
    b = lhs[..., 0, 0] * rhs[..., 0, 1] + lhs[..., 0, 1] * rhs[..., 1, 1]
    c = lhs[..., 1, 0] * rhs[..., 0, 0] + lhs[..., 1, 1] * rhs[..., 1, 0]
    d = lhs[..., 1, 0] * rhs[..., 0, 1] + lhs[..., 1, 1] * rhs[..., 1, 1]
    return jnp.stack(
        (jnp.stack((a, b), axis=-1), jnp.stack((c, d), axis=-1)), axis=-2)


def reduce_abcd(abcd: jnp.ndarray) -> jnp.ndarray:
    """Compose a chain of 2x2 ray-transfer matrices, last surface leftmost.

    (B, S, 2, 2) -> (B, 2, 2) computing M_{S-1} @ ... @ M_1 @ M_0 with a
    log-depth pairwise reduction (reference `ray_tracing_lite.py:301-311`).
    S is static, so the loop unrolls into ~log2(S) batched products.
    """
    while abcd.shape[1] > 1:
        if abcd.shape[1] % 2 == 0:
            abcd = _matmul2x2(abcd[:, 1::2], abcd[:, ::2])
        else:
            abcd = jnp.concatenate(
                (_matmul2x2(abcd[:, 1::2], abcd[:, :-1:2]), abcd[:, -1:]),
                axis=1)
    return jnp.squeeze(abcd, axis=1)


def interface_propagation_abcd(c: jnp.ndarray, t: jnp.ndarray,
                               n: jnp.ndarray) -> jnp.ndarray:
    """ABCD matrix of a spherical refraction followed by a translation.

    Reference `ray_tracing_lite.py:314-327`. ``n`` has one extra leading
    entry (the medium before the first surface).

    Args:
      c, t: (B, S) curvatures and thicknesses.
      n: (B, S+1) refractive indices.

    Returns:
      (B, S, 2, 2) per-surface matrices [[A, B], [C, D]].
    """
    assert n.shape[-1] - 1 == c.shape[-1] == t.shape[-1]
    D = n[:, :-1] / n[:, 1:]
    C = c * (D - 1.0)
    A = 1.0 + C * t
    B = D * t
    return jnp.stack((A, B, C, D), axis=-1).reshape(n.shape[0], -1, 2, 2)


def compute_pupil_position(lens: Lens) -> jnp.ndarray:
    """Axial position of the paraxial entrance pupil w.r.t. the first surface.

    ABCD of everything before the aperture stop; pupil position = B/A
    (reference `ray_tracing_lite.py:330-350`). Returns (B,).
    """
    sub = lens.up_to_stop()
    if sub.structure.mask.shape[1] == 0:
        return jnp.zeros(len(lens), dtype=lens.dtype)
    nd = jnp.concatenate((jnp.ones_like(sub.nd[:, 0:1]), sub.nd), axis=1)
    abcd = reduce_abcd(interface_propagation_abcd(sub.c, sub.t, nd))
    return abcd[:, 0, 1] / abcd[:, 0, 0]


def get_first_order(lens: Lens) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(EFL, BFL) of each system, both (B,).

    ABCD of the system with the last (image-space) thickness zeroed;
    EFL = -1/C, BFL = -A/C (reference `ray_tracing_lite.py:772-794`).
    """
    st = lens.structure
    nd = jnp.concatenate((jnp.ones_like(lens.nd[:, 0:1]), lens.nd), axis=1)
    rows = np.arange(len(lens))
    last = st.n_surfaces - 1
    t = lens.t.at[rows, last].set(0.0)
    abcd = reduce_abcd(interface_propagation_abcd(lens.c, t, nd))
    efl = -1.0 / abcd[:, 1, 0]
    bfl = -abcd[:, 0, 0] / abcd[:, 1, 0]
    return efl, bfl


def compute_magnification(lens: Lens) -> jnp.ndarray:
    """First-order magnification = A element of the full system ABCD
    (reference `ray_tracing.py:765-777`, TF-only there). Returns (B,)."""
    nd = jnp.concatenate((jnp.ones_like(lens.nd[:, 0:1]), lens.nd), axis=1)
    abcd = reduce_abcd(interface_propagation_abcd(lens.c, lens.t, nd))
    return abcd[:, 0, 0]


def get_paraxial_heights_at_image_plane(specs: Specs, lens: Lens,
                                        relative_fields) -> jnp.ndarray:
    """Paraxial chief-ray heights at the image plane, (B, F).

    Chief-ray height slope = B' = B - A * pupil_position; heights are
    proportional to tan(field angle) (reference `ray_tracing.py:780-799`).
    """
    rel = jnp.asarray(relative_fields, dtype=lens.dtype)
    angles = rel[None, :] * specs.hfov[:, None]
    pupil_position = compute_pupil_position(lens)
    nd = jnp.concatenate((jnp.ones_like(lens.nd[:, 0:1]), lens.nd), axis=1)
    abcd = reduce_abcd(interface_propagation_abcd(lens.c, lens.t, nd))
    a, b = abcd[:, 0, 0], abcd[:, 0, 1]
    b_prime = b - a * pupil_position
    return jnp.tan(angles) * b_prime[:, None]


def compute_last_curvature(structure: Structure, c: jnp.ndarray,
                           t: jnp.ndarray, nd: jnp.ndarray) -> jnp.ndarray:
    """Solve the last optical curvature so each system has EFL == 1.

    Algebraic inversion of the system ABCD: with the last refracting
    interface excluded, c_last = -(1 + n·C) / (A·(n - 1)) where n is the
    index before that interface; systems whose last two gaps are both air
    solve at the second-to-last surface instead
    (reference `ray_tracing_lite.py:725-769`).

    Args:
      structure: static topology.
      c: flat curvatures *excluding* each system's last optical curvature
         (packed row-major over ``mask`` minus that slot).
      t: flat thicknesses over ``mask``.
      nd: flat d-line indices over ``mask_G``.

    Returns:
      Flat curvatures over ``mask`` with the solved curvature spliced in.
    """
    mask = structure.mask
    rows = np.arange(mask.shape[0])
    seq_length = structure.n_surfaces
    # Is the gap before the last surface air? Then the last *optical*
    # curvature sits one surface earlier (trailing air-air, e.g. "...AA").
    air_air = ~structure.mask_G[rows, seq_length - 2]
    last_c_idx = seq_length - 1 - air_air.astype(np.int64)

    # Curvature slots available as inputs: all valid except the last surface.
    c_mask = mask.copy()
    c_mask[rows, seq_length - 1] = False

    c2d = mask_scatter(c_mask, jnp.asarray(c), 0.0)
    t2d = mask_scatter(mask, jnp.asarray(t), 0.0)
    n2d = mask_scatter(structure.mask_G, jnp.asarray(nd), 1.0)
    n2d = jnp.concatenate((jnp.ones_like(n2d[:, 0:1]), n2d), axis=1)

    # Exclude the solved-for surface itself from the ABCD product.
    selection_mask = c_mask.copy()
    selection_mask[rows, last_c_idx] = False

    abcd = interface_propagation_abcd(c2d, t2d, n2d)
    eye = jnp.eye(2, dtype=abcd.dtype)
    abcd = jnp.where(jnp.asarray(selection_mask)[..., None, None], abcd, eye)
    abcd = reduce_abcd(abcd)

    last_n = n2d[rows, last_c_idx]  # index *before* the last interface
    last_c = -(1.0 + last_n * abcd[:, 1, 0]) / (abcd[:, 0, 0] * (last_n - 1.0))

    c2d = c2d.at[rows, last_c_idx].set(last_c)
    r, cc = np.nonzero(mask)
    return c2d[r, cc]
