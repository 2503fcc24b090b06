"""Batched lens topology, specifications, and lens parameters as JAX pytrees.

TPU-first re-design of the reference's lens/scene model
(`torchlens/lens_modeling.py:151-386`):

* ``Structure`` is **static metadata** (hashable, host-side numpy masks). Under
  ``jax.jit`` it travels as auxiliary pytree data, so mask-dependent control
  flow (padded widths, scatter indices, scan lengths) is resolved at trace
  time and the compiled XLA program is fully static.
* ``Specs`` and ``Lens`` are registered pytrees whose leaves are the
  differentiable arrays (curvature ``c``, thickness ``t``, index ``nd``, Abbe
  ``v``, plus the TPU-build superset: conic ``kappa`` and even-asphere
  coefficients ``asph``). ``vmap`` / ``grad`` / sharding apply directly.
* All "setters" are functional (``with_flat_c`` returns a new Lens) — no
  in-place ``masked_scatter_`` (reference `lens_modeling.py:21-26`); we use
  static ``np.nonzero`` indices + ``Array.at[].set`` instead.

Tensor layout convention (shared with the trace engine, reference
`ray_tracing_lite.py:1-10`):

    dim 0: n_lens systems, dim 1: fields, dim 2: pupil rays,
    dim 3: wavelengths, dim 4: surfaces (when present).

Padded 2-D parameter tensors have shape ``(n_systems, max_surfaces)``;
curvatures/thicknesses pad with 0, refractive indices with 1, Abbe numbers
with 1 (the reference pads ``v`` with NaN — `lens_modeling.py:282` — which
poisons gradients through masked lanes; we use a finite pad on purpose).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import cached_property
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def _as_seq_tuple(sequence) -> Tuple[str, ...]:
    if isinstance(sequence, str):
        return (sequence,)
    if isinstance(sequence, np.ndarray):
        return tuple(str(s) for s in sequence.reshape(-1))
    return tuple(str(s) for s in sequence)


def _as_int_tuple(x) -> Tuple[int, ...]:
    if isinstance(x, (int, np.integer)):
        return (int(x),)
    return tuple(int(v) for v in np.asarray(x).reshape(-1))


def mask_scatter(mask: np.ndarray, flat: jnp.ndarray, fill) -> jnp.ndarray:
    """Scatter 1-D ``flat`` values into the True positions of a static 2-D
    boolean ``mask`` (row-major), padding the rest with ``fill``.

    Functional replacement for the reference's in-place ``mask_replace``
    (`lens_modeling.py:21-26`). ``mask`` must be host-side numpy so the
    scatter indices are compile-time constants.
    """
    rows, cols = np.nonzero(mask)
    out = jnp.full(mask.shape, fill, dtype=flat.dtype)
    return out.at[rows, cols].set(flat)


def mask_gather(mask: np.ndarray, padded: jnp.ndarray) -> jnp.ndarray:
    """Gather the True positions of a static mask out of a padded 2-D array."""
    rows, cols = np.nonzero(mask)
    return padded[rows, cols]


@dataclass(frozen=True)
class Structure:
    """Batched lens topology: where the glass is and where the stop sits.

    ``sequence`` strings use the reference's G/A alphabet
    (`lens_modeling.py:151-213`): 'G' = glass gap after the surface,
    'A' = air gap. One character per surface. ``stop_idx[i]`` is the index of
    the aperture-stop surface of system ``i``.

    Hashable + immutable: safe to close over in jitted functions or pass as a
    static argument.
    """

    stop_idx: Tuple[int, ...]
    sequence: Tuple[str, ...]
    pad_to: Optional[int] = None

    def __post_init__(self):
        object.__setattr__(self, "stop_idx", _as_int_tuple(self.stop_idx))
        object.__setattr__(self, "sequence", _as_seq_tuple(self.sequence))
        assert len(self.stop_idx) == len(self.sequence), (
            "stop_idx and sequence must have the same batch size"
        )
        width = max((len(s) for s in self.sequence), default=0)
        if self.pad_to is None:
            object.__setattr__(self, "pad_to", width)
        else:
            assert self.pad_to >= width

    # -- static numpy views ------------------------------------------------

    @cached_property
    def mask(self) -> np.ndarray:
        """(B, S) bool — valid (non-padding) surfaces."""
        m = np.zeros((len(self), self.pad_to), dtype=bool)
        for i, s in enumerate(self.sequence):
            m[i, : len(s)] = True
        return m

    @cached_property
    def mask_G(self) -> np.ndarray:
        """(B, S) bool — surfaces followed by a glass gap."""
        m = np.zeros((len(self), self.pad_to), dtype=bool)
        for i, s in enumerate(self.sequence):
            for j, ch in enumerate(s):
                m[i, j] = ch == "G"
        return m

    @cached_property
    def stop_idx_np(self) -> np.ndarray:
        return np.asarray(self.stop_idx, dtype=np.int32)

    @property
    def mask_jnp(self) -> jnp.ndarray:
        return jnp.asarray(self.mask)

    @property
    def mask_G_jnp(self) -> jnp.ndarray:
        return jnp.asarray(self.mask_G)

    @cached_property
    def n_surfaces(self) -> np.ndarray:
        return self.mask.sum(axis=1)

    @cached_property
    def last_g_idx(self) -> np.ndarray:
        """Index of the last glass gap per system (reference `lens_modeling.py:203-207`)."""
        idx = np.broadcast_to(np.arange(self.mask.shape[1]), self.mask.shape)
        return np.where(self.mask_G, idx, 0).argmax(axis=1)

    @cached_property
    def mask_except_last(self) -> np.ndarray:
        """Valid-surface mask with the surface after the last glass zeroed
        (reference `lens_modeling.py:209-213`)."""
        m = self.mask.copy()
        idx = np.minimum(self.last_g_idx + 1, self.mask.shape[1] - 1)
        m[np.arange(len(self)), idx] = False
        return m

    # -- API ---------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.sequence)

    def __hash__(self):
        return hash((self.stop_idx, self.sequence, self.pad_to))

    def up_to_stop(self) -> "Structure":
        """Topology truncated at the aperture stop (reference
        `lens_modeling.py:185-192`). The truncated width is the max stop index
        across the batch — a *static* quantity, so this is jit-safe."""
        max_len = max(self.stop_idx) if self.stop_idx else 0
        seqs = tuple(s[: min(k, len(s))] for s, k in zip(self.sequence, self.stop_idx))
        return Structure(self.stop_idx, seqs, pad_to=max_len)

    def __getitem__(self, index) -> "Structure":
        if isinstance(index, int):
            index = slice(index, index + 1)
        if isinstance(index, slice):
            idx = range(len(self))[index]
        else:  # host-side fancy index (list/np.ndarray of system rows)
            idx = [int(i) for i in np.asarray(index).reshape(-1)]
        seqs = tuple(self.sequence[i] for i in idx)
        return Structure(tuple(self.stop_idx[i] for i in idx), seqs)

    def clone(self) -> "Structure":
        return self

    @staticmethod
    def from_masks(stop_idx, mask: np.ndarray, mask_G: np.ndarray) -> "Structure":
        """Build from explicit masks (used by ``up_to_stop``-style surgery)."""
        seqs = []
        for i in range(mask.shape[0]):
            n = int(mask[i].sum())
            seqs.append("".join("G" if mask_G[i, j] else "A" for j in range(n)))
        return Structure(_as_int_tuple(stop_idx), tuple(seqs), pad_to=mask.shape[1])


def find_valid_curvatures(structure: Structure) -> np.ndarray:
    """Mask of optimizable curvatures: excludes air-air interfaces and the
    last curvature (solved analytically). Reference `lens_modeling.py:49-53`."""
    mask_G = structure.mask_G
    previous = np.concatenate(
        (np.zeros_like(mask_G[:, 0:1]), mask_G[:, :-1]), axis=1
    )
    return (mask_G | previous) & structure.mask_except_last & structure.mask


@jax.tree_util.register_pytree_node_class
@dataclass
class Specs:
    """Lens specifications (reference `lens_modeling.py:216-252`)."""

    structure: Structure
    epd: jnp.ndarray  # (B,) entrance pupil diameter
    hfov: jnp.ndarray  # (B,) half field of view [radians]
    vig_up: Optional[jnp.ndarray] = None
    vig_down: Optional[jnp.ndarray] = None
    vig_x: Optional[jnp.ndarray] = None

    def __post_init__(self):
        self.epd = jnp.asarray(self.epd)
        self.hfov = jnp.asarray(self.hfov)
        if self.vig_up is None:
            self.vig_up = jnp.zeros_like(self.epd)
        if self.vig_down is None:
            self.vig_down = jnp.zeros_like(self.epd)
        if self.vig_x is None:
            self.vig_x = jnp.zeros_like(self.epd)

    def __len__(self):
        return len(self.structure)

    def scale(self, factor) -> "Specs":
        return Specs(self.structure, self.epd * factor, self.hfov,
                     self.vig_up, self.vig_down, self.vig_x)

    def up_to_stop(self) -> "Specs":
        return Specs(self.structure.up_to_stop(), self.epd, self.hfov,
                     self.vig_up, self.vig_down, self.vig_x)

    def __getitem__(self, index) -> "Specs":
        if isinstance(index, int):
            index = slice(index, index + 1)
        return Specs(self.structure[index], self.epd[index], self.hfov[index],
                     self.vig_up[index], self.vig_down[index], self.vig_x[index])

    def astype(self, dtype) -> "Specs":
        return Specs(self.structure, self.epd.astype(dtype), self.hfov.astype(dtype),
                     self.vig_up.astype(dtype), self.vig_down.astype(dtype),
                     self.vig_x.astype(dtype))

    def tree_flatten(self):
        return (self.epd, self.hfov, self.vig_up, self.vig_down, self.vig_x), self.structure

    @classmethod
    def tree_unflatten(cls, structure, leaves):
        obj = object.__new__(cls)
        obj.structure = structure
        obj.epd, obj.hfov, obj.vig_up, obj.vig_down, obj.vig_x = leaves
        return obj


def _pad2d(structure: Structure, values, mask: np.ndarray, fill, dtype=None):
    values = jnp.asarray(values, dtype=dtype)
    if values.ndim == 1:
        return mask_scatter(mask, values, fill)
    assert values.shape == mask.shape, (
        f"padded parameter shape {values.shape} != mask shape {mask.shape}"
    )
    return values


@jax.tree_util.register_pytree_node_class
@dataclass
class Lens:
    """Batched lens parameters (reference `lens_modeling.py:255-386`).

    ``c``/``t`` are (B, S) padded with 0; ``nd``/``v`` padded with 1.
    1-D compact ("flat") forms are accepted by the constructor and promoted
    (reference `lens_modeling.py:263-283`).

    TPU-build superset (BASELINE.json north star): ``kappa`` (B, S) conic
    constants and ``asph`` (B, S, K) even-asphere coefficients (r^4 … r^(2K+2)
    terms). ``None`` means purely spherical and selects the closed-form
    intersection path in the trace engine.
    """

    structure: Structure
    c: jnp.ndarray
    t: jnp.ndarray
    nd: jnp.ndarray
    v: jnp.ndarray
    kappa: Optional[jnp.ndarray] = None
    asph: Optional[jnp.ndarray] = None

    def __post_init__(self):
        st = self.structure
        self.c = _pad2d(st, self.c, st.mask, 0.0)
        self.t = _pad2d(st, self.t, st.mask, 0.0)
        self.nd = _pad2d(st, self.nd, st.mask_G, 1.0)
        self.v = _pad2d(st, self.v, st.mask_G, 1.0)
        if self.kappa is not None:
            self.kappa = _pad2d(st, self.kappa, st.mask, 0.0)
        if self.asph is not None:
            self.asph = jnp.asarray(self.asph)
            assert self.asph.ndim == 3 and self.asph.shape[:2] == st.mask.shape

    def __len__(self):
        return len(self.structure)

    @property
    def dtype(self):
        return self.c.dtype

    @property
    def is_spherical(self) -> bool:
        """Static: True when the closed-form sphere intersection applies."""
        return self.kappa is None and self.asph is None

    # -- functional updates --------------------------------------------------

    def replace(self, **kw) -> "Lens":
        return dataclasses.replace(self, **kw)

    def scale(self, factor) -> "Lens":
        """Scale all lengths by ``factor`` (reference `lens_modeling.py:288`).
        Asphere coefficient of r^(2k+4) scales by factor^-(2k+3)."""
        factor = jnp.asarray(factor)
        f = factor.reshape((-1,) + (1,) * (self.c.ndim - 1)) if factor.ndim else factor
        kappa = self.kappa  # dimensionless
        asph = None
        if self.asph is not None:
            k = jnp.arange(self.asph.shape[-1])
            powers = -(2.0 * k + 3.0)
            fa = factor.reshape((-1, 1, 1)) if factor.ndim else factor
            asph = self.asph * fa ** powers
        return Lens(self.structure, self.c / f, self.t * f, self.nd, self.v,
                    kappa=kappa, asph=asph)

    def detach(self) -> "Lens":
        return jax.tree_util.tree_map(jax.lax.stop_gradient, self)

    def astype(self, dtype) -> "Lens":
        cast = lambda a: None if a is None else a.astype(dtype)
        return Lens(self.structure, cast(self.c), cast(self.t), cast(self.nd),
                    cast(self.v), kappa=cast(self.kappa), asph=cast(self.asph))

    def up_to_stop(self) -> "Lens":
        st = self.structure.up_to_stop()
        w = st.pad_to
        c = jnp.where(st.mask_jnp, self.c[:, :w], 0.0)
        t = jnp.where(st.mask_jnp, self.t[:, :w], 0.0)
        nd = jnp.where(st.mask_G_jnp, self.nd[:, :w], 1.0)
        v = jnp.where(st.mask_G_jnp, self.v[:, :w], 1.0)
        kappa = None if self.kappa is None else jnp.where(st.mask_jnp, self.kappa[:, :w], 0.0)
        asph = None if self.asph is None else jnp.where(st.mask_jnp[..., None], self.asph[:, :w], 0.0)
        return Lens(st, c, t, nd, v, kappa=kappa, asph=asph)

    def __getitem__(self, index) -> "Lens":
        if isinstance(index, int):
            index = slice(index, index + 1)
        st = self.structure[index]
        w = st.pad_to
        pick = lambda a: None if a is None else a[index, :w]
        return Lens(st, self.c[index, :w], self.t[index, :w], self.nd[index, :w],
                    self.v[index, :w], kappa=pick(self.kappa), asph=pick(self.asph))

    # -- flat views ----------------------------------------------------------

    @property
    def flat_c(self):
        return mask_gather(self.structure.mask, self.c)

    @property
    def flat_t(self):
        return mask_gather(self.structure.mask, self.t)

    @property
    def flat_nd(self):
        return mask_gather(self.structure.mask_G, self.nd)

    @property
    def flat_v(self):
        return mask_gather(self.structure.mask_G, self.v)

    @property
    def flat_c_but_last(self):
        """All valid curvatures except the last one of each system
        (reference `lens_modeling.py:326-329`)."""
        m = self.structure.mask.copy()
        m[np.arange(len(self)), self.structure.n_surfaces - 1] = False
        return mask_gather(m, self.c)

    def with_flat_c(self, c) -> "Lens":
        return self.replace(c=mask_scatter(self.structure.mask, jnp.asarray(c), 0.0))

    def with_flat_t(self, t) -> "Lens":
        return self.replace(t=mask_scatter(self.structure.mask, jnp.asarray(t), 0.0))

    def with_flat_nd(self, nd) -> "Lens":
        return self.replace(nd=mask_scatter(self.structure.mask_G, jnp.asarray(nd), 1.0))

    def with_flat_v(self, v) -> "Lens":
        return self.replace(v=mask_scatter(self.structure.mask_G, jnp.asarray(v), 1.0))

    # -- optics --------------------------------------------------------------

    def get_refractive_indices(self, wavelengths) -> jnp.ndarray:
        """n(λ) per surface gap, shape (B, S, W). See glass.refractive_indices."""
        from torchoptics_tpu.models import glass
        return glass.refractive_indices(
            self.nd, self.v, self.structure.mask_G, wavelengths
        )

    def cdf_index_table(self) -> jnp.ndarray:
        """(B, 3, S + 1) refractive-index table at the (C, d, F) lines with
        the air column prepended — the reference's ``compute_n`` surface-table
        form (`ray_tracing.py:273-293`), using the linear-partial-dispersion
        model instead of the Cauchy fit of :meth:`get_refractive_indices`."""
        from torchoptics_tpu.models import glass
        return glass.compute_n(self.flat_nd, self.flat_v,
                               self.structure.mask_G)

    @property
    def efl(self):
        from torchoptics_tpu.ops import abcd
        return abcd.get_first_order(self)[0]

    @property
    def bfl(self):
        from torchoptics_tpu.ops import abcd
        return abcd.get_first_order(self)[1]

    @property
    def entrance_pupil_position(self):
        from torchoptics_tpu.ops import abcd
        return abcd.compute_pupil_position(self)

    # -- pytree --------------------------------------------------------------

    def tree_flatten(self):
        return (self.c, self.t, self.nd, self.v, self.kappa, self.asph), self.structure

    @classmethod
    def tree_unflatten(cls, structure, leaves):
        obj = object.__new__(cls)
        obj.structure = structure
        obj.c, obj.t, obj.nd, obj.v, obj.kappa, obj.asph = leaves
        return obj
