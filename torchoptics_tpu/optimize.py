"""Gradient-based lens optimization (optax).

Re-creates the reference's *intended* optimizer-variable plumbing, which was
half-ported and disabled there (`lens_modeling.py:56-148`, commented), as
working JAX:

* :func:`get_normalized_lens_variables` — lens → trainable params
  ``{'c', 't', 'g'}`` (curvatures minus solved/invalid slots, thicknesses,
  whitened glass), scaled to EFL == 1.
* :func:`lens_from_normalized` — params → Lens, with quantized-continuous
  glass (straight-through), analytic last-curvature solve, optional BFL
  re-addition.
* :func:`make_optimizer` — a jitted Adam step whose forward+backward is one
  fused XLA program; the entire optimization loop runs without host sync.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchoptics_tpu.models import glass as glass_mod
from torchoptics_tpu.models.structure import (
    Lens, Specs, Structure, find_valid_curvatures, mask_scatter)
from torchoptics_tpu.ops import abcd as abcd_mod
from torchoptics_tpu import simulator as sim_mod


def get_normalized_lens_variables(lens: Lens, add_bfl: bool = False,
                                  scale_factor: float = 1.0
                                  ) -> Dict[str, jnp.ndarray]:
    """Extract trainable variables from a lens
    (reference `lens_modeling.py:56-98`, commented TF-era code).

    The lens is first scaled so EFL == 1 (the working scale for the
    last-curvature solve); glass goes to whitened ``g`` space; optionally the
    BFL is subtracted from the last thickness so the trainable value is the
    defocus. Conic/asphere coefficients (TPU-build superset) are included
    when the lens carries them."""
    efl = lens.efl
    lens = lens.scale(1.0 / efl)

    g = glass_mod.g_from_n_v(lens.flat_nd, lens.flat_v) * scale_factor

    t2d = lens.t
    if add_bfl:
        rows = np.arange(len(lens))
        last = lens.structure.n_surfaces - 1
        bfl = lens.bfl
        t2d = t2d.at[rows, last].add(-bfl)
    t = t2d[lens.structure.mask] * scale_factor

    valid = find_valid_curvatures(lens.structure)
    c = lens.c[valid] * scale_factor
    params = {"c": c, "t": t, "g": g}
    if lens.kappa is not None:
        params["kappa"] = lens.kappa * scale_factor
    if lens.asph is not None:
        params["asph"] = lens.asph * scale_factor
    return params


def lens_from_normalized(structure: Structure, params: Dict[str, jnp.ndarray],
                         catalog_g: Optional[jnp.ndarray] = None,
                         add_bfl: bool = False, scale_factor: float = 1.0,
                         qc_variables: bool = True) -> Lens:
    """Rebuild a Lens from normalized variables
    (reference `lens_modeling.py:107-148`, commented).

    The last curvature is solved analytically so EFL == 1; glass variables
    snap to the nearest catalog glass with a straight-through gradient when
    ``qc_variables``.
    """
    c = params["c"] / scale_factor
    t = params["t"] / scale_factor
    g = params["g"] / scale_factor

    if qc_variables and catalog_g is not None:
        g = glass_mod.quantize_glass_st(g, catalog_g)

    nd, v = glass_mod.n_v_from_g(g)

    # Scatter optimized curvatures into their slots; remaining (air-air and
    # last) slots stay 0 and the last is solved below.
    c2d = mask_scatter(find_valid_curvatures(structure), c, 0.0)
    rows = np.arange(len(structure))
    c_mask = structure.mask.copy()
    c_mask[rows, structure.n_surfaces - 1] = False
    flat_c_but_last = c2d[c_mask]
    flat_c = abcd_mod.compute_last_curvature(structure, flat_c_but_last, t, nd)

    kappa = params.get("kappa")
    asph = params.get("asph")
    lens = Lens(structure, flat_c, t, nd, v,
                kappa=None if kappa is None else kappa / scale_factor,
                asph=None if asph is None else asph / scale_factor)
    if add_bfl:
        last = structure.n_surfaces - 1
        bfl = lens.bfl
        new_t = lens.t.at[rows, last].add(bfl)
        lens = lens.replace(t=new_t)
    return lens


class OptState(NamedTuple):
    params: Dict[str, jnp.ndarray]
    opt_state: optax.OptState
    step: jnp.ndarray


@dataclass
class LensOptimizer:
    """Adam-based lens designer: optimizes (c, t, g) against the
    unsupervised optical loss + penalties (BASELINE.json config 4).

    All state is explicit; ``step`` is jitted once per structure.
    """

    specs: Specs
    config: sim_mod.SimulatorConfig
    learning_rate: float = 1e-3
    add_bfl: bool = True
    scale_factor: float = 1.0
    qc_variables: bool = True
    use_full_loss: bool = False  # include ray_path/ray_angle/glass penalties
    trainable: Tuple[str, ...] = ("c", "t", "g")
    catalog_g: Optional[jnp.ndarray] = None
    efl_target: Optional[float] = None
    # Optional objective override with the compute_losses signature
    # (specs, lens, config, g, catalog_g, key) -> (total, loss_dict);
    # used by parallel.shard.make_sharded_train_step to route the loss
    # through the shard_map-wrapped fused Pallas kernels.
    loss_fn: Optional[Callable] = None

    def __post_init__(self):
        if self.catalog_g is None and self.qc_variables:
            self.catalog_g = glass_mod.default_catalog_g()
        self.optimizer = optax.adam(self.learning_rate)
        self._step = jax.jit(self._step_impl)

    # -- functional pieces ---------------------------------------------------

    def init(self, lens: Lens) -> OptState:
        params = get_normalized_lens_variables(lens, self.add_bfl,
                                               self.scale_factor)
        return OptState(params, self.optimizer.init(params), jnp.asarray(0))

    def build_lens(self, params: Dict[str, jnp.ndarray]) -> Lens:
        lens = lens_from_normalized(
            self.specs.structure, params, self.catalog_g, self.add_bfl,
            self.scale_factor, self.qc_variables)
        if self.efl_target is not None:
            lens = lens.scale(self.efl_target / lens.efl)
        return lens

    def loss(self, params: Dict[str, jnp.ndarray],
             key: Optional[jax.Array] = None
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        lens = self.build_lens(params)
        specs = self.specs
        if self.loss_fn is not None:
            return self.loss_fn(specs, lens, self.config,
                                params["g"] / self.scale_factor,
                                self.catalog_g, key)
        if self.use_full_loss:
            total, loss_dict = sim_mod.compute_losses(
                specs, lens, self.config, g=params["g"] / self.scale_factor,
                catalog_g=self.catalog_g, key=key)
        else:
            _, loss_dict = sim_mod.do_ray_tracing(specs, lens, self.config,
                                                  key=key)
            total = loss_dict["loss_unsup"]
        return total, loss_dict

    def _step_impl(self, state: OptState, key: Optional[jax.Array]):
        (total, loss_dict), grads = jax.value_and_grad(
            self.loss, has_aux=True)(state.params, key)
        # Freeze non-trainable variable groups.
        grads = {k: (g if k in self.trainable else jnp.zeros_like(g))
                 for k, g in grads.items()}
        # Reject non-finite steps: a diverging iterate (e.g. glass variables
        # pushing the last-curvature solve through a pole) must not poison
        # the parameters — keep the previous state instead.
        finite = jnp.isfinite(total)
        for g in jax.tree_util.tree_leaves(grads):
            finite = finite & jnp.all(jnp.isfinite(g))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.params)
        params = optax.apply_updates(state.params, updates)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(finite, a, b), new, old)
        params = keep(params, state.params)
        opt_state = keep(opt_state, state.opt_state)
        return OptState(params, opt_state, state.step + 1), total, loss_dict

    def step(self, state: OptState, key: Optional[jax.Array] = None):
        return self._step(state, key)

    def run(self, lens: Lens, n_steps: int,
            key: Optional[jax.Array] = None, log_every: int = 0):
        """Optimize for ``n_steps``; returns (final lens, final state,
        loss history)."""
        state = self.init(lens)
        history = []
        for i in range(n_steps):
            k = None
            if key is not None:
                key, k = jax.random.split(key)
            state, total, loss_dict = self.step(state, k)
            if log_every and i % log_every == 0:
                history.append({k_: float(v) for k_, v in loss_dict.items()})
        return self.build_lens(state.params), state, history
