"""Training-loss bridge for neural lens-design generators.

Redesign of the reference's `optical_loss.py`: decodes generated design
vectors (glass ``g`` pairs, curvatures, thicknesses), enforces EFL == 1 via
the algebraic last-curvature solve, builds a lens, and evaluates the
unsupervised optical loss Lu = rms + rate·ΣQ. Where the reference loops over
the batch in Python (`optical_loss.py:99-122`), this build evaluates the
whole batch with ``jax.vmap`` in one XLA program.

The reference imports its sequence encoder/decoder from a missing external
package (`optical_loss.py:9` — `preprocessing.process_dataframe`); the
scheme is recovered from its arithmetic (`optical_loss.py:14-18`): G→'1',
A→'0', the digit string read as an integer. Note the int form drops leading
'A's ("AGA" → 10 → "GA"); encoded values are only well-defined for sequences
starting with 'G', which holds for all generator lens types (GA/GGA/GAGA).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.models import glass as glass_mod
from torchoptics_tpu.models.structure import Lens, Specs, Structure
from torchoptics_tpu.ops import abcd as abcd_mod
from torchoptics_tpu import simulator as sim_mod


def sequence_encoder(sequence: str) -> int:
    """'GAGA' -> 1010 (reference scheme, see module docstring)."""
    if not sequence or sequence[0] != "G":
        raise ValueError(
            f"encoded sequences must start with 'G' (got {sequence!r}); the "
            "integer encoding cannot represent a leading 'A'")
    return int("".join("1" if ch == "G" else "0" for ch in sequence))


def sequence_decoder(encoded: int) -> str:
    """1010 -> 'GAGA'."""
    return "".join("G" if d == "1" else "A" for d in str(int(encoded)))


def t_converter(stop_idx: int, sequence: str, t: jnp.ndarray,
                as_t: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Splice the aperture-stop value into a parameter vector when the stop
    sits on an 'A' gap whose slot the generator does not emit
    (reference `optical_loss.py:125-133`). ``as_t`` of -1 (or None) means
    the design has no separate stop variable."""
    if as_t is None:
        return t
    as_t = jnp.atleast_1d(jnp.asarray(as_t))
    if sequence[stop_idx - 1] == "A":
        return jnp.concatenate((t[: stop_idx - 1], as_t, t[stop_idx - 1:]))
    return t


@dataclass(frozen=True)
class OpticalLoss:
    """Optical loss for a neural lens-design generator
    (reference ``Optical_Loss``, `optical_loss.py:11-122`).

    Instantiate once per lens type; the per-sample evaluation is a pure
    function that is vmapped over the batch.
    """

    lens_type: str
    penalty_rate: float = 0.2
    n_sampled_fields: int = 8     # reference `optical_loss.py:81`
    n_pupil_rings: int = 8        # reference `optical_loss.py:82`
    wavelengths: Tuple[float, ...] = (459.0, 520.0, 640.0)
    pupil_sampling: str = "circular"
    n_ray_aiming_iter: int = 1
    # Spot metric the generator trains against: 'y' is the reference's
    # Y-deviation-only `compute_rms2d` (parity default); 'xy' is the radial
    # 2-D superset that also sees sagittal blur — training on 'y' lets
    # generated designs hide 10-30x of sagittal spot size (RESULTS.md
    # round-4 report card), so real training runs should use 'xy'.
    spot_metric: str = "y"

    @property
    def code_lenstype(self) -> int:
        return sequence_encoder(self.lens_type)

    @property
    def numsurf(self) -> int:
        return len(self.lens_type)

    @property
    def numglass(self) -> int:
        return sum(1 for ch in self.lens_type if ch == "G")

    @property
    def numin(self) -> int:
        return 2 + 2 * self.numsurf

    @property
    def numout(self) -> int:
        return 2 * self.numglass + 2 * self.numsurf - 1

    def _sim_config(self) -> sim_mod.SimulatorConfig:
        return sim_mod.SimulatorConfig(
            wavelengths=self.wavelengths,
            penalty_rate=self.penalty_rate,
            n_pupil_rings=self.n_pupil_rings,
            n_ray_aiming_iter=self.n_ray_aiming_iter,
            pupil_sampling=self.pupil_sampling,
            n_sampled_fields=self.n_sampled_fields,
            spot_metric=self.spot_metric,
        )

    def unsupervised_single(self, inputs: jnp.ndarray, outputs: jnp.ndarray,
                            stop_idx: int, sequence: Optional[str] = None,
                            has_stop_vars: bool = False
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Loss for one (input, output) pair
        (reference `optical_loss.py:20-96`; slot layouts documented there).

        ``stop_idx``/``sequence`` are static (they fix the compiled program's
        structure); in the reference they ride inside the input tensor —
        callers should pull them out host-side (see ``unsupervised``).

        Returns (loss_unsup, rms, penalty).
        """
        sequence = sequence or self.lens_type
        G, S = self.numglass, self.numsurf

        epd = inputs[0:1]
        hfov = inputs[1]
        t = outputs[G * 2 + S - 1: self.numout]

        g = outputs[: 2 * G].reshape(G, 2)
        n, v = glass_mod.n_v_from_g(g)

        as_c = inputs[-2] if has_stop_vars else None
        as_t = inputs[-1] if has_stop_vars else None

        # Splice stop-slot variables first so every downstream consumer sees
        # full-length vectors. (The reference solves the last curvature with
        # the *pre-splice* thickness vector — `optical_loss.py:65-69` — which
        # is shape-inconsistent whenever a splice actually occurs; fixed
        # here, identical when no splice happens.)
        c_wo_last = outputs[G * 2: G * 2 + S - 1]
        full_sequence = sequence
        if has_stop_vars and sequence[stop_idx - 1] == "A":
            t = t_converter(stop_idx, sequence, t, as_t)
            c_wo_last = t_converter(stop_idx, sequence, c_wo_last, as_c)
            full_sequence = (sequence[: stop_idx - 1] + "A"
                             + sequence[stop_idx - 1:])

        structure = Structure((int(stop_idx),), (full_sequence,))
        c = abcd_mod.compute_last_curvature(structure, c_wo_last, t, n)

        lens = Lens(structure, c, t, n, v)
        hfov_full = jnp.reshape(hfov, (1,))
        specs = Specs(structure, epd, hfov_full)

        config = self._sim_config()
        cfg = config.trace_config()
        from torchoptics_tpu.ops import trace as trace_mod
        res = trace_mod.trace_rays(specs, lens, cfg,
                                   aggregate=trace_mod.AGG_TORCH)
        loss_dict = sim_mod.compute_loss_out(res, len(full_sequence),
                                             self.penalty_rate,
                                             spot_metric=self.spot_metric)
        return loss_dict["loss_unsup"], loss_dict["rms"], loss_dict["penalty"]

    def build_batch(self, inputs: jnp.ndarray, outputs: jnp.ndarray,
                    stop_idx: int, has_stop_vars: bool = False):
        """Decode a whole batch of generator design vectors into one batched
        (Specs, Lens) pair (shared Structure, EFL == 1 enforced per system).
        """
        sequence = self.lens_type
        G, S = self.numglass, self.numsurf

        def decode(inp, out):
            epd = inp[0]
            hfov = inp[1]
            t = out[G * 2 + S - 1: self.numout]
            g = out[: 2 * G].reshape(G, 2)
            n, v = glass_mod.n_v_from_g(g)
            c_wo_last = out[G * 2: G * 2 + S - 1]
            if has_stop_vars and sequence[stop_idx - 1] == "A":
                t = t_converter(stop_idx, sequence, t, inp[-1])
                c_wo_last = t_converter(stop_idx, sequence, c_wo_last,
                                        inp[-2])
            return epd, hfov, c_wo_last, t, n, v

        epd, hfov, c_wo_last, t, n, v = jax.vmap(decode)(inputs, outputs)
        full_sequence = sequence
        if has_stop_vars and sequence[stop_idx - 1] == "A":
            full_sequence = (sequence[: stop_idx - 1] + "A"
                             + sequence[stop_idx - 1:])
        B = inputs.shape[0]
        structure = Structure((int(stop_idx),) * B, (full_sequence,) * B)
        c = abcd_mod.compute_last_curvature(
            structure, c_wo_last.reshape(-1), t.reshape(-1), n.reshape(-1))
        lens = Lens(structure, c, t.reshape(-1), n.reshape(-1), v.reshape(-1))
        specs = Specs(structure, epd, hfov)
        return specs, lens

    def unsupervised(self, inputs: jnp.ndarray, outputs: jnp.ndarray,
                     stop_idx: Optional[int] = None,
                     has_stop_vars: bool = False,
                     engine: str = "xla",
                     mesh=None,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Mean unsupervised loss over a batch
        (reference `optical_loss.py:99-122`) — vmapped, not a Python loop.

        ``stop_idx`` defaults to the value in the first sample's input slot
        (all samples of one lens type share it; it is static under jit).
        ``engine='pallas'`` evaluates the whole population in one fused TPU
        kernel launch (ops.pallas_batch); with a ``jax.sharding.Mesh`` in
        ``mesh`` the launch shards over the ('lens', 'rays') axes —
        one fused kernel per device, psum'd reductions
        (parallel.shard.sharded_fused_losses) — for multi-chip generator
        training.
        """
        if stop_idx is None:
            if isinstance(inputs, jax.core.Tracer):
                raise ValueError(
                    "OpticalLoss.unsupervised was called under "
                    "jit/vmap/grad without an explicit stop_idx. The "
                    "aperture-stop index fixes the compiled program's "
                    "structure, so it cannot be read out of a traced input "
                    "tensor (the reference keeps it in input slot -3, "
                    "`optical_loss.py:63`); pass stop_idx=<python int> "
                    "from the host instead.")
            stop_idx = int(np.asarray(inputs[0, -3]))
        if engine == "pallas":
            from torchoptics_tpu.ops import pallas_batch
            specs, lens = self.build_batch(inputs, outputs, stop_idx,
                                           has_stop_vars)
            if mesh is not None:
                from torchoptics_tpu.parallel import shard as shard_mod
                mean_lu, ld = shard_mod.sharded_fused_losses(
                    specs, lens, self._sim_config(), mesh, full=False)
                return mean_lu, ld["rms"], ld["penalty"]
            mean_lu, ld = pallas_batch.batched_unsupervised_loss(
                specs, lens, self._sim_config())
            return (mean_lu, jnp.mean(ld["rms"]), jnp.mean(ld["penalty"]))
        single = partial(self.unsupervised_single, stop_idx=stop_idx,
                         has_stop_vars=has_stop_vars)
        loss, rms, penalty = jax.vmap(single)(inputs, outputs)
        return jnp.mean(loss), jnp.mean(rms), jnp.mean(penalty)

    def supervised(self, inputs: jnp.ndarray, outputs: jnp.ndarray
                   ) -> jnp.ndarray:
        """Per-block MSE between generated and reference design vectors
        (reference `optical_loss.py:136-176`)."""
        S, G = self.numsurf, self.numglass
        g1 = list(range(0, 2 * G, 2))
        g2 = list(range(1, 2 * G + 1, 2))
        c_st = G * 2
        t_st = G * 2 + S - 1

        dev_g1 = outputs[:, g1] - inputs[:, g1]
        dev_g2 = outputs[:, g2] - inputs[:, g2]
        dev_c = outputs[:, c_st: c_st + S - 1] - inputs[:, c_st: c_st + S - 1]
        dev_t = outputs[:, t_st: t_st + S] - inputs[:, t_st: t_st + S]

        sum_sq = (jnp.sum(dev_g1 ** 2, 1) + jnp.sum(dev_g2 ** 2, 1)
                  + jnp.sum(dev_c ** 2, 1) + jnp.sum(dev_t ** 2, 1))
        mses = sum_sq / (2 * G + 2 * S - 1)
        return jnp.mean(mses)
