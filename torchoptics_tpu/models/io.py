"""Lens prescription I/O: the reference's YAML schema, load and save.

The reference only reads prescriptions (`optics_simulator_lite.py:64-71`,
schema documented in SURVEY §2.7); this adds the symmetric writer so
optimized designs round-trip.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np
import yaml

from torchoptics_tpu.models.structure import Lens, Specs, Structure
from torchoptics_tpu.models import zoo


def load_prescription(path_or_dict) -> dict:
    """Load a lens prescription from a YAML file path or pass a dict through
    (the reference accepts both — `optics_simulator_lite.py:64-71`)."""
    if isinstance(path_or_dict, dict):
        return path_or_dict
    with open(path_or_dict, "r") as f:
        return yaml.safe_load(f)


def load_lens(path_or_dict, dtype=jnp.float32) -> Tuple[Specs, Lens]:
    """Load a YAML prescription and build (Specs, Lens)."""
    return zoo.build(load_prescription(path_or_dict), dtype=dtype)


def prescription_from_lens(specs: Specs, lens: Lens,
                           f_number: float = None) -> dict:
    """Serialize a (Specs, Lens) pair back to the YAML schema."""
    st = lens.structure
    out = {
        "stop_idx": [int(i) for i in st.stop_idx],
        "sequence": list(st.sequence),
        "hfov": [float(v) for v in np.rad2deg(np.asarray(specs.hfov))],
        "epd": [float(v) for v in np.asarray(specs.epd)],
        "c": [float(v) for v in np.asarray(lens.flat_c)],
        "t": [float(v) for v in np.asarray(lens.flat_t)],
        "nd": [float(v) for v in np.asarray(lens.flat_nd)],
        "v": [float(v) for v in np.asarray(lens.flat_v)],
    }
    if f_number is not None:
        out["f_number"] = [float(f_number)]
    if lens.kappa is not None:
        out["kappa"] = [float(v) for v in np.asarray(
            lens.kappa)[st.mask]]
    if lens.asph is not None:
        out["asph"] = np.asarray(lens.asph).tolist()
    return out


def save_lens(path: str, specs: Specs, lens: Lens, **kw) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(prescription_from_lens(specs, lens, **kw), f,
                       sort_keys=False)
