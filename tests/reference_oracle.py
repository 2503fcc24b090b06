"""Load the upstream PyTorch reference as a numerical oracle for parity tests.

The reference at /root/reference is treated as a black-box executable
specification: we import and *run* it (never copy it) to cross-check our
numerics. Its ``ray_tracing_lite`` module imports shapely (unavailable here)
only for a dead code path, so a minimal stub is installed first.
"""

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def load_reference():
    """Return (ray_tracing_lite, lens_modeling) reference modules or None if
    the reference tree is unavailable."""
    if not (REFERENCE_ROOT / "torchlens").exists():
        return None

    if "shapely" not in sys.modules:
        shapely = types.ModuleType("shapely")
        geometry = types.ModuleType("shapely.geometry")

        class Polygon:  # pragma: no cover - dead reference code path
            def __init__(self, *a, **k):
                raise NotImplementedError

        geometry.Polygon = Polygon
        shapely.geometry = geometry
        sys.modules["shapely"] = shapely
        sys.modules["shapely.geometry"] = geometry

    if "torchlens" not in sys.modules:
        pkg = types.ModuleType("torchlens")
        pkg.__path__ = [str(REFERENCE_ROOT / "torchlens")]
        sys.modules["torchlens"] = pkg

    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        import torchlens.ray_tracing_lite as rt_ref
        import torchlens.lens_modeling as lm_ref
    finally:
        sys.path.pop(0)
    return rt_ref, lm_ref


def build_reference_lens(prescription, lm_ref):
    """Build reference Structure/Specs/Lens (torch, CPU) from a zoo dict."""
    import numpy as np
    import torch

    st = lm_ref.Structure(
        stop_idx=np.asarray(prescription["stop_idx"]),
        sequence=np.asarray(prescription["sequence"]),
        default_device="cpu",
    )
    lens = lm_ref.Lens(
        st,
        torch.tensor(prescription["c"], dtype=torch.float32),
        torch.tensor(prescription["t"], dtype=torch.float32),
        torch.tensor(prescription["nd"], dtype=torch.float32),
        torch.tensor(prescription["v"], dtype=torch.float32),
    )
    import torchlens.ray_tracing_lite as rt_ref
    efl, _ = rt_ref.get_first_order(lens)
    hfov = torch.deg2rad(torch.tensor(prescription["hfov"], dtype=torch.float32))
    epd = efl / torch.tensor(prescription["f_number"], dtype=torch.float32)
    specs = lm_ref.Specs(st, epd, hfov)
    return st, specs, lens
