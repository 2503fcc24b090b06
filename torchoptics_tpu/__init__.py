"""torchoptics_tpu — a TPU-native differentiable ray-tracing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
OceanT-shirt/TorchOptics ("torchlens"): batched differentiable sequential
ray tracing for compound-lens design, paraxial optics, optical losses and
penalties, PSF/image formation, and gradient-based lens optimization —
designed for TPU hardware (fused elementwise trace kernels, SPMD sharding of
the ray block over device meshes, explicit PRNG, static shapes).

Quick start::

    import jax
    from torchoptics_tpu import zoo, trace, metrics

    specs, lens = zoo.build("cooke")
    cfg = trace.TraceConfig(mode="circular", n_rays=(8, 8),
                            rel_fields=(0.0, 0.707, 1.0),
                            wavelengths=("C", "d", "F"),
                            n_ray_aiming_iter=1)
    res = trace.trace_rays(specs, lens, cfg)
    rms = metrics.compute_rms2d(res.x, res.y, res.ray_ok)
"""

from torchoptics_tpu.models.structure import (  # noqa: F401
    Lens, Specs, Structure, find_valid_curvatures, mask_gather, mask_scatter)
from torchoptics_tpu.models import glass, io, zoo  # noqa: F401
from torchoptics_tpu.ops import (  # noqa: F401
    abcd, aiming, image, metrics, psf, pupil, surfaces, trace, wavefront)
from torchoptics_tpu.ops.trace import TraceConfig, TraceResult, trace_rays  # noqa: F401
from torchoptics_tpu import analysis, imaging, loss, optimize, simulator  # noqa: F401
from torchoptics_tpu.simulator import RaytracedOptics, SimulatorConfig  # noqa: F401

__version__ = "0.1.0"
