"""Coverage of the five BASELINE.json evaluation configs, end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import imaging, metrics, optimize, trace, zoo
from torchoptics_tpu import simulator as sim
from torchoptics_tpu.models.structure import Lens, Specs, Structure


def test_config1_singlet_onaxis_fan_spot_rms():
    """Singlet spherical lens: on-axis ray-fan trace + spot RMS."""
    specs, lens = zoo.build("singlet")
    cfg = trace.TraceConfig(mode="meridional_uniform", n_rays=(33,),
                            rel_fields=(0.0,), wavelengths=("d",))
    res = trace.trace_rays(specs, lens, cfg)
    assert bool(res.ray_ok.all())
    rms = float(metrics.compute_rms2d(res.x, res.y, res.ray_ok)[0])
    # an f/2 singlet has severe spherical aberration: ~0.12 mm RMS on axis
    assert 0 < rms < 0.5

    g = jax.grad(lambda c: metrics.compute_rms2d(
        *trace.trace_rays(specs, lens.replace(c=c), cfg)[:2],
        trace.trace_rays(specs, lens.replace(c=c), cfg).ray_ok)[0])(lens.c)
    assert np.isfinite(np.asarray(g)).all()


def test_config2_cooke_aspheres_3wav_3fields():
    """Cooke triplet with even-aspheric surfaces: 3 wavelengths x 3 fields."""
    p = zoo.get_prescription("cooke")
    st = Structure(tuple(p["stop_idx"]), tuple(p["sequence"]))
    kappa = np.zeros((1, 7), np.float32)
    asph = np.zeros((1, 7, 2), np.float32)
    kappa[0, 0] = -0.8
    asph[0, 0, 0] = 2e-5
    lens = Lens(st, jnp.asarray(p["c"]), jnp.asarray(p["t"]),
                jnp.asarray(p["nd"]), jnp.asarray(p["v"]),
                kappa=jnp.asarray(kappa), asph=jnp.asarray(asph))
    specs, _ = zoo.build("cooke")
    cfg = trace.TraceConfig(mode="circular", n_rays=(6, 6),
                            rel_fields=(0.0, 0.707, 1.0),
                            wavelengths=("d", "F", "C"))
    res = trace.trace_rays(specs, lens, cfg)
    assert float(res.ray_ok.mean()) > 0.9
    rms = metrics.compute_rms2d(res.x, res.y, res.ray_ok)
    assert np.isfinite(float(rms[0]))


def test_config3_double_gauss_dense_grid_spot_distortion_grads():
    """Double-Gauss: dense pupil-grid trace + spot/distortion gradients."""
    specs, lens = zoo.build("double_gauss")
    cfg = trace.TraceConfig(mode="circular", n_rays=(12, 12),
                            rel_fields=(0.0, 0.5, 1.0),
                            wavelengths=(459.0, 520.0, 640.0),
                            n_ray_aiming_iter=1)
    res = trace.trace_rays(specs, lens, cfg)
    assert float(res.ray_ok.mean()) == 1.0

    def loss(c, t):
        l = lens.replace(c=c, t=t)
        r = trace.trace_rays(specs, l, cfg)
        spot = metrics.compute_rms2d(r.x, r.y, r.ray_ok)[0]
        dist = metrics.compute_distortion(specs, l, [0.7, 1.0])
        return spot + 0.1 * jnp.sum(dist ** 2)

    g = jax.grad(loss, argnums=(0, 1))(lens.c, lens.t)
    for arr in g:
        arr = np.asarray(arr)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() > 0


def test_config4_adam_on_c_t_asphere():
    """Lens optimization: Adam on curvatures/thicknesses/asphere coeffs."""
    specs, lens0 = zoo.build("cooke")
    lens = lens0.replace(kappa=jnp.zeros_like(lens0.c),
                         asph=jnp.zeros(lens0.c.shape + (2,)))
    cfg = sim.SimulatorConfig(n_sampled_fields=3, n_pupil_rings=4,
                              pupil_sampling="circular", n_ray_aiming_iter=1)
    o = optimize.LensOptimizer(specs=specs, config=cfg, learning_rate=3e-4,
                               qc_variables=False, add_bfl=False,
                               trainable=("c", "t", "kappa", "asph"),
                               efl_target=float(lens0.efl[0]))
    state = o.init(lens.replace(c=lens.c * 1.05))
    assert "asph" in state.params and "kappa" in state.params
    loss0 = float(o.loss(state.params)[0])
    for _ in range(15):
        state, total, _ = o.step(state)
    assert float(total) < loss0
    # asphere coefficients actually moved
    assert np.abs(np.asarray(state.params["asph"])).max() > 0


def test_config5_population_image_simulation():
    """Batched lens-population image simulation: PSF render + sensor
    convolution, vmapped over a perturbed population of one design."""
    specs, lens = zoo.build("cooke")
    cfg = sim.SimulatorConfig(
        n_sampled_fields=3, n_pupil_rings=4, pupil_sampling="circular",
        n_ray_aiming_iter=0, psf_shape=(9, 9), psf_abs_pixel_size=1.5e-2,
        psf_grid_shape=(2, 2), apply_distortion=False,
        apply_relative_illumination=False)
    rng = np.random.default_rng(0)
    radiance = jnp.asarray(rng.uniform(0, 255, (1, 24, 24, 3))
                           .astype(np.float32))
    field_lim = imaging.sample_field_lim(24, 24)

    deltas = jnp.asarray([1.0, 1.01, 0.99])[:, None, None]

    def render_one(scale):
        l = lens.replace(c=lens.c * scale[0])
        irr, psnr, _ = imaging.simulate(specs, l, radiance, cfg,
                                        field_lim=field_lim)
        return irr, psnr

    irr, psnr = jax.vmap(render_one)(deltas)
    assert irr.shape == (3, 1, 24, 24, 3)
    assert np.isfinite(np.asarray(irr)).all()
    # different lenses -> different renders
    assert not np.allclose(np.asarray(irr[0]), np.asarray(irr[1]))
