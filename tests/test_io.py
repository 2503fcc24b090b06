"""YAML prescription I/O, glass catalog, wavelength utils."""

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from torchoptics_tpu import zoo
from torchoptics_tpu.models import glass, io
from torchoptics_tpu.utils.wavelength import wavelength_to_rgb


def test_yaml_roundtrip(tmp_path):
    specs, lens = zoo.build("cooke")
    path = str(tmp_path / "lens.yml")
    io.save_lens(path, specs, lens, f_number=2.0)
    specs2, lens2 = io.load_lens(path)
    np.testing.assert_allclose(np.asarray(lens2.c), np.asarray(lens.c),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(specs2.epd), np.asarray(specs.epd),
                               rtol=1e-5)
    assert lens2.structure.sequence == lens.structure.sequence


def test_load_reference_schema_yaml(tmp_path):
    """A YAML in the reference's exact schema (f_number, no epd) loads."""
    doc = {
        "stop_idx": [0], "sequence": ["AGA"], "hfov": [25.0],
        "f_number": [2.0],
        "c": [0.0, 0.0187, -0.0462],
        "t": [6.715, 3.0, 15.02],
        "nd": [1.9165], "v": [31.6],
    }
    path = tmp_path / "ref.yml"
    path.write_text(yaml.safe_dump(doc))
    specs, lens = io.load_lens(str(path))
    # epd derived as efl / f_number
    np.testing.assert_allclose(float(specs.epd[0]),
                               float(lens.efl[0]) / 2.0, rtol=1e-5)


def test_load_reference_fixture_files():
    """The actual reference YAML fixtures load unmodified (schema parity)."""
    import os
    base = "/root/reference/torchlens/data"
    if not os.path.isdir(base):
        pytest.skip("reference data unavailable")
    for name in ("singlet_lens.yml", "baseline_doublet.yml",
                  "baseline_cooke.yml", "baseline_tessar.yml"):
        specs, lens = io.load_lens(os.path.join(base, name))
        assert np.isfinite(float(lens.efl[0]))


def test_builtin_catalog():
    g = glass.default_catalog_g()
    assert g.shape == (65, 2)
    # round-trips through the whitening map to physical glass space
    n, v = glass.n_v_from_g(g)
    assert (np.asarray(n) > 1.4).all() and (np.asarray(n) < 2.1).all()
    assert (np.asarray(v) > 15).all() and (np.asarray(v) < 100).all()


def test_load_catalog_csv(tmp_path):
    path = tmp_path / "glasses.csv"
    path.write_text("1.5168,64.17\n1.62004,36.37\n")
    g = glass.load_catalog(str(path))
    assert g.shape == (2, 2)
    n, v = glass.n_v_from_g(g)
    np.testing.assert_allclose(np.asarray(n), [1.5168, 1.62004], rtol=1e-4)


def test_wavelength_to_rgb():
    r, g, b = wavelength_to_rgb(650.0)  # red
    assert r > 200 and g < 60 and b < 60
    r, g, b = wavelength_to_rgb(520.0)  # green
    assert g > 200
    r, g, b = wavelength_to_rgb(460.0)  # blue
    assert b > 200
    assert wavelength_to_rgb(200.0) == (128, 128, 128)


def test_resolve_wavelengths():
    assert glass.resolve_wavelengths(("C", "d", "F")) == (656.3, 587.6, 486.1)
    assert glass.resolve_wavelengths((500.0, "d")) == (500.0, 587.6)


def test_spot_plot_smoke(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from torchoptics_tpu.utils.plotting import show_trace_result
    from torchoptics_tpu import trace
    specs, lens = zoo.build("singlet")
    cfg = trace.TraceConfig(mode="circular", n_rays=(3, 3),
                            rel_fields=(0.0, 1.0),
                            wavelengths=(486.1, 587.6, 656.3))
    res = trace.trace_rays(specs, lens, cfg)
    fig = show_trace_result(res.x, res.y, res.ray_ok, 0.123,
                            (486.1, 587.6, 656.3), show=False)
    fig.savefig(tmp_path / "spot.png")
