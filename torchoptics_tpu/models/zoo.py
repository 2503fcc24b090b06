"""Built-in lens prescriptions.

The four fixtures the reference ships as YAML (`torchlens/data/*.yml` —
singlet, doublet, Cooke triplet, Tessar; all hfov 25 deg, f/2) plus the
6-element double-Gauss benchmark scene required by BASELINE.json. Each
prescription is a plain dict in the reference's YAML schema
(`optics_simulator_lite.py:64-71`):

    stop_idx: [int]      index of the aperture-stop surface
    sequence: [str]      G/A gap string, one char per surface
    hfov:     [deg]      half field of view
    f_number: [float]
    c, t:     per-surface curvature / thickness
    nd, v:    per-glass d-line index / Abbe number
"""

from __future__ import annotations

import copy
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.models.structure import Lens, Specs, Structure

# fmt: off
SINGLET = {
    "stop_idx": [0], "sequence": ["AGA"], "hfov": [25.0], "f_number": [2.0],
    "c": [0.0, 0.01867167465388775, -0.04616425931453705],
    "t": [6.715000152587891, 3.0007503032684326, 15.0230131149292],
    "nd": [1.916499376296997],
    "v": [31.60358428955078],
}

DOUBLET = {
    "stop_idx": [2], "sequence": ["GAAGA"], "hfov": [25.0], "f_number": [2.0],
    "c": [0.059835370630025864, 0.04363778978586197, 0.0,
          0.022557824850082397, -0.0437268428504467],
    "t": [1.6105520725250244, 5.601459980010986, 6.902040481567383,
          2.890363931655884, 12.037284851074219],
    "nd": [1.6778998374938965, 1.8918993473052979],
    "v": [55.3400764465332, 37.133338928222656],
}

COOKE = {
    "stop_idx": [4], "sequence": ["GAGAAGA"], "hfov": [25.0], "f_number": [2.0],
    "c": [0.10994608700275421, 0.014736141078174114, -0.03834565356373787,
          0.11981328576803207, 0.0, 0.03997667506337166, -0.0657755583524704],
    "t": [2.4371840953826904, 0.5665456652641296, 1.0000001192092896,
          0.844669759273529, 1.6025489568710327, 3.0, 13.061942100524902],
    "nd": [1.7638500928878784, 1.6258817911148071, 1.7638500928878784],
    "v": [48.48774719238281, 35.69896697998047, 48.48774719238281],
}

TESSAR = {
    "stop_idx": [4], "sequence": ["GAGAAGGA"], "hfov": [25.0], "f_number": [2.0],
    "c": [0.11917586624622345, 0.03537517040967941, -0.032270871102809906,
          0.13348394632339478, 0.0, 0.057362884283065796,
          -0.14504458010196686, -0.07696522772312164],
    "t": [2.6051883697509766, 0.8061898946762085, 1.000000238418579,
          1.5986409187316895, 0.14155136048793793, 2.999530076980591,
          1.1733624935150146, 12.837242126464844],
    "nd": [1.7638611793518066, 1.6259105205535889, 1.7638611793518066,
           1.9166003465652466],
    "v": [48.4895133972168, 35.70527267456055, 48.4895133972168,
          31.602611541748047],
}

# 6-element double Gauss, EFL 50 mm, f/2, hfov 19 deg: symmetric
# (+)(+-) | stop | (-+)(+) layout with two cemented doublets. Prescription
# designed with this framework's own optimizer (torchoptics_tpu.optimize,
# staged f/4 -> f/2.8 -> f/2 with ray-path thickness constraints) from a
# symmetric starting layout; 100% ray transmission at f/2 over the full
# field; polychromatic RMS spot 0.0134 mm. This is the flagship benchmark scene for BASELINE.json config 3
# ("Double-Gauss 6-element: dense pupil-grid trace").
DOUBLE_GAUSS = {
    "stop_idx": [5], "sequence": ["GAGGAAGGAGA"], "hfov": [19.0],
    "f_number": [2.0],
    "c": [0.008491829968988895, 0.0038041367661207914, 0.015981631353497505, -0.001652966602705419, 0.003033766755834222, 0.0, -0.00505311693996191, 0.03892448917031288, -0.011659904383122921, 0.02384570799767971, -0.005778007209300995],
    "t": [2.5913422107696533, 13.478734016418457, 6.149362087249756, 1.5008875131607056, 4.839343070983887, 15.386726379394531, 9.128893852233887, 15.99984359741211, 6.581823348999023, 11.07535171508789, 18.00004005432129],
    "nd": [1.6778998374938965, 1.6515969038009644, 1.737999439239502, 1.737999439239502, 1.6515969038009644, 1.6778998374938965],
    "v": [55.3400764465332, 58.5494499206543, 32.2607307434082, 32.2607307434082, 58.5494499206543, 55.3400764465332],
}
# fmt: on


# Aspherized variant of the double Gauss: conic constants + two even-asphere
# coefficients (r^4, r^6) on every surface, jointly optimized with c/t by
# this framework (stage 1: kappa/asph only, stage 2: joint). Polychromatic
# RMS spot 0.0016 mm at f/2 (essentially diffraction-limited) over the full 19 deg half field with 100% ray
# transmission — 8x better than the refined spherical parent. Flagship scene for
# the conic/asphere superset (BASELINE north star; see ops/pallas_asphere).
DOUBLE_GAUSS_ASPH = {
    "stop_idx": [5], "sequence": ["GAGGAAGGAGA"], "hfov": [19.0],
    "f_number": [2.0],
    "c": [0.005744007416069508, 0.012626704759895802, 0.008825656026601791, 0.0060381512157619, -0.0008471026667393744, 0.0, -0.009344830177724361, 0.03422092646360397, -0.01667642779648304, 0.01892252080142498, -0.004845264367759228],
    "t": [1.8271242380142212, 15.885034561157227, 15.947441101074219, 15.999481201171875, 15.853718757629395, 7.954293251037598, 1.5007882118225098, 7.528452396392822, 0.3002510964870453, 7.538528919219971, 46.389408111572266],
    "nd": DOUBLE_GAUSS["nd"],
    "v": DOUBLE_GAUSS["v"],
    "kappa": [-0.012389598414301872, 0.11227740347385406, -0.09669111669063568, 0.24021126329898834, 0.1170448511838913, 0.0, -0.11562485992908478, -0.561708390712738, 0.025301020592451096, 0.032018959522247314, -0.1763148158788681],
    "asph": [[-1.1252957676788355e-07, -1.3887146987912047e-10], [5.135593141858408e-07, -1.5476935011360382e-10], [-4.7572115136063076e-07, -4.692634614222868e-10], [2.150914269805071e-06, 6.43086139895388e-10], [8.114111551549286e-07, 2.86700413409946e-10], [5.088942089059856e-06, 2.020010159142771e-09], [6.962954444134084e-07, 4.452641588770234e-10], [-5.153679012437351e-06, -1.3212664295991772e-09], [-7.020096290943911e-07, 3.171261864221009e-10], [-1.5139171694045217e-07, 6.297870558391594e-11], [1.6030745655370993e-06, -3.0899049985322335e-10]],
}

ZOO: Dict[str, dict] = {
    "singlet": SINGLET,
    "doublet": DOUBLET,
    "cooke": COOKE,
    "tessar": TESSAR,
    "double_gauss": DOUBLE_GAUSS,
    "double_gauss_asph": DOUBLE_GAUSS_ASPH,
}


def get_prescription(name: str) -> dict:
    return copy.deepcopy(ZOO[name])


def build(prescription, dtype=jnp.float32) -> Tuple[Specs, Lens]:
    """Construct (Specs, Lens) from a prescription dict (reference schema).

    EPD is derived as EFL / f_number the way the reference's TF-era
    ``initialize`` did (`optics_simulator_lite.py:150-178`, esp. `:167`).
    """
    if isinstance(prescription, str):
        prescription = get_prescription(prescription)
    p = prescription
    structure = Structure(tuple(int(i) for i in p["stop_idx"]),
                          tuple(p["sequence"]))
    asph = None
    if "asph" in p:
        asph = jnp.asarray(p["asph"], dtype=dtype)
        if asph.ndim == 2:  # (S, K) prescription -> single-system batch
            asph = asph[None]
    lens = Lens(structure,
                jnp.asarray(p["c"], dtype=dtype),
                jnp.asarray(p["t"], dtype=dtype),
                jnp.asarray(p["nd"], dtype=dtype),
                jnp.asarray(p["v"], dtype=dtype),
                kappa=None if "kappa" not in p else jnp.asarray(p["kappa"], dtype=dtype),
                asph=asph)
    hfov = jnp.deg2rad(jnp.asarray(p["hfov"], dtype=dtype))
    if "epd" in p:
        epd = jnp.asarray(p["epd"], dtype=dtype)
    else:
        efl = lens.efl
        epd = efl / jnp.asarray(p["f_number"], dtype=dtype)
    specs = Specs(structure, epd, hfov)
    return specs, lens
