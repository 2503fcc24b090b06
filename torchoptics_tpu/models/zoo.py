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
# field. This is the flagship benchmark scene for BASELINE.json config 3
# ("Double-Gauss 6-element: dense pupil-grid trace").
DOUBLE_GAUSS = {
    "stop_idx": [5], "sequence": ["GAGGAAGGAGA"], "hfov": [19.0],
    "f_number": [2.0],
    "c": [0.007098540663719177, 0.005453308112919331, 0.01615321822464466,
          -0.0013351266970857978, 0.002841322449967265, 0.0,
          -0.003427648451179266, 0.035170674324035645, -0.012313609942793846,
          0.018931368365883827, -0.008300425484776497],
    "t": [6.373253345489502, 13.075956344604492, 9.577503204345703,
          1.5088554620742798, 7.554969310760498, 13.997114181518555,
          7.074100494384766, 11.994585990905762, 7.694481372833252,
          7.907110214233398, 22.00676918029785],
    "nd": [1.6778998374938965, 1.6515969038009644, 1.737999439239502,
           1.737999439239502, 1.6515969038009644, 1.6778998374938965],
    "v": [55.3400764465332, 58.5494499206543, 32.2607307434082,
          32.2607307434082, 58.5494499206543, 55.3400764465332],
}
# fmt: on


# Aspherized variant of the double Gauss: conic constants + two even-asphere
# coefficients (r^4, r^6) on every surface, jointly optimized with c/t by
# this framework (stage 1: kappa/asph only, stage 2: joint). Polychromatic
# RMS spot 0.0035 mm at f/2 over the full 19 deg half field with 100% ray
# transmission — 6.6x better than the spherical parent. Flagship scene for
# the conic/asphere superset (BASELINE north star; see ops/pallas_asphere).
DOUBLE_GAUSS_ASPH = {
    "stop_idx": [5], "sequence": ["GAGGAAGGAGA"], "hfov": [19.0],
    "f_number": [2.0],
    "c": [0.0035826058592647314, 0.009367899037897587, 0.014143591746687889, 0.0022948281839489937, 0.0006933839176781476, 0.0, -0.005277773831039667, 0.03284847363829613, -0.015501280315220356, 0.015926918014883995, -0.004528638441115618],
    "t": [1.530446171760559, 15.587099075317383, 10.367450714111328, 1.7273943424224854, 14.138989448547363, 14.030355453491211, 1.5268899202346802, 7.832614898681641, 0.3070015609264374, 9.52701187133789, 37.71778106689453],
    "nd": DOUBLE_GAUSS["nd"],
    "v": DOUBLE_GAUSS["v"],
    "kappa": [0.004777070600539446, 0.08749423176050186, -0.09090401977300644, 0.07064864784479141, 0.08296874910593033, 0.0, -0.0281720831990242, -0.21981368958950043, 0.037330854684114456, 0.11101576685905457, -0.15005606412887573],
    "asph": [[9.740535489299873e-09, 2.3367402457452613e-10], [3.6949853665646515e-07, -4.550708768147338e-11], [-3.877248957451229e-07, -9.208410700622949e-10], [1.0129938345926348e-06, -1.8459572759255138e-10], [8.851174015944707e-07, 5.105758038581598e-10], [3.966175881942036e-06, 1.6096800559139979e-09], [9.350374341465795e-08, -2.668657239635053e-10], [-2.406128487564274e-06, -2.5687596494350373e-10], [-8.476037578475371e-07, 5.760315557878926e-10], [3.580140628400841e-07, 5.115713963554924e-10], [1.396348352500354e-06, -7.714286431870221e-10]],
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
