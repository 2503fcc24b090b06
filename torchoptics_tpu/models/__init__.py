from torchoptics_tpu.models.structure import Lens, Specs, Structure  # noqa: F401
