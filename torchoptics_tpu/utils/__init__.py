from torchoptics_tpu.utils.wavelength import wavelength_to_rgb  # noqa: F401
