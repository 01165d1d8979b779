from stereo_reconstruction_tpu.io.pfm import read_pfm, write_pfm  # noqa: F401
from stereo_reconstruction_tpu.io.calib import parse_calib, Calibration  # noqa: F401
from stereo_reconstruction_tpu.io.image import read_image, write_image  # noqa: F401
from stereo_reconstruction_tpu.io.mesh_io import write_off  # noqa: F401
