from stereo_reconstruction_tpu.data.records import StereoPair  # noqa: F401
from stereo_reconstruction_tpu.data.middeval3 import MiddEval3  # noqa: F401
