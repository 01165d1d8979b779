from stereo_reconstruction_tpu.rectify.loop_zhang import (  # noqa: F401
    RectifyHomographies,
    loop_zhang_homographies,
)
from stereo_reconstruction_tpu.rectify.rectifier import (  # noqa: F401
    RectifiedPair,
    rectify_pair,
    disparity_to_original_frame,
)
