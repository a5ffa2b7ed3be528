"""Model zoo: Flax image/video backbones with explicit feature taps."""

from .api import ImageModel, TinyVideoNet, VideoModel, init_bundle  # noqa: F401
from .registry import (  # noqa: F401
    DEPTH_TO_TAP,
    IMAGE_MODEL_NAMES,
    build_image_model,
    get_image_models,
)
from .video_zoo import (  # noqa: F401
    ILAF_TAPS,
    TAP_TAPS,
    VIDEO_BUILDERS,
    get_video_model,
    tap_keys_for,
)
