"""Data pipelines: Kinetics-400 mp4, UCF-101 frame-JPEG, synthetic."""

from .kinetics import KineticsAttackDataset  # noqa: F401
from .pipeline import device_prefetch, make_input_pipeline, threaded_prefetch  # noqa: F401
from .synthetic import SyntheticAttackDataset  # noqa: F401
from .ucf101 import UCF101AttackDataset  # noqa: F401
