"""Segment Anything (SAM) — opt-in import, mirroring the reference
(tfimm/architectures/segment_anything/__init__.py)."""

from tfimm_tpu.architectures.segment_anything.sam import (  # noqa: F401
    SegmentAnythingModel,
    SegmentAnythingModelConfig,
)
from tfimm_tpu.architectures.segment_anything.predictor import (  # noqa: F401
    ImageResizer,
    SAMPredictor,
)
from tfimm_tpu.architectures.segment_anything.amg import (  # noqa: F401
    SAMAutomaticMaskGenerator,
)
