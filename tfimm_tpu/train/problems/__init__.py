from tfimm_tpu.train.problems.classification import (  # noqa: F401
    ClassificationConfig,
    ClassificationProblem,
)
from tfimm_tpu.train.problems.distillation import (  # noqa: F401
    DistillationConfig,
    DistillationProblem,
)
