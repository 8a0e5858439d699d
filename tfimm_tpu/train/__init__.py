"""Training framework (reference: tfimm/train/__init__.py:1-45).

Importing this package registers all @cfg_serializable classes.
"""

from tfimm_tpu.train.config import (  # noqa: F401
    deep_to_flat,
    dump_config,
    flat_to_deep,
    parse_args,
    pprint,
    to_dict_format,
)
from tfimm_tpu.train.datasets import (  # noqa: F401
    ArrayDataset,
    ArrayDatasetConfig,
    GrainDataset,
    GrainDatasetConfig,
    ImageFolderConfig,
    ImageFolderDataset,
    SyntheticDataset,
    SyntheticDatasetConfig,
    TFDSConfig,
    TFDSWrapper,
)
from tfimm_tpu.train.transforms import (  # noqa: F401
    Mixup,
    random_flip_horizontal,
    smooth_one_hot,
)
from tfimm_tpu.train.interface import ProblemBase  # noqa: F401
from tfimm_tpu.train.model import (  # noqa: F401
    EmbeddingModelConfig,
    EmbeddingModelFactory,
    ModelConfig,
    ModelFactory,
    SavedModel,
    SavedModelConfig,
)
from tfimm_tpu.train.optimizers import (  # noqa: F401
    LRConstFactory,
    LRCosineDecayFactory,
    LRExpDecayFactory,
    LRMultiStepsFactory,
    OptimizerConfig,
    OptimizerFactory,
)
from tfimm_tpu.train.problems import (  # noqa: F401
    ClassificationConfig,
    ClassificationProblem,
    DistillationConfig,
    DistillationProblem,
)
from tfimm_tpu.train.registry import cfg_serializable, get_class, get_cfg_class  # noqa: F401
from tfimm_tpu.train.timekeeping import Timekeeping  # noqa: F401
from tfimm_tpu.train.train import ExperimentConfig, run  # noqa: F401
from tfimm_tpu.train.trainer import SingleDeviceTrainer, Trainer, TrainerConfig  # noqa: F401
from tfimm_tpu.train.utils import collect_tfrecord_files, setup_logging  # noqa: F401
