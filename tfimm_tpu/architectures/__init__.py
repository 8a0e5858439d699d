"""Architecture zoo. Importing this package fills the model registry
(reference: tfimm/architectures/__init__.py:1-16). LoRA and Segment Anything
are opt-in imports, mirroring the reference."""

from tfimm_tpu.architectures.cait import *  # noqa: F401,F403
from tfimm_tpu.architectures.convmixer import *  # noqa: F401,F403
from tfimm_tpu.architectures.poolformer import *  # noqa: F401,F403
from tfimm_tpu.architectures.efficientnet import *  # noqa: F401,F403
from tfimm_tpu.architectures.convnext import *  # noqa: F401,F403
from tfimm_tpu.architectures.mlp_mixer import *  # noqa: F401,F403
from tfimm_tpu.architectures.pit import *  # noqa: F401,F403
from tfimm_tpu.architectures.pvt import *  # noqa: F401,F403
from tfimm_tpu.architectures.pvt_v2 import *  # noqa: F401,F403
from tfimm_tpu.architectures.resnet import *  # noqa: F401,F403
from tfimm_tpu.architectures.resnetv2 import *  # noqa: F401,F403
from tfimm_tpu.architectures.vit_hybrid import *  # noqa: F401,F403
from tfimm_tpu.architectures.swin import *  # noqa: F401,F403
from tfimm_tpu.architectures.vgg import *  # noqa: F401,F403
from tfimm_tpu.architectures.vit import *  # noqa: F401,F403
