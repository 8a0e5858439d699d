from tfimm_tpu.ops.basic import (  # noqa: F401
    Dense,
    act_layer_factory,
    constant_init,
    lecun_normal,
    trunc_normal,
    variance_scaling,
    zeros_init,
    ones_init,
)
from tfimm_tpu.ops.norm import (  # noqa: F401
    Affine,
    BatchNorm,
    GroupNorm,
    LayerNorm,
    norm_layer_factory,
)
from tfimm_tpu.ops.conv import (  # noqa: F401
    Conv2d,
    DepthwiseConv2d,
    StdConv2d,
    FanoutInitializer,
)
from tfimm_tpu.ops.mlp import MLP, ConvMLP, GluMLP, GatedMLP  # noqa: F401
from tfimm_tpu.ops.embed import (  # noqa: F401
    PatchEmbeddings,
    interpolate_pos_embeddings,
    interpolate_pos_embeddings_grid,
)
from tfimm_tpu.ops.stochastic import Dropout, DropPath  # noqa: F401
from tfimm_tpu.ops.classifier import ClassifierHead, global_pool_2d  # noqa: F401
from tfimm_tpu.ops.se import EcaModule, SEModule, attn_layer_factory  # noqa: F401
from tfimm_tpu.ops.pool import BlurPool2d  # noqa: F401
from tfimm_tpu.ops.attention import MultiHeadAttention, scaled_dot_product_attention  # noqa: F401
