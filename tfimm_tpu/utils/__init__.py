from tfimm_tpu.utils.cache import (  # noqa: F401
    cached_model_path,
    clear_model_cache,
    get_dir,
    list_cached_models,
    set_dir,
    set_model_cache,
)
from tfimm_tpu.utils.constants import (  # noqa: F401
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    IMAGENET_INCEPTION_MEAN,
    IMAGENET_INCEPTION_STD,
)
from tfimm_tpu.utils.etc import make_divisible, to_2tuple  # noqa: F401
from tfimm_tpu.utils.tree import (  # noqa: F401
    flatten_params,
    unflatten_params,
    tree_cast,
    count_params,
)
