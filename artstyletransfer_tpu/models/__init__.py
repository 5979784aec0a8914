from .vgg19 import (  # noqa: F401
    CONTENT_INDEX,
    LAYER_NAMES,
    STYLE_INDICES,
    Vgg19Features,
    extract_features,
    prepare_model,
)
from .weights import init_vgg19_params, load_vgg19_params, save_vgg19_params  # noqa: F401
