from .gram import gram_matrix  # noqa: F401
from .tv import total_variation  # noqa: F401
from .losses import content_loss, level_loss, style_loss  # noqa: F401
from .resize import bicubic_resize, downscale2x, resize_matrix  # noqa: F401
