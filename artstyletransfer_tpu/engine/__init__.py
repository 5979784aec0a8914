from .pyramid import build_input_pyramids, resize_to_level  # noqa: F401
from .transfer import ContentStylePair, TransferJob, neural_style_transfer  # noqa: F401
