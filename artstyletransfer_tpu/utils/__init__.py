from .image import (  # noqa: F401
    IMAGENET_MEAN_255,
    encode_jpeg,
    load_image,
    prepare_img,
    unprepare_img,
)
