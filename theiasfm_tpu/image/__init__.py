from .float_image import FloatImage, load_gray  # noqa: F401
from .sift import SiftOptions, extract_sift  # noqa: F401
