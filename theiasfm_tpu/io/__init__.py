from .theia_format import read_theia_reconstruction  # noqa: F401
from .native_format import (  # noqa: F401
    read_reconstruction, write_reconstruction,
)
from .ply import write_ply  # noqa: F401
