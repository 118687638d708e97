from .twoview import estimate_twoview_info, TwoViewInfoOptions  # noqa: F401
from .estimate_tracks import EstimateTracksOptions, estimate_all_tracks  # noqa: F401
from .localize import LocalizeOptions, localize_view  # noqa: F401
from .filters import (  # noqa: F401
    set_outlier_tracks_to_unestimated, set_underconstrained_as_unestimated,
)
from .incremental import (  # noqa: F401
    IncrementalOptions, incremental_reconstruction,
)
from .global_pipeline import GlobalOptions, global_reconstruction  # noqa: F401
from .hybrid import HybridOptions, hybrid_reconstruction  # noqa: F401
