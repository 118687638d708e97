from .mesh import make_mesh, shard_ba_problem, sharded_bundle_adjust  # noqa: F401
from .point_sharded import (  # noqa: F401
    partition_problem_by_point, point_sharded_bundle_adjust)
from .edge_sharded import (  # noqa: F401
    rotation_averaging_sharded, estimate_positions_sharded)
