from .mesh import make_mesh, shard_ba_problem, sharded_bundle_adjust  # noqa: F401
